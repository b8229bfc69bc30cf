package graft

import org.apache.spark.sql.functions._

import graft.operators.Delivery

/** Bounds for the engine-specific sketch aggregates (Spark's built-in
  * approx_count_distinct/percentile_approx have engine-specific HLL/GK
  * internals, so no cross-engine oracle can exist by category — the
  * accuracy contract is proven here instead; the deterministic gated
  * counterparts are q106/q107/q120/q123), plus small delivery-rule
  * parity. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("grouped single-pass sketch aggregation (former q25 shape)") {
    // the one-pass pure-sketch plan: both approx aggregates in a single
    // groupBy (mixing countDistinct in would force a double-pass Expand)
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median"))
      .as[(String, Long, Double)].collect()
    assert(rows.length == 3) // A, N, R
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (flag, approx, median) =>
      val err = math.abs(approx - exact(flag)).toDouble / exact(flag)
      assert(err < 0.15, s"$flag: approx=$approx exact=${exact(flag)}")
      assert(median > 0.0)
    }
  }

  test("approx_count_distinct within its rsd bound of the exact count") {
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (flag, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.15, s"$flag: approx=$approx exact=$exact err=$err")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val o = Tables.load(spark, sf("sf0.01"), "orders")
    val r = o.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      min(col("o_totalprice")), max(col("o_totalprice")))
      .as[(Double, Double, Double, Double)].head()
    val (approx, exact, lo, hi) = r
    assert(approx >= lo && approx <= hi)
    assert(math.abs(approx - exact) / (hi - lo) < 0.05,
      s"approx=$approx exact=$exact range=[$lo,$hi]")
  }

  test("monitoring skip rule: heartbeat runs and blank ARN send nothing") {
    assert(!Delivery.shouldSendMonitoring("NIFI_HEARTBEAT", "arn:topic"))
    assert(!Delivery.shouldSendMonitoring("2026-01-01", ""))
    assert(Delivery.shouldSendMonitoring("2026-01-01", "arn:topic"))
  }

  test("monitoring payload JSON carries the decision fields") {
    val completion = Seq(("run-1", true, false, "COMPLETED_SUCCESSFULLY"))
      .toDF("correlationId", "all_ok", "any_failed", "completionStatus")
    val json = Delivery.monitoringPayload(completion, "2026-01-01", "full")
      .as[String].head()
    assert(json.contains("\"severity\":\"Information\""))
    assert(json.contains("\"title_text\":\"Crown export completed\""))
    assert(json.contains("\"Correlation Id\""))
  }
}
