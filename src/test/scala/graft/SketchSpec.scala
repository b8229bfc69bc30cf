package graft

import org.apache.spark.sql.functions._

import graft.operators.Delivery

/** Bounds for the engine-specific sketch aggregates (q25 has no DuckDB
  * oracle — HLL/KLL internals differ per engine — so the accuracy
  * contract is proven here instead), plus small delivery-rule parity. */
class SketchSpec extends SparkSuite {
  import spark.implicits._

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
