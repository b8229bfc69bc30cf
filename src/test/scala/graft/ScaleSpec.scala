package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Scale primitives: bucketed joins eliminate the exchange; salted
  * variants are result-identical to their plain forms. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed co-located join plans with zero shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.load(spark, sf("sf0.001"), "orders")
      val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      ScaleOps.writeBucketed(o, "orders_b", "o_orderkey", 8)
      ScaleOps.writeBucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        "o_orderkey", 8)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
      // and it computes the right thing
      assert(joined.count() ==
        o.join(li, o("o_orderkey") === li("l_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted join == plain join on a skewed key distribution") {
    // skew: 90% of rows share key 1
    val left = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((1L, "hot"), (10L, "cold"), (20L, "cold2"))
      .toDF("k", "tag")
    val plain = left.join(right, Seq("k"))
    val salted = ScaleOps.saltedJoin(left, right, Seq("k"), 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted two-phase aggregation == plain groupBy") {
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum"), count(lit(1)).as("count"))
    val salted = ScaleOps.saltedSumCount(li, "l_returnflag", "l_quantity", 8)
    val diff = plain.as("p").join(salted.as("s"), Seq("l_returnflag"))
      .filter(abs(col("p.sum") - col("s.sum")) > 1e-6 ||
        col("p.count") =!= col("s.count"))
    assert(diff.count() == 0)
  }
}
