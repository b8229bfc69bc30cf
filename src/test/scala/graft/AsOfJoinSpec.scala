package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest prior value, <= semantics, left-join nulls") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "early"), // before any right row
      (2L, ts("2024-01-01 10:30:00"), "c"),
      (3L, ts("2024-01-01 10:00:00"), "lonely")) // key with no right rows
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0), // EQUAL ts to left "a" → matches (<=)
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 10:00:00"), 300.0))
      .toDF("user_id", "ts", "value")

    val got = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("value"))
      .select(col("tag"), col("asof_value"))
      .as[(String, Option[Double])].collect().toMap

    assert(got("a").contains(100.0))   // equal timestamp counts
    assert(got("b").contains(200.0))   // latest prior, not first
    assert(got("early").isEmpty)       // nothing before → null
    assert(got("c").contains(300.0))
    assert(got("lonely").isEmpty)      // key absent on right → null
  }

  test("a matching right row with NULL value attaches NULL, not an older value") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double])) // latest match: NULL value
      .toDF("user_id", "ts", "value")
    val got = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", Seq("value"))
      .select(col("tag"), col("asof_value"))
      .as[(String, Option[Double])].collect().toMap
    // the 11:00 row is the as-of match; its NULL must not be skipped in
    // favor of the older 10:00 row's 100.0
    assert(got("x").isEmpty)
  }

  test("right-side ties on (key, ts) resolve deterministically") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0)) // same key+ts: max value wins
      .toDF("user_id", "ts", "value")
    (1 to 3).foreach { _ =>
      val got = AsOfJoin.asofBackward(
        left, right.repartition(8), Seq("user_id"), "ts", Seq("value"))
        .select(col("asof_value")).as[Option[Double]].head()
      assert(got.contains(200.0))
    }
  }

  test("as-of result is one row per left row (no range blow-up)") {
    val e = Tables.load(spark, sf("sf0.001"), "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = AsOfJoin.asofBackward(clicks, purchases,
      Seq("user_id"), "ts", Seq("value"))
    assert(joined.count() == clicks.count())
  }
}
