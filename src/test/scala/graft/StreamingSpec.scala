package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Streaming/batch parity: the same transform function over a file stream
  * (memory sink, run to completion) must equal the batch result. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  // events re-written µs-normalized (the raw parquet is TIMESTAMP(NANOS),
  // which the streaming reader rejects just like the batch one)
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream-events").toString
    Tables.load(spark, sf("sf0.001"), "events").write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: streaming == batch on watermark-closed windows") {
    // Append mode only emits windows the watermark has closed; windows in
    // the final 2h horizon stay open at end-of-stream. Compare the closed
    // prefix — it must match batch EXACTLY.
    val maxTs = spark.read.parquet(eventsDir)
      .agg(max(col("ts"))).as[java.sql.Timestamp].head()
    // emit condition is window.end <= watermark = maxTs - 2h, so the last
    // surely-emitted window STARTS before maxTs - 3h; one more hour of
    // slack for watermark truncation across micro-batches.
    val horizon = new java.sql.Timestamp(maxTs.getTime - 4L * 3600 * 1000)
    def closed(rows: Array[(java.sql.Timestamp, String, Long)]) =
      rows.filter(_._1.before(horizon)).toSeq
    val streamed = EventStream.runToCompletion(spark, eventsDir,
      EventStream.hourlyTypeCounts, OutputMode.Append, "hourly")
      .orderBy("hour_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    val batch = EventStream.hourlyTypeCounts(spark.read.parquet(eventsDir))
      .orderBy("hour_start", "event_type")
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(closed(streamed).nonEmpty)
    assert(closed(streamed) == closed(batch))
    // and streaming emitted nothing batch doesn't have
    assert(streamed.toSet.subsetOf(batch.toSet))
  }

  test("streaming dedupe-by-key == batch distinct (the F1 stream analog)") {
    val deduped = EventStream.runToCompletion(spark, eventsDir,
      df => EventStream.dedupeByKey(df, "user_id", "ts"), OutputMode.Append,
      "dedup")
    val batchDistinct = spark.read.parquet(eventsDir)
      .select("user_id").distinct().count()
    assert(deduped.count() == batchDistinct)
  }

  test("stream-stream interval join == batch interval join") {
    val batchEvents = spark.read.parquet(eventsDir)
    def clicksOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
    def purchasesOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")

    val streamed = EventStream.runToCompletion(spark, eventsDir,
      df => EventStream.purchaseAttribution(clicksOf(df), purchasesOf(df)),
      OutputMode.Append, "attribution")
      .select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet
    val batch = EventStream.purchaseAttribution(
        clicksOf(batchEvents), purchasesOf(batchEvents))
      .select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    // inner stream-stream join emits matches as both sides arrive; with a
    // single replay batch every batch pair must be emitted and no extras
    assert(streamed == batch)
  }

  test("event-time sessionization closes exact sessions across OUT-OF-ORDER batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(Long, java.sql.Timestamp)](spark)
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val stream = ms.toDF().toDF("user_id", "ts")
    val q = EventStream.sessionizeEventTime(spark, stream,
        gapMs = 30L * 60 * 1000, watermarkDelay = "45 minutes")
      .toDF().writeStream.outputMode("append")
      .format("memory").queryName("et_sessions").start()
    try {
      // batch 1: user 1's events at minute 100 and 10 — the minute-10
      // event ARRIVES after minute-100 raised the max-seen clock
      ms.addData((1L, t(100)), (1L, t(10)))
      q.processAllAvailable()
      // batch 2: minute 60 arrives AFTER minute 100 was processed, but is
      // above the watermark (55) — it must slot between the buffered
      // sessions; this batch also closes {10} (10 + gap = 40 ≤ wm 55)
      ms.addData((1L, t(60)))
      q.processAllAvailable()
      // sentinel far in the future forces the watermark past everything
      ms.addData((99L, t(1000)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("et_sessions")
      .as[(Long, Long, Long, Long)].collect().toSet
    def sess(startMin: Long, endMin: Long, n: Long) =
      (1L, startMin * 60000L, endMin * 60000L, n)
    // exact event-time sessions for user 1: {10}, {60}, {100} — three
    // singleton sessions (gaps 50 and 40 > 30), with the minute-10 event
    // correctly placed BEFORE minute-100 despite arriving in the same
    // batch after it, and minute-60 arriving a batch later still slotting
    // between them.
    assert(got.filter(_._1 == 1L) ==
      Set(sess(10, 10, 1), sess(60, 60, 1), sess(100, 100, 1)))
  }

  test("stateful sessionization == batch gaps-and-islands") {
    import org.apache.spark.sql.expressions.Window
    val sessions = EventStream.runToCompletion(spark, eventsDir,
      df => EventStream.sessionize(spark, df).toDF(), OutputMode.Update,
      "sessions")
    // Update mode: last row per user is the final state
    val finalState = sessions.groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"), max(col("n_sessions")).as("n_sessions"))

    val e = spark.read.parquet(eventsDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = e.select(col("user_id"), col("ts"),
        when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
          > 30L * 60 * 1000, 1L).otherwise(
          when(lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
          .as("is_new"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("is_new")).as("n_sessions"))

    val mismatches = finalState.as("s").join(batch.as("b"), Seq("user_id"))
      .filter(col("s.n_events") =!= col("b.n_events") ||
        col("s.n_sessions") =!= col("b.n_sessions"))
      .count()
    assert(mismatches == 0)
    assert(finalState.count() == batch.count())
  }
}
