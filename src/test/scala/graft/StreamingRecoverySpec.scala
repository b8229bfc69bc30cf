package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DeliveredFile, DeliveryTransport, LocalFsTransport}
import graft.sources.SnapshotFixture
import graft.streaming.EventStream

/** Crash-recovery: kill a streaming query mid-input, restart it from the
  * checkpoint, and prove the UNION of outputs equals the batch oracle
  * with no duplicates — the streaming analogue of the batch path's
  * `.finished`-marker re-run idempotence (which SnapshotJobSpec proves).
  *
  * The "crash" is a stop with unprocessed input still to come: phase 1
  * drains a prefix of the files and stops (watermark, window partials,
  * session buffers and the file-source seen-set all live only in the
  * checkpoint), phase 2 adds the rest and restarts the same query. The
  * parquet sink's metadata log is the exactly-once commit protocol under
  * test — reading the output dir replays only committed files. */
class StreamingRecoverySpec extends SparkSuite {
  import spark.implicits._

  /** Drains everything currently available, then stops — one "life" of a
    * restartable query. Default trigger + processAllAvailable (not
    * AvailableNow) so no-data micro-batches still fire event-time
    * timeouts before the stop. */
  private def drainOnce(input: String, out: String, ckpt: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(input))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("windowed aggregation survives a mid-input restart exactly-once") {
    // events split into two halves BY TIME at a mid-hour point: the split
    // hour's window has events on both sides of the restart, so its final
    // emission is only correct if the phase-1 partial count came back
    // from the checkpoint. (A split by FILE would feed phase 2 events
    // older than the phase-1 watermark — dropped as late data by design,
    // which is watermark semantics, not a recovery defect.)
    val srcDir = Files.createTempDirectory("rec-src").toString
    Tables.load(spark, sf("sf0.001"), "events")
      .write.mode("overwrite").parquet(srcDir)
    val src = spark.read.parquet(srcDir)
    val (minMs, maxMs) = src.agg(unix_millis(min(col("ts"))),
      unix_millis(max(col("ts")))).as[(Long, Long)].head()
    // a dense hour near the middle of the range (≥2 events at distinct
    // times, comfortably before the end so its window closes), split
    // between its first and last event
    val (hourStartMs, splitLo, splitHi) = src
      .select((expr("unix_millis(ts) div 3600000") * 3600000L).as("h"),
        unix_millis(col("ts")).as("ms"))
      .filter(col("h") < maxMs - 6L * 3600000L)
      .groupBy(col("h"))
      .agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      .filter(col("lo") < col("hi"))
      .orderBy(abs(col("h") - (minMs + maxMs) / 2L))
      .as[(Long, Long, Long)].head()
    val splitMs = splitLo + 1 // ≥1 event strictly before, ≥1 at/after
    assert(splitHi >= splitMs && hourStartMs == (splitLo / 3600000L) * 3600000L)

    val input = Files.createTempDirectory("rec-input").toString
    val out = Files.createTempDirectory("rec-out").toString
    val ckpt = Files.createTempDirectory("rec-ckpt").toString
    val schema = src.schema
    def copyIn(half: DataFrame, name: String): Unit = {
      val stage = Files.createTempDirectory(s"rec-stage-$name").toString
      half.coalesce(1).write.mode("overwrite").parquet(stage)
      Paths.get(stage).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
          case (f, i) => Files.copy(f.toPath,
            Paths.get(input, s"$name-$i.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
        }
    }

    copyIn(src.filter(unix_millis(col("ts")) < splitMs), "first")
    drainOnce(input, out, ckpt, schema, EventStream.hourlyTypeCounts)
    copyIn(src.filter(unix_millis(col("ts")) >= splitMs), "second")
    drainOnce(input, out, ckpt, schema, EventStream.hourlyTypeCounts)

    val got = spark.read.parquet(out)
      .as[(java.sql.Timestamp, String, Long)].collect()
    // exactly-once: a (window, type) group emits at most once across lives
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length,
      "restart produced duplicate window emissions")
    val batch = EventStream.hourlyTypeCounts(spark.read.parquet(srcDir))
      .as[(java.sql.Timestamp, String, Long)].collect()
    // nothing emitted that batch doesn't have — with the TOTAL count, i.e.
    // pre-restart partial counts were recovered, not restarted from zero
    assert(got.toSet.subsetOf(batch.toSet),
      s"streamed rows diverge from batch: ${got.toSet.diff(batch.toSet).take(3)}")
    // and the closed prefix is complete (same horizon rule as StreamingSpec)
    val maxTs = spark.read.parquet(srcDir).agg(max(col("ts")))
      .as[java.sql.Timestamp].head()
    val horizon = new java.sql.Timestamp(maxTs.getTime - 4L * 3600 * 1000)
    val gotClosed = got.filter(_._1.before(horizon)).toSet
    val batchClosed = batch.filter(_._1.before(horizon)).toSet
    assert(gotClosed.nonEmpty && gotClosed == batchClosed)
    // the straddling hour specifically: emitted once, with the TOTAL
    // count — phase-1 partials recovered, not restarted from zero
    assert(got.filter(_._1.getTime == hourStartMs).toSet ==
      batch.filter(_._1.getTime == hourStartMs).toSet)
    assert(batch.count(_._1.getTime == hourStartMs) > 0)
  }

  test("event-time session buffers survive a restart; closed sessions never re-emit") {
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = Files.createTempDirectory("sess-input").toString
    val out = Files.createTempDirectory("sess-out").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    def addFile(name: String, rows: (Long, java.sql.Timestamp)*): Unit = {
      val stage = s"$input-stage"
      rows.toSeq.toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      Paths.get(stage).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach(f =>
          Files.copy(f.toPath, Paths.get(input, name),
            StandardCopyOption.REPLACE_EXISTING))
    }
    val schema = Seq((1L, t(0))).toDF("user_id", "ts").schema
    def life(): Unit = drainOnce(input, out, ckpt, schema,
      df => EventStream.sessionizeEventTime(spark, df,
        gapMs = 30L * 60 * 1000, watermarkDelay = "45 minutes").toDF())

    // life 1: user 1 at minutes 10 and 100. Watermark reaches 55 → the
    // {10} session closes and emits; {100} stays buffered in state.
    addFile("f1.parquet", (1L, t(10)), (1L, t(100)))
    life()
    assert(spark.read.parquet(out).count() == 1, "life 1 must close {10} only")
    // life 2 ("after the crash"): minute 60 slots BETWEEN the recovered
    // buffer's sessions; the sentinel pushes the watermark past everything.
    addFile("f2.parquet", (1L, t(60)), (99L, t(1000)))
    life()

    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().toSet
    def sess(s: Long, e: Long, n: Long) = (1L, s * 60000L, e * 60000L, n)
    // {10} exactly once (no re-emit after restart), {60} and {100} closed
    // in life 2 — {100} ONLY exists if the session buffer was recovered
    assert(got.filter(_._1 == 1L) ==
      Set(sess(10, 10, 1), sess(60, 60, 1), sess(100, 100, 1)),
      s"got $got")
  }

  test("windowed KMV sketch buffer survives a mid-window restart (typed-aggregator state recovered)") {
    // the Append-windowed sketches keep a CUSTOM Aggregator buffer (the
    // bottom-k list) in the state store — the one stateful shape the
    // suite didn't cover. Split one window's rows across two lives with
    // k < total distinct values: the final estimate depends on ALL
    // values' hashes (u_k = k-th smallest of six), so a lost phase-1
    // buffer cannot produce the batch answer (it would read exactly 3.0,
    // the below-k exact branch over phase 2's three values).
    def t(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    val input = Files.createTempDirectory("kmv-input").toString
    val out = Files.createTempDirectory("kmv-out").toString
    val ckpt = Files.createTempDirectory("kmv-ckpt").toString
    def addFile(name: String, rows: (String, Long, java.sql.Timestamp)*): Unit = {
      val stage = s"$input-stage"
      rows.toSeq.toDF("event_type", "user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      Paths.get(stage).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach(f =>
          Files.copy(f.toPath, Paths.get(input, name),
            StandardCopyOption.REPLACE_EXISTING))
    }
    val schema = Seq(("a", 1L, t(1, 1))).toDF("event_type", "user_id", "ts").schema
    def life(): Unit = drainOnce(input, out, ckpt, schema,
      df => EventStream.kmvWindowed(df, "event_type", "user_id", k = 4,
        "1 day", "1 hour"))

    // life 1: half of window W1 (Jan 1); watermark stays inside W1 → no
    // emission, the partial bottom-k buffer lives only in the checkpoint
    addFile("f1.parquet", ("a", 1L, t(1, 1)), ("a", 2L, t(1, 2)), ("a", 3L, t(1, 3)))
    life()
    assert(spark.read.parquet(out).count() == 0,
      "W1 must not close in life 1")
    // life 2 (after the "crash"): W1's other half + an advance event two
    // days later that pushes the watermark past W1's end
    addFile("f2.parquet", ("a", 4L, t(1, 4)), ("a", 5L, t(1, 5)),
      ("a", 6L, t(1, 6)), ("a", 999L, t(3, 12)))
    life()

    val got = spark.read.parquet(out)
      .as[(java.sql.Timestamp, String, Double)].collect()
    assert(got.length == 1 && got(0)._1 == t(1, 0) && got(0)._2 == "a",
      s"want exactly W1 for group a, got ${got.toSeq}")
    val expected = graft.operators.Sketches.kmvDistinct(
        (1L to 6L).map(u => ("a", u)).toDF("event_type", "user_id"),
        "event_type", "user_id", k = 4)
      .select("kmv_estimate").as[Double].head()
    assert(got(0)._3 == expected,
      s"recovered-buffer estimate ${got(0)._3} != batch $expected — " +
        "phase-1 sketch state was lost across the restart")
  }

  test("SCD2 open interval survives a restart; closed intervals never re-emit") {
    // base > 0: a row whose event time EQUALS the initial watermark (0)
    // is dropped by the late-row filter (predicate is ts <= wm) before
    // the handler sees it — an epoch-0 test artifact, not a real case
    val base = 1700000000000L
    def t(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val input = Files.createTempDirectory("scd2-input").toString
    val out = Files.createTempDirectory("scd2-out").toString
    val ckpt = Files.createTempDirectory("scd2-ckpt").toString
    def addFile(name: String,
        rows: (Long, java.sql.Timestamp, Long, String)*): Unit = {
      val stage = s"$input-stage"
      rows.toSeq.toDF("user_id", "ts", "event_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      Paths.get(stage).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach(f =>
          Files.copy(f.toPath, Paths.get(input, name),
            StandardCopyOption.REPLACE_EXISTING))
    }
    val schema = Seq((1L, t(0), 1L, "a")).toDF(
      "user_id", "ts", "event_id", "event_type").schema
    def life(): Unit = drainOnce(input, out, ckpt, schema,
      df => EventStream.scd2Stream(df, watermarkDelay = "45 minutes").toDF())

    // life 1: user 1 a@0 b@10 b@100 → wm 55: (a,0,10) emits; the open
    // interval (b, from 10) and the raw b@100 live ONLY in the checkpoint
    addFile("f1.parquet", (1L, t(0), 1L, "a"), (1L, t(10), 2L, "b"),
      (1L, t(100), 3L, "b"))
    life()
    val after1 = spark.read.parquet(out)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(after1 == Set((1L, "a", base, base + 10L * 60000)), after1.toString)

    // life 2: c@200 a@210 b@300 → wm 255: b@100 must COLLAPSE into the
    // recovered open (b, from 10) — lost state would emit (b,100,200)
    // instead of (b,10,200) — then (c,200,210) closes too
    addFile("f2.parquet", (1L, t(200), 4L, "c"), (1L, t(210), 5L, "a"),
      (1L, t(300), 6L, "b"))
    life()
    val got = spark.read.parquet(out)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length == got.distinct.length,
      "restart produced duplicate interval emissions")
    assert(got.toSet == Set(
      (1L, "a", base, base + 10L * 60000),
      (1L, "b", base + 10L * 60000, base + 200L * 60000),
      (1L, "c", base + 200L * 60000, base + 210L * 60000)),
      s"open-interval recovery broken: ${got.toSeq.sortBy(_._3)}")
  }

  test("snapshot stream restart delivers new files only — never re-sends") {
    StreamingRecoverySpec.sendCounts.clear()
    val fixture = "/tmp/graft-fixture-recovery"
    val out = Files.createTempDirectory("rec-snap-out").toString
    val status = Files.createTempDirectory("rec-snap-status").toString
    val ckpt = Files.createTempDirectory("rec-snap-ckpt").toString
    def life(): Unit = {
      val q = graft.streaming.SnapshotStream.start(spark, fixture, out,
        status, ckpt, graft.sources.LocalKeyService,
        transport = Some(CountingTransport(out)))
      q.awaitTermination()
    }
    // life 1: 2 files; life 2: the SAME 2 files (byte-identical, rewritten
    // paths) + 2 new ones — only the new ones may be sent after restart
    SnapshotFixture.generate(fixture, Seq(SnapshotFixture.Topic("core", "claimant", 2, 5)))
    life()
    assert(StreamingRecoverySpec.sendCounts.size == 2)
    SnapshotFixture.generate(fixture, Seq(SnapshotFixture.Topic("core", "claimant", 4, 5)))
    life()
    val counts = StreamingRecoverySpec.sendCounts.asScala.view
      .mapValues(_.get).toMap
    assert(counts.size == 4, s"expected 4 distinct files, got $counts")
    assert(counts.values.forall(_ == 1),
      s"a file was re-sent across the restart: $counts")
    assert(Paths.get(status).toFile.listFiles()
      .count(_.getName.endsWith(".finished")) == 4)
  }
}

object StreamingRecoverySpec {
  /** outputName → sends, across query lives (same JVM in local mode). */
  val sendCounts = new ConcurrentHashMap[String, AtomicInteger]()
}

/** Delivery transport that counts every send before delegating to the
  * local-FS delivery — the probe for exactly-once-across-restarts. */
final case class CountingTransport(outDir: String) extends DeliveryTransport {
  override def send(file: DeliveredFile): Unit = {
    StreamingRecoverySpec.sendCounts
      .computeIfAbsent(file.outputName, _ => new AtomicInteger(0))
      .incrementAndGet()
    LocalFsTransport(outDir).send(file)
  }
}
