package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{LocalKeyService, SnapshotFixture}
import graft.streaming.SnapshotStream

/** Streaming delivery parity + full dedup ladder. */
class SnapshotStreamSpec extends SparkSuite {
  import spark.implicits._

  /** Listener delivery is async: poll until the family has entries. */
  private def awaitFamily(c: graft.operators.PipelineMetrics.Collector,
      prefix: String, timeoutMs: Long = 10000): Map[String, Long] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (c.sumFamily(prefix).isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    val m = c.sumFamily(prefix)
    assert(m.nonEmpty, s"observation family '$prefix' never delivered")
    m
  }

  test("streaming pipeline delivers the same outputs as the batch job") {
    val fixture = "/tmp/graft-fixture-stream"
    SnapshotFixture.generate(fixture, SnapshotFixture.defaultTopics(4, 10))
    val out = Files.createTempDirectory("stream-out").toString
    val status = Files.createTempDirectory("stream-status").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    // install BEFORE start: foreachBatch runs on the query's cloned
    // session, which snapshots the listener list at query start
    val collector = graft.operators.PipelineMetrics.install(spark)
    try {
      val q = SnapshotStream.start(spark, fixture, out, status, ckpt,
        LocalKeyService)
      q.awaitTermination(120000) // AvailableNow terminates when drained

      val claimant = Paths.get(out, "db.core.claimant").toFile.listFiles()
        .filter(_.getName.endsWith(".json.gz"))
      assert(claimant.length == 4)
      // A4 parity: per-batch observe nodes, summed over the family —
      // correct for ANY batch split, not just the one-batch drain
      assert(awaitFamily(collector, "graft_scan")("files_scanned") == 5)
      assert(awaitFamily(collector, "graft_delivery")("files_delivered") == 5)
    } finally spark.listenerManager.unregister(collector)
    val markers = Paths.get(status).toFile.listFiles()
      .filter(_.getName.endsWith(".finished"))
    assert(markers.length == 5) // 4 claimant + 1 sent

    // restart with the same checkpoint: nothing re-delivered (no new files)
    val mtimes = markers.map(f => f.getName -> f.lastModified()).toMap
    val q2 = SnapshotStream.start(spark, fixture, out, status,
      ckpt, LocalKeyService)
    q2.awaitTermination(120000)
    val after = Paths.get(status).toFile.listFiles()
      .filter(_.getName.endsWith(".finished"))
    assert(after.length == 5)
    assert(after.forall(f => mtimes(f.getName) == f.lastModified()),
      "checkpoint must prevent re-delivery")
  }

  test("streaming blocked-topic files leave a .blocked marker, not silence") {
    import graft.operators.SnapshotPipeline.DeliveryConf
    val fixture = "/tmp/graft-fixture-stream-blocked"
    SnapshotFixture.generate(fixture, SnapshotFixture.defaultTopics(3, 5))
    val out = Files.createTempDirectory("sb-out").toString
    val status = Files.createTempDirectory("sb-status").toString
    val ckpt = Files.createTempDirectory("sb-ckpt").toString

    val collector = graft.operators.PipelineMetrics.install(spark)
    try {
      val q = SnapshotStream.start(spark, fixture, out, status, ckpt,
        LocalKeyService, DeliveryConf(blockedTopics = Seq("db.core.claimant")))
      q.awaitTermination(120000)

      // blocked files: no delivery, no .finished marker — but a .blocked
      // marker each (the checkpoint consumed them exactly once)
      assert(!Paths.get(out, "db.core.claimant").toFile.exists())
      val names = Paths.get(status).toFile.listFiles().map(_.getName)
      val blocked = names.filter(_.endsWith(".blocked"))
      assert(blocked.length == 3)
      assert(blocked.forall(_.contains("db.core.claimant")))
      // the unblocked topic still delivers normally
      assert(names.count(_.endsWith(".finished")) == 1)
      // counter parity on the DIVERGING path too: blocked files counted,
      // nothing rejected, only the unblocked file delivered
      val scan = awaitFamily(collector, "graft_scan")
      assert(scan("files_scanned") == 4 && scan("files_blocked") == 3 &&
        scan("files_rejected") == 0)
      assert(awaitFamily(collector, "graft_delivery")("files_delivered") == 1)
    } finally spark.listenerManager.unregister(collector)
  }

  test("dedupeCorpus drops planted exact + near duplicates, keeps originals") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents").limit(100)
    // plant: exact copies (+10000) and near-copies with one word changed (+20000)
    val exact = docs.withColumn("doc_id", col("doc_id") + 10000L)
    val near = docs.withColumn("doc_id", col("doc_id") + 20000L)
      .withColumn("text", concat(col("text"), lit(" xyzzy")))
    val corpus = docs.unionByName(exact).unionByName(near)
    val kept = Dedup.dedupeCorpus(corpus, "doc_id", "text").cache()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // the corpus may contain NATURAL near-dups among the originals — the
    // invariant is: adding planted copies never changes which originals
    // survive (copies have larger ids, so originals always win keep-first)
    val naturalKept = Dedup.dedupeCorpus(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds.filter(_ < 10000L) == naturalKept)
    // every exact copy dropped (its original has the smaller id)
    assert(!keptIds.exists(id => id >= 10000L && id < 20000L))
    // near copies (one appended token → jaccard > 0.8) largely dropped
    val nearSurvivors = keptIds.count(_ >= 20000L)
    assert(nearSurvivors < 15, s"$nearSurvivors near-dups survived")
    assert(kept.count() < 130)
  }
}
