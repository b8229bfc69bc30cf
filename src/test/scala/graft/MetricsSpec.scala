package graft

import java.nio.file.Files

import graft.operators.{PipelineMetrics, SnapshotJob}
import graft.sources.{LocalKeyService, SnapshotFixture}

/** The observe-based counter surface (reference A4): scan and delivery
  * metrics are exact and arrive via the QueryExecutionListener. */
class MetricsSpec extends SparkSuite {
  import spark.implicits._

  test("scan + delivery counters reflect the run exactly") {
    val fixtureDir = "/tmp/graft-fixture-metrics"
    SnapshotFixture.generate(fixtureDir, SnapshotFixture.defaultTopics(5, 20))
    val out = Files.createTempDirectory("graft-metrics-out").toString
    val status = Files.createTempDirectory("graft-metrics-status").toString
    val expected = Seq(("db.core.claimant", 5L), ("db.database.sent", 1L),
      ("db.database.empty", 0L)).toDF("topic", "FilesExported")

    val collector = PipelineMetrics.install(spark)
    SnapshotJob.run(spark, fixtureDir, out, status, expected, LocalKeyService)

    val delivery = collector.await("graft_delivery")
    assert(delivery("files_delivered") == 6) // 5 claimant + 1 sent
    assert(delivery("bytes_delivered") > 0)
    val scan = collector.await("graft_scan")
    assert(scan("files_scanned") == 6)
    assert(scan("files_rejected") == 0)
    assert(scan("files_blocked") == 0)
    assert(scan("bytes_scanned") > 0)
  }
}
