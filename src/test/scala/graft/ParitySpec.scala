package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Delivery, SnapshotJob, SnapshotPipeline}
import graft.sources.{LocalKeyService, SnapshotFixture}

/** Parity details: K4 status-table upsert and the strict failure mode. */
class ParitySpec extends SparkSuite {
  import spark.implicits._

  private val fixtureDir = {
    val d = "/tmp/graft-fixture-parity"
    SnapshotFixture.generate(d, SnapshotFixture.defaultTopics(3, 10))
    d
  }
  private def expectedDf = Seq(("db.core.claimant", 3L),
    ("db.database.sent", 1L), ("db.database.empty", 0L))
    .toDF("topic", "FilesExported")

  test("K4: status table holds the per-correlation end state, re-run idempotent") {
    val out = Files.createTempDirectory("parity-out").toString
    val status = Files.createTempDirectory("parity-status").toString
    val table = Files.createTempDirectory("parity-table").toString
    val conf = SnapshotPipeline.DeliveryConf(correlationId = "corr-42",
      statusTable = Some(table))
    SnapshotJob.run(spark, fixtureDir, out, status, expectedDf,
      LocalKeyService, conf)
    SnapshotJob.run(spark, fixtureDir, out, status, expectedDf,
      LocalKeyService, conf) // idempotent overwrite
    val st = Delivery.readStatusTable(spark, table)
    assert(st.count() == 3)
    val row = st.filter(col("topic") === "db.core.claimant").head()
    assert(row.getAs[String]("CollectionStatus") == "Sent")
    assert(row.getAs[Long]("FilesSent") == 3L)
    assert(row.getAs[String]("CorrelationId") == "corr-42")
  }

  test("lake export partitions by (database, collection) and prunes") {
    val lake = Files.createTempDirectory("parity-lake").toString
    val recs = SnapshotJob.records(spark, fixtureDir, LocalKeyService)
    Delivery.exportRecordsPartitioned(recs, lake)
    // partition subtree per topic
    assert(Files.exists(Paths.get(lake, "database=core", "collection=claimant")))
    assert(Files.exists(Paths.get(lake, "database=database", "collection=sent")))
    val back = spark.read.parquet(lake)
    assert(back.count() == recs.count())
    // a topic-filtered read plans with partition filters (pruning)
    val pruned = back.filter(col("database") === "core" &&
      col("collection") === "claimant")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(pruned.count() == 3 * 10)
  }

  test("strict mode fails the run on a malformed filename") {
    val badDir = Files.createTempDirectory("parity-bad").toString
    // copy fixture + plant one malformed object with sidecar
    Paths.get(fixtureDir).toFile.listFiles().foreach { f =>
      Files.copy(f.toPath, Paths.get(badDir, f.getName))
    }
    Files.write(Paths.get(badDir, "not-a-valid-name.bin.enc"),
      Array[Byte](1, 2, 3))
    Files.write(Paths.get(badDir, "not-a-valid-name.bin.enc.meta.json"),
      """{"fileName":"not-a-valid-name.bin.enc","iv":"AAAA","dataKeyEncryptionKeyId":"k","cipherTextDataKey":"x"}"""
        .getBytes)
    val out = Files.createTempDirectory("parity-out2").toString
    val status = Files.createTempDirectory("parity-status2").toString
    val e = intercept[IllegalArgumentException] {
      SnapshotJob.run(spark, badDir, out, status, expectedDf, LocalKeyService,
        SnapshotPipeline.DeliveryConf(strict = true))
    }
    assert(e.getMessage.contains("not-a-valid-name.bin.enc"))
    // non-strict: same input quarantines instead and delivers the rest
    val res = SnapshotJob.run(spark, badDir, out, status, expectedDf,
      LocalKeyService)
    assert(res.quarantined == 1)
    assert(res.statuses.filter(col("CollectionStatus") === "Sent").count() == 2)
  }
}
