package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SnapshotJob
import graft.sources.{EncryptedSnapshotSource, LocalKeyService, SnapshotFixture}

/** The DSv2 encrypted-snapshot source must be a drop-in for the
  * glob+sidecar-join read: same schema, same rows, same pipeline results —
  * plus the scale behaviors the V2 API buys (column pruning reaching the
  * reader, balanced partitions). */
class SnapshotDsv2Spec extends SparkSuite {
  import spark.implicits._

  private val fixture = "/tmp/graft-fixture-dsv2"
  SnapshotFixture.generate(fixture, SnapshotFixture.defaultTopics(6, 10))

  private def dsv2 = spark.read.format("encrypted-snapshot").load(fixture)

  test("schema and rows identical to the glob+join read") {
    val glob = EncryptedSnapshotSource.read(spark, fixture)
    assert(dsv2.schema.map(f => (f.name, f.dataType)) ==
      glob.schema.map(f => (f.name, f.dataType)))
    // compare full content via hashes (content is binary)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("fileName"), col("fullPath"), col("length"),
        sha2(col("content"), 256).as("h"), col("iv"),
        col("dataKeyEncryptionKeyId"), col("cipherTextDataKey"))
        .collect().map(_.toSeq).toSet
    assert(canon(dsv2) == canon(glob))
    assert(dsv2.count() == 7) // 6 claimant + 1 sent
  }

  test("column pruning reaches the reader: listing queries skip the bytes") {
    val pruned = dsv2.select(col("fileName"), col("length"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("content"), s"content not pruned:\n$plan")
    assert(pruned.count() == 7)
    // count(*) still works with everything pruned
    assert(dsv2.groupBy().count().as[Long].head() == 7)
  }

  test("empty directory yields an empty relation, not an error") {
    val empty = Files.createTempDirectory("dsv2-empty").toString
    assert(spark.read.format("encrypted-snapshot").load(empty).count() == 0)
  }

  test("full pipeline parity: q50-shaped run matches under both sources") {
    val expected = Seq(("db.core.claimant", 6L), ("db.database.sent", 1L),
      ("db.database.empty", 0L)).toDF("topic", "FilesExported")
    def runWith(impl: String) = {
      spark.conf.set("spark.graft.snapshotSource", impl)
      try {
        val out = Files.createTempDirectory(s"dsv2-$impl-out").toString
        val status = Files.createTempDirectory(s"dsv2-$impl-status").toString
        val r = SnapshotJob.run(spark, fixture, out, status, expected,
          LocalKeyService)
        val statuses = r.statuses.select("topic", "CollectionStatus")
          .as[(String, String)].collect().toSet
        val records = SnapshotJob.records(spark, fixture, LocalKeyService)
        (statuses, records.count(),
          records.agg(sum(hash(col("record.contractId"), col("topic"))))
            .as[Long].head())
      } finally spark.conf.unset("spark.graft.snapshotSource")
    }
    val (sGlob, nGlob, hGlob) = runWith("glob")
    val (sDsv2, nDsv2, hDsv2) = runWith("dsv2")
    assert(sGlob == sDsv2)
    assert(nGlob == nDsv2 && nGlob == 70)
    assert(hGlob == hDsv2)
  }
}
