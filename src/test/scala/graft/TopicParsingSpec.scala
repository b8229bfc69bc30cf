package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.SnapshotPipeline

/** Filename grammar accept/reject table, ported from the semantics of the
  * reference's TextParsingUtilityTest.kt (hyphens allowed, optional `db.`
  * prefix, strict numeric chunk suffix). */
class TopicParsingSpec extends SparkSuite {
  import spark.implicits._

  private def parse(names: String*) = {
    val df = names.toDF("fileName")
    SnapshotPipeline.withTopic(df)
      .select(col("fileName"), col("database"), col("collection"), col("topic"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
  }

  test("accepts the standard db-prefixed form") {
    val m = parse("db.core.claimant-045-050-000001.txt.gz")
    assert(m("db.core.claimant-045-050-000001.txt.gz") ==
      (("core", "claimant", "db.core.claimant")))
  }

  test("accepts without the db. prefix; topic has no prefix then") {
    val m = parse("core.claimant-045-050-000001.txt.gz")
    assert(m("core.claimant-045-050-000001.txt.gz") ==
      (("core", "claimant", "core.claimant")))
  }

  test("accepts hyphens in database and collection") {
    val m = parse("db.core-db.address-declared-045-050-000001.txt.gz")
    assert(m("db.core-db.address-declared-045-050-000001.txt.gz") ==
      (("core-db", "address-declared", "db.core-db.address-declared")))
  }

  test("accepts .enc suffixed names (3-part extension)") {
    // the scan sees x.txt.gz.enc before decrypt renames it
    val m = parse("db.core.claimant-045-050-000001.txt.gz.enc")
    assert(m("db.core.claimant-045-050-000001.txt.gz.enc")._1 == "core")
  }

  test("rejects malformed names into quarantine") {
    val bad = Seq(
      "no-topic-at-all.txt.gz",          // no dotted topic
      "db.core.claimant-045-050.txt.gz", // missing chunk number
      "db.core.claimant-45-50-1.txt.gz", // chunk fields not 3-digit
      "db.core.claimant-045-050-000001") // missing 2-part extension
    val df = bad.toDF("fileName")
      .withColumn("iv", lit("aXY="))
      .withColumn("dataKeyEncryptionKeyId", lit("k"))
      .withColumn("cipherTextDataKey", lit("c"))
    val (valid, rejected) = SnapshotPipeline.quarantine(SnapshotPipeline.withTopic(df))
    assert(valid.count() == 0)
    assert(rejected.count() == bad.size)
  }
}
