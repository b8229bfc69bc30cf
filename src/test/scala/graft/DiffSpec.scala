package graft

import org.apache.spark.sql.functions._

import graft.operators.Diff

/** Snapshot-diff semantics: classification, null-key reading, the
  * null-vs-"null" fingerprint distinction, idempotence. */
class DiffSpec extends SparkSuite {
  import spark.implicits._

  private def diff(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Diff.snapshotDiff(a, b, Seq("k"), Seq("v", "w"))
      .as[(Long, String)].collect().toMap

  test("added / removed / changed / unchanged classify correctly") {
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("k", "v", "w")
    val b = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "n", 40L))
      .toDF("k", "v", "w")
    assert(diff(a, b) == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      "2 is unchanged and must be dropped")
  }

  test("diff(a, a) is empty — re-running a snapshot diffs to nothing") {
    val a = Seq((1L, "x", 10L), (2L, null.asInstanceOf[String], 20L))
      .toDF("k", "v", "w")
    assert(diff(a, a).isEmpty)
  }

  test("null keys never join: removed from A, added to B") {
    val a = Seq((Some(1L), "x"), (None, "ghost")).toDF("k", "v")
      .withColumn("w", lit(0L))
    val b = Seq((Some(1L), "x"), (None, "ghost")).toDF("k", "v")
      .withColumn("w", lit(0L))
    val got = Diff.snapshotDiff(a, b, Seq("k"), Seq("v", "w"))
      .select(col("status")).as[String].collect().sorted.toSeq
    assert(got == Seq("added", "removed"),
      "identical null-key rows still cannot be linked — one removed, one added")
  }

  test("NULL column value is distinct from the string 'null'") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
      .withColumn("w", lit(0L))
    val b = Seq((1L, "null")).toDF("k", "v").withColumn("w", lit(0L))
    assert(diff(a, b) == Map(1L -> "changed"))
    assert(diff(a, a).isEmpty, "NULL vs NULL is unchanged")
  }

  test("column boundaries cannot alias (per-column fingerprints)") {
    val a2 = Seq((1L, "ab", "c")).toDF("k", "v", "w")
    val b2 = Seq((1L, "a", "bc")).toDF("k", "v", "w")
    assert(Diff.snapshotDiff(a2, b2, Seq("k"), Seq("v", "w"))
      .as[(Long, String)].collect().toMap == Map(1L -> "changed"),
      "('ab','c') vs ('a','bc') must differ — concat-then-hash would alias")
  }

  test("reserved output names are rejected loudly") {
    val bad = Seq((1L, "x")).toDF("status", "v")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(bad, bad, Seq("status"), Seq("v"))
    }
  }
}
