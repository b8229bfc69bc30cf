package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff: classify rows between two snapshot runs of the same
  * collection as added / removed / changed (unchanged rows are dropped —
  * they are the bulk, and the diff IS the interesting output).
  *
  * Reference semantics: the reference pipeline re-runs snapshots per
  * topic and makes re-runs incremental by skipping already-finished
  * collections (`FinishedFilterProcessor.kt:17-27`); the natural weekly
  * analytic over that layout is "what changed between run N-1 and run N"
  * — this operator answers it for any keyed frame pair.
  *
  * Shape at 100 TB: one full-outer join, co-partitioned on the key
  * (both sides shuffle once on the key — or zero times if both runs are
  * bucketed on it, [[Layout.bucketize]]); rows are compared by a
  * per-column sha256 fingerprint so the join carries two slim
  * (key, 64-hex) frames, not the full row payloads.
  *
  * Fingerprint discipline: each compare column is hashed SEPARATELY and
  * the fixed-width hex digests are concatenated before the outer hash —
  * a single concat-then-hash would alias column boundaries ("a|b","c" vs
  * "a","b|c"). NULL hashes to the literal sentinel "null", which no hex
  * digest equals — and which stays distinct from the STRING "null"
  * (that hashes through sha256; spec-pinned). Values are compared
  * post-`cast(string)`: two rows are "changed" iff some compare column's
  * string form differs (exactly the DuckDB oracle's IS DISTINCT FROM on
  * this frame's string/long columns).
  *
  * Null KEYS never join (SQL semantics): a null-key row in A classifies
  * as removed and in B as added — the honest reading, since no identity
  * links them (spec-pinned).
  */
object Diff {

  /** Order-sensitive row fingerprint over `cols` (see class doc). */
  def rowFingerprint(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "rowFingerprint needs at least one column")
    sha2(concat(cols.map(c =>
      coalesce(sha2(c.cast("string"), 256), lit("null"))): _*), 256)
  }

  /** Diff run `a` → run `b`: (keyCols…, status). */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val reserved = Set("_fp_a", "_fp_b", "status")
    require(!keyCols.exists(reserved), // withHilbert2 hygiene
      s"snapshotDiff reserves ${reserved.mkString("/")} — rename key columns")
    val fa = a.select(keyCols.map(col) :+
      rowFingerprint(compareCols.map(col)).as("_fp_a"): _*)
    val fb = b.select(keyCols.map(col) :+
      rowFingerprint(compareCols.map(col)).as("_fp_b"): _*)
    fa.join(fb, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_fp_a").isNull, "added")
          .when(col("_fp_b").isNull, "removed")
          .when(col("_fp_a") =!= col("_fp_b"), "changed")
          .otherwise("unchanged").as("status"): _*)
      .filter(col("status") =!= "unchanged")
  }
}
