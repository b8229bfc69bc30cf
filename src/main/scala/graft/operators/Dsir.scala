package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS
  * — "DSIR"): pick raw-corpus documents that RESEMBLE a small target
  * corpus (the Pile→Wikipedia/books recipe) by importance weight under
  * hashed n-gram bag-of-words models, formulated EXACT-INTEGER so the
  * distributed per-document sum is aggregation-order-free and replays
  * bit-for-bit in SQL.
  *
  * Features (the paper's): word unigrams ∪ bigrams, hashed into
  * [[Buckets]] buckets (bucket = fnv1a64(gram) unsigned mod a PRIME —
  * a prime modulus consumes all 64 hash bits, where a power of two
  * would read only fnv's weakly-avalanched low bits). Both corpora and
  * the scored documents share one hashing kernel, so hash collisions
  * are consistent on every side — DSIR's correctness argument.
  *
  * Smoothing is CORPUS-SIZE-PROPORTIONAL (pseudocount N/B per bucket,
  * not add-one): with target total T and raw total R,
  *
  *   p_t(b) = (cT[b] + T/B) / 2T        p_r(b) = (cR[b] + R/B) / 2R
  *
  * so a gram with the SAME occurrence rate f on both sides gets
  * log-ratio ln((f + 1/B)/(f + 1/B)) = 0 exactly, at ANY corpus-size
  * asymmetry. (Add-one smoothing instead biases every rare gram by up
  * to +ln(R/T) when the target is much smaller than the raw pool — at
  * the 10:1 fixture asymmetry that bias swamped the real signal;
  * measured before switching.) The ratio collapses to ONE integer
  * fraction, so each bucket needs a single ln rounded once to
  * micro-nats (the q188/q204/q210 discipline):
  *
  *   lam_micro[b] = round(ln( (B·cT[b] + T) · R
  *                          / ((B·cR[b] + R) · T) ) · 1e6)
  *
  * Per-document log importance weight = Σ_b n_d[b] · lam_micro[b] —
  * an INTEGER dot product (associative; distributed order cannot
  * drift). Selection is the paper's deterministic top-k variant
  * (importance-weight ranking; the Gumbel-resampling variant differs
  * only by noise injection) with (score DESC, id ASC) as a total
  * order.
  *
  * Scale shape (100 TB): the target side aggregates to ≤ B rows; the
  * raw side is one explode → one map-side-combining groupBy(id,
  * bucket) on slim (id, int) rows; lam is a ≤ B-row BROADCAST join;
  * the per-doc score is one more combining aggregation. Top-k is a
  * TakeOrdered (bounded heap), never a global sort; the k-row rank
  * window runs on k rows. Tokenization is whitespace-split (replayable
  * relationally); grams never leave the executor as strings — only
  * (id, bucket, count) integers shuffle. Integer seam: the
  * (B·c + N)·N' products fit Long up to ~3e18 — beyond ~10¹² corpus
  * grams widen to the 128-bit compare (the Kneser–Ney denominator
  * seam).
  */
object Dsir {

  /** Hash-bucket count — prime so the modulus mixes all 64 fnv bits. */
  val Buckets = 997L

  /** One-pass kernel: whitespace words → unigram ∪ bigram fnv1a64
    * hashes → unsigned-mod-[[Buckets]] bucket ids, with multiplicity
    * (a bag, not a set — DSIR models occurrence counts). */
  private[graft] def gramBuckets(text: String): Array[Long] = {
    if (text == null) return Array.empty
    val t = text.trim
    if (t.isEmpty) return Array.empty
    val words = t.split("\\s+")
    val n = words.length
    val out = new Array[Long](2 * n - 1)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Long.remainderUnsigned(
        TextFunctions.fnv1a64(words(i)), Buckets)
      i += 1
    }
    var j = 0
    while (j < n - 1) {
      out(n + j) = java.lang.Long.remainderUnsigned(
        TextFunctions.fnv1a64(words(j) + " " + words(j + 1)), Buckets)
      j += 1
    }
    out
  }

  private val gramBucketsUdf = udf((t: String) => gramBuckets(t))

  /** Column form of the gram-bucket kernel. */
  def gramBucketsCol(text: Column): Column = gramBucketsUdf(text)

  /** The ≤ [[Buckets]]-row importance table: bucket →
    * (cnt_t, cnt_r, lam_micro). Buckets absent from BOTH corpora are
    * never referenced by any scored document (scored docs ⊆ raw), so
    * the outer join of the two count tables is complete. */
  def importanceTable(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame = df
      .select(explode(gramBucketsCol(col(textCol))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val ct = counts(target, "cnt_t")
    val cr = counts(raw, "cnt_r")
    val tot = ct.agg(sum(col("cnt_t")).as("_T"))
      .crossJoin(cr.agg(sum(col("cnt_r")).as("_R")))
    ct.join(cr, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("cnt_t", "cnt_r"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("cnt_t"), col("cnt_r"),
        round(log(
            ((col("cnt_t") * Buckets + col("_T")) * col("_R")).cast("double")
              / ((col("cnt_r") * Buckets + col("_R")) * col("_T")).cast("double"))
          * 1e6, 0).cast("long").as("lam_micro"))
  }

  /** Per-raw-document log importance weight:
    * (id, n_grams, score_micro). */
  def importanceScores(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val lam = importanceTable(raw, target, idCol, textCol)
      .select(col("bucket"), col("lam_micro"))
    raw.select(col(idCol).as("id"),
        explode(gramBucketsCol(col(textCol))).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(lam), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_grams"),
        sum(col("n") * col("lam_micro")).as("score_micro"))
  }

  /** DSIR top-k selection manifest: (rank 1..k, id, n_grams,
    * score_micro) by (score_micro DESC, id ASC) — deterministic. */
  def selectTopK(raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val top = importanceScores(raw, target, idCol, textCol)
      .orderBy(col("score_micro").desc, col("id").asc)
      .limit(k) // TakeOrdered — bounded heap, no global sort
    // rank window runs over the k collected rows only
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col("id").asc)))
      .select(col("rank").cast("long"), col("id"),
        col("n_grams"), col("score_micro"))
  }
}
