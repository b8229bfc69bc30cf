package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Char-n-gram language identification — the curation-grade form of
  * [[TextFunctions.langId]]'s 10-marker argmax: a Cavnar–Trenkle-style
  * rank profile per language, fit from the corpus itself.
  *
  * Everything deterministic, no RNG, and — unlike the merge-loop fits —
  * SINGLE-PASS, so the DuckDB oracle replays fit AND classification as
  * one plain SQL chain (no unrolling):
  *  - sample   = the `sampleDocs` docs with smallest unsigned
  *               mix64(doc id) (the shared Bpe.fit discipline);
  *  - profile  = per language, the `topGrams` most frequent padded char
  *               trigrams of its sampled words (ties: gram ascending),
  *               rank 1..topGrams. Trigrams come from `_word_`-padded
  *               ASCII-lowered alpha words (the Bpe pre-token rules —
  *               no unicode case mapping can diverge cross-engine);
  *  - classify = over a document's DISTINCT trigram set, score(lang) =
  *               Σ (topGrams + 1 − rank) of profile hits; predict the
  *               max score, ties → lexicographically smallest language,
  *               zero everywhere → "und".
  *
  * Scale shape: the fit is driver-local over a capped sample (profiles
  * are a few KB and saturate quickly); classification is a fused
  * per-document kernel with the profiles riding the closure — no
  * shuffle, no lookup join on the hot path. */
object CharLangId {

  final case class Profiles(topGrams: Int, byLang: Map[String, Map[String, Int]])

  private def words(text: String): Array[String] =
    if (text == null) Array.empty
    else Bpe.LexPattern.r.findAllIn(text)
      .filter(t => t.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      .map(_.toLowerCase(Locale.ROOT)).toArray

  private def grams(w: String): Seq[String] = {
    val p = "_" + w + "_"
    (0 to p.length - 3).map(i => p.substring(i, i + 3))
  }

  /** Driver-local profile fit (see class doc). The only collect is the
    * hash-capped sample — the Bpe.fit selection, verbatim. */
  def fit(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      sampleDocs: Int = 256, topGrams: Int = 64): Profiles = {
    require(sampleDocs >= 1 && topGrams >= 1,
      s"bad fit params: sampleDocs=$sampleDocs topGrams=$topGrams")
    val mix = udf((id: Long) => TextFunctions.mix64(id))
    val sample = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"), col(textCol).as("_text"),
        col(langCol).as("_lang"))
      .withColumn("_h", mix(col("_id")).bitwiseXOR(lit(Long.MinValue)))
      .orderBy(col("_h"))
      .limit(sampleDocs)
      .collect()
    val counts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    sample.foreach { row =>
      val lang = row.getString(2)
      if (lang != null) {
        words(row.getString(1)).foreach(w => grams(w).foreach { g =>
          counts.update((lang, g), counts.getOrElse((lang, g), 0L) + 1L)
        })
      }
    }
    val byLang = counts.toSeq
      .groupBy(_._1._1)
      .map { case (lang, cs) =>
        lang -> cs
          .map { case ((_, g), c) => (g, c) }
          .sortBy { case (g, c) => (-c, g) }
          .take(topGrams)
          .zipWithIndex
          .map { case ((g, _), i) => g -> (i + 1) }
          .toMap
      }
    Profiles(topGrams, byLang)
  }

  /** Classify one document (see class doc): (language, score). */
  def classify(text: String, p: Profiles): (String, Long) = {
    val docGrams = words(text).iterator.flatMap(grams).toSet
    val scored = p.byLang.toSeq
      .map { case (lang, prof) =>
        val s = docGrams.iterator
          .flatMap(g => prof.get(g))
          .map(r => (p.topGrams + 1 - r).toLong).sum
        (lang, s)
      }
      .filter(_._2 > 0L)
    if (scored.isEmpty) ("und", 0L)
    else scored.minBy { case (lang, s) => (-s, lang) }
  }

  /** Column form: struct(pred_lang, score) — profiles ride the closure. */
  def classifyCol(text: Column, p: Profiles): Column = {
    val f = udf((t: String) => classify(t, p))
    f(text)
  }
}
