package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece-unigram family,
  * Kudo 2018) — the OTHER production tokenizer next to BPE
  * ([[Bpe]]): instead of greedy merges, a piece inventory with
  * unigram log-probabilities segments every word by Viterbi
  * minimum-cost, and the inventory is refined by EM.
  *
  * This implementation is the DETERMINISTIC hard-EM form, built for
  * exact SQL replay (the q143/q185 oracle discipline):
  *  - sample: the identical hash-capped sample as [[Bpe.fit]]
  *    (mix64-ordered bottom-`sampleDocs` docs, lower-cased alpha
  *    words, top `maxWords` by (freq DESC, word ASC));
  *  - seed inventory: every substring of length ≤ [[MaxPieceLen]] of
  *    the sampled words, counted by occurrence × word frequency; the
  *    top [[SeedSize]] by (count DESC, piece ASC) plus ALL single
  *    characters (so segmentation is total by construction);
  *  - scores: integer MICRO-NAT costs s(p) = round(−ln(c(p)/Σc)·1e6)
  *    — one double division + one ln per piece, the established
  *    cross-engine float discipline;
  *  - hard-EM ([[EmIters]] fixed iterations): Viterbi-segment every
  *    sampled word under the current scores (DP scanning candidate
  *    start positions ASCENDING with strict improvement — ties
  *    resolve to the longest piece), re-count pieces from the chosen
  *    segmentations weighted by word frequency, drop pieces that won
  *    zero words (the pruning step), floor every single character at
  *    count 1 (totality), re-score;
  *  - words longer than [[MaxWordLen]] chars are excluded from fit
  *    and output (the oracle's DP unroll is bounded; SentencePiece
  *    skips over-long sentences the same way).
  *
  * Scale shape: the fit is driver-local over the capped sample (the
  * LocalKMeans discipline — one distributed pass to sample, O(sample)
  * local EM); the MODEL (≤ SeedSize + alphabet scores) broadcasts and
  * segmentation of any corpus is one narrow distributed pass
  * ([[segmentCol]]).
  */
object UnigramLm {

  val MaxPieceLen = 4
  val SeedSize = 256
  val EmIters = 2
  val MaxWordLen = 24

  /** Piece → integer micro-nat cost. */
  final case class Model(scores: Map[String, Long])

  /** One segmented word: total micro-nat cost + pieces in order. */
  final case class Segmentation(cost: Long, pieces: Vector[String])

  private val Inf = Long.MaxValue / 4

  /** Viterbi minimum-cost segmentation under `scores`. DP over end
    * positions; candidate start positions scanned ASCENDING with
    * strict `<` improvement, so cost ties resolve to the longest
    * piece. Total by construction when every character of `w` is in
    * the inventory; returns None otherwise (callers keep the
    * alphabet floored, so this only fires for out-of-alphabet
    * characters). */
  def segment(w: String, scores: Map[String, Long]): Option[Segmentation] = {
    val n = w.length
    val best = Array.fill(n + 1)(Inf)
    val prev = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (best(j) < Inf) {
          scores.get(w.substring(j, i)) match {
            case Some(s) if best(j) + s < best(i) =>
              best(i) = best(j) + s
              prev(i) = j
            case _ =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) >= Inf) None
    else {
      val pieces = Vector.newBuilder[String]
      val stack = scala.collection.mutable.ArrayBuffer.empty[String]
      var k = n
      while (k > 0) { stack += w.substring(prev(k), k); k = prev(k) }
      stack.reverseIterator.foreach(pieces += _)
      Some(Segmentation(best(n), pieces.result()))
    }
  }

  private def scoresFromCounts(counts: Map[String, Long]): Map[String, Long] = {
    val tot = counts.values.sum
    counts.map { case (p, c) =>
      p -> math.round(-math.log(c.toDouble / tot.toDouble) * 1e6)
    }
  }

  /** Content-addressed vocabulary VERSION id — [[Bpe.vocabId]]'s
    * unigram-LM form: segmentation consults only the (piece, cost)
    * table, so the id folds the SORTED (piece, micro-nat cost) entries;
    * two fits share the id iff they produce identical score tables.
    * Artifacts carrying it serve through [[Bpe.requireVocab]]. */
  def vocabId(m: Model): Long = {
    var h = 0xcbf29ce484222325L
    m.scores.toSeq.sortBy(_._1).foreach { case (p, c) =>
      h = (h ^ TextFunctions.fnv1a64(p)) * 0x100000001b3L
      h = (h ^ c) * 0x100000001b3L
    }
    (h * 0x100000001b3L) ^ m.scores.size.toLong
  }

  /** Deterministic hard-EM fit from a word-frequency table (see object
    * scaladoc for every rule). */
  def fitFromWordFreq(wordFreq: Map[String, Long]): Model = {
    val words = wordFreq.toSeq
      .filter { case (w, _) => w.nonEmpty && w.length <= MaxWordLen }
      .sortBy { case (w, _) => w }
    // seed counts: all substrings up to MaxPieceLen, occurrence × freq
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var a = 0
      while (a < w.length) {
        var l = 1
        while (l <= MaxPieceLen && a + l <= w.length) {
          val p = w.substring(a, a + l)
          subCounts.update(p, subCounts.getOrElse(p, 0L) + f)
          l += 1
        }
        a += 1
      }
    }
    val top = subCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(SeedSize)
    val chars = subCounts.filter { case (p, _) => p.length == 1 }
    var counts: Map[String, Long] = (top ++ chars).toMap
    var it = 0
    while (it < EmIters) {
      val scores = scoresFromCounts(counts)
      val segCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        segment(w, scores).foreach(_.pieces.foreach { p =>
          segCounts.update(p, segCounts.getOrElse(p, 0L) + f)
        })
      }
      // drop zero-count pieces (pruning); floor the alphabet at 1
      counts = segCounts.toMap ++ chars.keysIterator.map { ch =>
        ch -> math.max(segCounts.getOrElse(ch, 0L), 1L)
      }
      it += 1
    }
    Model(scoresFromCounts(counts))
  }

  /** Full driver-local fit over a documents frame: the EXACT
    * [[Bpe.fit]] sample (mix64 bottom-k docs, lexer alpha words
    * lower-cased, top `maxWords` by (freq DESC, word ASC)), then
    * [[fitFromWordFreq]]. */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int = 256, maxWords: Int = 4096): (Model, Seq[(String, Long)]) = {
    val mix = udf((id: Long) => TextFunctions.mix64(id))
    val sample = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"), col(textCol).as("_text"))
      .withColumn("_h", mix(col("_id")).bitwiseXOR(lit(Long.MinValue)))
      .orderBy(col("_h"))
      .limit(sampleDocs)
      .collect()
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    val lexRe = java.util.regex.Pattern.compile("\\w+|[^\\w\\s]")
    sample.foreach { row =>
      val m = lexRe.matcher(row.getString(1))
      while (m.find()) {
        val tok = m.group()
        if (tok.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) {
          val w = tok.toLowerCase(Locale.ROOT)
          freq.update(w, freq.getOrElse(w, 0L) + 1L)
        }
      }
    }
    val vocab = freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(maxWords)
      .filter { case (w, _) => w.length <= MaxWordLen }
    (fitFromWordFreq(vocab.toMap), vocab)
  }

  /** Distributed segmentation column: struct(cost, n_pieces, seg) or
    * null for out-of-alphabet words. The piece→score Map is built ONCE
    * here and captured in the UDF closure (shipped with the task
    * serialization, bounded by SeedSize + alphabet) — not as per-row
    * literal arrays, which would re-zip an O(|model|) Map allocation
    * for every word of the advertised distributed pass. */
  def segmentCol(word: Column, model: Model): Column = {
    val scores = model.scores
    val segUdf = udf((w: String) =>
      segment(w, scores).map(s => (s.cost, s.pieces.length, s.pieces.mkString("|"))))
    segUdf(word)
  }
}
