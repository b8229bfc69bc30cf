package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT basis) —
  * the THIRD production tokenizer family beside BPE ([[Bpe]], both the
  * lexer and GPT-2 pre-token bases) and the unigram LM ([[UnigramLm]]).
  * Same hash-capped sample and word basis as the BPE fit (word
  * frequencies over the `\w` lexer, ASCII-lowered), so all three
  * families fit on identical documents and their oracles share one
  * sample chain.
  *
  * FIT (likelihood-ratio greedy merges): a word's symbols start as its
  * first char plus `##`-prefixed continuation chars (the BERT
  * convention — `##` marks "does not start a word"). Each step merges
  * the adjacent pair maximizing score(l, r) = c(l, r) / (c(l) · c(r))
  * — BPE's raw-count argmax reweighted by the unigram denominators,
  * the published WordPiece objective (merging high-score pairs
  * maximizes the corpus likelihood gain under a unigram LM). The
  * argmax is decided by an EXACT scaled-integer key,
  * floor(c · 2^80 / (c_l · c_r)): distinct fractions with numerators
  * < 2^20 and denominators < 2^80 differ by ≥ 2^-80, so the floored
  * keys order them exactly — no float anywhere, and the oracle replays
  * every step bit-for-bit with the same HUGEINT arithmetic (the
  * exactness bound is enforced loudly). Ties (count DESC, l, r);
  * pairs with count < 2 never merge; merged symbol = l ++ r without
  * r's `##` (continuations stay continuations). The merge PASS is
  * BPE's left-to-right non-overlapping scan (match runs take their
  * 1st, 3rd, … members) so the SQL replay reuses the gaps-and-islands
  * fold.
  *
  * ENCODE (greedy longest-match-first — NOT a merge replay; WordPiece
  * encoding consults only the final vocabulary): from position 0,
  * repeatedly take the LONGEST vocab piece matching at the position
  * (continuation positions probe the `##` form); a position with no
  * match — an unseen char — makes the whole word [[Unk]], BERT's
  * rule. The vocabulary is the initial alphabet plus every merged
  * symbol, so any word over seen chars always segments. */
object Wordpiece {

  val Unk = "[UNK]"

  /** The score key's scale: 2^80 as a BigInt/HUGEINT multiplier. */
  private val ScaleBig = BigInt(1) << 80
  private[graft] val ScaleSqlLiteral = ScaleBig.toString // 1208925819614629174706176

  final case class Model(vocab: Set[String], maxPieceChars: Int)
      extends Serializable

  /** Exact argmax key for score(l, r) — see class doc. Inputs must
    * stay under 2^20 for the floor to be order-exact (enforced by
    * [[fitFromWordFreq]]). */
  private def scoreKey(c: Long, cl: Long, cr: Long): BigInt =
    (BigInt(c) * ScaleBig) / (BigInt(cl) * BigInt(cr))

  private def initialSyms(w: String): Vector[String] =
    w.iterator.zipWithIndex.map { case (ch, i) =>
      if (i == 0) ch.toString else "##" + ch
    }.toVector

  private def applyMergeWp(s: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += l + r.stripPrefix("##"); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def pieceChars(sym: String): Int =
    sym.length - (if (sym.startsWith("##")) 2 else 0)

  /** Fit from a word-frequency view. Deterministic given the input map
    * (argmax order in the class doc). Returns the model AND the fitted
    * vocabulary (word, freq) — the gate's segmentation target, the
    * [[UnigramLm.fit]] convention. */
  def fitFromWordFreq(wordFreq: Map[String, Long], maxWords: Int,
      numMerges: Int): (Model, Seq[(String, Long)]) = {
    val top = wordFreq.toSeq.sortBy { case (w, f) => (-f, w) }.take(maxWords)
    var words: Vector[(Vector[String], Long)] =
      top.map { case (w, f) => (initialSyms(w), f) }.toVector
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach(_._1.foreach(vocab += _))
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (s, f) =>
        var i = 0
        while (i < s.length) {
          symCounts.update(s(i), symCounts.getOrElse(s(i), 0L) + f)
          if (i + 1 < s.length) {
            val p = (s(i), s(i + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
          }
          i += 1
        }
      }
      if (symCounts.nonEmpty)
        require(symCounts.valuesIterator.max < (1L << 20),
          "wordpiece fit: symbol counts exceed the 2^80 exactness bound " +
            "— shrink the sample")
      val best = pairCounts.toSeq
        .filter(_._2 >= 2L)
        .map { case ((l, r), c) =>
          (scoreKey(c, symCounts(l), symCounts(r)), c, l, r)
        }
        .sortBy { case (key, c, l, r) => (-key, -c, l, r) }
        .headOption
      best match {
        case None => stop = true
        case Some((_, _, l, r)) =>
          vocab += (l + r.stripPrefix("##"))
          words = words.map { case (s, f) => (applyMergeWp(s, l, r), f) }
          k += 1
      }
    }
    val v = vocab.toSet
    // empty/all-filtered input ⇒ empty model (Bpe/UnigramLm tolerate
    // empty corpora — match them); encodeWord then yields [UNK] via the
    // maxPieceChars == 0 guard (the length-0 probe loop never runs)
    (Model(v, if (v.isEmpty) 0 else v.iterator.map(pieceChars).max), top)
  }

  /** Content-addressed vocabulary VERSION id — [[Bpe.vocabId]]'s
    * WordPiece form (encoding consults only the final vocabulary, so
    * the id folds the SORTED vocab entries plus the piece-length bound;
    * two fits share the id iff they produce the same vocabulary).
    * Artifacts carrying this id serve through [[Bpe.requireVocab]]
    * (the guard is model-family-agnostic — it checks a column). */
  def vocabId(m: Model): Long = {
    var h = 0xcbf29ce484222325L
    m.vocab.toSeq.sorted.foreach { v =>
      h = (h ^ TextFunctions.fnv1a64(v)) * 0x100000001b3L
    }
    (h * 0x100000001b3L) ^ ((m.vocab.size.toLong << 16) |
      m.maxPieceChars.toLong)
  }

  /** Full driver-local fit: the SAME hash-capped sample, lexer, and
    * word basis as [[Bpe.fit]] (doc selection depends only on ids, so
    * all tokenizer-family oracles share one sample chain). */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int = 256, maxWords: Int = 4096,
      numMerges: Int = 48): (Model, Seq[(String, Long)]) = {
    require(sampleDocs >= 1 && maxWords >= 1 && numMerges >= 0,
      s"bad fit params: $sampleDocs/$maxWords/$numMerges")
    // the shared sample view — one word-frequency basis for every
    // tokenizer family (doc selection depends only on ids)
    fitFromWordFreq(
      Bpe.sampleVocab(docs, idCol, textCol, sampleDocs, maxWords).toMap,
      maxWords, numMerges)
  }

  /** Greedy longest-match-first segmentation of one (lowercased,
    * alpha) word — see class doc. */
  def encodeWord(word: String, m: Model): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val pfx = if (pos == 0) "" else "##"
      var len = math.min(m.maxPieceChars, word.length - pos)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = pfx + word.substring(pos, pos + len)
        if (m.vocab.contains(cand)) found = cand else len -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      pos += found.length - pfx.length
    }
    out.result()
  }

  /** Column form of [[encodeWord]] (the model rides the closure). */
  def encodeWordCol(word: Column, m: Model): Column = {
    val f = udf((w: String) => if (w == null) Seq.empty[String]
      else encodeWord(w, m))
    f(word)
  }
}
