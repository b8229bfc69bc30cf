package graft.functions

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer — the real form of the
  * token-budget family (chunking, packing, surprisal previously counted
  * regex-lexer tokens; a training pipeline budgets in BPE merges).
  *
  * Reference scope: the reference engine has no tokenizer (its pipeline
  * moves opaque gzip payloads); this is part of the training-data-pipeline
  * surface the brief adds on top of reference parity.
  *
  * Design for 100 TB: the FIT is driver-local over a hash-capped document
  * sample (codebook-quality saturates long before the corpus does — the
  * same argument as the PQ/IVF fits in
  * [[graft.operators.ProductQuantization]]), then the merge table (≤ a few
  * KB) rides to executors inside the encode kernel's closure; ENCODING is
  * embarrassingly parallel, one fused per-document UDF call with a
  * per-JVM word→subwords memo (natural text repeats words heavily, so the
  * merge loop runs once per distinct word per executor, not once per
  * occurrence). No shuffle anywhere on the encode path.
  *
  * Everything is deterministic — no RNG:
  *  - sample   = the `sampleDocs` documents with the smallest unsigned
  *               splitmix64(doc id) (any retry or partitioning yields the
  *               same set);
  *  - vocab    = the `maxWords` most frequent sampled words, ties broken
  *               by the word ascending;
  *  - merges   = repeat `numMerges` times: count adjacent symbol pairs
  *               over the vocab (every adjacent position, weighted by word
  *               frequency), take the most frequent pair (ties: smaller
  *               left symbol, then smaller right symbol), stop when the
  *               best pair occurs < 2 times; merge all its occurrences
  *               left-to-right in every vocab word.
  *
  * Encoding applies the fitted merges IN RANK ORDER, each as one
  * left-to-right non-overlapping pass. This is equivalent to the textbook
  * "repeatedly merge the lowest-ranked pair present" loop: merging pair k
  * can only create pairs that contain its merged symbol, and every merge
  * containing a symbol first built by merge k was necessarily learned
  * after k (rank > k), so no lower-ranked opportunity ever appears
  * mid-stream ([[graft.BpeSpec]] pins this equivalence on the fitted
  * table).
  *
  * Cross-engine parity: the pre-tokenizer is the shared lexer regex
  * (`\w+|[^\w\s]` — identical in Java regex and DuckDB RE2, the q139
  * precedent); only pure-ASCII-alpha pre-tokens are lowercased (ASCII
  * lowering is locale- and engine-independent; non-alpha tokens pass
  * through RAW and atomic, so no unicode case-mapping can diverge).
  * The DuckDB oracle replays the ENTIRE fit and encode — sample, vocab,
  * every merge step, every encode pass — as unrolled SQL (the q46/q105
  * unrolled-k-means pattern), so the gate trusts nothing from this class.
  */
object Bpe {

  /** Pre-token pattern — shared verbatim with
    * [[TextFunctions.lexTokens]] and every oracle. */
  val LexPattern = "\\w+|[^\\w\\s]"

  /** Only pre-tokens matching this are BPE-encoded (after ASCII
    * lowercase); everything else is an atomic token. */
  val AlphaPattern = "^[A-Za-z]+$"

  final case class Merge(l: String, r: String)

  final case class Model(merges: Vector[Merge]) {
    /** Stable identity for the per-JVM encode memo (two SFs fit two
      * different tables in one JVM — tests and Verify both do). */
    private[functions] lazy val key: Long = {
      var h = 0xcbf29ce484222325L
      merges.foreach { m =>
        h = (h ^ TextFunctions.fnv1a64(m.l)) * 0x100000001b3L
        h = (h ^ TextFunctions.fnv1a64(m.r)) * 0x100000001b3L
      }
      // fold in the merge count: a pure-hash key collision between two
      // different fitted models in one JVM would silently serve the
      // other model's tokenization from the memo; length makes the
      // key a (hash, size) pair — collisions now need BOTH to match
      (h * 0x100000001b3L) ^ merges.length.toLong
    }
  }

  /** One left-to-right non-overlapping merge pass (the shared kernel of
    * fit and encode; the oracle's window-function fold computes the same
    * positions — match runs take their 1st, 3rd, … members). */
  def applyMerge(s: Vector[String], l: String, r: String): Vector[String] = {
    if (s.length < 2) return s
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private[functions] def lex(text: String): Array[String] =
    if (text == null) Array.empty
    else LexPattern.r.findAllIn(text).toArray

  private val alphaRe = AlphaPattern.r

  private[functions] def isAlpha(tok: String): Boolean = alphaRe.matches(tok)

  /** Fit a merge table from the word-frequency view of a sample.
    * Deterministic given the input map (see class doc for tie order). */
  def fitFromWordFreq(wordFreq: Map[String, Long], maxWords: Int,
      numMerges: Int): Model = {
    val vocab = wordFreq.toSeq
      .sortBy { case (w, f) => (-f, w) }
      .take(maxWords)
    var words: Vector[(Vector[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toVector, f) }.toVector
    val merges = Vector.newBuilder[Merge]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val best = counts.toSeq
        .filter(_._2 >= 2L)
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption
      best match {
        case None => stop = true
        case Some(((l, r), _)) =>
          merges += Merge(l, r)
          words = words.map { case (s, f) => (applyMerge(s, l, r), f) }
          k += 1
      }
    }
    Model(merges.result())
  }

  /** Full driver-local fit over a documents frame: hash-capped sample →
    * word frequencies → merge loop. The ONLY collect is the capped
    * sample (`sampleDocs` rows — bounded by construction, the
    * ProductQuantization.train discipline). */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int = 256, maxWords: Int = 4096,
      numMerges: Int = 48): Model = {
    require(sampleDocs >= 1 && maxWords >= 1 && numMerges >= 0,
      s"bad fit params: sampleDocs=$sampleDocs maxWords=$maxWords numMerges=$numMerges")
    // ONE word-frequency basis for every tokenizer family — the fit is
    // definitionally fitFromWordFreq over the shared sample view
    fitFromWordFreq(
      sampleVocab(docs, idCol, textCol, sampleDocs, maxWords).toMap,
      maxWords, numMerges)
  }

  /** The fit's (word, freq) SAMPLE VIEW — the hash-capped sample's word
    * frequencies, top `maxWords` by (freq DESC, word ASC): the basis
    * every tokenizer-family fit shares, exposed so drift measurement
    * (q322) probes the exact words a fit would see. Fitting
    * [[fitFromWordFreq]] from this view == [[fit]] (same cap, order). */
  def sampleVocab(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int = 256, maxWords: Int = 4096): Seq[(String, Long)] = {
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    sampleTexts(docs, idCol, textCol, sampleDocs).foreach { text =>
      lex(text).foreach { tok =>
        if (isAlpha(tok)) {
          val w = tok.toLowerCase(Locale.ROOT)
          freq.update(w, freq.getOrElse(w, 0L) + 1L)
        }
      }
    }
    freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(maxWords)
  }

  /** Content-addressed vocabulary VERSION id (the ANN fit_id discipline
    * applied to tokenizer models — r17 missing #5): FNV-1a over the
    * ordered merge list, so two fits share the id iff they agree on
    * every merge at every rank. Encoded artifacts carry this id;
    * [[requireVocab]] refuses a mismatched serve loudly. */
  def vocabId(m: Model): Long = m.key

  /** Loud serve guard: every row of `encoded` must carry `vocab_id` ==
    * `expected`. The raise_error lives in a FILTER predicate — column
    * pruning cannot elide it (the r16 guard discipline), so a stale or
    * foreign-vocab artifact fails the moment anything reads it. */
  def requireVocab(encoded: DataFrame, expected: Long): DataFrame =
    encoded.filter(
      when(col("vocab_id") === expected, lit(true))
        .otherwise(raise_error(concat(
          lit("requireVocab: artifact vocab_id "), col("vocab_id"),
          lit(s" != serving model's $expected")))))

  /** The shared fit sample: the `sampleDocs` texts with the smallest
    * unsigned splitmix64(doc id). Unsigned order rides the sign-flip
    * bijection (x ^ Long.MinValue preserves unsigned order under signed
    * compare), so the bottom-k runs as a DISTRIBUTED sort+limit — the
    * only collect is the capped sample itself. Identical doc selection
    * for every tokenizer basis (it depends only on ids), so the lexer
    * and GPT-2 fits sample the same documents and their oracles share
    * one `samp` CTE. */
  private[functions] def sampleTexts(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int): Array[String] = {
    val mix = udf((id: Long) => TextFunctions.mix64(id))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("_id"), col(textCol).as("_text"))
      .withColumn("_h", mix(col("_id")).bitwiseXOR(lit(Long.MinValue)))
      .orderBy(col("_h"))
      .limit(sampleDocs)
      .collect()
      .map(_.getString(1))
  }

  /** Encode one (lowercased alpha) word: chars, then every merge in rank
    * order, one pass each. */
  def encodeWord(w: String, model: Model): Vector[String] = {
    var s = w.map(_.toString).toVector
    model.merges.foreach(m => s = applyMerge(s, m.l, m.r))
    s
  }

  // per-JVM (model, word) → subwords memo; bounded so an adversarial
  // vocabulary can't grow it without limit (beyond the cap the encode
  // just recomputes — correctness never depends on the cache)
  private val memoCap = 1 << 17
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Vector[String]]()

  private def encodeWordMemo(w: String, model: Model): Vector[String] = {
    val k = (model.key, w)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val v = encodeWord(w, model)
      if (memo.size < memoCap) memo.put(k, v)
      v
    }
  }

  /** The 256 reserved byte-fallback token strings `<0x00>`…`<0xFF>`
    * (GPT-2/SentencePiece byte-fallback convention): any non-ASCII
    * pre-token decomposes to its UTF-8 bytes mapped through this
    * alphabet, so EVERY string encodes to in-vocabulary tokens — the
    * vocab is bounded at 256 + learned subwords instead of growing one
    * entry per distinct non-ASCII glyph. Unambiguous by construction:
    * a literal "<0xC3>" in input lexes as `<`, `0xC3`, `>` (three
    * ASCII pre-tokens), so a byte token string can never be produced
    * by the atomic path. Non-ASCII pre-tokens are always SINGLE code
    * points (the `\w` lexer is ASCII, so any char ≥ U+0080 matches
    * `[^\w\s]` alone) — the oracle replays the byte split as pure
    * arithmetic over `unicode(c)`. */
  val ByteTokens: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  private val byteTokenValue: Map[String, Int] =
    ByteTokens.zipWithIndex.toMap

  private def isAscii(tok: String): Boolean = {
    var i = 0
    while (i < tok.length) {
      if (tok.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  private def byteFallback(tok: String): Vector[String] =
    tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .toVector.map(b => ByteTokens(b & 0xff))

  /** Fused per-document kernel: lex → per-token encode/atomic/byte-
    * fallback → flat subword stream. ASCII alpha pre-tokens are
    * BPE-encoded, other ASCII pre-tokens are atomic, non-ASCII
    * pre-tokens decompose to [[ByteTokens]]. Null text → empty (never
    * null — callers aggregate). */
  def encodeText(text: String, model: Model): Seq[String] = {
    val toks = lex(text)
    val out = Seq.newBuilder[String]
    toks.foreach { tok =>
      if (isAlpha(tok))
        out ++= encodeWordMemo(tok.toLowerCase(Locale.ROOT), model)
      else if (isAscii(tok)) out += tok
      else out ++= byteFallback(tok)
    }
    out.result()
  }

  /** Column form (the model rides the closure — a few KB). */
  def encodeCol(text: Column, model: Model): Column = {
    val f = udf((t: String) => encodeText(t, model))
    f(text)
  }

  /** The GPT-2 pre-tokenization pattern (Radford et al. 2019,
    * `encoder.py`) — verbatim, for the spec that pins [[gpt2PreTokenize]]
    * to it. Java regex supports the lookahead; DuckDB's RE2 does not,
    * which is why the operational kernel below exists. */
  val Gpt2Pattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  /** GPT-2-pattern pre-tokenizer — the production-fidelity alternative
    * to the `\w+|[^\w\s]` lexer (round-14 missing #5): contractions
    * split as their own tokens, a single LITERAL SPACE (0x20 — not tab
    * or newline) ATTACHES to the following word/number/punct run (the
    * byte-level-BPE convention that makes " the" and "the" distinct
    * tokens), an inner whitespace run keeps all but its last char as
    * one token (the last char attaches only if it is a literal space,
    * else stands alone), and a trailing whitespace run is one token.
    * Tokens tile the input exactly —
    * concatenating them reproduces the text byte-for-byte (gated).
    *
    * Implemented as a single operational pass, NOT the regex: the
    * pattern's `\s+(?!\S)` lookahead is not RE2-expressible, so a
    * regex kernel could never be oracle-replayed. The pass implements
    * the pattern's scanner semantics exactly (BpeSpec pins kernel ==
    * Java-regex findAll on an adversarial battery and on corpus docs):
    *  - at `'`: the contraction alternatives 's 't 'm 'd 're 've 'll
    *    (case-sensitive, first-letter-disjoint) — reachable only when
    *    the scanner LANDS on the quote (doc start or after a
    *    letter/digit run; a quote after space/punct is consumed by the
    *    space-attached or greedy punct run instead, exactly as the
    *    ordered alternation behaves);
    *  - classes: Java `\s` (ASCII whitespace), `\p{L}` (isLetter),
    *    `\p{N}` (Unicode number categories), other. */
  def gpt2PreTokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    def isSpace(c: Char): Boolean = // Java regex \s: [ \t\n\x0B\f\r]
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def isNum(cp: Int): Boolean = Character.getType(cp) match {
      case Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
           Character.OTHER_NUMBER => true
      case _ => false
    }
    // classify per CODE POINT, not per UTF-16 char (r15 advice): the
    // pinned Java regex's \p{L}/\p{N} match code points, so a non-BMP
    // letter/number (surrogate pair, e.g. 𝒜 U+1D49C) must class as
    // letter/number here too or the kernel==regex parity silently
    // breaks outside the BMP. An unpaired surrogate classes as "other"
    // — the regex's \p{L}/\p{N} cannot match one either. \s stays
    // char-based (every Java-regex whitespace char is ASCII).
    def clsAt(i: Int): Int = {
      val c = text.charAt(i)
      if (isSpace(c)) 0
      else {
        val cp = text.codePointAt(i)
        if (Character.isLetter(cp)) 1 else if (isNum(cp)) 2 else 3
      }
    }
    def step(i: Int): Int = i + Character.charCount(text.codePointAt(i))
    def contractionLen(i: Int): Int =
      if (text.charAt(i) != '\'' || i + 1 >= n) 0
      else {
        val c1 = text.charAt(i + 1)
        if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') 2
        else if (i + 2 < n) {
          val two = text.substring(i + 1, i + 3)
          if (two == "re" || two == "ve" || two == "ll") 3 else 0
        } else 0
      }
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      val cl = contractionLen(i)
      if (cl > 0) { out += text.substring(i, i + cl); i += cl }
      else if (c == ' ' && i + 1 < n && !isSpace(text.charAt(i + 1))) {
        // ` ?X+` — the optional prefix is a LITERAL SPACE (0x20) only;
        // a tab/newline never attaches to the following run
        val k = clsAt(i + 1)
        var j = step(i + 1)
        while (j < n && clsAt(j) == k) j = step(j)
        out += text.substring(i, j); i = j
      } else if (!isSpace(c)) {
        val k = clsAt(i)
        var j = step(i)
        while (j < n && clsAt(j) == k) j = step(j)
        out += text.substring(i, j); i = j
      } else {
        // `\s+(?!\S)` then `\s+`: a whitespace run followed by non-space
        // yields all-but-its-last char as one token (the lookahead
        // backtrack); the remaining single whitespace char re-enters the
        // scan — attaching via ` ?X+` only if it is a literal space. A
        // trailing run (end of text) is one token whole.
        var e = i + 1
        while (e < n && isSpace(text.charAt(e))) e += 1
        if (e >= n || e - i == 1) { out += text.substring(i, e); i = e }
        else { out += text.substring(i, e - 1); i = e - 1 }
      }
    }
    out.toArray
  }

  private val gpt2Udf = udf((t: String) => gpt2PreTokenize(t))

  /** Column form of [[gpt2PreTokenize]]. */
  def gpt2PreTokensCol(text: Column): Column = gpt2Udf(text)

  /** The GPT-2-basis BPE-merged pre-token class: an optionally
    * space-prefixed pure-ASCII letter run (`" the"` / `"the"` — the
    * leading literal space is PART of the word, so the two learn
    * separate merge statistics: byte-level BPE's defining property).
    * Everything else the scanner emits — contractions (`'s`),
    * space-attached digit/punct runs, whitespace tokens — passes
    * through atomic (ASCII) or byte-fallback (non-ASCII). */
  val Gpt2AlphaPattern = "^ ?[A-Za-z]+$"

  private val gpt2AlphaRe = Gpt2AlphaPattern.r

  private def isGpt2Alpha(tok: String): Boolean = gpt2AlphaRe.matches(tok)

  /** [[fit]] on the GPT-2 pre-token basis (r15 missing #3): the same
    * hash-capped sample and merge loop, but words are
    * [[gpt2PreTokenize]]'s space-attached letter runs, ASCII-lowered —
    * so the fitted table contains merges like (" ", "t") that the
    * lexer basis can never learn, and " the" / "the" tokenize
    * independently. Symbols are single chars incl. the leading space;
    * [[fitFromWordFreq]] is shared unchanged. */
  def fitGpt2(docs: DataFrame, idCol: String, textCol: String,
      sampleDocs: Int = 256, maxWords: Int = 4096,
      numMerges: Int = 48): Model = {
    require(sampleDocs >= 1 && maxWords >= 1 && numMerges >= 0,
      s"bad fit params: sampleDocs=$sampleDocs maxWords=$maxWords numMerges=$numMerges")
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    sampleTexts(docs, idCol, textCol, sampleDocs).foreach { text =>
      gpt2PreTokenize(text).foreach { tok =>
        if (isGpt2Alpha(tok)) {
          val w = tok.toLowerCase(Locale.ROOT)
          freq.update(w, freq.getOrElse(w, 0L) + 1L)
        }
      }
    }
    fitFromWordFreq(freq.toMap, maxWords, numMerges)
  }

  /** Fused GPT-2-basis encode — ONE pass per document (pre-tokenize →
    * per-token merge/atomic/byte-fallback inside a single kernel, so
    * the text crosses the JVM boundary once — the r15 advisory's
    * composition seam closed). Space-attached alpha pre-tokens
    * BPE-encode (lowercased, space as a first-class symbol); other
    * ASCII pre-tokens are atomic; a non-ASCII pre-token decomposes to
    * [[ByteTokens]] over its FULL UTF-8 byte run (under this scanner a
    * non-ASCII pre-token can be a multi-code-point letter run — unlike
    * the `\w` lexer's single-code-point guarantee, so oracles must
    * stay ASCII, q243's stance). Tokens still tile the input up to
    * ASCII lowering of the merged class. */
  def encodeTextGpt2(text: String, model: Model): Seq[String] = {
    val toks = gpt2PreTokenize(text)
    val out = Seq.newBuilder[String]
    toks.foreach { tok =>
      if (isGpt2Alpha(tok))
        out ++= encodeWordMemo(tok.toLowerCase(Locale.ROOT), model)
      else if (isAscii(tok)) out += tok
      else out ++= byteFallback(tok)
    }
    out.result()
  }

  /** Column form of [[encodeTextGpt2]] (the model rides the closure). */
  def encodeGpt2Col(text: Column, model: Model): Column = {
    val f = udf((t: String) => encodeTextGpt2(t, model))
    f(text)
  }

  /** Word-boundary marker for the invertible token stream (the
    * SentencePiece convention): prefixed to the FIRST subword of every
    * pre-token. U+2581 never occurs in ASCII text; an adversarial input
    * containing it goes down the byte-fallback path (marked form
    * "▁<0xE2>", "<0x96>", "<0x81>"), so the marker never appears
    * INSIDE a token except as this prefix and the round trip holds —
    * spec-pinned. */
  val WordMarker = "▁"

  /** Invertible encode: [[encodeText]]'s exact subword stream, but the
    * first subword of each pre-token carries [[WordMarker]]. The FLAT
    * stream loses word boundaries (subwords carry no markers), so the
    * plain form cannot be decoded; this form is what a tokenized-corpus
    * WRITER stores, because it makes [[decodeTokens]] a true inverse:
    * decode∘encode = canonical lex form (tokens space-joined, alpha
    * lowercased) and encode∘decode = identity on the token stream. */
  def encodeTextMarked(text: String, model: Model): Seq[String] = {
    val toks = lex(text)
    val out = Seq.newBuilder[String]
    toks.foreach { tok =>
      val subs =
        if (isAlpha(tok)) encodeWordMemo(tok.toLowerCase(Locale.ROOT), model)
        else if (isAscii(tok)) Vector(tok)
        else byteFallback(tok)
      out += (WordMarker + subs.head)
      subs.iterator.drop(1).foreach(out += _)
    }
    out.result()
  }

  /** Inverse of [[encodeTextMarked]]: marker starts a new space-joined
    * word, unmarked subwords concatenate into the current word, and
    * runs of byte tokens collect into a byte buffer that UTF-8-decodes
    * at the next non-byte token / word boundary / end (the byte-
    * fallback inverse). Null → empty, matching encode's null stance. */
  def decodeTokens(toks: Seq[String]): String = {
    if (toks == null) return ""
    val sb = new StringBuilder
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def flushBytes(): Unit = if (bytes.nonEmpty) {
      sb ++= new String(bytes.toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      bytes.clear()
    }
    toks.foreach { t0 =>
      val marked = t0.startsWith(WordMarker)
      val t = if (marked) t0.substring(WordMarker.length) else t0
      if (marked) {
        flushBytes()
        if (sb.nonEmpty) sb += ' '
      }
      byteTokenValue.get(t) match {
        case Some(b) => bytes += b.toByte
        case None => flushBytes(); sb ++= t
      }
    }
    flushBytes()
    sb.toString
  }

  /** Column forms of the invertible pair. */
  def encodeMarkedCol(text: Column, model: Model): Column = {
    val f = udf((t: String) => encodeTextMarked(t, model))
    f(text)
  }
  def decodeCol(tokens: Column): Column = {
    val f = udf((ts: Seq[String]) => decodeTokens(ts))
    f(tokens)
  }
}
