package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the LLM-data-pipeline surface.
  *
  * Everything that can be a built-in Column expression is one (codegen'd,
  * oracle-checkable); only MinHash/SimHash/rolling-hash — which need
  * per-token imperative loops — are Scala UDFs, and those run once per
  * document, amortized over the whole text.
  */
object TextFunctions {

  /** Whitespace tokens. Strips ALL leading/trailing whitespace (not just
    * spaces — `trim` alone leaves tabs/newlines, and a text starting with
    * a separator then yields a spurious empty first token). Matches the
    * JVM kernels' String.trim semantics and the DuckDB oracles (which use
    * the same regexp strip). */
  def tokens(text: Column): Column =
    split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")

  /** BPE-ish lexer tokens: word runs or single non-space punctuation. */
  def lexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Word n-gram shingles via higher-order functions (no UDF):
    * shingle i = words[i..i+n-1] joined by space.
    *
    * PERF TRAP (measured, round 14): the transform lambda references
    * the `words` SPLIT subtree, and Catalyst's CollapseProject inlines
    * alias references into lambda bodies — so this form re-tokenizes
    * the text once PER SHINGLE (O(len²) per doc; 13.9 s vs 0.34 s on
    * the q215 corpus), and pre-staging the tokens column does NOT
    * help (the collapse puts the subtree back). Fine on bounded demo
    * inputs (q34's 100 docs); corpus-scale consumers use the one-pass
    * scalar kernels ([[distinctShinglesCol]], [[minhashText]], or a
    * per-row stats UDF) instead. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = tokens(text)
    when(size(words) < n, array())
      .otherwise(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
  }

  /** Stopword-marker language-ID: score = |tokens ∩ markers(lang)|,
    * predict argmax (ties → lexicographically first lang, 'und' if all
    * zero). Deterministic, SQL-expressible in both engines. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "ich"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un", "une", "que", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"))

  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => {
      val markers = langMarkers(lang)
      markers.map(m => t === m).reduce(_ || _)
    }))

  /** Argmax via a sortable string encoding — `lpad(score)||lang`, take the
    * max — so ties break toward the lexicographically LAST lang in both
    * Spark and the DuckDB oracle (plain string max, no struct ordering
    * needed). Score 0 across the board → 'und'. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val langs = langMarkers.keys.toSeq.sorted
    val scored = langs.map(l =>
      concat(lpad(langScore(toks, l).cast("string"), 5, "0"), lit(l)))
    val best = array_max(array(scored: _*))
    when(substring(best, 1, 5) === "00000", "und")
      .otherwise(substring(best, 6, 2))
  }

  /** PII patterns for the scrubbing pass (training-data cleaning).
    * RE2-compatible (no lookarounds) so the same patterns run in Spark
    * (Java regex) and any RE2 engine bit-identically. Order matters:
    * SSN-style ids redact BEFORE phones (a 3-2-4 id also matches the
    * phone shape). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val idRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val phoneRe = "\\+?\\d[\\d()\\- ]{6,}\\d"

  /** Redact emails, SSN-style ids, then phone-shaped digit runs. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        idRe, "<ID>"),
      phoneRe, "<PHONE>")

  /** Per-kind PII hit counts (on the RAW text, before redaction). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(emailRe), lit(0))),
    "n_ids" -> size(regexp_extract_all(text, lit(idRe), lit(0))),
    "n_phones" -> size(regexp_extract_all(
      regexp_replace(regexp_replace(text, emailRe, ""), idRe, ""),
      lit(phoneRe), lit(0))))

  /** Contiguous ≥9-digit runs (account / national-id shapes). Word-
    * bounded: digits are word chars, so a run glued to letters
    * (`id987654321`) does NOT match — only standalone runs. E.164-ish
    * phones written WITH separators never form a contiguous run and
    * stay in the phone class; a phone written as one bare digit run is
    * classified as a long id (a fixed, documented policy — the two
    * classes overlap textually and SOME deterministic order must win). */
  val longIdRe = "\\b\\d{9,}\\b"

  /** Four-class redaction ladder, most-specific first: email → SSN-style
    * id → contiguous long digit run → phone-shaped run. Each later class
    * is matched on the text with earlier classes already substituted by
    * their placeholders, so one character is only ever attributed to one
    * class and [[piiBatteryCounts]] (which counts on the same
    * intermediate strings) agrees with this output by construction. */
  def redactPiiBattery(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailRe, "<EMAIL>"),
          idRe, "<ID>"),
        longIdRe, "<LONGID>"),
      phoneRe, "<PHONE>")

  /** Per-class hit counts for the 4-class battery; each later class is
    * counted on the text with earlier classes SUBSTITUTED by their
    * placeholders — exactly the intermediate strings the
    * [[redactPiiBattery]] chain rewrites — so counts and redaction can
    * never disagree. (Counting on excised text instead could attribute
    * a run that only becomes contiguous once an earlier-class match is
    * removed — e.g. `12 a@b.co 3456789` would count a phone the
    * redacted output doesn't contain; placeholders' letters block such
    * spans, matching what redaction actually sees.) */
  def piiBatteryCounts(text: Column): Seq[(String, Column)] = {
    val subEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val subId = regexp_replace(subEmail, idRe, "<ID>")
    val subLong = regexp_replace(subId, longIdRe, "<LONGID>")
    Seq(
      "n_emails" -> size(regexp_extract_all(text, lit(emailRe), lit(0))),
      "n_ids" -> size(regexp_extract_all(subEmail, lit(idRe), lit(0))),
      "n_longids" -> size(regexp_extract_all(subId, lit(longIdRe), lit(0))),
      "n_phones" -> size(regexp_extract_all(subLong, lit(phoneRe), lit(0))))
  }

  /** Heuristic quality score in [0,1]: penalizes very short docs, all-caps,
    * low alpha ratio, missing stopwords. Exact arithmetic: integer counts
    * + one double division per ratio (cross-engine deterministic). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
    val stop = langScore(tokens(lower(text)), "en")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "alpha_ratio" -> round(alpha.cast("double") / nChars, 6),
      "avg_token_len" -> round((nChars - (nTokens - lit(1))).cast("double") / nTokens, 6),
      "stopword_ratio" -> round(stop.cast("double") / nTokens, 6))
  }

  // --- UDF kernels (per-document, deterministic) -------------------------

  /** FNV-1a 64-bit over UTF-8 — stable, dependency-free token hash. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private val fnv1a64Udf = udf((s: String) => fnv1a64(s))

  /** Column form of the fnv1a64 string hash (64-bit join keys for gram /
    * shingle joins at scale — 8 bytes instead of an n-word string). */
  def fnv1a64Col(s: Column): Column = fnv1a64Udf(s)

  /** splitmix64 finalizer. package-visible so query oracles can embed
    * mix64-derived constants generated from the SAME kernel (no drift). */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: numHashes universal-hash minima over the shingle
    * set. One pass per shingle, O(shingles × numHashes) multiply-adds. */
  def minhashSig(shingles: Seq[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val base = fnv1a64(s)
      var i = 0
      while (i < numHashes) {
        val v = mix64(base ^ mix64(i.toLong))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  private val minhashUdf = udf((sh: Seq[String], n: Int) => minhashSig(sh, n))

  def minhash(shingles: Column, numHashes: Int): Column =
    minhashUdf(shingles, lit(numHashes))

  /** Fused tokenize→shingle→minhash in ONE JVM pass. The composable
    * expression form (wordShingles + minhash) pays ~interpreted-lambda
    * costs per shingle (measured 4 s / 10k docs just for shingling);
    * this kernel is the hot-path form for the LSH operators. */
  def minhashFromText(text: String, shingleSize: Int, numHashes: Int): Array[Long] = {
    if (text == null) return Array.fill(numHashes)(Long.MaxValue) // → filtered
    val words = text.trim.split("\\s+")
    if (words.length < shingleSize) return Array.fill(numHashes)(Long.MaxValue)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - shingleSize) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      val base = fnv1a64(sb.toString)
      var h = 0
      while (h < numHashes) {
        val v = mix64(base ^ mix64(h.toLong))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  private val minhashTextUdf =
    udf((t: String, s: Int, n: Int) => minhashFromText(t, s, n))

  def minhashText(text: Column, shingleSize: Int, numHashes: Int): Column =
    minhashTextUdf(text, lit(shingleSize), lit(numHashes))

  /** Fused tokenize→shingle→distinct in one JVM pass (the exact-Jaccard
    * verification input; same element set as
    * array_distinct(wordShingles(text, n)) — both strip all
    * leading/trailing whitespace before splitting). */
  def distinctShingles(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val words = text.trim.split("\\s+")
    if (words.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  private val distinctShinglesUdf = udf((t: String, n: Int) => distinctShingles(t, n))

  def distinctShinglesCol(text: Column, n: Int): Column =
    distinctShinglesUdf(text, lit(n))

  private val normWordPattern = java.util.regex.Pattern.compile("\\w+")

  /** [[distinctShingles]] over the NORMALIZED token stream — lowercase,
    * `\w+` word tokens only, punctuation dropped — the GPT-3 appendix-C
    * decontamination normalization: "The Cat, Sat." and "the cat sat"
    * shingle identically, so a trivially reformatted benchmark leak
    * (case flips, injected punctuation) cannot evade an n-gram filter.
    * The raw variant stays for byte-exact matching; use this one for
    * contamination defense. */
  def normalizedDistinctShingles(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val m = normWordPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val words = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) words += m.group()
    if (words.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  private val normalizedShinglesUdf =
    udf((t: String, n: Int) => normalizedDistinctShingles(t, n))

  def normalizedDistinctShinglesCol(text: Column, n: Int): Column =
    normalizedShinglesUdf(text, lit(n))

  /** Fused tokenize→shingle WITHOUT dedup (same element multiset as
    * wordShingles, one JVM pass — the expression form's interpreted
    * higher-order lambdas cost ~4 s / 10k docs and dominated q89/q90). */
  def allShingles(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val words = text.trim.split("\\s+")
    if (words.length < n) return Array.empty
    val out = new Array[String](words.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private val allShinglesUdf = udf((t: String, n: Int) => allShingles(t, n))

  def allShinglesCol(text: Column, n: Int): Column =
    allShinglesUdf(text, lit(n))

  /** Content-defined duplicated-substring windows (the Lee et al. 2022
    * "Deduplicating Training Data" op in windowed form): a position i
    * anchors iff fnv1a64 of its `gate`-char prefix ≡ 0 (mod `modulo`) —
    * the winnowing idea, so anchor positions are a function of CONTENT,
    * not absolute offset, and a span duplicated at DIFFERENT offsets in
    * two documents anchors at the same relative positions in both
    * (fixed-stride windows would only match offset-aligned copies).
    * Each anchored window's fnv1a64 is emitted; cross-doc hash equality
    * marks duplicated substrings.
    *
    * Recall is probabilistic in span length — a duplicated span of
    * length L ≥ window carries an anchor with prob 1 − (1−1/modulo)^
    * (L−window+1) (≈95% at L = window + 3·modulo) — precision is exact
    * up to 64-bit hash collision. Expected windows per char = 1/modulo,
    * so cost matches stride-`modulo` windowing. The exact-all-positions
    * form is modulo = 1: every position anchors, and the window hash is
    * the ROLLABLE polynomial ([[PolyBase]]) instead of fnv1a, so the
    * scan is O(len) — matching the suffix-array form's linear cost
    * (Lee et al.) while keeping the shuffle-on-small-keys shape. */
  def anchoredWindowHashes(text: String, window: Int, gate: Int,
      modulo: Int): Array[Long] = {
    if (text == null || text.length < window) return Array.empty[Long]
    val out = Array.newBuilder[Long]
    anchoredScan(text, window, gate, modulo)((_, h) => out += h)
    out.result()
  }

  /** fnv1a64 over bytes[from, until) — the substring-free fold. */
  private def fnvRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Base of the ROLLABLE polynomial hash used by the exact
    * (modulo = 1) substring path: H = Σ b_j · B^(W-1-j) mod 2⁶⁴. The
    * fnv prime re-used as the base (odd → invertible mod 2⁶⁴, and its
    * value is already embedded in every oracle's arithmetic). fnv1a
    * itself cannot roll (the xor sits between the multiplies); the
    * plain polynomial form rolls in O(1) per position:
    * H(i+1) = (H(i) − b_i·B^(W-1))·B + b_{i+W}, everything mod 2⁶⁴ via
    * natural Long overflow — replayable in DuckDB as the direct fold
    * `(h*B + b) % 2^64` in HUGEINT (h < 2⁶⁴, B < 2⁴¹ → product < 2¹⁰⁵
    * < 2¹²⁷). */
  private[graft] val PolyBase = 0x100000001b3L

  /** Direct polynomial fold over bytes[from, until) — the reference
    * form the rolling recurrence must equal at every position
    * (spec-pinned in TextFunctionsSpec). */
  private[graft] def polyRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      h = h * PolyBase + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Shared anchored-window scan: emits (0-based anchor position,
    * window hash) for every position whose gate-prefix fnv ≡ 0 mod
    * `modulo`. ASCII fast path folds directly over ONE per-doc UTF-8
    * byte array (no per-position substring/byte-array allocation — at
    * corpus scale the old per-position 4-char substring + getBytes
    * dominated GC); any non-ASCII char falls back to the original
    * per-position substring fold, whose UTF-8 multi-byte semantics the
    * byte-offset arithmetic can't reproduce (oracles reject non-ASCII
    * corpora loudly anyway). */
  private def anchoredScan(text: String, window: Int, gate: Int,
      modulo: Int)(emit: (Int, Long) => Unit): Unit = {
    val n = text.length
    val max = n - window
    var ascii = true
    var k = 0
    while (ascii && k < n) {
      if (text.charAt(k) >= 0x80) ascii = false
      k += 1
    }
    // modulo = 1 is the exact-all-positions form: every position
    // anchors (no gate fold), and the window hash switches from fnv1a
    // (which cannot roll — the xor sits between the multiplies) to the
    // rollable polynomial hash, so the scan is O(len) instead of the
    // O(len·window) per-position re-fold. Anchored (modulo > 1) paths
    // keep fnv1a unchanged — hashes are only ever compared for
    // equality, within one parameterization.
    if (ascii) {
      val bytes =
        text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if (modulo == 1) {
        var pow = 1L // B^(window-1) mod 2^64
        var j = 0
        while (j < window - 1) { pow *= PolyBase; j += 1 }
        var h = polyRange(bytes, 0, window)
        var i = 0
        while (i <= max) {
          emit(i, h)
          if (i < max)
            h = (h - (bytes(i) & 0xffL) * pow) * PolyBase +
              (bytes(i + window) & 0xffL)
          i += 1
        }
      } else {
        var i = 0
        while (i <= max) {
          if (java.lang.Long.remainderUnsigned(
              fnvRange(bytes, i, i + gate), modulo) == 0L)
            emit(i, fnvRange(bytes, i, i + window))
          i += 1
        }
      }
    } else {
      // non-ASCII fallback: per-position UTF-8 substring folds (the
      // byte-offset arithmetic above can't reproduce multi-byte
      // semantics; oracles reject non-ASCII corpora loudly anyway).
      // modulo = 1 keeps the polynomial hash for parameterization
      // consistency, folded per position over the substring's bytes.
      var i = 0
      while (i <= max) {
        if (modulo == 1) {
          val b = text.substring(i, i + window)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          emit(i, polyRange(b, 0, b.length))
        } else if (java.lang.Long.remainderUnsigned(
            fnv1a64(text.substring(i, i + gate)), modulo) == 0L)
          emit(i, fnv1a64(text.substring(i, i + window)))
        i += 1
      }
    }
  }

  private val anchoredWindowsUdf =
    udf((t: String, w: Int, g: Int, m: Int) => anchoredWindowHashes(t, w, g, m))

  def anchoredWindowHashesCol(text: Column, window: Int, gate: Int,
      modulo: Int): Column =
    anchoredWindowsUdf(text, lit(window), lit(gate), lit(modulo))

  /** One anchored window: 0-based character position + fnv1a64 of the
    * `window`-char slice starting there. */
  final case class AnchoredSpan(pos: Int, h: Long)

  /** [[anchoredWindowHashes]] keeping the anchor POSITION alongside each
    * hash — the form span-removal needs (detection alone can discard
    * positions; excision cannot). Same anchors, same hashes, in document
    * order. */
  def anchoredWindowSpans(text: String, window: Int, gate: Int,
      modulo: Int): Array[AnchoredSpan] = {
    if (text == null || text.length < window) return Array.empty[AnchoredSpan]
    val out = Array.newBuilder[AnchoredSpan]
    anchoredScan(text, window, gate, modulo)((p, h) => out += AnchoredSpan(p, h))
    out.result()
  }

  private val anchoredSpansUdf =
    udf((t: String, w: Int, g: Int, m: Int) => anchoredWindowSpans(t, w, g, m))

  /** Column form of [[anchoredWindowSpans]]:
    * array&lt;struct&lt;pos:int,h:long&gt;&gt;. */
  def anchoredWindowSpansCol(text: Column, window: Int, gate: Int,
      modulo: Int): Column =
    anchoredSpansUdf(text, lit(window), lit(gate), lit(modulo))

  /** 64-bit SimHash over tokens: per-bit weighted vote of token hashes.
    * Null token list (null text upstream) → 0L fingerprint. */
  def simhash64(toks: Seq[String]): Long = {
    if (toks == null) return 0L
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  def simhash(toks: Column): Column = simhashUdf(toks)

  /** Polynomial rolling-hash document fingerprint over normalized text
    * (lowercase, collapsed whitespace) — base 257 mod p = 2^61-1.
    * Mersenne reduction over the full 128-bit product (Math.multiplyHigh):
    * 2^64 ≡ 8 (mod p), so hi·2^64 + lo ≡ 8·hi + (lo & p) + (lo >>> 61). */
  def rollingFingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    var h = 0L
    var i = 0
    while (i < norm.length) {
      h = addMod61(mulMod61(h, 257L), norm.charAt(i).toLong)
      i += 1
    }
    h
  }

  private val P61 = (1L << 61) - 1

  private def addMod61(a: Long, b: Long): Long = {
    val s = a + b // both < p < 2^61 → no overflow
    if (s >= P61) s - P61 else s
  }

  private def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // a,b < 2^61 → product < 2^122 → hi < 2^58 → 8·hi < 2^61
    var r = (lo & P61) + (lo >>> 61) + (hi << 3)
    while (r >= P61) r -= P61
    r
  }

  private val fingerprintUdf = udf((s: String) => rollingFingerprint(s))

  def fingerprint(text: Column): Column = fingerprintUdf(text)
}
