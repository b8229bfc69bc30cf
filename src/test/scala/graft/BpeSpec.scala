package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.functions.Bpe.{Merge, Model}

/** The BPE tokenizer: merge-pass semantics (including the overlapping-run
  * parity case), fit determinism and tie order, and the equivalence of
  * rank-order application with the textbook min-rank loop — the property
  * the oracle's unrolled encode relies on. */
class BpeSpec extends SparkSuite {

  // ------------------------------------------------------------------
  // applyMerge: the left-to-right non-overlapping pass
  // ------------------------------------------------------------------

  private def syms(s: String): Vector[String] = s.map(_.toString).toVector

  test("applyMerge merges every non-overlapping occurrence left-to-right") {
    assert(Bpe.applyMerge(syms("abab"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.applyMerge(syms("aab"), "a", "b") == Vector("a", "ab"))
    assert(Bpe.applyMerge(syms("ab"), "x", "y") == Vector("a", "b"))
    assert(Bpe.applyMerge(Vector("ab", "c"), "ab", "c") == Vector("abc"))
    assert(Bpe.applyMerge(syms("a"), "a", "a") == Vector("a"))
    assert(Bpe.applyMerge(Vector.empty, "a", "b") == Vector.empty)
  }

  test("applyMerge overlapping runs take the 1st, 3rd, … occurrence (parity)") {
    // the case the oracle's gaps-and-islands fold must match exactly
    assert(Bpe.applyMerge(syms("aaa"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.applyMerge(syms("aaaa"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.applyMerge(syms("aaaaa"), "a", "a") == Vector("aa", "aa", "a"))
    assert(Bpe.applyMerge(syms("baaab"), "a", "a") == Vector("b", "aa", "a", "b"))
  }

  // ------------------------------------------------------------------
  // fit: hand-computed merges, tie order, determinism
  // ------------------------------------------------------------------

  test("fitFromWordFreq learns the hand-computed merge sequence") {
    // pairs of "abab"×3: (a,b)=6 [two occurrences per word], (b,a)=3;
    // "cd"×2 adds (c,d)=2. Merge 1 = (a,b). Then "abab"→[ab,ab] gives
    // (ab,ab)=3; merge 2 = (ab,ab) [3 > 2]. Merge 3 = (c,d)=2.
    // Then "cd"→[cd]: nothing ≥ 2 remains → stop at 3 merges.
    val m = Bpe.fitFromWordFreq(
      Map("abab" -> 3L, "cd" -> 2L), maxWords = 10, numMerges = 10)
    assert(m.merges == Vector(
      Merge("a", "b"), Merge("ab", "ab"), Merge("c", "d")))
  }

  test("fit tie order: equal counts break on (l, r) ascending") {
    // "xy" and "xz" both freq 2 → pairs (x,y)=2 and (x,z)=2: tie on
    // count, (x,y) < (x,z) lexicographically → merge 1 = (x,y)
    val m = Bpe.fitFromWordFreq(
      Map("xy" -> 2L, "xz" -> 2L), maxWords = 10, numMerges = 1)
    assert(m.merges == Vector(Merge("x", "y")))
  }

  test("fit stops when the best pair count drops below 2") {
    val m = Bpe.fitFromWordFreq(Map("ab" -> 1L, "cd" -> 1L), 10, 10)
    assert(m.merges.isEmpty, "all pair counts are 1 — nothing to merge")
  }

  test("fit is independent of map iteration order") {
    val words = Seq("spark" -> 7L, "scala" -> 5L, "scan" -> 5L,
      "span" -> 3L, "parquet" -> 2L, "part" -> 6L)
    val a = Bpe.fitFromWordFreq(words.toMap, 100, 20)
    val b = Bpe.fitFromWordFreq(
      scala.collection.immutable.ListMap(words.reverse: _*), 100, 20)
    assert(a.merges == b.merges)
    assert(a.merges.nonEmpty)
  }

  test("vocab cap keeps the maxWords most frequent words (ties: word asc)") {
    // cap 1: "bb" (freq 3) wins over "aa" (freq 2) → only (b,b) learnable
    val m = Bpe.fitFromWordFreq(Map("aa" -> 2L, "bb" -> 3L), maxWords = 1,
      numMerges = 10)
    assert(m.merges == Vector(Merge("b", "b")))
  }

  // ------------------------------------------------------------------
  // encode: rank-order application ≡ textbook min-rank loop
  // ------------------------------------------------------------------

  /** The textbook encode: repeatedly merge the LOWEST-ranked pair present
    * (leftmost occurrence), until none applies. */
  private def minRankEncode(w: String, model: Model): Vector[String] = {
    val rank = model.merges.zipWithIndex
      .map { case (m, i) => (m.l, m.r) -> i }.toMap
    var s = syms(w)
    var done = false
    while (!done) {
      val cands = (0 until s.length - 1)
        .flatMap(i => rank.get((s(i), s(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) done = true
      else {
        val (r, i) = cands.min
        val m = model.merges(r)
        s = s.patch(i, Vector(m.l + m.r), 2)
      }
    }
    s
  }

  test("rank-order encode equals the min-rank loop on a fitted table") {
    val corpus = Map("lower" -> 9L, "lowest" -> 7L, "newer" -> 11L,
      "newest" -> 8L, "wider" -> 6L, "widest" -> 5L, "low" -> 13L,
      "new" -> 12L, "aaaa" -> 4L, "aaab" -> 3L)
    val model = Bpe.fitFromWordFreq(corpus, 100, 30)
    assert(model.merges.size >= 10, s"expected a rich table, got ${model.merges}")
    val probes = corpus.keys.toSeq ++ Seq(
      "slowest", "renewed", "aa", "aaaaaaa", "widestest", "z", "lownew")
    probes.foreach { w =>
      assert(Bpe.encodeWord(w, model) == minRankEncode(w, model),
        s"divergence on '$w' with merges ${model.merges}")
    }
  }

  // ------------------------------------------------------------------
  // encodeText: lexing, atomic passthrough, case, nulls
  // ------------------------------------------------------------------

  test("encodeText lowers alpha tokens, passes others through atomically") {
    val model = Model(Vector(Merge("a", "b"), Merge("ab", "c")))
    assert(Bpe.encodeText("ABC abc", model) == Seq("abc", "abc"))
    assert(Bpe.encodeText("abc, x1b!", model) ==
      Seq("abc", ",", "x1b", "!"), // x1b has a digit → atomic, unmerged
      "non-alpha \\w+ tokens must stay atomic")
    assert(Bpe.encodeText(null, model) == Seq.empty)
    assert(Bpe.encodeText("", model) == Seq.empty)
    assert(Bpe.encodeText("  \t\n ", model) == Seq.empty)
  }

  test("encodeCol matches encodeText through the Spark plan") {
    import spark.implicits._
    val model = Bpe.fit(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"),
      "doc_id", "text")
    assert(model.merges.size == 48)
    val docs = Seq((1L, "spark scan merge"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.encodeCol(col("text"), model).as("bt"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Bpe.encodeText("spark scan merge", model))
    assert(got(2L) == Seq.empty)
  }

  test("fit on the real corpus is reproducible run-to-run") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val a = Bpe.fit(docs, "doc_id", "text")
    val b = Bpe.fit(docs.repartition(7), "doc_id", "text")
    assert(a.merges == b.merges,
      "fit must not depend on partitioning (hash-capped sample is a total order)")
  }

  // ------------------------------------------------------------------
  // decode round-trip (q163's kernel)
  // ------------------------------------------------------------------

  test("decode∘encodeMarked = canonical lex form; encode∘decode = id on tokens") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val model = Bpe.fit(docs, "doc_id", "text")
    def canon(t: String): String =
      "[\\w]+|[^\\w\\s]".r.findAllIn(Option(t).getOrElse("")).map { tok =>
        if (tok.matches("^[A-Za-z]+$")) tok.toLowerCase else tok
      }.mkString(" ")
    val adversarial = Seq(
      "Hello, World!", "", "   \t\n", "!!!", "a  b\tc",
      "héllo wörld", // non-ASCII chars: byte-fallback, reassembled on decode
      "MiXeD CaSe AND lower", "x1b 42 !?.",
      "▁marker in input▁") // the marker itself as input
    adversarial.foreach { t =>
      val toks = Bpe.encodeTextMarked(t, model)
      val decoded = Bpe.decodeTokens(toks)
      assert(decoded == canon(t),
        s"decode∘encode != canon on '$t': '$decoded' vs '${canon(t)}'")
      assert(Bpe.encodeTextMarked(decoded, model) == toks,
        s"encode∘decode != id on token stream for '$t'")
    }
    // and over real corpus text: marked stream has the same token count
    // as the flat stream, and the round trip holds on every sampled doc
    import spark.implicits._
    val sample = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].head(50)
    sample.foreach { case (id, t) =>
      val flat = Bpe.encodeText(t, model)
      val marked = Bpe.encodeTextMarked(t, model)
      assert(flat.size == marked.size, s"doc $id: marking changed the count")
      assert(marked.map(_.stripPrefix(Bpe.WordMarker)) == flat,
        s"doc $id: marked stream must be the flat stream + markers")
      assert(Bpe.decodeTokens(marked) == canon(t), s"doc $id round trip")
    }
    assert(Bpe.decodeTokens(null) == "")
  }

  test("byte fallback: non-ASCII decomposes to byte tokens; every token is ASCII") {
    val model = Model(Vector.empty)
    // 2-byte sequence: é = U+00E9 → C3 A9
    assert(Bpe.encodeText("café", model) ==
      Seq("c", "a", "f", "<0xC3>", "<0xA9>"))
    // 3-byte sequences: 東 = U+6771, 京 = U+4EAC
    assert(Bpe.encodeText("東京", model) ==
      Seq("<0xE6>", "<0x9D>", "<0xB1>", "<0xE4>", "<0xBA>", "<0xAC>"))
    // the whole output alphabet is ASCII — the bounded-vocab guarantee
    val toks = Bpe.encodeText("naïve 🚀 über résumé x1b!", model)
    assert(toks.forall(t => t.forall(_ < 0x80)), toks.toString)
    // a literal byte-token string in INPUT lexes as ASCII pieces, never
    // as a byte token (no ambiguity)
    assert(Bpe.encodeText("<0xC3>", model) == Seq("<", "0", "x", "C3".toLowerCase, ">")
      || Bpe.encodeText("<0xC3>", model) == Seq("<", "0xC3", ">"))
    // marked round trip over 2-, 3- and 4-byte sequences (🚀 = U+1F680,
    // a surrogate pair in UTF-16 — one code point, 4 UTF-8 bytes)
    def canon(t: String): String =
      "[\\w]+|[^\\w\\s]".r.findAllIn(t).map { tok =>
        if (tok.matches("^[A-Za-z]+$")) tok.toLowerCase else tok
      }.mkString(" ")
    for (t <- Seq("café au lait", "東京 tower", "emoji 🚀 launch", "ü ü ü")) {
      val m = Bpe.encodeTextMarked(t, model)
      assert(m.forall(tk =>
        tk.stripPrefix(Bpe.WordMarker).forall(_ < 0x80)), m.toString)
      assert(Bpe.decodeTokens(m) == canon(t), s"round trip on '$t'")
      assert(Bpe.encodeTextMarked(Bpe.decodeTokens(m), model) == m,
        s"encode∘decode != id on '$t'")
    }
  }

  test("UnigramLm: Viterbi hand cases, tie-break, total hard-EM fit") {
    import graft.functions.UnigramLm
    // hand DP: "abc" under {a:10,b:10,c:10,ab:15,bc:12,abc:40} —
    // best = a(10) + bc(12) = 22, not abc(40) nor ab+c(25)
    val sc = Map("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 15L, "bc" -> 12L, "abc" -> 40L)
    val s1 = UnigramLm.segment("abc", sc).get
    assert(s1.cost == 22L && s1.pieces == Vector("a", "bc"))
    // cost tie: ab(20) == a(10)+b(10) — the ascending-start scan keeps
    // the LONGEST piece
    val s2 = UnigramLm.segment("ab",
      Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)).get
    assert(s2.pieces == Vector("ab"), s2.toString)
    // out-of-alphabet char → None, never a crash
    assert(UnigramLm.segment("axb", Map("a" -> 1L, "b" -> 1L)).isEmpty)
    // hard-EM fit is total over its own vocab and deterministic
    val wf = Map("abab" -> 5L, "ab" -> 3L, "ba" -> 2L, "cab" -> 1L)
    val m1 = UnigramLm.fitFromWordFreq(wf)
    val m2 = UnigramLm.fitFromWordFreq(wf)
    assert(m1.scores == m2.scores)
    wf.keys.foreach { w =>
      val s = UnigramLm.segment(w, m1.scores)
      assert(s.nonEmpty, s"fit must segment its own vocab word '$w'")
      assert(s.get.pieces.mkString("") == w, "pieces must concatenate back")
    }
    // the dominant pattern 'ab' should survive EM as a piece
    assert(m1.scores.contains("ab"))
  }

  test("vocab drift: identical corpora share every merge at equal rank, a shifted corpus diverges") {
    import spark.implicits._
    val docs = (1L to 30L).toSeq.map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val a = Bpe.fit(docs, "doc_id", "text", 256, 4096, 12)
    val b = Bpe.fit(docs, "doc_id", "text", 256, 4096, 12)
    assert(a.merges == b.merges, "same corpus must fit the same tokenizer")
    // shifted corpus: heavy novel jargon changes the top pair counts
    val shifted = docs.select(col("doc_id"),
      concat(col("text"), lit(" zzqx zzqx zzqx zzqx zzqx zzqx" * 4)).as("text"))
    val c = Bpe.fit(shifted, "doc_id", "text", 256, 4096, 12)
    val aSet = a.merges.map(m => (m.l, m.r)).toSet
    val novel = c.merges.count(m => !aSet.contains((m.l, m.r)))
    assert(novel > 0, s"jargon must force novel merges: ${c.merges}")
    // the drift join logic (shared flag + old rank) on the model pair
    val aRank = a.merges.zipWithIndex.map { case (m, i) => (m.l, m.r) -> (i + 1) }.toMap
    c.merges.zipWithIndex.foreach { case (m, i) =>
      val shared = aRank.contains((m.l, m.r))
      val oldRank = aRank.getOrElse((m.l, m.r), -1)
      if (shared) assert(oldRank >= 1) else assert(oldRank == -1)
    }
  }

  test("GPT-2-basis BPE: space-attached words are first-class, contractions atomic, fused encode tiles") {
    import spark.implicits._
    // ' the' dominates the sample; the fit must learn merges over the
    // 5-symbol word {' ','t','h','e'} — merges the lexer basis can
    // never contain (no lexer word starts with a space)
    val docs = (1L to 20L)
      .map(i => (i, "the theme of the thesis is that the theory holds"))
      .toDF("doc_id", "text")
    val g = Bpe.fitGpt2(docs, "doc_id", "text",
      sampleDocs = 20, maxWords = 100, numMerges = 20)
    assert(g.merges.exists(m => (m.l + m.r).startsWith(" ")),
      s"no space-prefixed merge learned: ${g.merges}")
    val enc = Bpe.encodeTextGpt2("the theory, don't they'll say", g)
    // contractions stay atomic — never merged into neighbors
    assert(enc.contains("'t") && enc.contains("'ll"), enc.toString)
    // the merged stream tiles the input modulo ASCII lowering of the
    // alpha class (space prefixes included)
    val pretoks = Bpe.gpt2PreTokenize("the theory, don't they'll say")
    val want = pretoks.map(t =>
      if (t.matches(Bpe.Gpt2AlphaPattern)) t.toLowerCase else t).mkString("")
    assert(enc.mkString("") == want, s"${enc.mkString("|")} vs $want")
    // ' the' and 'the' tokenize independently: doc-initial 'the' has no
    // space, so its subword stream may differ from the attached form
    val bare = Bpe.encodeTextGpt2("the", g)
    val attached = Bpe.encodeTextGpt2("x the", g).drop(1) // drop 'x'
    assert(attached.mkString("") == " the" && bare.mkString("") == "the")
    // non-ASCII pre-token: the WHOLE multi-code-point run byte-falls-back
    val enc2 = Bpe.encodeTextGpt2("a café b", g)
    val cafeBytes = " café".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => Bpe.ByteTokens(b & 0xff)).toSeq
    assert(enc2.containsSlice(cafeBytes),
      s"multi-code-point byte fallback: $enc2")
  }

  test("gpt2PreTokenize == the literal GPT-2 regex on an adversarial battery and corpus docs") {
    val re = java.util.regex.Pattern.compile(Bpe.Gpt2Pattern)
    def viaRegex(t: String): Seq[String] = {
      val m = re.matcher(t)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    val battery = Seq(
      "Hello world", "don't", "isn't's", "I'll you've we're he'd",
      "'s leads the string", "can'tify", "rock'sand", "a''s", "x.'s",
      " 's after space", "!'s after punct", "9's digits", "ab12cd",
      "a  b   c", "trailing spaces   ", "   leading", "tabs\tand\nnewlines",
      "punct...runs!?", "mixed 'IT'S' case", "a'd", "q're'll", "",
      "  ", "'", "a'", "one-two--three", "3.14 and 2,000,000",
      "quote 'inside' text", "I'm I'M", "'ll at start",
      // non-BMP (surrogate pairs) — r15 advice: \p{L}/\p{N} match code
      // points, so 𝒜 (U+1D49C, letter) and 𝟙 (U+1D7D9, number) must
      // class per code point, not per UTF-16 char; 😀 is "other"
      "math 𝒜𝒷𝒸 script", "digits 𝟙𝟚𝟛 here", "a𝒜b mixed", " 𝒜fter space",
      "𝒜't contraction", "😀 emoji 𝒜𝟙 run", "café naïve BMP accents")
    battery.foreach { t =>
      assert(Bpe.gpt2PreTokenize(t).toSeq == viaRegex(t),
        s"diverged on <$t>: ${Bpe.gpt2PreTokenize(t).toSeq} vs ${viaRegex(t)}")
      assert(Bpe.gpt2PreTokenize(t).mkString("") == t,
        s"tokens must tile the input: <$t>")
    }
    // and on real corpus text (all three SFs share generation style)
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("text").as[String].collect()
    docs.foreach { t =>
      assert(Bpe.gpt2PreTokenize(t).toSeq == viaRegex(t), s"corpus doc diverged: ${t.take(80)}")
    }
  }

  test("wordpiece: score argmax, ## convention, greedy encode, UNK") {
    import graft.functions.Wordpiece
    // 'ab' pair: c=6, c(a)=8, c(b)=6 → key ∝ 6/48; 'bc': c=6, c(b)=6,
    // c(c)=6 → 6/36 — WordPiece merges 'b ##c' FIRST even though raw
    // counts tie (BPE's tie-break would pick 'a ##b' lexicographically)
    val freq = Map("abc" -> 6L, "ad" -> 2L, "xb" -> 0L)
    val (m, vocab) = Wordpiece.fitFromWordFreq(freq, maxWords = 10,
      numMerges = 1)
    assert(m.vocab.contains("##bc") && !m.vocab.contains("ab"),
      s"likelihood ratio must beat raw count: ${m.vocab}")
    assert(vocab.head == ("abc", 6L))
    // greedy longest-match + ## continuation + multi-merge
    val (m2, _) = Wordpiece.fitFromWordFreq(
      Map("abc" -> 6L, "ad" -> 2L), 10, 5)
    assert(Wordpiece.encodeWord("abc", m2) == Seq("abc"),
      s"fully merged word is one piece: ${Wordpiece.encodeWord("abc", m2)}")
    assert(Wordpiece.encodeWord("adc", m2).head == "a" ||
      Wordpiece.encodeWord("adc", m2).head == "ad",
      "prefix pieces reuse the vocab")
    // unseen char → whole word [UNK] (BERT's rule)
    assert(Wordpiece.encodeWord("azq", m2) == Seq(Wordpiece.Unk))
    // continuation marker: second piece of a split word carries ##
    val (m3, _) = Wordpiece.fitFromWordFreq(
      Map("ab" -> 5L, "cd" -> 5L), 10, 0) // no merges: chars only
    assert(Wordpiece.encodeWord("ab", m3) == Seq("a", "##b"))
    assert(Wordpiece.encodeWord("cdb", m3) == Seq("c", "##d", "##b"))
    // positional forms are distinct vocab entries: 'a' was only ever
    // seen word-INITIAL, so a continuation-position 'a' is unseen →
    // the whole word is [UNK] (the ## convention's point)
    assert(Wordpiece.encodeWord("cda", m3) == Seq(Wordpiece.Unk))
    // empty/all-filtered input → empty model, not a crash (r17 advice:
    // the Bpe/UnigramLm contract); any word then encodes as [UNK]
    val (m4, v4) = Wordpiece.fitFromWordFreq(Map.empty[String, Long], 10, 5)
    assert(m4.vocab.isEmpty && m4.maxPieceChars == 0 && v4.isEmpty)
    assert(Wordpiece.encodeWord("abc", m4) == Seq(Wordpiece.Unk))
  }

  test("vocabId: content-addressed for all three families; serve guard refuses mismatches") {
    import graft.functions.{Wordpiece, UnigramLm}
    val in1 = Map("abc" -> 6L, "ad" -> 2L)
    val in2 = Map("abq" -> 9L, "xy" -> 3L)
    // same input → same id; different merges/vocab/scores → different id
    assert(Bpe.vocabId(Bpe.fitFromWordFreq(in1, 10, 5)) ==
      Bpe.vocabId(Bpe.fitFromWordFreq(in1, 10, 5)))
    assert(Bpe.vocabId(Bpe.fitFromWordFreq(in1, 10, 5)) !=
      Bpe.vocabId(Bpe.fitFromWordFreq(in2, 10, 5)))
    assert(Wordpiece.vocabId(Wordpiece.fitFromWordFreq(in1, 10, 5)._1) ==
      Wordpiece.vocabId(Wordpiece.fitFromWordFreq(in1, 10, 5)._1))
    assert(Wordpiece.vocabId(Wordpiece.fitFromWordFreq(in1, 10, 5)._1) !=
      Wordpiece.vocabId(Wordpiece.fitFromWordFreq(in2, 10, 5)._1))
    assert(UnigramLm.vocabId(UnigramLm.fitFromWordFreq(in1)) ==
      UnigramLm.vocabId(UnigramLm.fitFromWordFreq(in1)))
    assert(UnigramLm.vocabId(UnigramLm.fitFromWordFreq(in1)) !=
      UnigramLm.vocabId(UnigramLm.fitFromWordFreq(in2)))
    // the guard is family-agnostic (a vocab_id column check): accepts
    // its own id, refuses a foreign one loudly
    import spark.implicits._
    val id1 = Bpe.vocabId(Bpe.fitFromWordFreq(in1, 10, 5))
    val id2 = Wordpiece.vocabId(Wordpiece.fitFromWordFreq(in2, 10, 5)._1)
    val art = Seq((1L, id1)).toDF("doc_id", "vocab_id")
    assert(Bpe.requireVocab(art, id1).count() == 1L)
    val ex = intercept[Exception] { Bpe.requireVocab(art, id2).count() }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(x => Option(x.getMessage)).mkString(" ")
    assert(msgs(ex).contains("requireVocab"), msgs(ex))
  }
}
