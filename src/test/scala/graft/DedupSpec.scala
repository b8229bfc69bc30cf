package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Recall/precision properties of the approximate dedup operators that
  * have no SQL oracle. Corpus: documents ∪ exact copy (ids +10000) —
  * every original has one guaranteed duplicate partner. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("incrementalLshMatches: copies match, disjoint text is new, short docs report 0") {
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red green blue yellow purple orange pink teal"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
      (102L, "totally different words sharing nothing at all here now"),
      (103L, "hi"))                                            // < 3 words
      .toDF("doc_id", "text")
    val got = Dedup.incrementalLshMatches(existing, incoming, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(101L -> 1L, 102L -> 0L, 103L -> 0L), got.toString)
  }


  private lazy val docs = Tables.load(spark, sf("sf0.001"), "documents")
  private lazy val corpus =
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000L))
  private lazy val nDocs = docs.count()

  test("minhash LSH recalls every exact-duplicate pair with est_jaccard 1.0") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text").cache()
    val exactPairs = pairs
      .filter(col("idB") === col("idA") + 10000L && col("est_jaccard") === 1.0)
    assert(exactPairs.count() == nDocs) // 100% recall on identical docs
  }

  test("minhash LSH est_jaccard tracks exact jaccard on candidates") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text")
    val verified = Dedup.ngramJaccard(pairs, corpus, "doc_id", "text")
      .join(pairs, Seq("idA", "idB"))
    val err = verified
      .select(avg(abs(col("jaccard") - col("est_jaccard")))).as[Double].head()
    assert(err < 0.15, s"mean |exact-est| = $err")
  }

  test("simhash blocks recall identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text").cache()
    val exact = pairs.filter(col("idB") === col("idA") + 10000L)
    assert(exact.count() == nDocs)
    assert(exact.filter(col("hamming") =!= 0).count() == 0)
  }

  test("fingerprint is whitespace-collapse invariant, exact dedup is not") {
    val variants = Seq(
      (1L, "the  quick   brown fox"),
      (2L, "the quick brown fox"),
      (3L, "THE QUICK BROWN FOX"),
      (4L, "something else entirely")).toDF("doc_id", "text")
    val fps = variants.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L)) // whitespace collapsed
    assert(fps(2L) == fps(3L)) // case folded
    assert(fps(1L) != fps(4L))
    val hashes = Dedup.exact(variants, "doc_id", "text")
    assert(hashes.count() == 4) // sha256 treats all four as distinct
  }

  test("anchored windows find a duplicated span at DIFFERENT offsets") {
    // prefix lengths 9 vs 30: offset difference 21 ≢ 0 (mod 16), so
    // fixed-stride-16 windows of the shared span NEVER align across the
    // two docs — content-defined anchoring must still match them
    val span = "the quick brown fox jumps over the lazy dog repeatedly and often " * 3
    val a = ("x" * 9) + span + " suffix one"
    val b = ("y" * 30) + span + " a different tail"
    val ha = TextFunctions.anchoredWindowHashes(a, 64, 4, 16).toSet
    val hb = TextFunctions.anchoredWindowHashes(b, 64, 4, 16).toSet
    assert((ha intersect hb).nonEmpty,
      "shared span must anchor at the same content positions in both docs")
    def stride(t: String): Set[Long] =
      (0 to t.length - 64 by 16)
        .map(i => TextFunctions.fnv1a64(t.substring(i, i + 64))).toSet
    assert((stride(a) intersect stride(b)).isEmpty,
      "fixed-stride windows at unaligned offsets must miss — the case " +
        "content anchoring exists for")
    // degenerate inputs
    assert(TextFunctions.anchoredWindowHashes(null, 64, 4, 16).isEmpty)
    assert(TextFunctions.anchoredWindowHashes("short", 64, 4, 16).isEmpty)
  }

  test("removeDuplicatedSpans excises a planted duplicated span, novel text survives") {
    // the same long span planted at DIFFERENT offsets in two docs,
    // wrapped in unique prose; a third doc shares nothing
    val span = "the quick brown fox jumps over the lazy dog repeatedly and often " * 3
    val aHead = "unique head of document alpha with its own words here "
    val aTail = " and a unique alpha tail that must survive the cut entirely"
    val bHead = "doc beta opens differently and much longer than alpha does here today "
    val bTail = " beta ends on its own novel closing words"
    val cText = "gamma is entirely novel text sharing no sixty-four character run " +
      "with anything else in this tiny corpus at all, padded to be long enough " +
      "that windows exist but none of them are duplicated anywhere"
    val df = Seq((1L, aHead + span + aTail), (2L, bHead + span + bTail),
      (3L, cText)).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // the unique doc passes through byte-identical, zero spans
    assert(got(3L)._2 == 0 && got(3L)._5 == cText)
    // both copies of the span lose it: no 64-char run of the span text
    // survives in either cleaned doc
    for (id <- Seq(1L, 2L)) {
      val (_, nSpans, removed, cleanLen, clean) = got(id)
      assert(nSpans >= 1, s"doc $id must carry at least one merged span")
      assert(removed >= span.length - 64,
        s"doc $id removed only $removed of a ${span.length}-char duplicated span")
      assert(cleanLen == clean.length)
      assert(!clean.contains(span.substring(0, 64)),
        s"doc $id still contains the duplicated span head")
    }
    // novel fringes survive: heads and tails are outside every anchored
    // window of the planted span (windows need 64 chars of context, so
    // up to window-1 chars of span fringe may also survive — that's the
    // documented recall shape, not a bug)
    assert(got(1L)._5.startsWith(aHead.substring(0, 40)))
    assert(got(1L)._5.endsWith(aTail.substring(aTail.length - 40)))
    assert(got(2L)._5.startsWith(bHead.substring(0, 40)))
    assert(got(2L)._5.endsWith(bTail.substring(bTail.length - 40)))
  }

  test("keep-one span removal: lowest id keeps the span, others lose it") {
    val span = "the quick brown fox jumps over the lazy dog repeatedly and often " * 3
    val df = Seq(
      (1L, "alpha head " + span + " alpha tail"),
      (2L, "longer beta heading text " + span + " beta tail"),
      (3L, "gamma prose " + span + " gamma close")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpansKeepOne(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is the keeper of every duplicated window: untouched
    assert(got(1L)._2 == 0 && got(1L)._5.contains(span),
      s"keeper doc must keep the span: ${got(1L)}")
    // docs 2 and 3 lose it
    for (id <- Seq(2L, 3L)) {
      assert(got(id)._3 >= span.length - 64,
        s"doc $id kept too much of the span: ${got(id)}")
      assert(!got(id)._5.contains(span.substring(0, 64)), s"doc $id")
    }
    // remove-all (q175 policy) on the same corpus guts ALL THREE —
    // the two policies must actually differ
    val all = Dedup.removeDuplicatedSpans(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(all(1L)._3 >= span.length - 64, all(1L).toString)
  }

  test("topDuplicatedWindows: planted banner owns the top, counts and example text line up") {
    val banner = " click here to accept cookies and subscribe to our " +
      "newsletter for the latest updates delivered straight to your inbox"
    val df = (1L to 9L).map { i =>
      val body = s"document number $i has its own unique body text " +
        (1 to 20).map(j => s"tok${i}x$j").mkString(" ")
      (i, if (i % 3 == 0) body + banner else body)
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup.topDuplicatedWindows(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty, "banner must anchor at least one shared window")
    // ordered by n_total desc, then example id/pos
    assert(got.sliding(2).forall(p => p.length < 2 || p(0)._1 >= p(1)._1))
    // the top rows are the banner family: present in all 3 banner docs,
    // once each, first occurrence in doc 3
    val top = got.head
    assert(top._1 == 3L && top._2 == 3L && top._3 == 3L, top.toString)
    // example text is the real 64-char window at the reported 1-based pos
    val texts = df.as[(Long, String)].collect().toMap
    got.foreach { r =>
      val expected = texts(r._3).substring(r._4.toInt - 1,
        math.min(r._4.toInt - 1 + 64, texts(r._3).length))
      assert(r._5 == expected, s"window_text mismatch at ${(r._3, r._4)}")
      assert(banner.contains(r._5) || r._1 >= 2)
    }
  }

  test("minhashAccuracyAudit: exact twin saturates, near pair lands in the error band") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four"
    val df = Seq(
      (1L, base),
      (2L, base),                                  // exact twin of 1
      (3L, base + " five six seven"),              // near-dup of 1
      (4L, "entirely different text with no shared three word shingle " +
        "anywhere inside it at all padded padded padded padded padded"))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.minhashAccuracyAudit(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // exact twins: all 128 slots match, exact jaccard 1.0
    val t = got((1L, 2L))
    assert(t._3 == 128L && t._4 == t._5 && t._7 == 1.0, t.toString)
    assert(t._6 == 1.0)
    // near pair: hand-count shingles — base has 28 3-shingles (30 words),
    // doc 3 appends 3 words → 31 shingles sharing all 28 → j = 28/31
    val n = got.get((1L, 3L)).orElse(got.get((2L, 3L)))
    assert(n.isDefined, s"near pair must be an LSH candidate: ${got.keySet}")
    assert(n.get._4 == 28L && n.get._5 == 31L, n.get.toString)
    assert(n.get._7 == math.round(28.0 / 31 * 1e6) / 1e6)
    // estimate within the 128-hash error band of the truth
    assert(math.abs(n.get._6 - n.get._7) < 0.15, n.get.toString)
    // the disjoint doc never pairs
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exciseContaminatedSpans cuts leaked eval text, leaves clean docs intact") {
    val evalText = "benchmark question: what is the airspeed velocity of an " +
      "unladen swallow given standard atmospheric conditions and wingspan " * 2
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")
    val contaminated = "training doc opens with its own prose before leaking " +
      evalText + " and then continues with novel training content afterwards"
    val clean = "a fully clean training document sharing no sixty-four " +
      "character window with the benchmark suite, long enough that anchored " +
      "windows exist inside it but none of them appear in the eval index"
    val train = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val got = Dedup.exciseContaminatedSpans(train, evalSet, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // the clean doc passes through byte-identical
    assert(got(2L)._2 == 0 && got(2L)._5 == clean)
    // the contaminated doc loses the leaked passage but keeps its fringes
    val (_, nSpans, removed, cleanLen, cleaned) = got(1L)
    assert(nSpans >= 1, s"contaminated doc must carry a span: ${got(1L)}")
    assert(removed >= evalText.length - 64,
      s"removed only $removed of a ${evalText.length}-char leak")
    assert(cleanLen == cleaned.length)
    assert(!cleaned.contains(evalText.substring(0, 64)),
      "leaked benchmark head survived the cut")
    assert(cleaned.startsWith("training doc opens"))
    assert(cleaned.endsWith("training content afterwards"))
    // unlike remove-all span dedup, the eval set itself is untouched: the
    // operator reads it only as an index (nothing to assert on output —
    // the output ids are exactly the training ids)
    assert(got.keySet == Set(1L, 2L))
  }

  test("anchoredWindowSpans positions+hashes agree with anchoredWindowHashes") {
    val texts = Seq(
      ("x" * 9) + ("the quick brown fox jumps over the lazy dog " * 4) + " end",
      "padded but unique " * 10,
      "café au lait " * 20) // non-ASCII: exercises the fallback path
    for (t <- texts) {
      val spans = TextFunctions.anchoredWindowSpans(t, 64, 4, 16)
      val hashes = TextFunctions.anchoredWindowHashes(t, 64, 4, 16)
      assert(spans.map(_.h).toSeq == hashes.toSeq)
      // every reported position re-hashes to the reported hash via the
      // original per-substring fold (pins the ASCII byte-array fast
      // path to the reference semantics)
      for (s <- spans)
        assert(TextFunctions.fnv1a64(t.substring(s.pos, s.pos + 64)) == s.h)
    }
    assert(TextFunctions.anchoredWindowSpans(null, 64, 4, 16).isEmpty)
    assert(TextFunctions.anchoredWindowSpans("short", 64, 4, 16).isEmpty)
  }

  test("modulo=1 rolling polynomial hash equals the direct fold at every position") {
    // adversarial shapes: long repeats (rolling subtraction hits equal
    // bytes), 0xFF-adjacent chars (Long overflow wraps), short-window
    // boundaries, and a non-ASCII text (substring-fallback path)
    val texts = Seq(
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog " * 3,
      (0 until 200).map(i => (32 + (i * 37) % 95).toChar).mkString,
      "~~" * 30,
      "café au lait " * 10) // non-ASCII fallback
    for (t <- texts; w <- Seq(4, 32)) {
      val rolled = TextFunctions.anchoredWindowHashes(t, w, 4, 1)
      assert(rolled.length == t.length - w + 1,
        s"modulo=1 must emit every position (len=${t.length}, w=$w)")
      val direct = (0 to t.length - w).map { i =>
        val b = t.substring(i, i + w)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        TextFunctions.polyRange(b, 0, b.length)
      }
      assert(rolled.toSeq == direct,
        s"rolling recurrence diverged from the direct polynomial fold (w=$w)")
    }
    // spans form agrees on the same kernel
    val t = "exactly repeated text exactly repeated text tail"
    val spans = TextFunctions.anchoredWindowSpans(t, 8, 4, 1)
    assert(spans.map(_.h).toSeq ==
      TextFunctions.anchoredWindowHashes(t, 8, 4, 1).toSeq)
  }

  test("langId picks the language whose markers dominate") {
    val samples = Seq(
      ("the cat and the dog is in a house", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("le chat est dans les jardins", "fr"),
      ("el perro es un animal que no se ve", "es"),
      ("xyz qrs tuv", "und")).toDF("text", "expected")
    val got = samples.select(col("expected"),
      TextFunctions.langId(col("text")).as("got"))
      .filter(col("expected") =!= col("got")).count()
    assert(got == 0)
  }
}
