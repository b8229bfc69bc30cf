package graft

import org.apache.spark.sql.functions._

import graft.functions.CharLangId

/** Char-n-gram language-ID: real discrimination on a synthetic
  * multilingual corpus (confusion matrix), fit determinism, tie and
  * empty-input behavior. */
class CharLangIdSpec extends SparkSuite {
  import spark.implicits._

  // three synthetic "languages" with genuinely different character
  // distributions; generator is deterministic (no RNG)
  private val stems = Map(
    "aa" -> Seq("thorn", "thatch", "wrench", "strength", "church", "knight"),
    "bb" -> Seq("zzimba", "nzuzzo", "mzizzi", "zanza", "uzzu", "izzo"),
    "cc" -> Seq("lalolu", "melina", "solara", "veluna", "ralome", "naluva"))

  private def doc(lang: String, seed: Int): String = {
    val s = stems(lang)
    (0 until 30).map(i => s((seed * 7 + i * 3) % s.size)).mkString(" ")
  }

  private def corpus(docsPerLang: Int) = {
    val langs = stems.keys.toSeq.sorted
    (for {
      (lang, li) <- langs.zipWithIndex
      i <- 0 until docsPerLang
    } yield (li.toLong * 1000 + i, doc(lang, i), lang))
      .toDF("doc_id", "text", "lang")
  }

  test("confusion matrix is diagonal on held-out synthetic docs") {
    val train = corpus(40)
    val p = CharLangId.fit(train, "doc_id", "text", "lang",
      sampleDocs = 120, topGrams = 32)
    assert(p.byLang.keySet == stems.keySet)
    // held-out docs: unseen seeds → unseen stem mixes, same distributions
    val held = stems.keys.toSeq.sorted.flatMap(l =>
      (100 until 110).map(i => (l, doc(l, i))))
    held.foreach { case (truth, text) =>
      val (pred, score) = CharLangId.classify(text, p)
      assert(pred == truth,
        s"doc of '$truth' predicted '$pred' (score $score)")
      assert(score > 0)
    }
  }

  test("fit is independent of partitioning and repeatable") {
    val c = corpus(20)
    val a = CharLangId.fit(c, "doc_id", "text", "lang", 50, 32)
    val b = CharLangId.fit(c.repartition(7), "doc_id", "text", "lang", 50, 32)
    assert(a.byLang == b.byLang)
  }

  test("no alpha content → 'und' with zero score") {
    val p = CharLangId.fit(corpus(5), "doc_id", "text", "lang", 15, 32)
    assert(CharLangId.classify("12345 !!! 67", p) == ("und", 0L))
    assert(CharLangId.classify(null, p) == ("und", 0L))
    assert(CharLangId.classify("", p) == ("und", 0L))
  }

  test("score ties break to the lexicographically smallest language") {
    // two langs with IDENTICAL training text → identical profiles →
    // every scored doc ties; prediction must be the smaller lang name
    val twin = (0 until 10).flatMap(i =>
      Seq((i.toLong, "solara veluna melina", "xx"),
        (100L + i, "solara veluna melina", "yy")))
      .toDF("doc_id", "text", "lang")
    val p = CharLangId.fit(twin, "doc_id", "text", "lang", 20, 32)
    val (pred, score) = CharLangId.classify("solara melina", p)
    assert(pred == "xx" && score > 0, s"got ($pred, $score)")
  }

  test("classifyCol matches the kernel through the Spark plan") {
    val c = corpus(10)
    val p = CharLangId.fit(c, "doc_id", "text", "lang", 30, 32)
    val got = c.select(col("doc_id"), col("text"),
        CharLangId.classifyCol(col("text"), p).as("v"))
      .select(col("doc_id"), col("text"), col("v")("_1").as("pred"))
      .as[(Long, String, String)].collect()
    got.foreach { case (_, text, pred) =>
      assert(pred == CharLangId.classify(text, p)._1)
    }
  }
}
