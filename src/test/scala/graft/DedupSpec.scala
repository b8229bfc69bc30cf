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
