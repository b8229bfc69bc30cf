package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dsir

/** DSIR importance resampling: the gram-bucket kernel, the
  * scale-invariance of the N/B pseudocount smoothing, a hand-computed
  * lam, and the selection dial. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  test("gramBuckets: unigram∪bigram bag with multiplicity, in order") {
    val got = Dsir.gramBuckets("a b a")
    def b(s: String) =
      java.lang.Long.remainderUnsigned(TextFunctions.fnv1a64(s), Dsir.Buckets)
    assert(got.toSeq == Seq(b("a"), b("b"), b("a"), b("a b"), b("b a")),
      "3 unigrams (duplicate 'a' kept twice) + 2 bigrams")
    assert(Dsir.gramBuckets(null).isEmpty)
    assert(Dsir.gramBuckets("   ").isEmpty)
    assert(Dsir.gramBuckets("solo").toSeq ==
      Seq(b("solo")), "single word → one unigram, no bigram")
    assert(got.forall(x => x >= 0 && x < Dsir.Buckets))
  }

  test("smoothing is corpus-size invariant: equal-rate grams get lam 0") {
    // target = 1 copy, raw = 10 copies of the SAME doc: every bucket
    // has cT/T == cR/R, so every lam_micro must be exactly 0 even at
    // 10:1 corpus asymmetry (the add-one form would read +ln(10) per
    // rare gram — the measured defect that motivated N/B smoothing).
    val doc = "alpha beta gamma delta epsilon"
    val target = Seq((1L, doc)).toDF("id", "text")
    val raw = (1L to 10L).map(i => (i, doc)).toDF("id", "text")
    val lam = Dsir.importanceTable(raw, target, "id", "text")
      .select("lam_micro").as[Long].collect()
    assert(lam.nonEmpty && lam.forall(_ == 0L))
  }

  test("hand-computed lam_micro for a one-word divergence") {
    // target: "x x x y" (T=4 unigrams + 3 bigrams = 7 grams)
    // raw:    "x y y y" (R=7 grams)
    val target = Seq((1L, "x x x y")).toDF("id", "text")
    val raw = Seq((2L, "x y y y")).toDF("id", "text")
    val lam = Dsir.importanceTable(raw, target, "id", "text")
      .select("bucket", "lam_micro").as[(Long, Long)].collect().toMap
    def b(s: String) =
      java.lang.Long.remainderUnsigned(TextFunctions.fnv1a64(s), Dsir.Buckets)
    val B = Dsir.Buckets
    def expect(ct: Long, cr: Long): Long =
      math.round(math.log(((ct * B + 7L) * 7L).toDouble
        / ((cr * B + 7L) * 7L).toDouble) * 1e6)
    assert(lam(b("x")) == expect(3, 1))
    assert(lam(b("y")) == expect(1, 3))
    assert(lam(b("x x")) == expect(2, 0)) // target-only bigram
    assert(lam(b("y y")) == expect(0, 2)) // raw-only bigram
    assert(lam(b("x y")) == expect(1, 1))
  }

  test("selectTopK ranks target-flavored raw docs first, total order") {
    val flavor = " nova quasar pulsar"
    val base = (1L to 40L).map(i => (i, s"common words doc number item $i"))
    val target = (101L to 110L).map(i => (i, s"common words doc number item $i$flavor"))
      .toDF("id", "text")
    val raw = base.map { case (i, t) =>
      (i, if (i % 4 == 0) t + flavor else t)
    }.toDF("id", "text")
    val top = Dsir.selectTopK(raw, target, "id", "text", k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(top.map(_._1).toSeq == (1L to 10L), "ranks are 1..k")
    val flavored = top.filter(_._2 % 4 == 0)
    assert(flavored.length == 10,
      s"all 10 flavored raw docs outrank every unflavored one: $top")
    // scores non-increasing, ties broken by id ascending
    top.sliding(2).foreach { case Array(a, c) =>
      assert(a._4 > c._4 || (a._4 == c._4 && a._2 < c._2))
    }
  }
}
