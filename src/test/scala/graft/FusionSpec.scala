package graft

import graft.operators.Fusion

/** Reciprocal-rank fusion: hand-computed integer weights, overlap vs
  * single-leg candidates, deterministic tie-break. */
class FusionSpec extends SparkSuite {
  import spark.implicits._

  test("RRF hand-computed: overlap beats either single leg") {
    // leg A ranks: n1=1, n2=2; leg B ranks: n2=1, n3=2
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("qid", "nid", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("qid", "nid", "rank")
    val got = Fusion.rrfTopK(Seq(a, b), k = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    val w1 = 1000000000L / 61 // rank 1
    val w2 = 1000000000L / 62 // rank 2
    assert(got.toSeq == Seq(
      (1L, 20L, w2 + w1, 1), // in both legs: 1/62 + 1/61 — the winner
      (1L, 10L, w1, 2),      // leg-A only, rank 1
      (1L, 30L, w2, 3)))     // leg-B only, rank 2
  }

  test("equal fused scores break to the smaller nid") {
    val a = Seq((1L, 50L, 1), (1L, 40L, 2)).toDF("qid", "nid", "rank")
    val b = Seq((1L, 40L, 1), (1L, 50L, 2)).toDF("qid", "nid", "rank")
    val got = Fusion.rrfTopK(Seq(a, b), k = 2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // both candidates: 1/61 + 1/62 — exact tie → nid ascending
    assert(got.map(_._2).toSeq == Seq(40L, 50L))
    assert(got(0)._3 == got(1)._3)
  }

  test("k truncates the fused list per query independently") {
    val a = (1 to 5).map(r => (1L, r.toLong, r)) ++
      (1 to 2).map(r => (2L, 100L + r, r))
    val got = Fusion.rrfTopK(Seq(a.toDF("qid", "nid", "rank")), k = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.count(_._1 == 1L) == 3 && got.count(_._1 == 2L) == 2)
  }

  test("assembleContext: doc dedup keeps the best-ranked chunk; prefix stop at the budget") {
    val S = 1L << 20
    // q1 ranking: doc7/chunk0 (rank1, 100 tok), doc7/chunk1 (rank2 —
    // SAME doc, must drop), doc8/chunk2 (rank3, 150), doc9/chunk0
    // (rank4, 200 — overflows 300 budget → stops; doc5 rank5 of 10
    // tokens would fit but prefix semantics exclude it)
    val ranked = Seq(
      (1L, 7L * S + 0, 1), (1L, 7L * S + 1, 2), (1L, 8L * S + 2, 3),
      (1L, 9L * S + 0, 4), (1L, 5L * S + 0, 5),
      (2L, 3L * S + 4, 1)
    ).toDF("qid", "nid", "rank")
    val toks = Seq(
      (7L * S + 0, 100L), (7L * S + 1, 90L), (8L * S + 2, 150L),
      (9L * S + 0, 200L), (5L * S + 0, 10L), (3L * S + 4, 42L)
    ).toDF("chunk_key", "chunk_tokens")
    val got = Fusion.assembleContext(ranked, toks, budgetTokens = 300)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val q1 = got.filter(_._1 == 1L)
    assert(q1.map(_._3).toSeq == Seq(7L * S + 0, 8L * S + 2),
      s"doc-dedup + prefix stop: ${q1.toSeq}")
    assert(q1.map(_._6).toSeq == Seq(100L, 250L), "running sums")
    assert(q1.map(_._4).toSeq == Seq(7L, 8L), "parent doc ids")
    val q2 = got.filter(_._1 == 2L)
    assert(q2.map(_._3).toSeq == Seq(3L * S + 4) && q2.head._2 == 1L)
  }
}
