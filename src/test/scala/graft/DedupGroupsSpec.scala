package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupGroups

/** Star-contraction connected components: correctness on adversarial
  * shapes and the O(log n) round bound that motivated the algorithm
  * (min-label propagation needs DIAMETER rounds — 50 for a 50-chain). */
class DedupGroupsSpec extends SparkSuite {
  import spark.implicits._

  test("a 50-element chain converges in O(log n) rounds, not O(n)") {
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("idA", "idB")
    val (labels, rounds) = DedupGroups.connectedComponentsWithStats(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 50)
    assert(got.values.forall(_ == 0L), "every chain node labels to the min")
    // diameter is 49; star contraction must be logarithmic (≈2·log₂ 50 ≈ 11
    // plus the fixed-point confirmation round)
    assert(rounds <= 12, s"chain took $rounds rounds — not logarithmic")
  }

  test("mixed shapes: chain + clique + singleton-pair, disjoint labels") {
    val chain = (100L until 110L).map(i => (i, i + 1))
    val clique = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val pair = Seq((1000L, 2000L))
    val pairs = (chain ++ clique ++ pair).toDF("idA", "idB")
    val got = DedupGroups.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((100L to 110L).forall(got(_) == 100L))
    assert((0L until 5L).forall(got(_) == 0L))
    assert(got(1000L) == 1000L && got(2000L) == 1000L)
    assert(got.size == 11 + 5 + 2)
  }

  test("pair order / duplicates / self-loops do not affect the labels") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L), (3L, 2L))
      .toDF("idA", "idB")
    val got = DedupGroups.connectedComponents(messy)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields an empty label set") {
    val empty = Seq.empty[(Long, Long)].toDF("idA", "idB")
    assert(DedupGroups.connectedComponents(empty).count() == 0)
  }
}
