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

  test("mergeBatch: a new doc bridging two existing groups merges them") {
    // registry: {1,2} (rep 1), {5,6} (rep 5), singleton {9}
    val registry = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (9L, 9L))
      .toDF("id", "groupId")
    // new doc 10 matches a NON-rep member of each group — the contraction
    // must route both edges through the reps and merge to min(1,5)=1
    val batch = Seq((10L, 2L), (10L, 6L)).toDF("idA", "idB")
    val got = DedupGroups.mergeBatch(registry, batch)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 5L, 6L, 10L).forall(got(_) == 1L),
      s"bridge must merge both groups: $got")
    assert(got(9L) == 9L, "untouched groups pass through unrelabeled")
    assert(got.size == 6)
  }

  test("mergeBatch: incremental result equals full recompute") {
    // epoch edges + batch edges, vs CC over the union — the defining
    // property of the incremental algorithm (q161's gate in miniature)
    val epochEdges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("idA", "idB")
    val allIds = Seq(1L, 2L, 3L, 7L, 8L).toDF("id")
    val registry = allIds
      .join(DedupGroups.connectedComponents(epochEdges), Seq("id"), "left")
      .select(col("id"), coalesce(col("groupId"), col("id")).as("groupId"))
    // batch: new-new pair (20,21), new doc 22 joining {7,8}, late
    // existing-existing edge (3,7) merging {1,2,3} with {7,8}
    val batch = Seq((20L, 21L), (22L, 8L), (3L, 7L)).toDF("idA", "idB")
    val inc = DedupGroups.mergeBatch(registry, batch)
      .as[(Long, Long)].collect().toMap
    val full = DedupGroups.connectedComponents(
        epochEdges.unionByName(batch))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"incremental $inc != full recompute $full")
    assert(inc(22L) == 1L && inc(20L) == 20L && inc(21L) == 20L)
  }

  test("mergeBatch: batch with only new-new edges leaves the registry intact") {
    val registry = Seq((1L, 1L), (2L, 1L)).toDF("id", "groupId")
    val batch = Seq((30L, 31L)).toDF("idA", "idB")
    val got = DedupGroups.mergeBatch(registry, batch)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 30L -> 30L, 31L -> 30L))
  }

  test("groupRegistry split is group-atomic: no duplicate edge ever crosses the boundary") {
    import org.apache.spark.sql.functions._
    // exact-copy pairs, a near-dup CHAIN (1~2~3 via shared shingles),
    // and singletons — the structures a per-doc hash split would break
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "beta gamma delta epsilon zeta eta iota kappa"),
      (10L, "completely different text about other things entirely"),
      (11L, "completely different text about other things entirely"),
      (20L, "a lone singleton document with its own words here"),
      (21L, "another unrelated standalone piece of text content")
    ).toDF("doc_id", "text")
    val reg = DedupGroups.groupRegistry(docs, "doc_id", "text",
      jaccardThreshold = 0.5)
    val byId = reg.as[(Long, Long)].collect().toMap
    // chain closes transitively; exact copies group; singletons self-map
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L)
    assert(byId(10L) == 10L && byId(11L) == 10L)
    assert(byId(20L) == 20L && byId(21L) == 21L)
    // the invariant the operator exists for: same group ⇒ same split,
    // so NO duplicate relation can cross the train/eval boundary
    val mixU = udf((g: Long) => java.lang.Long.remainderUnsigned(
      graft.functions.TextFunctions.mix64(g), 10L))
    val split = reg.select(col("id"), col("group_id"),
        when(mixU(col("group_id")) < 8, "train").otherwise("eval").as("split"))
      .as[(Long, Long, String)].collect()
    split.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"a group split across the boundary: ${members.toSeq}")
    }
  }

  test("keepBestByQuality: quality inverts min-id; exact ties fall back to min-id") {
    // words repeated so near-dup shingles overlap; 'zzqq'/'xxpp' are
    // corpus-rare → higher surprisal for the docs carrying them
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, base + " zzqq xxpp"), // degraded copy at the LOW id
      (11L, base),               // clean original at the HIGH id
      (20L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"),
      (21L, "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"), // exact twin
      (30L, "solo document with entirely unshared vocabulary tokens here"),
    ).toDF("doc_id", "text")
    val kept = DedupGroups.keepBestByQuality(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(kept.keySet == Set(11L, 20L, 30L), s"kept: $kept")
    val inv = kept(11L)
    assert(inv._3 == 1L && inv._4 == 2L,
      s"the {1, 11} group must keep the CLEAN high id over min-id 1: $inv")
    assert(kept(20L)._3 == 20L && kept(20L)._4 == 2L,
      "exact twins tie on surprisal and fall back to min-id")
    assert(kept(30L)._4 == 1L, "singleton keeps itself")
  }

  test("keepBestByQuality: token-less members still count and all-empty groups still keep one (r14 advice)") {
    // the classic mass-duplicate case: a group of EMPTY docs. The old
    // inner join to the surprisal table (which has no row for zero-token
    // docs) emitted no keeper at all for {40,41} and undercounted {1,2}.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, ""),   // token-less — joins no surprisal row
      (40L, ""),  // all-empty exact-dup pair: must still keep one
      (41L, "")
    ).toDF("doc_id", "text")
    val kept = DedupGroups.keepBestByQuality(corpus, "doc_id", "text")
      .select("id", "group_id", "min_id", "n_members")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // empty docs are exact dups of each other: {2,40,41} one group
    assert(kept.contains(1L), s"kept: $kept")
    val emptyKeeper = kept.filterNot(_._1 == 1L)
    assert(emptyKeeper.size == 1, s"exactly one keeper for the empty group: $kept")
    val (_, (kid, _, minId, n)) = emptyKeeper.head
    assert(kid == 2L && minId == 2L && n == 3L,
      s"empty group keeps min-id 2 of 3 members: $kept")
    // the keeper's mean is null (no surprisal defined), not a sentinel
    val keptMean = DedupGroups.keepBestByQuality(corpus, "doc_id", "text")
      .filter(col("id") === 2L).select("kept_mean")
      .collect().head
    assert(keptMean.isNullAt(0), s"kept_mean must be null, got $keptMean")
  }

  test("cleanSplit: group-atomic, dirty eval docs repaired into train, audit columns") {
    // 40 base docs with +1000 exact twins; a 13-token disclaimer on
    // ids %4==0 (and twins) crosses groups
    val disc = " this content is provided as is without any warranty of any kind express"
    def body(i: Long) = s"document $i body " +
      (1 to 16).map(j => s"w${i}x$j").mkString(" ")
    val rows = (1L to 40L).flatMap { i =>
      val t = if (i % 4 == 0) body(i) + disc else body(i)
      Seq((i, t), (i + 1000L, t))
    }
    val got = graft.operators.DedupGroups
      .cleanSplit(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 80)
    // twins share a group and therefore a split0 (group atomicity)
    (1L to 40L).foreach { i =>
      assert(got(i)._2 == got(i + 1000L)._2, s"twin group $i")
      assert(got(i)._3 == got(i + 1000L)._3, s"twin split $i")
    }
    // every planted doc that landed eval is moved to train; the final
    // eval side carries no disclaimer doc
    val planted = got.values.filter(r => r._1 % 1000 % 4 == 0)
    assert(planted.exists(_._3 == "eval") || planted.forall(_._3 == "train"))
    planted.filter(_._3 == "eval").foreach { r =>
      assert(r._5 == 1L && r._4 == "train", r.toString) }
    // unplanted docs never move (bodies are unique, no shared 13-gram)
    got.values.filter(r => r._1 % 1000 % 4 != 0).foreach { r =>
      assert(r._5 == 0L && r._4 == r._3, r.toString) }
  }

  test("dedupImpact: exact-twin corpus reads dup_frac 0.5, tokens halve, singleton source 0") {
    val rows = Seq(
      (1L, "a", "one two three four"), (11L, "a", "one two three four"),
      (2L, "a", "five six seven eight nine"), (12L, "a", "five six seven eight nine"),
      (3L, "b", "a singleton document with no twin at all anywhere"))
    val got = graft.operators.DedupGroups
      .dedupImpact(rows.toDF("doc_id", "src", "text"), "doc_id", "text", "src")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 4L, 2L, 18L, 9L, 0.5)), got("a").toString)
    assert(got("b") == (("b", 1L, 1L, 9L, 9L, 0.0)), got("b").toString)
  }
}
