package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive duplicate groups: connected components over the near-dup
  * pair graph, so A~B and B~C land in ONE group even when A~C was never
  * a candidate pair (the keep-smallest-id rule in Dedup.dedupeCorpus is
  * greedy/local; this is the exact closure).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard scale-out CC. Each round:
  *   - large-star: every node links its LARGER neighbors to the minimum
  *     of its neighborhood (incl. itself);
  *   - small-star: every node links its smaller neighbors (and itself)
  *     to the minimum of that set.
  * Both preserve connectivity and strictly shrink tree height; the edge
  * set converges to one star per component rooted at the component min in
  * O(log n) rounds — unlike min-label propagation, whose round count is
  * the graph DIAMETER (data-dependent: a chain of k near-dup edits needs
  * k rounds; this needs ~log k).
  *
  * Per round: two groupBy+join pairs on the edge list (each join keyed on
  * the groupBy key, so the aggregated side reuses the exchange), one
  * `localCheckpoint` to truncate the growing plan lineage, and ONE
  * aggregate computing a (count, hash-sum) signature — convergence is
  * detected by signature equality, not by a separate join+count over the
  * previous labels.
  */
object DedupGroups {

  /** @param pairs (idA, idB) candidate/verified duplicate pairs
    * @param maxIter safety cap; star-contraction needs ~log₂(largest
    *        component) rounds, so the default is generous for any
    *        realistic graph (2^20-node chains). Hitting the cap without
    *        convergence logs a warning — the result then over-keeps
    *        (components split), never over-drops.
    * @param localEdgeLimit edge-count threshold below which the closure is
    *        finished with driver-side union-find instead of distributed
    *        star rounds. The pair graph reaching CC has ALREADY been
    *        LSH-pruned and similarity-verified — duplicate edges, not raw
    *        rows — so it is usually orders of magnitude smaller than the
    *        corpus; 4M edges ≈ 64 MB collected. Union-find is O(E α(E))
    *        in one job's worth of latency, where each star round costs ~4
    *        scheduled jobs (the q77 bench floor was round latency, not
    *        compute). Larger graphs take the star path unchanged.
    * @return (id, groupId) for every id that appears in a pair; groupId =
    *         min id of its connected component */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      localEdgeLimit: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = pairs.schema("idA").dataType
    val integral = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!integral) return connectedComponentsWithStats(pairs, maxIter)._1
    // keep self-loop pairs here: `nodeIds` must cover ids that appear
    // ONLY in (x, x) pairs, and deriving both edges and nodes from this
    // one cached frame means the (potentially expensive) upstream pair
    // pipeline — LSH + verification in dedupeTransitive — is evaluated
    // once, not once per action
    val canonical = pairs
      .select(greatest(col("idA"), col("idB")).cast("long").as("a"),
        least(col("idA"), col("idB")).cast("long").as("b"))
      .distinct()
      .persist()
    try {
      if (canonical.filter(col("a") =!= col("b")).count() > localEdgeLimit)
        return connectedComponentsWithStats(pairs, maxIter)._1
      val spark = pairs.sparkSession
      import spark.implicits._
      val edges = canonical.filter(col("a") =!= col("b"))
        .as[(Long, Long)].collect()
      val nodeIds = canonical.select(col("a"))
        .unionAll(canonical.select(col("b")))
        .distinct().as[Long].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        // union by min id: the smaller root stays root, so find() yields
        // the component minimum directly — same contract as the star path
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      // parallelize, don't toDF: a Seq-backed LocalRelation embeds every
      // row in the logical plan — at the 4M-edge crossover that is ~8M
      // boxed tuples of driver heap and plan-serialization cost
      val labels = nodeIds.map(n => (n, find(n)))
      val parts = math.max(1, labels.length / 500000)
      spark.sparkContext.parallelize(labels.toSeq, parts)
        .toDF("id", "groupId")
        .select(col("id").cast(idType).as("id"),
          col("groupId").cast(idType).as("groupId"))
    } finally canonical.unpersist()
  }

  /** As [[connectedComponents]], also returning the number of star rounds
    * executed (exposed so specs can pin the O(log n) bound). */
  def connectedComponentsWithStats(pairs: DataFrame, maxIter: Int = 20)
      : (DataFrame, Int) = {
    // canonical child→parent edges: (a, b) with a > b
    val initial = pairs
      .select(greatest(col("idA"), col("idB")).as("a"),
        least(col("idA"), col("idB")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // every id of the ORIGINAL pair set — final labels are computed over
    // this, so the output contract (one row per paired id) holds even at
    // a non-converged cap exit
    val nodes = pairs.select(col("idA").as("id"))
      .unionAll(pairs.select(col("idB").as("id")))
      .distinct()
      .localCheckpoint(true)

    var edges = initial.localCheckpoint(true)
    var sig: (Long, Long) = signature(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: center u over ALL neighbors, m = min(Γ(u) ∪ {u});
      // emit (v, m) for each larger neighbor v > u. Output edges keep
      // a > b canonical form (v > u ≥ m).
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val lsMin = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = sym.join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()

      // small-star: edges are (a, b) with b < a, so center a's smaller
      // neighborhood is exactly its b's; m = min(b's). Emit (b, m) for
      // every smaller neighbor plus (a, m).
      val ssMin = large.groupBy("a").agg(min(col("b")).as("m"))
      val small = large.join(ssMin, Seq("a"))
        .select(col("b").as("a2"), col("m"))
        .unionAll(ssMin.select(col("a").as("a2"), col("m")))
        .filter(col("a2") =!= col("m"))
        .select(col("a2").as("a"), col("m").as("b"))
        .distinct()

      val prev = edges
      // truncate lineage + cache in one go: without this the logical plan
      // doubles every round and analysis time dominates by round ~10
      edges = small.localCheckpoint(true)
      prev.unpersist()
      val nextSig = signature(edges)
      converged = nextSig == sig
      sig = nextSig
      i += 1
    }
    if (!converged)
      System.err.println(s"[DedupGroups] star contraction hit maxIter=$maxIter " +
        "without converging — components may be split (over-kept, never over-dropped)")

    // at the star fixed point each child a has exactly one parent b = the
    // component min; min() also degrades safely at a cap exit
    val children = edges.groupBy(col("a"))
      .agg(min(col("b")).as("groupId"))
      .select(col("a").as("id"), col("groupId"))
    val labels = nodes.join(children, Seq("id"), "left")
      .select(col("id"), coalesce(col("groupId"), col("id")).as("groupId"))
    (labels, i)
  }

  /** One-job convergence probe: (edge count, sum of 32-bit edge hashes).
    * Equal signatures across a round ⇒ same edge set (hash collisions
    * would need the count AND the sum to collide simultaneously). */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(count(lit(1)),
      coalesce(sum(hash(col("a"), col("b")).cast("long")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Incremental group maintenance — the daily-ingest continuation of
    * the dedup registry (the reference's whole design is incremental
    * re-runs, `FinishedFilterProcessor.kt:17-27`; this is that pattern
    * applied to dedup groups): merge a NEW batch's duplicate edges into
    * an EXISTING (id, groupId) registry without recomputing the full
    * historical pair graph.
    *
    * Contraction argument: each existing group is already a closed
    * component rooted at its min id, so for connectivity it can be
    * collapsed to its representative (the groupId). Mapping every new
    * edge endpoint to its rep (itself if unregistered) yields a
    * contracted graph whose components are EXACTLY the merged
    * components' rep sets, and whose component minima are the merged
    * components' minima (reps are group minima; new ids are their own
    * reps). Full CC therefore runs only over the contracted edge set —
    * bounded by the BATCH, never the corpus.
    *
    * Result equals a full recompute over existing ∪ incoming iff the
    * registry was the closure of the existing-existing edges and
    * `newPairs` covers every edge a full recompute would find with ≥1
    * incoming endpoint — both hold for deterministic per-doc candidate
    * generation ([[Dedup.incrementalLshPairs]]: band signatures are
    * per-doc, so the combined corpus's candidate set is exactly
    * existing-existing ∪ batch-touched).
    *
    * Shuffle shape at 100 TB: the contracted CC is batch-sized; the one
    * registry-sized operation is the relabel join, keyed on groupId
    * against a TOUCHED-groups-only map (bounded by batch edges, hence
    * broadcast). A batch pathological enough to touch ≥10^8 groups
    * should drop the broadcast hint and bucketize the registry on
    * groupId instead.
    *
    * @param labels existing registry (id, groupId), groupId = component
    *        min id; must be a closed assignment (every groupId is also
    *        an id in its own group)
    * @param newPairs (idA, idB) batch edges — ≥1 endpoint new, or late
    *        edges between existing docs (also handled: they contract to
    *        a rep-rep edge and merge the two groups)
    * @return updated registry over ids(labels) ∪ endpoints(newPairs) */
  def mergeBatch(labels: DataFrame, newPairs: DataFrame, maxIter: Int = 20,
      localEdgeLimit: Long = 4000000L): DataFrame = {
    val reps = labels.select(col("id"), col("groupId"))
    val contracted = newPairs
      .join(reps.select(col("id").as("idA"), col("groupId").as("repA")),
        Seq("idA"), "left")
      .join(reps.select(col("id").as("idB"), col("groupId").as("repB")),
        Seq("idB"), "left")
      .select(coalesce(col("repA"), col("idA")).as("idA"),
        coalesce(col("repB"), col("idB")).as("idB"))
    // CC over touched reps + new ids only; (rep → merged-component min).
    // Read twice below (relabel + new-id lookup) and batch-small —
    // eager localCheckpoint materializes it once and lets the returned
    // plan own the data (no persist handle to leak past return)
    val cc = connectedComponents(contracted, maxIter, localEdgeLimit)
      .localCheckpoint(true)
    // relabel map is touched-groups-sized → broadcast against the
    // (corpus-sized) registry; untouched groups pass through
    val relabel = cc.select(col("id").as("groupId"), col("groupId").as("newG"))
    val updated = labels
      .join(broadcast(relabel), Seq("groupId"), "left")
      .select(col("id"), coalesce(col("newG"), col("groupId")).as("groupId"))
    // unregistered endpoints: their rep is themselves → label directly
    val newIds = newPairs.select(col("idA").as("id"))
      .unionByName(newPairs.select(col("idB").as("id")))
      .distinct()
      .join(labels.select(col("id")), Seq("id"), "left_anti")
    val newLabels = newIds
      .join(broadcast(cc.select(col("id"), col("groupId").as("newG"))),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("newG"), col("id")).as("groupId"))
    updated.unionByName(newLabels)
  }

  /** Full closure dedup: groups from the verified near-dup pair graph
    * UNION the exact-hash pair graph (LSH filters shingle-less short
    * docs, so exact duplicates below shingleSize words would otherwise
    * escape the closure); survivors = every unpaired doc + one keeper
    * (min id) per group. */
  /** The duplicate-edge set (near ∪ exact) dedupeTransitive closes
    * over — exposed so group-level consumers share the exact relation. */
  private def dupEdges(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double): DataFrame = {
    val near = Dedup.ngramJaccard(
        Dedup.minhashLshPairs(df, idCol, textCol), df, idCol, textCol)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("idA"), col("idB"))
    val exact = df
      .select(sha2(col(textCol), 256).as("h"), col(idCol).as("id"))
      .groupBy(col("h")).agg(min(col("id")).as("idA"),
        collect_list(col("id")).as("ids"))
      .select(col("idA"), explode(col("ids")).as("idB"))
      .filter(col("idA") =!= col("idB"))
    near.unionByName(exact)
  }

  /** Full (id, group_id) duplicate-group registry over the corpus:
    * connected components of the near ∪ exact edge relation, singletons
    * mapped to themselves — the group-ATOMIC view a leakage-safe
    * train/eval splitter hashes instead of per-doc ids (splitting by
    * doc would strand a near-dup pair across the split boundary and
    * leak training text into eval). */
  def groupRegistry(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, maxIter: Int = 20): DataFrame = {
    val groups = connectedComponents(
      dupEdges(df, idCol, textCol, jaccardThreshold), maxIter)
    df.select(col(idCol).as("id"))
      .join(groups, Seq("id"), "left")
      .select(col("id"), coalesce(col("groupId"), col("id")).as("group_id"))
  }

  /** DEDUP IMPACT REPORT — the before/after accounting a curation run
    * publishes: per `groupCol` (source/domain), document and token
    * counts before dedup, after keep-one (the min-id member of each
    * duplicate group survives — group label == min id by construction
    * of the min-label closure), and the duplicate fraction. One
    * id-keyed join of the registry onto per-doc token counts, then a
    * per-group combiner aggregation — no new shuffle class beyond the
    * registry itself.
    *
    * @return (group, n_before, n_after, toks_before, toks_after,
    *         dup_frac) */
  def dedupImpact(corpus: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val reg = groupRegistry(corpus, idCol, textCol)
    val base = corpus.select(col(idCol).as("id"), col(groupCol).as("_grp"),
      size(graft.functions.TextFunctions.tokens(col(textCol)))
        .cast("long").as("_tk"))
    base.join(reg, Seq("id"))
      .groupBy(col("_grp"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("id") === col("group_id"), 1L).otherwise(0L))
          .as("n_after"),
        sum(col("_tk")).as("toks_before"),
        sum(when(col("id") === col("group_id"), col("_tk")).otherwise(0L))
          .as("toks_after"))
      .select(col("_grp").as(groupCol), col("n_before"), col("n_after"),
        col("toks_before"), col("toks_after"),
        round(lit(1.0) - col("n_after").cast("double") / col("n_before"), 6)
          .as("dup_frac"))
  }

  /** CLEAN EVAL-SET CONSTRUCTION — the two leakage defenses composed
    * into the split table a release actually ships: (1) the q214
    * group-atomic 8:2 split (mix64 of the duplicate-GROUP id, so no
    * near/exact pair straddles the boundary by construction), then
    * (2) contamination REPAIR — any eval doc still sharing a word
    * `n`-gram with the training side (a common phrase, boilerplate, a
    * cross-group near-miss below the Jaccard threshold) is reassigned
    * to train. Moving a doc INTO train is always safe (train may not
    * leak into eval, eval text in train is the harm); the reverse
    * repair would be wrong. Output keeps both verdicts auditable:
    * (doc_id, group_id, split0, split, moved).
    *
    * Scale shape: the registry + split are the q214 machinery. The
    * repair probe is NOT the q222 broadcast direction: q222's eval side
    * is a small external benchmark suite, but here "eval" is ~20% of
    * the corpus itself — broadcasting its grams would OOM at scale
    * (round-14 advice). So the probe is a plain shuffled equi-join on
    * the gram (both sides hash-partition; Spark picks SMJ/shuffled-hash
    * by size), and only the matched-id DROP LIST — bounded by the eval
    * doc count — is small. In production, bucket both sides on an
    * 8-byte gram hash to make the shuffle bandwidth-proportional to
    * the hash, not the gram text. */
  def cleanSplit(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 13, normalized: Boolean = false): DataFrame = {
    import graft.functions.TextFunctions
    val reg = groupRegistry(corpus, idCol, textCol)
    val mixU = udf((g: Long) =>
      java.lang.Long.remainderUnsigned(TextFunctions.mix64(g), 10L))
    val sp = reg.select(col("id"), col("group_id"),
      when(mixU(col("group_id")) < 8, "train").otherwise("eval")
        .as("split0"))
    val withText = corpus.select(col(idCol).as("id"), col(textCol).as("_txt"))
      .join(sp, Seq("id"))
    def grams(split: String, withId: Boolean): DataFrame = {
      val f = withText.filter(col("split0") === split)
      val raw = explode(
        Curation.shingles(col("_txt"), n, normalized)).as("gm")
      if (withId) f.select(col("id"), raw) else f.select(raw)
    }
    val dirty = grams("train", withId = false)
      .join(grams("eval", withId = true).distinct(), Seq("gm"))
      .select(col("id")).distinct()
      .withColumn("_dirty", lit(1L))
    sp.join(dirty, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("group_id"), col("split0"),
        when(col("split0") === "eval" && col("_dirty").isNotNull, "train")
          .otherwise(col("split0")).as("split"),
        when(col("split0") === "eval" && col("_dirty").isNotNull, 1L)
          .otherwise(0L).as("moved"))
  }

  /** QUALITY-AWARE keep-one: per duplicate group, keep the member with
    * the LOWEST mean unigram surprisal (the cleanest text under the
    * corpus LM — Curation.unigramSurprisal's q94-gated 4-dp value), id
    * ascending as the deterministic tie-break — so exact copies
    * (identical text → identical surprisal) still resolve to min-id,
    * while a near-dup pair where the lower id is the DEGRADED variant
    * keeps the clean higher-id member, which min-id keep-one gets
    * wrong (production pipelines keep the best cluster member, not the
    * first-crawled one).
    *
    * Scale shape: the argmin is `min(struct(quality, id))` per group —
    * a map-side-combining aggregation, no per-group window/sort; the
    * surprisal table side is the gated broadcast chain.
    *
    * @return (id, group_id, min_id, n_members, kept_mean): one row per
    *         KEPT doc; min_id ≠ id exactly on the groups where quality
    *         inverted the naive rule. kept_mean is null when the kept
    *         doc has no tokens (no surprisal is defined for it).
    *
    * Token-less members (empty/whitespace-only text — the classic
    * mass-duplicate case) carry no surprisal row, so the join is LEFT
    * and a missing mean coalesces to a worst-quality sentinel for the
    * argmin: every group still emits exactly one keeper, token-less
    * members still count in n_members, and a token-less doc can only
    * win its group when NO member has tokens (round-14 advice — the
    * old inner join emitted no row at all for an all-empty group). */
  def keepBestByQuality(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, maxIter: Int = 20): DataFrame = {
    val reg = groupRegistry(df, idCol, textCol, jaccardThreshold, maxIter)
    val q = Curation.unigramSurprisal(df, idCol, textCol)
      .select(col("id"), col("mean_surprisal"))
    reg.join(q, Seq("id"), "left")
      .groupBy(col("group_id"))
      .agg(min(struct(
          coalesce(col("mean_surprisal"), lit(Double.MaxValue)).as("_q"),
          col("id"), col("mean_surprisal"))).as("best"),
        min(col("id")).as("min_id"),
        count(lit(1)).as("n_members"))
      .select(col("best.id").as("id"), col("group_id"), col("min_id"),
        col("n_members"), col("best.mean_surprisal").as("kept_mean"))
  }

  def dedupeTransitive(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, maxIter: Int = 20): DataFrame = {
    val groups = connectedComponents(
      dupEdges(df, idCol, textCol, jaccardThreshold), maxIter)
    val drops = groups.filter(col("id") =!= col("groupId"))
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }
}
