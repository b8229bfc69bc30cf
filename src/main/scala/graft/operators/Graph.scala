package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators — the graph-shaped curation signals of a
  * web-scale training-data pipeline (PageRank over a hyperlink or
  * interaction graph is the classic quality prior attached to crawled
  * documents before filtering).
  *
  * ALL rank arithmetic is integer fixed-point in micro-units (the q94
  * integer-micro-nat discipline): partial sums of longs commute exactly,
  * so the result is independent of partitioning AND the whole iteration
  * chain replays bit-for-bit in SQL — floating-point PageRank would
  * hash-diverge on summation order alone. Per iteration each node sends
  * `pr DIV outdeg` (integral division) along every out-edge and updates
  * to `BASE + (DAMP_NUM * received) DIV DAMP_DEN` (damping 0.85,
  * BASE = 0.15 in micro-units). Nodes with no out-edges leak their mass
  * (the "leaked mass" dangling variant) — avoiding the global
  * dangling-sum scalar keeps each iteration ONE join + ONE aggregation
  * with no driver round-trip, and determinism is unaffected.
  *
  * 100 TB shape: per iteration, contributions = edges ⋈ ranks on src (a
  * key-partitioned shuffle join) then groupBy(dst) with map-side partial
  * aggregation; ranks is one slim row per node. Bucket the edge table by
  * src so the per-iteration join reuses the bucketing instead of
  * re-shuffling the (large, static) edge side every round — only the
  * small rank frame moves. No collect, no driver state, O(iterations)
  * stages.
  */
object Graph {
  /** 1.0 in micro-units — every node's initial rank. */
  val Scale = 1000000L
  private val Base = 150000L // 0.15 * Scale
  private val DampNum = 85L
  private val DampDen = 100L

  /** Fixed-point PageRank over an edge list with columns (src, dst),
    * both integral node ids. Multi-edges count multiply — dedup upstream
    * if the graph is simple. Returns (node, pr) with pr in micro-units.
    *
    * @param iterations unrolled iteration count (each is one join + one
    *                   aggregation; callers gate small fixed counts, the
    *                   convergence loop is the caller's policy)
    * @param broadcastRanks when true, the per-iteration rank frame (one
    *                   slim row per node) is broadcast to the edge side —
    *                   the big, static edge table is never re-shuffled,
    *                   each iteration is map + partial agg + one small
    *                   contribs shuffle. Right whenever the node count
    *                   fits an executor (tens of millions); leave false
    *                   at billions of nodes, where the co-partitioned
    *                   shuffle join (bucket the edges by src) is the
    *                   scale shape.
    */
  def pageRank(edges: DataFrame, iterations: Int,
      broadcastRanks: Boolean = false): DataFrame =
    pageRankImpl(edges, None, iterations, broadcastRanks)

  /** Personalized PageRank: teleport mass restarts at the SEED set only
    * (uniform PageRank is the special case "every node is a seed") —
    * the "what's near these nodes" relevance query of a link graph:
    * seeds = a topic's known-good pages (or one user's history), ranks
    * = proximity-weighted relevance. Same fixed-point integer
    * arithmetic, same per-iteration plan; non-seeds start at 0 and
    * receive no base term, so all mass provably originates from the
    * seed set. `seeds` is a single-column (`node`) frame; seed ids
    * absent from the graph are ignored on both sides of the gate. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, broadcastRanks: Boolean = false): DataFrame =
    pageRankImpl(edges, Some(seeds), iterations, broadcastRanks)

  /** The static per-run frames every iteration reads: nodes (with seed
    * flag) and the degree-annotated edge list. Both persisted; the
    * CALLER owns release (lazy form: OperatorCaches; converged form:
    * unpersist-on-return). */
  private def staticFrames(edges: DataFrame, seeds: Option[DataFrame],
      small: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val bare = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val flagged = seeds match {
      case None => bare.select(col("node"), lit(true).as("_seed"))
      case Some(s) =>
        bare.join(
            small(s.select(col("node")).distinct()
              .select(col("node"), lit(true).as("_seed"))),
            Seq("node"), "left")
          .select(col("node"), coalesce(col("_seed"), lit(false)).as("_seed"))
    }
    // static across iterations: every edge annotated with its source's
    // out-degree, so the loop joins one frame instead of two
    (flagged.persist(), degreeEdges(edges).persist())
  }

  /** One fixed-point iteration — THE kernel, shared verbatim by the
    * unrolled (gated) and converged (deep-iteration) forms so their
    * arithmetic cannot drift: one equi-join + one map-side-combining
    * aggregation, no driver state. */
  private def step(nodes: DataFrame, degEdges: DataFrame, ranks: DataFrame,
      small: DataFrame => DataFrame): DataFrame = {
    val baseTerm = when(col("_seed"), lit(Base)).otherwise(lit(0L))
    val received = degEdges
      .join(small(ranks), degEdges("src") === ranks("node"))
      .select(col("dst"), expr("pr DIV outdeg").as("contrib"))
      .groupBy("dst").agg(sum(col("contrib")).as("recv"))
    nodes
      .join(small(received), nodes("node") === received("dst"), "left")
      .select(col("node"),
        (baseTerm + expr(s"($DampNum * coalesce(recv, CAST(0 AS BIGINT))) DIV $DampDen"))
          .as("pr"))
  }

  private def initRanks(nodes: DataFrame): DataFrame =
    nodes.select(col("node"),
      when(col("_seed"), lit(Scale)).otherwise(lit(0L)).as("pr"))

  /** The static per-edge frame of the iteration: every edge annotated
    * with its source's out-degree. Public so callers can MATERIALIZE it
    * once — at 100 TB, bucketize it by `src` (Layout.bucketize) and run
    * [[pageRankBucketed]] over the table. */
  def degreeEdges(edges: DataFrame): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
  }

  /** PageRank over a PRE-MATERIALIZED degree-annotated edge table
    * (src, dst, outdeg — [[degreeEdges]] saved via `Layout.bucketize`
    * on `src`): the documented 100×-scale shape made runnable. Each
    * iteration's join reads the edge buckets co-partitioned with NO
    * exchange and NO cache on the edge side — at scale the edge table
    * outlives any executor cache; the bucket layout IS the
    * materialization, so only the slim rank frame moves per iteration
    * (PlanSpec: zero `Exchange hashpartitioning(src…` in the whole
    * 4-iteration plan). The merge hint pins the sort-merge join — at
    * test scale the planner would happily broadcast the rank frame,
    * which is exactly the co-location the demo must not silently fall
    * back to (the q140 discipline).
    *
    * Same `step` kernel as [[pageRank]] — identical integer fixed-point
    * arithmetic, identical oracle. */
  def pageRankBucketed(degEdges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val nodes0 = degEdges.select(col("src").as("node"))
      .union(degEdges.select(col("dst").as("node")))
      .distinct()
      .select(col("node"), lit(true).as("_seed"))
      .persist()
    val nodes = OperatorCaches.track(nodes0)
    val hinted = degEdges.hint("merge")
    var ranks = initRanks(nodes)
    for (_ <- 1 to iterations) ranks = step(nodes, hinted, ranks, identity)
    ranks.select(col("node"), col("pr"))
  }

  private def pageRankImpl(edges: DataFrame, seeds: Option[DataFrame],
      iterations: Int, broadcastRanks: Boolean): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val small: DataFrame => DataFrame =
      if (broadcastRanks) df => broadcast(df) else identity
    // static frames are read by EVERY iteration — persisted and tracked
    // (OperatorCaches contract: this form stays LAZY, so it cannot
    // unpersist on return; loop-heavy sessions should call
    // pageRankConverged, which owns its caches), else the upstream edge
    // construction recomputes once per iteration per consumer
    val (nodes0, degEdges0) = staticFrames(edges, seeds, small)
    val nodes = OperatorCaches.track(nodes0)
    val degEdges = OperatorCaches.track(degEdges0)
    var ranks = initRanks(nodes)
    for (_ <- 1 to iterations) ranks = step(nodes, degEdges, ranks, small)
    ranks.select(col("node"), col("pr"))
  }

  /** Deep-iteration PageRank — the form that owns the iteration policy
    * a real 20–50-round run needs, instead of leaving it to the caller:
    *
    *   - **lineage truncation**: every `checkpointEvery` iterations the
    *     rank frame is `localCheckpoint`ed (eager). The unrolled chain's
    *     logical plan otherwise grows linearly and its analysis cost
    *     super-linearly, and a lost partition late in the run would
    *     recompute the whole chain. A checkpoint makes the frame
    *     self-contained (plan = one scan of materialized partitions).
    *   - **convergence stop**: when `tol >= 0`, after each checkpoint a
    *     PROBE iteration is evaluated (one extra join + max aggregation,
    *     paid only once per `checkpointEvery` rounds — amortized, not
    *     abandoned) and iteration stops once max |pr − pr'| ≤ tol
    *     (micro-units) between CONSECUTIVE iterations. Deliberately not
    *     "delta across the burst": integer floor-division dynamics can
    *     settle into small limit cycles, and a cycle whose period
    *     divides the burst length would alias to delta 0 across the
    *     burst — a false fixed point whose answer depends on
    *     `checkpointEvery` parity. A consecutive-iteration check can
    *     only stop at a genuine (within-tol) fixed point; a tol=0 run on
    *     a pure limit cycle correctly runs to `maxIterations`.
    *     `tol < 0` disables the check (fixed-count deep run).
    *
    * EAGER by design (checkpointing IS materialization) and
    * cache-clean: the static frames are unpersisted before return and
    * the result is checkpointed, so repeated calls in one session
    * accumulate nothing (spec-proven; superseded rank checkpoints are
    * reclaimed by Spark's ContextCleaner once unreferenced). The
    * arithmetic is [[step]] — identical to the gated unrolled form, so
    * a converged run at iteration count N equals `pageRank(edges, N)`
    * bit-for-bit (spec-proven).
    *
    * @return (ranks, iterationsRun) */
  def pageRankConverged(edges: DataFrame, maxIterations: Int,
      tol: Long = 0L, checkpointEvery: Int = 8,
      broadcastRanks: Boolean = false,
      seeds: Option[DataFrame] = None): (DataFrame, Int) = {
    require(maxIterations >= 0, s"maxIterations must be >= 0, got $maxIterations")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val small: DataFrame => DataFrame =
      if (broadcastRanks) df => broadcast(df) else identity
    val (nodes, degEdges) = staticFrames(edges, seeds, small)
    try {
      var ranks = initRanks(nodes).localCheckpoint(true)
      var it = 0
      var converged = false
      while (it < maxIterations && !converged) {
        val burst = math.min(checkpointEvery, maxIterations - it)
        for (_ <- 1 to burst) ranks = step(nodes, degEdges, ranks, small)
        ranks = ranks.localCheckpoint(true)
        it += burst
        if (tol >= 0) {
          // probe ONE further iteration and compare CONSECUTIVE states
          // (see scaladoc: a burst-to-burst delta would alias limit
          // cycles). The probe frame is discarded — at tol=0 it equals
          // `ranks` exactly, so the returned frame is still bit-equal
          // to pageRank(it); at tol>0 it is within tol by definition.
          val probe = step(nodes, degEdges, ranks, small)
          val row = probe.as("a")
            .join(ranks.select(col("node"), col("pr").as("_prev")), Seq("node"))
            .agg(max(abs(col("pr") - col("_prev"))))
            .collect()(0)
          // an EMPTY graph has no ranks at all: max over zero rows is
          // null — converged by definition (nothing can ever move)
          converged = row.isNullAt(0) || row.getLong(0) <= tol
        }
      }
      (ranks.select(col("node"), col("pr")), it)
    } finally {
      nodes.unpersist(blocking = false)
      degEdges.unpersist(blocking = false)
    }
  }
}
