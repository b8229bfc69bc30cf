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

  private def pageRankImpl(edges: DataFrame, seeds: Option[DataFrame],
      iterations: Int, broadcastRanks: Boolean): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val small: DataFrame => DataFrame =
      if (broadcastRanks) df => broadcast(df) else identity
    // nodes (with their seed flag) and the degree-annotated edge list
    // are read by EVERY iteration — persisted and tracked
    // (OperatorCaches contract), else the upstream edge construction
    // (often a join + distinct) recomputes once per iteration per
    // consumer
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
    val nodes = OperatorCaches.track(flagged.persist())
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // static across iterations: every edge annotated with its source's
    // out-degree, so the loop joins one frame instead of two
    val degEdges = OperatorCaches.track(
      edges.join(outdeg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
        .persist())

    val baseTerm = when(col("_seed"), lit(Base)).otherwise(lit(0L))
    var ranks = nodes.select(col("node"),
      when(col("_seed"), lit(Scale)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iterations) {
      val received = degEdges
        .join(small(ranks), degEdges("src") === ranks("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("recv"))
      ranks = nodes
        .join(small(received), nodes("node") === received("dst"), "left")
        .select(col("node"),
          (baseTerm + expr(s"($DampNum * coalesce(recv, CAST(0 AS BIGINT))) DIV $DampDen"))
            .as("pr"))
    }
    ranks.select(col("node"), col("pr"))
  }
}
