package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine ranked candidate lists
  * from heterogeneous scorers (lexical TF-IDF, dense ANN, …) without
  * comparing their incomparable scores — reciprocal-rank fusion,
  * RRF(d) = Σ_legs 1 / (c + rank_leg(d)) (Cormack et al.'s c = 60
  * default).
  *
  * Determinism discipline: the reciprocal is computed in INTEGER
  * micro-units — `1e9 DIV (c + rank)` — so fused scores are exact
  * integer sums (cross-engine, aggregation-order-free; doubles would
  * tie-break on summation noise). Ranks are ints, so every fused score
  * is exact.
  *
  * Scale shape: each leg contributes ≤ k slim (qid, nid, weight) rows
  * per query; the union groups on (qid, nid) with map-side combine and
  * the final top-k uses the bounded-heap aggregator (≤ k rows per
  * query per map task) — never a full per-query sort. */
object Fusion {

  /** Fuse legs of shape (qid, nid, rank) → (qid, nid, rrf, rank),
    * top `k` per query by (rrf DESC, nid ASC). */
  def rrfTopK(legs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfTopK needs at least one leg")
    require(k >= 1 && c >= 0, s"bad params k=$k c=$c")
    // the aggregator scores through double: the max possible fused score
    // (every leg ranks the doc #1) must stay inside the 2^53 exact-
    // integer range, or ties would silently lose precision. Fails loudly
    // if a caller ever raises the leg count or the micro-unit scale.
    require(legs.size.toLong * (1000000000L / (c + 1)) < (1L << 53),
      s"rrf micro-unit scores would exceed double's exact-integer range: " +
        s"${legs.size} legs x 1e9/(${c}+1)")
    val contrib = legs
      .map(_.select(col("qid"), col("nid"),
        expr(s"CAST(1000000000 DIV ($c + rank) AS BIGINT)").as("w")))
      .reduce(_.unionByName(_))
    contrib.groupBy(col("qid"), col("nid"))
      .agg(sum(col("w")).as("rrf"))
      .groupBy(col("qid"))
      // exact: rrf ≤ legs × 1e9/61 ≈ tens of millions — far inside the
      // double's 2^53 exact-integer range the aggregator scores with
      .agg(graft.plans.TopKAggregator.top_k(k)(
        col("rrf").cast("double"), col("nid")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("nid"),
        col("col.score").cast("long").as("rrf"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** RAG CONTEXT ASSEMBLY — the step between retrieval and the prompt:
    * per query, walk the fused ranking and pack chunks into a token
    * budget under two deterministic rules:
    *  - DOC DEDUP: only the best-ranked chunk of each parent document
    *    enters (overlapping chunks of one doc crowd out diversity; the
    *    parent is `nid DIV keyStride` — the chunkTexts key contract);
    *  - PREFIX STOP: chunks admit in rank order while the cumulative
    *    token count stays ≤ `budgetTokens`, and assembly STOPS at the
    *    first overflow (prefix semantics, not skip-and-continue — a
    *    window-expressible total order both engines replay exactly;
    *    skip-and-continue would be a sequential fold for marginal
    *    context gain).
    *
    * Scale shape: two windows partitioned by qid over ≤ k rows each +
    * one chunk-token equi-join — per-query work is O(k), and queries
    * are the small side by definition.
    *
    * @param ranked (qid, nid, rank) — e.g. [[rrfTopK]] output
    * @param chunkTokens (chunk_key, chunk_tokens)
    * @return (qid, ctx_pos 1.., chunk_key, doc_id, chunk_tokens,
    *         cum_tokens), ctx_pos dense in rank order */
  def assembleContext(ranked: DataFrame, chunkTokens: DataFrame,
      budgetTokens: Int,
      keyStride: Long = Curation.ChunkKeyStride): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val perDoc = Window
      .partitionBy(col("qid"), expr(s"nid DIV $keyStride"))
      .orderBy(col("rank"))
    val asm = Window.partitionBy(col("qid")).orderBy(col("rank"))
    ranked.select(col("qid"), col("nid"), col("rank"))
      .withColumn("_dr", row_number().over(perDoc))
      .filter(col("_dr") === 1)
      .join(chunkTokens.select(col("chunk_key").as("nid"),
        col("chunk_tokens")), Seq("nid"))
      .withColumn("ctx_pos", row_number().over(asm).cast("long"))
      .withColumn("cum_tokens",
        sum(col("chunk_tokens")).over(asm.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("qid"), col("ctx_pos"), col("nid").as("chunk_key"),
        expr(s"nid DIV $keyStride").as("doc_id"),
        col("chunk_tokens"), col("cum_tokens"))
  }
}
