package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF term weighting and sparse cosine similarity — the classic
  * retrieval stack as pure DataFrame algebra (no MLlib vectors).
  *
  * Shapes for scale:
  *  - term frequencies: explode(tokens) → groupBy(doc, term) — one
  *    shuffle on (doc, term), combiner-friendly;
  *  - document frequencies: groupBy(term) over distinct (doc, term) —
  *    small output (vocabulary);
  *  - similarity: the sparse dot product joins on TERM (posting-list
  *    join) so only documents sharing a term ever pair up — the
  *    inverted-index shape, no dense vectors, no all-pairs product.
  */
object TfIdf {

  /** (id, term, tf, df, tfidf) — smoothed idf = ln((N+1)/(df+1)) + 1. */
  def weights(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = corpus.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // corpus size as an in-plan broadcast scalar, not a driver count():
    // a blocking .count() serializes an extra job before the real DAG —
    // measurable fixed latency on every call (and at scale it re-reads
    // the corpus). Numerics identical: count cast to double, then +1.
    val nDf = corpus.agg(count(lit(1)).cast("double").as("_n_docs"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf",
        col("tf") * (log((col("_n_docs") + 1) / (col("df") + 1)) + 1))
      .drop("_n_docs")
  }

  /** Sparse cosine similarity for all document pairs sharing ≥1 term:
    * posting-list self-join on term, dot = Σ tfidf_a·tfidf_b, norms
    * precomputed per doc. Returns (idA, idB, sim) with idA < idB.
    *
    * `maxDfRatio` < 1 prunes terms appearing in more than that fraction
    * of documents from the similarity entirely (join AND norms) — the
    * champion-list/stop-term cutoff. A term with df ≈ N contributes
    * idf ≈ 1 to everyone but its posting self-join is O(N²): at sf0.1
    * the unpruned join is ~450M pairs, pruned at 0.5 it is ~60k. The
    * pruned form is therefore the DEFAULT (0.5); exact cosine over every
    * stop term is the explicitly-requested form — pass maxDfRatio = 1.0
    * and accept the O(df²) posting join it implies.
    *
    * The weights plan is read three times (norms + both join sides) →
    * persisted here, tracked for caller release (OperatorCaches). */
  def pairSimilarity(weightsDf0: DataFrame, maxDfRatio: Double = 0.5): DataFrame = {
    val weightsAll = OperatorCaches.track(weightsDf0.persist())
    val weightsDf =
      if (maxDfRatio >= 1.0) weightsAll
      else {
        // document count as an in-plan broadcast scalar (same stance as
        // weights(): no driver-blocking count job on the hot path)
        val nd = weightsAll.agg(countDistinct(col("id")).as("_nd"))
        OperatorCaches.track(
          weightsAll.crossJoin(broadcast(nd))
            .filter(col("df") <= col("_nd") * maxDfRatio).drop("_nd")
            .persist())
      }
    val norms = weightsDf.groupBy(col("id"))
      .agg(sqrt(sum(col("tfidf") * col("tfidf"))).as("norm"))
    val a = weightsDf.select(col("term"), col("id").as("idA"),
      col("tfidf").as("wA"))
    val b = weightsDf.select(col("term"), col("id").as("idB"),
      col("tfidf").as("wB"))
    a.join(b, Seq("term"))
      .filter(col("idA") < col("idB"))
      .groupBy(col("idA"), col("idB"))
      .agg(sum(col("wA") * col("wB")).as("dot"))
      .join(norms.select(col("id").as("idA"), col("norm").as("normA")), Seq("idA"))
      .join(norms.select(col("id").as("idB"), col("norm").as("normB")), Seq("idB"))
      .select(col("idA"), col("idB"),
        (col("dot") / (col("normA") * col("normB"))).as("sim"))
  }

  /** Top-k most similar docs per query doc (sparse, inverted-index path).
    *
    * Like [[pairSimilarity]], topK defaults to the 0.5 stop-term cutoff:
    * a retrieval entry point is a ranking, rankings are dominated by rare
    * terms, and a df≈N term's posting self-join is the O(N²) blow-up that
    * killed the unpruned form at sf0.1 (~450M pairs). Pass
    * maxDfRatio = 1.0 explicitly to rank with exact cosine. */
  def topK(weightsDf: DataFrame, k: Int, maxDfRatio: Double = 0.5): DataFrame = {
    val sims = OperatorCaches.track(
      pairSimilarity(weightsDf, maxDfRatio).persist()) // both union sides
    // symmetrize so every doc sees its neighbors regardless of id order
    val sym = sims.select(col("idA").as("qid"), col("idB").as("nid"), col("sim"))
      .unionAll(sims.select(col("idB").as("qid"), col("idA").as("nid"), col("sim")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
