package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive duplicate groups: connected components over the near-dup
  * pair graph, so A~B and B~C land in ONE group even when A~C was never
  * a candidate pair (the keep-smallest-id rule in Dedup.dedupeCorpus is
  * greedy/local; this is the exact closure).
  *
  * Algorithm: iterative label propagation (large-star-ish) — every node
  * repeatedly adopts the minimum label in its neighborhood until a fixed
  * point. Each iteration is one join + one aggregation on the EDGE list
  * (∝ candidate pairs, already bucket-bounded upstream); iterations ≈
  * diameter of the dup graph, which for near-dup clusters is tiny (dup
  * clusters are near-cliques). Hard cap + convergence check.
  */
object DedupGroups {

  /** @param pairs (idA, idB) candidate/verified duplicate pairs
    * @param maxIter safety cap; min-label propagation needs ~diameter
    *        iterations (near-clique dup clusters: 2-3; a CHAIN of k edits
    *        needs k). Hitting the cap without convergence logs a warning —
    *        the result then over-keeps (components split), never
    *        over-drops.
    * @return (id, groupId) for every id that appears in a pair; groupId =
    *         min id of its connected component */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("idA").as("src"), col("idB").as("dst"))
      .unionAll(pairs.select(col("idB").as("src"), col("idA").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbrLabel"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbrLabel"), col("label"))).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged)
      System.err.println(s"[DedupGroups] label propagation hit maxIter=$maxIter " +
        "without converging — components may be split (over-kept, never over-dropped)")
    edges.unpersist()
    labels.withColumnRenamed("label", "groupId")
  }

  /** Full closure dedup: groups from the verified near-dup pair graph
    * UNION the exact-hash pair graph (LSH filters shingle-less short
    * docs, so exact duplicates below shingleSize words would otherwise
    * escape the closure); survivors = every unpaired doc + one keeper
    * (min id) per group. */
  def dedupeTransitive(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, maxIter: Int = 25): DataFrame = {
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
    val groups = connectedComponents(near.unionByName(exact), maxIter)
    val drops = groups.filter(col("id") =!= col("groupId"))
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }
}
