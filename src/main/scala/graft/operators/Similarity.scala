package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *  - [[bruteTopK]] — exact cosine top-k; the correctness baseline. The
  *    query side is broadcast, so the corpus is scanned once with no
  *    shuffle of the corpus; per-pair work is one fused-kernel dot product
  *    (norms precomputed per row, not per pair).
  *  - [[srpTopK]] — signed-random-projection LSH: bucket on signature
  *    bands, exact rerank inside buckets. Corpus-side cost drops to the
  *    bucket fraction; the scale path when queries × corpus explodes.
  *  - [[ivfTopK]] — inverted-file: KMeans coarse centroids, probe the
  *    nprobe nearest cells. Centroid fit is a tiny sampled job; assignment
  *    is one narrow pass; the probe join hits nprobe/k of the corpus.
  */
object Similarity {

  /** Exact cosine top-k: queries (small, broadcast) × corpus → window
    * rank per query. Ties broken by corpus id for determinism.
    * Pair scoring uses the fused dot kernel (double-cast inputs → same
    * numerics as the expression form, DuckDB-oracle bit-exact). Rows
    * with zero-norm (or null) embeddings are excluded — a 0/0 sim is NaN,
    * and Spark sorts NaN ABOVE every double, which would make a zero
    * vector everybody's rank-1 neighbor. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qnorm", normFast(col("qv")))
      .filter(col("qnorm") > 0)
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .withColumn("nnorm", normFast(col("nv")))
      .filter(col("nnorm") > 0)
    val pairs = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", cosinePre(dotFast(col("qv"), col("nv")), col("qnorm"), col("nnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** SRP-LSH top-k: same output shape as bruteTopK but only pairs sharing
    * an LSH band bucket are scored (approximate — high-sim pairs collide
    * with high probability). planes bits split into bands of bandBits. */
  def srpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bandBits: Int = 4, seed: Long = 42L): DataFrame = {
    require(planes % bandBits == 0)
    val nBands = planes / bandBits
    val buckets = array((0 until nBands).map(b =>
      shiftrightunsigned(col("sig"), b * bandBits)
        .bitwiseAND(lit((1 << bandBits) - 1))): _*)
    // zero-norm/null guard mirrors bruteTopK: 0/0 sim is NaN and Spark
    // sorts NaN above every double — a zero vector would be every
    // colliding query's rank-1 neighbor.
    def base(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("id"), col("embedding").as("v"),
        srpSignature(col("embedding"), planes, seed).as("sig"),
        normFast(col("embedding")).as("vnorm"))
        .filter(col("vnorm") > 0)
    def banded(df: DataFrame, idAs: String): DataFrame =
      base(df).select(col("id").as(idAs),
        posexplode(buckets).as(Seq("band", "bucket")))
    // bucket join on ids only; vectors re-attach per deduped candidate
    val qVecs = base(queries).select(col("id").as("qid"), col("v").as("qv"),
      col("vnorm").as("qnorm"))
    val cVecs = base(corpus).select(col("id").as("nid"), col("v").as("nv"),
      col("vnorm").as("nnorm"))
    val cand = banded(corpus, "nid")
      .join(broadcast(banded(queries, "qid")), Seq("band", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct() // a pair can collide in several bands
      .join(broadcast(qVecs), Seq("qid"))
      .join(cVecs, Seq("nid"))
      .withColumn("sim",
        cosinePre(dotFast(col("qv"), col("nv")), col("qnorm"), col("nnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** IVF top-k: coarse-quantize the corpus into nCells KMeans cells, then
    * score queries only against their nprobe nearest cells. The centroid
    * fit runs on a deterministic hash-sample capped at `maxTrainRows`
    * (coarse-centroid quality saturates long before the corpus does —
    * same stance as ProductQuantization.train), so index-build cost does
    * NOT grow with corpus size; assignment is still one narrow pass over
    * everything. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4,
      maxTrainRows: Long = 100000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // zero-norm/null guard mirrors bruteTopK (NaN-sim hazard) and keeps
    // degenerate vectors out of the centroid fit.
    val vecs = corpus
      .withColumn("nnorm", normFast(col("embedding")))
      .filter(col("nnorm") > 0)
      .select(col("vec_id"), col("embedding"), col("nnorm"))
    val total = vecs.count()
    val every = math.max(1L, total / maxTrainRows)
    // fit runs on the driver (LocalKMeans): the sample is capped, sorted
    // by id for determinism; MLlib's driver-iterative jobs were the whole
    // q42 index-build latency
    val trainRows = vecs
      .filter(pmod(hash(col("vec_id")), lit(every)) === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    require(trainRows.nonEmpty,
      "ivfTopK: no trainable vectors (empty corpus or all zero-norm)")
    val sorted = trainRows.sortBy(_._1).map(_._2.toArray)
    val dim = LocalKMeans.dominantDim(sorted)
    // sorted-Forgy init + double precision: no RNG and arithmetic a SQL
    // oracle can replay exactly (q42 is oracle-gated on this path)
    val centers = LocalKMeans.fitSortedForgy(sorted.filter(_.length == dim),
      nCells, maxIter = 10)
    // cell assignment: one narrow pass with broadcast centroids; a
    // wrong-dimension row is dropped (null cell), not a job-killing
    // IndexOutOfBounds inside the kernel — same one-bad-row stance as
    // ProductQuantization.encode
    val bcCenters = spark.sparkContext.broadcast(centers)
    // null check INSIDE the udf: the optimizer may evaluate it before
    // the norm>0 filter that would have dropped null rows
    val nearestCell = udf((v: Seq[Float]) =>
      if (v == null || v.length != dim) None
      else Some(LocalKMeans.nearestDouble(v, bcCenters.value)))
    val assigned = vecs
      .select(col("vec_id").as("nid"), col("embedding").as("nv"),
        col("nnorm"), nearestCell(col("embedding")).as("cell"))
      .filter(col("cell").isNotNull)

    // centroid table is tiny: broadcast to rank cells per query
    val centroids = centers.zipWithIndex
      .map { case (v, i) => (i, v) }
      .toSeq.toDF("cell", "centroid")
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .withColumn("qnorm", normFast(col("qv")))
      .filter(col("qnorm") > 0)
    val wCell = Window.partitionBy(col("qid"))
      .orderBy(col("cellSim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cellSim", cosine(col("qv"), col("centroid")))
      .withColumn("cellRank", row_number().over(wCell))
      .filter(col("cellRank") <= nprobe)
      .select(col("qid"), col("qv"), col("qnorm"), col("cell"))

    val pairs = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosinePre(dotFast(col("qv"), col("nv")), col("qnorm"), col("nnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold via SRP buckets
    * (the embedding analogue of Dedup.minhashLshPairs).
    *
    * Defaults are tuned for HIGH thresholds (≥0.9): 8-bit bands are ~30×
    * more selective than the 4-bit topK default (candidates ∝ n²/2^bandBits
    * per band), identical vectors still collide with probability 1, and a
    * 0.95-cosine pair survives ≥1 of 3 bands w.p. ~0.8. */
  def cosineDupPairs(corpus: DataFrame, threshold: Double,
      planes: Int = 24, bandBits: Int = 8, seed: Long = 42L): DataFrame = {
    val nBands = planes / bandBits
    val buckets = array((0 until nBands).map(b =>
      shiftrightunsigned(col("sig"), b * bandBits)
        .bitwiseAND(lit((1 << bandBits) - 1))): _*)
    // bucket join carries ids only; vectors re-attach per deduped candidate.
    // base is read twice (banding + vector attach) → persist the small table.
    // zero-norm/null guard: Spark evaluates `NaN >= threshold` as TRUE, so
    // without this a zero-embedding row is reported as a duplicate of every
    // bucket-mate with sim = NaN.
    val base = OperatorCaches.track(
      corpus.select(col("vec_id").as("id"), col("embedding").as("v"),
        srpSignature(col("embedding"), planes, seed).as("sig"),
        normFast(col("embedding")).as("vnorm"))
      .filter(col("vnorm") > 0)
      .persist())
    val banded = base
      .select(col("id"), posexplode(buckets).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("idA"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("idB"))
    val vecs = base.select(col("id"), col("v"), col("vnorm"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
      .distinct()
      .join(vecs.select(col("id").as("idA"), col("v").as("vA"),
        col("vnorm").as("normA")), Seq("idA"))
      .join(vecs.select(col("id").as("idB"), col("v").as("vB"),
        col("vnorm").as("normB")), Seq("idB"))
      .withColumn("sim",
        cosinePre(dotFast(col("vA"), col("vB")), col("normA"), col("normB")))
      .filter(col("sim") >= threshold)
      .select(col("idA"), col("idB"), round(col("sim"), 6).as("sim"))
  }
}
