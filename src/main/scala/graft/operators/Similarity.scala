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
    // each side's base (upstream featurization + signature + norm) is
    // consumed TWICE — once banded, once for the vector re-attach.
    // Persist both so the upstream subtree executes once per side (r20,
    // guide §7.2 duplicated-subtree audit: the hybrid legs' corpus side
    // is a full chunk featurization that ran twice per call).
    val cBase = OperatorCaches.track(base(corpus).persist())
    val qBase = OperatorCaches.track(base(queries).persist())
    def banded(b: DataFrame, idAs: String): DataFrame =
      b.select(col("id").as(idAs),
        posexplode(buckets).as(Seq("band", "bucket")))
    // bucket join on ids only; vectors re-attach per deduped candidate
    val qVecs = qBase.select(col("id").as("qid"), col("v").as("qv"),
      col("vnorm").as("qnorm"))
    val cVecs = cBase.select(col("id").as("nid"), col("v").as("nv"),
      col("vnorm").as("nnorm"))
    val cand = banded(cBase, "nid")
      .join(broadcast(banded(qBase, "qid")), Seq("band", "bucket"))
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

  /** MULTI-PROBE SRP top-k: same index as [[srpTopK]] (the corpus is
    * banded exactly once — the trick queries MORE buckets instead of
    * storing more tables), but the QUERY side also probes, per band,
    * the buckets reached by flipping its `nProbes` lowest-margin sign
    * bits ([[graft.functions.VectorFunctions.multiProbeBucketsKernel]]).
    * Candidates are a strict superset of srpTopK's, so recall can only
    * go up; corpus-side cost rises by the probed-bucket fraction, not
    * by a rebuild. Output shape and tie rules identical to srpTopK. */
  def srpMultiProbeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 16, bandBits: Int = 4, seed: Long = 42L,
      nProbes: Int = 2): DataFrame = {
    require(planes % bandBits == 0)
    val nBands = planes / bandBits
    val buckets = array((0 until nBands).map(b =>
      shiftrightunsigned(col("sig"), b * bandBits)
        .bitwiseAND(lit((1 << bandBits) - 1))): _*)
    def base(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("id"), col("embedding").as("v"),
        srpSignature(col("embedding"), planes, seed).as("sig"),
        normFast(col("embedding")).as("vnorm"))
        .filter(col("vnorm") > 0)
    // corpus base consumed twice (bands + vector re-attach) — one
    // persisted featurization instead of two (see srpTopK)
    val cBase = OperatorCaches.track(base(corpus).persist())
    val cBanded = cBase.select(col("id").as("nid"),
      posexplode(buckets).as(Seq("band", "bucket")))
    val probeUdf = udf((v: Seq[Float]) =>
      multiProbeBucketsKernel(v, planes, bandBits, seed, nProbes))
    val qProbes = queries
      .withColumn("vnorm", normFast(col("embedding")))
      .filter(col("vnorm") > 0)
      .select(col("vec_id").as("qid"),
        explode(probeUdf(col("embedding"))).as("bb"))
      .select(col("qid"), col("bb._1").as("band"), col("bb._2").as("bucket"))
    val qVecs = base(queries).select(col("id").as("qid"), col("v").as("qv"),
      col("vnorm").as("qnorm"))
    val cVecs = cBase.select(col("id").as("nid"), col("v").as("nv"),
      col("vnorm").as("nnorm"))
    val cand = cBanded.join(broadcast(qProbes), Seq("band", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
      .distinct() // a pair can collide in several probed buckets
      .join(broadcast(qVecs), Seq("qid"))
      .join(cVecs, Seq("nid"))
      .withColumn("sim",
        cosinePre(dotFast(col("qv"), col("nv")), col("qnorm"), col("nnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** The SRP leg's STREAM-SAFE candidate stage (r15 missing #4): band
    * signatures, the bucket join against the STATIC corpus side, and
    * the cosine — with NO distinct and NO aggregation, so a STREAMING
    * `queries` frame flows through statelessly (signature/norm are
    * per-row; the join is stream-static). A (qid, nid) pair colliding
    * in several bands emits several rows carrying the SAME sim (sim is
    * a pure function of the pair), so the caller's ONE aggregation —
    * max(sim) per (qid, nid) — reproduces [[srpTopK]]'s
    * distinct-then-score values exactly; ranking is batch-side
    * presentation (the q245 discipline).
    * @return (qid, nid, sim) with per-band duplicates */
  def srpScoredCandidates(queries: DataFrame, corpus: DataFrame,
      planes: Int = 16, bandBits: Int = 4, seed: Long = 42L): DataFrame = {
    require(planes % bandBits == 0)
    val nBands = planes / bandBits
    val buckets = array((0 until nBands).map(b =>
      shiftrightunsigned(col("sig"), b * bandBits)
        .bitwiseAND(lit((1 << bandBits) - 1))): _*)
    def base(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("id"), col("embedding").as("v"),
        srpSignature(col("embedding"), planes, seed).as("sig"),
        normFast(col("embedding")).as("vnorm"))
        .filter(col("vnorm") > 0)
    // the stream side keeps vector + norm alongside its exploded bands
    // (re-attaching them would need a second stream join); the static
    // corpus side re-attaches vectors per candidate as in srpTopK
    val qSide = base(queries).select(col("id").as("qid"),
        col("v").as("qv"), col("vnorm").as("qnorm"),
        posexplode(buckets).as(Seq("band", "bucket")))
    // the STATIC corpus base is consumed twice (bands + vector
    // re-attach) and, under a Complete-mode stream, re-executes per
    // micro-batch — persist it once (the stream side stays unpersisted)
    val cBase = OperatorCaches.track(base(corpus).persist())
    val cBands = cBase.select(col("id").as("nid"),
      posexplode(buckets).as(Seq("band", "bucket")))
    val cVecs = cBase.select(col("id").as("nid"), col("v").as("nv"),
      col("vnorm").as("nnorm"))
    qSide.join(cBands, Seq("band", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .join(cVecs, Seq("nid"))
      .select(col("qid"), col("nid"),
        cosinePre(dotFast(col("qv"), col("nv")), col("qnorm"), col("nnorm"))
          .as("sim"))
  }

  /** IVF top-k: coarse-quantize the corpus into nCells KMeans cells, then
    * score queries only against their nprobe nearest cells. The centroid
    * fit runs on a deterministic hash-sample capped at `maxTrainRows`
    * (coarse-centroid quality saturates long before the corpus does —
    * same stance as ProductQuantization.train), so index-build cost does
    * NOT grow with corpus size; assignment is still one narrow pass over
    * everything. */
  /** Shared coarse-quantization stage (ivfTopK + semanticDedup): fit
    * nCells KMeans centroids on a deterministic hash-sample capped at
    * maxTrainRows, assign every vector to its nearest cell.
    *
    * Fit runs on the driver (LocalKMeans): the sample is capped, sorted
    * by id for determinism; MLlib's driver-iterative jobs were the whole
    * q42 index-build latency. Sorted-Forgy init + double precision: no
    * RNG and arithmetic a SQL oracle can replay exactly (q42/q162 are
    * oracle-gated on this path). Zero-norm/null rows are excluded — the
    * NaN-sim hazard (bruteTopK scaladoc) and degenerate fit vectors.
    *
    * @return (assigned (nid, nv, nnorm, cell), centers) */
  private[operators] def fitAssign(corpus: DataFrame, nCells: Int,
      maxIter: Int, maxTrainRows: Long)
      : (DataFrame, Array[Array[Double]]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus
      .withColumn("nnorm", normFast(col("embedding")))
      .filter(col("nnorm") > 0)
      .select(col("vec_id"), col("embedding"), col("nnorm"))
    val total = vecs.count()
    val every = math.max(1L, total / maxTrainRows)
    val trainRows = vecs
      .filter(pmod(hash(col("vec_id")), lit(every)) === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    require(trainRows.nonEmpty,
      "fitAssign: no trainable vectors (empty corpus or all zero-norm)")
    val sorted = trainRows.sortBy(_._1).map(_._2.toArray)
    val dim = LocalKMeans.dominantDim(sorted)
    val centers = LocalKMeans.fitSortedForgy(sorted.filter(_.length == dim),
      nCells, maxIter = maxIter)
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
    (assigned, centers)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4,
      maxTrainRows: Long = 100000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (assigned, centers) = fitAssign(corpus, nCells, maxIter = 10,
      maxTrainRows = maxTrainRows)

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

  /** Public fit+assign for the INDEX side of incremental/streaming
    * semantic dedup: the assigned corpus (nid, nv, nnorm, cell) plus
    * the centers — saved once per epoch, so a daily batch assigns and
    * compares without refitting (the band-index discipline of
    * [[Dedup.incrementalLshPairsFromIndex]] in embedding space). */
  def semanticIndex(corpus: DataFrame, nCells: Int = 16, maxIter: Int = 10,
      maxTrainRows: Long = 100000L): (DataFrame, Array[Array[Double]]) =
    fitAssign(corpus, nCells, maxIter, maxTrainRows)

  /** Assign a batch to an EXISTING index's cells — stateless per row,
    * so it works on a streaming frame (the q170 stream-static form).
    * Zero-norm/null/wrong-dim rows are dropped, as in [[fitAssign]]. */
  def assignToCells(batch: DataFrame,
      centers: Array[Array[Double]]): DataFrame = {
    val spark = batch.sparkSession
    val dim = centers(0).length
    val bc = spark.sparkContext.broadcast(centers)
    val nearest = udf((v: Seq[Float]) =>
      if (v == null || v.length != dim) None
      else Some(LocalKMeans.nearestDouble(v, bc.value)))
    batch.withColumn("vnorm", normFast(col("embedding")))
      .filter(col("vnorm") > 0)
      .withColumn("cell", nearest(col("embedding")))
      .filter(col("cell").isNotNull)
  }

  /** Per-incoming semantic-dup verdicts against a saved index: assign
    * to cells, join ONLY that cell's members, count distinct matches at
    * cosine ≥ threshold. `batch` may be a streaming frame — assignment
    * is stateless, the member join is stream-static, and the one
    * stateful operator is the final aggregation (collect_set, not
    * countDistinct — the latter is unsupported in streaming; per-key
    * state is the incoming doc's match set, bounded by its dup degree).
    * @return (in_id, n_sem_dups) for every assigned incoming row */
  def semanticDupMatches(batch: DataFrame, index: DataFrame,
      centers: Array[Array[Double]], threshold: Double): DataFrame = {
    val assigned = assignToCells(batch, centers)
      .select(col("vec_id").as("in_id"), col("embedding").as("iv"),
        col("vnorm").as("inorm"), col("cell"))
    val members = index.select(col("cell"), col("nid"), col("nv"),
      col("nnorm"))
    assigned.join(members, Seq("cell"))
      .withColumn("sim",
        cosinePre(dotFast(col("iv"), col("nv")), col("inorm"), col("nnorm")))
      .filter(col("sim") >= threshold)
      .groupBy(col("in_id"))
      .agg(size(collect_set(col("nid"))).cast("long").as("n_sem_dups"))
  }

  /** SEMANTIC eval-set contamination report — the embedding-space
    * sibling of the verbatim substring probe: for every EVAL doc, how
    * many TRAINING docs sit within cosine ≥ threshold (paraphrased or
    * copied leakage a verbatim check cannot see — the near-duplicate
    * overlap metric model releases report next to n-gram overlap).
    * Same machinery as [[semanticDupMatches]] (assign each eval doc to
    * its fitted training cell, score only that cell's members), but
    * the report keeps the evidence: distinct contaminating sources AND
    * the best similarity among them (−2 sentinel when none — below any
    * real cosine).
    *
    * Scale shape: the training index is fitted once ([[semanticIndex]],
    * capped driver-local k-means) and saved; eval sets are small by
    * definition, so the probe is one broadcast-friendly cell join —
    * per eval doc only its own cell's members are scored, never the
    * corpus.
    *
    * @return (in_id, n_sources, best_sim [6 dp, −2 when clean],
    *         contaminated 1|0) for every assigned eval row */
  def semanticContamination(evalBatch: DataFrame, index: DataFrame,
      centers: Array[Array[Double]], threshold: Double): DataFrame = {
    val assigned = assignToCells(evalBatch, centers)
      .select(col("vec_id").as("in_id"), col("embedding").as("iv"),
        col("vnorm").as("inorm"), col("cell"))
    val members = index.select(col("cell"), col("nid"), col("nv"),
      col("nnorm"))
    assigned.join(members, Seq("cell"))
      .withColumn("sim",
        cosinePre(dotFast(col("iv"), col("nv")), col("inorm"), col("nnorm")))
      .groupBy(col("in_id"))
      .agg(
        size(collect_set(when(col("sim") >= threshold, col("nid"))))
          .cast("long").as("n_sources"),
        round(coalesce(max(when(col("sim") >= threshold, col("sim"))),
          lit(-2.0)), 6).as("best_sim"))
      .select(col("in_id"), col("n_sources"), col("best_sim"),
        when(col("n_sources") > 0, 1L).otherwise(0L).as("contaminated"))
  }

  /** Semantic dedup (the SemDeDup shape: Abbas et al. 2023,
    * arXiv:2303.09540): LSH catches near-LITERAL duplicates; this is the
    * standard second pass that removes semantic duplicates in embedding
    * space — k-means cells partition the corpus, intra-cell pairs above
    * the cosine threshold mark the GREATER id as a duplicate (keep-
    * lowest-id, the Dedup.dedupeCorpus decision rule).
    *
    * Scale shape: candidate generation is bucketed by cell — the
    * quadratic term is bounded by the largest cell, never the corpus.
    * At 100 TB, nCells must grow with the corpus (SemDeDup's own recipe:
    * n/avgCellSize clusters); for heavier cells, compose with
    * [[cosineDupPairs]]' SRP banding INSIDE each cell. The fit is the
    * capped-sample driver-local [[fitAssign]] (index-build cost does not
    * grow with the corpus); assignment is one narrow pass.
    *
    * @return one row per non-degenerate vector: (vec_id, cell, n_dups =
    *         intra-cell partners at sim ≥ threshold, keep = no such
    *         partner with a smaller id) */
  def semanticDedup(corpus: DataFrame, threshold: Double, nCells: Int = 16,
      maxIter: Int = 10, maxTrainRows: Long = 100000L): DataFrame = {
    val (assigned, _) = fitAssign(corpus, nCells, maxIter, maxTrainRows)
    // read 3× (two pair sides + final labels) — persist via the caches
    // contract so benched queries release it
    val cells = OperatorCaches.track(assigned.persist())
    val a = cells.select(col("cell"), col("nid").as("idA"),
      col("nv").as("vA"), col("nnorm").as("normA"))
    val b = cells.select(col("cell"), col("nid").as("idB"),
      col("nv").as("vB"), col("nnorm").as("normB"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("idA") < col("idB"))
      .withColumn("sim",
        cosinePre(dotFast(col("vA"), col("vB")), col("normA"), col("normB")))
      .filter(col("sim") >= threshold)
      .select(col("idA"), col("idB"))
    val nDups = pairs.select(col("idA").as("vec_id"))
      .unionByName(pairs.select(col("idB").as("vec_id")))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_dups"))
    val droppedIds = pairs.select(col("idB").as("vec_id")).distinct()
      .withColumn("dropped", lit(true))
    cells.select(col("nid").as("vec_id"), col("cell").cast("int").as("cell"))
      .join(nDups, Seq("vec_id"), "left")
      .join(droppedIds, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("dropped").isNull.as("keep"))
  }
}
