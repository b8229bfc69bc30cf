package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + ANN.
  *
  * The 100 TB memory story: a d-dim float vector (d·4 bytes) compresses
  * to m bytes — one codebook index per subspace (m subspaces of d/m dims,
  * k=256-max centroids each; here k≤16 for the tiny test corpus). At
  * d=64, m=8 that is 256 B → 8 B per vector, 32×. Scoring is asymmetric
  * distance computation (ADC): per query, precompute an m×k table of
  * subvector dot products against every centroid; a corpus vector's
  * approximate dot is then m table lookups on its code — no float vector
  * is ever touched at scan time.
  *
  * Codebooks are trained per subspace with KMeans on a sample
  * (deterministic seed), broadcast everywhere; encode is one narrow pass.
  */
object ProductQuantization {

  /** codebooks(sub)(centroid) = centroid subvector */
  final case class PQModel(m: Int, subDim: Int,
      codebooks: Array[Array[Array[Float]]]) extends Serializable

  /** Trains on a deterministic hash-sample capped at ~`maxTrainRows`
    * vectors (codebook quality saturates long before the corpus does);
    * the sampled projection is persisted once and sliced per subspace —
    * m KMeans fits but ONE pass over the source data. */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16,
      seed: Long = 42L, maxTrainRows: Long = 100000L): PQModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val total = corpus.count()
    val every = math.max(1L, total / maxTrainRows)
    val sample = corpus
      .filter(col("embedding").isNotNull &&
        pmod(hash(col("vec_id")), lit(every)) === 0)
      .select(col("embedding")).persist()
    // explicit guard: an empty sample (empty corpus / all-null embeddings)
    // must fail with a diagnosable message, not head()'s NoSuchElementException
    val firstDim = sample.select(size(col("embedding"))).head(1)
    require(firstDim.nonEmpty,
      "PQ.train: no trainable vectors (empty corpus or all-null embeddings)")
    val dim = firstDim(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    // the m fits are independent driver-iterative jobs over the SAME
    // persisted sample — run them concurrently (Spark schedules concurrent
    // jobs fine; each is tiny). Sequential fits were the whole q46 bench
    // cost: 8 × ~1 s of driver-iteration latency, not compute.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
    val ec = ExecutionContext.fromExecutorService(pool)
    val codebooks =
      try {
        val fits = (0 until m).map { s =>
          Future {
            val sub = sample.select(array_to_vector(
              slice(col("embedding"), s * subDim + 1, subDim)).as("features"))
            val model = new KMeans().setK(k).setSeed(seed + s).setMaxIter(5)
              .fit(sub)
            model.clusterCenters.map(_.toArray.map(_.toFloat))
          }(ec)
        }
        fits.map(Await.result(_, Duration.Inf)).toArray
      } finally ec.shutdown()
    sample.unpersist()
    PQModel(m, subDim, codebooks)
  }

  /** Nearest centroid per subspace → m-byte code (as Array[Int] for
    * Spark-friendliness; values < k ≤ 256). Null / wrong-dim vectors →
    * null code (dropped by [[encode]] — one bad row must not kill the
    * index build). */
  def encodeKernel(v: Seq[Float], model: PQModel): Array[Int] = {
    if (v == null || v.length != model.m * model.subDim) return null
    val code = new Array[Int](model.m)
    var s = 0
    while (s < model.m) {
      val cb = model.codebooks(s)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0; var i = 0
        while (i < model.subDim) {
          val diff = v(s * model.subDim + i) - cb(c)(i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      code(s) = best
      s += 1
    }
    code
  }

  /** ADC: query's per-subspace dot-product table, then approximate
    * dot(query, corpus) = Σ_s table(s)(code(s)). */
  def adcTable(q: Seq[Float], model: PQModel): Array[Array[Double]] =
    Array.tabulate(model.m) { s =>
      model.codebooks(s).map { c =>
        var d = 0.0; var i = 0
        while (i < model.subDim) {
          d += q(s * model.subDim + i).toDouble * c(i); i += 1
        }
        d
      }
    }

  /** Encode a corpus: (vec_id, code ARRAY<INT>) — the compressed index.
    * Rows with null/malformed embeddings are dropped. */
  def encode(corpus: DataFrame, model: PQModel): DataFrame = {
    val enc = udf((v: Seq[Float]) => Option(encodeKernel(v, model)))
    corpus.select(col("vec_id"), enc(col("embedding")).as("code"))
      .filter(col("code").isNotNull)
  }

  /** Approximate top-k by ADC over the compressed index: queries are
    * collected (small side), their ADC tables broadcast via the UDF
    * closure; the corpus side touches ONLY the m-int codes. */
  def adcTopK(queries: DataFrame, index: DataFrame, model: PQModel,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .filter { case (_, v) => v != null && v.length == model.m * model.subDim }
    val tables = qRows.map { case (qid, v) => (qid, adcTable(v, model)) }
    val score = udf((code: Seq[Int], qIdx: Int) => {
      val t = tables(qIdx)._2
      var s = 0.0; var i = 0
      while (i < code.length) { s += t(i)(code(i)); i += 1 }
      s
    })
    val qIds = tables.zipWithIndex.map { case ((qid, _), i) => (qid, i) }
      .toSeq.toDF("qid", "qIdx")
    val scored = index.crossJoin(broadcast(qIds))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("approx_dot", score(col("code"), col("qIdx")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("approx_dot").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"),
        round(col("approx_dot"), 6).as("approx_dot"), col("rank"))
  }
}
