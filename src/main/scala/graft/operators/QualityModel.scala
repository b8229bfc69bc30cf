package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality scoring — the learned half of the curation stack
  * (the CCNet/fastText shape: hashed bag-of-words features + a linear
  * model). The rule battery (`TextQueries.gopherRules`) supplies the
  * training labels, so the model is a distillation of the rules into a
  * classifier that generalizes past them — exactly how production
  * pipelines bootstrap a quality model before human labels exist.
  *
  * Features: COUNT-SKETCH hashed bag-of-words — every token probes TWO
  * buckets (fnv1a64 of the token and of the reversed token, low bits),
  * plus a constant bias. Two probes matter: with one hash, a quality-
  * bearing token colliding with a frequent neutral token makes the
  * classes inseparable in bucket space (measured here: 'a' shares its
  * single-hash bucket with two corpus nouns up to 4096 buckets); the
  * second independent probe restores a separating direction at 2×32
  * buckets. This is the multiple-hashing variant of the hashing trick
  * (Weinberger et al. 2009); production fastText sidesteps it with 2M
  * bins, the two-probe form keeps the weight vector small enough for
  * the SQL oracle to fold.
  *
  * Trainer: the online MARGIN PERCEPTRON — docs in ascending-id order,
  * w += y'·x whenever y'·(w·x) ≤ margin — chosen over logistic GD
  * deliberately, for cross-engine exactness reasons discovered the
  * hard way:
  *  - exp()-based logistic is not bit-identical across engines;
  *  - fixed-point batch GD needs a per-update division whose integer
  *    truncation freezes learning once |grad| < divisor (a dead zone
  *    measured at 15–25% residual error here), while division-FREE
  *    batch subgradient steps limit-cycle;
  *  - the perceptron update is pure integer addition — no division,
  *    no clamp, no float — and on linearly separable data Novikoff
  *    guarantees convergence. Measured: zero sample error within 128
  *    epochs for every (test scale × per-class cap) sample, so the
  *    FIXED `Epochs` budget is parity-safe (a converged epoch performs
  *    zero updates — a no-op — so an oracle folding the full budget
  *    reaches the identical w).
  * The margin (rather than plain perceptron) buys generalization:
  * update-until-comfortably-correct leaves held-out near-threshold
  * docs on the right side.
  *
  * Determinism: the fold order is sample docs sorted by id, epochs
  * outer — a pure function of (corpus, labels). The oracle replays the
  * ENTIRE fit as one `list_reduce` over the epoch-repeated sample list
  * (fixed-size SQL regardless of epoch count), then every per-doc
  * integer score and verdict.
  *
  * Scale shape (100 TB): the LocalKMeans discipline — one distributed
  * pass aggregates per-doc probe counts, the deterministic sample
  * (the mix64 bottom-[[SampleCap]] docs of EACH class — a per-class
  * hash cap, so the collect is ≤ 2·SampleCap docs ≈ 65 longs/doc no
  * matter the corpus size or the label skew) collects to the driver,
  * the fit is O(sample·Epochs) driver-local, then the 65 weights
  * broadcast for one distributed scoring pass. The cap is a bounded
  * map-side aggregator (one bottom-k heap per class per partition),
  * not a sort; Novikoff's convergence bound is sample-size-free, so
  * capping costs epochs nothing. No iterative Spark jobs; the only
  * shuffle is the feature groupBy.
  */
object QualityModel {

  /** Buckets per probe (power of two: bucket = low bits of the hash —
    * `h & (NumBuckets-1)` == unsigned mod, replayable as `%` on
    * UBIGINT). Probe 1 occupies [0, NumBuckets), probe 2
    * [NumBuckets, 2·NumBuckets). */
  val NumBuckets = 32

  /** Bias feature index (constant x = 1 for every doc). */
  val BiasIdx: Int = 2 * NumBuckets

  /** Dense feature dimension. */
  val Dim: Int = 2 * NumBuckets + 1

  /** Fixed epoch budget (converged epochs are no-ops — see scaladoc).
    * Sized with headroom over the measured convergence point: the
    * capped per-class samples at every test SF reach zero sample
    * error within 128 epochs (48 leaves up to 21 errors for some
    * mix64-sampled orderings), so the budget is 128. */
  val Epochs = 128

  /** Perceptron margin: update while y'·(w·x) ≤ Margin. */
  val Margin = 32L

  /** Fit-sample cap PER CLASS: each class contributes its mix64
    * bottom-SampleCap doc ids (the perplexityTiers / LocalKMeans
    * sampling discipline), so the driver collect is bounded by
    * 2·SampleCap docs — a CONSTANT, independent of corpus rows and of
    * label skew. Sized so every test scale's sample is still rich
    * enough for zero training error within [[Epochs]] (Novikoff's
    * mistake bound does not grow with sample size). */
  val SampleCap = 512

  /** Per-doc count-sketch feature rows (id, b, x): token-count per
    * probed bucket plus the bias row (BiasIdx, 1). Token basis =
    * whitespace tokens of lowercased text, empties dropped (the
    * vocabulary discipline). */
  def featureRows(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = corpus.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
    val probe1 = toks.select(col("id"),
      (TextFunctions.fnv1a64Col(col("tok"))
        .bitwiseAND(lit(NumBuckets - 1L))).cast("int").as("b"))
    val probe2 = toks.select(col("id"),
      (lit(NumBuckets) + TextFunctions.fnv1a64Col(reverse(col("tok")))
        .bitwiseAND(lit(NumBuckets - 1L))).cast("int").as("b"))
    probe1.unionByName(probe2)
      .groupBy(col("id"), col("b"))
      .agg(count(lit(1)).as("x"))
      .unionByName(corpus.select(col(idCol).as("id"),
        lit(BiasIdx).as("b"), lit(1L).as("x")))
  }

  /** One collected sample document: (id, label, dense Dim-long feature
    * vector). */
  final case class SampleDoc(id: Long, y: Int, x: Array[Long])

  /** Driver-local margin-perceptron fit (see object scaladoc). The
    * sample MUST be sorted by id — the online update order is part of
    * the fit's definition. Pure integer adds; returns the Dim
    * weights. */
  def fit(sample: Array[SampleDoc], epochs: Int = Epochs,
      margin: Long = Margin): Array[Long] = {
    require(sample.nonEmpty, "QualityModel.fit: empty sample")
    val w = new Array[Long](Dim)
    var e = 0
    while (e < epochs) {
      var d = 0
      while (d < sample.length) {
        val doc = sample(d)
        val ys = if (doc.y == 1) 1L else -1L
        var z = 0L
        var b = 0
        while (b < Dim) { z += w(b) * doc.x(b); b += 1 }
        if (ys * z <= margin) {
          b = 0
          while (b < Dim) { w(b) += ys * doc.x(b); b += 1 }
        }
        d += 1
      }
      e += 1
    }
    w
  }

  /** Deterministic capped fit-sample ids: EACH class's mix64
    * bottom-`sampleCap` doc ids, selected by a bounded per-class
    * bottom-k aggregator (no global sort; the shuffle moves at most
    * 2·partitions·sampleCap slim rows). SQL-replayable: row_number()
    * over (PARTITION BY y ORDER BY mix64(id)) ≤ cap. */
  def sampleIds(labels: DataFrame, sampleCap: Int): Array[Long] = {
    val mixFlip = udf((id: Long) =>
      graft.functions.TextFunctions.mix64(id) ^ Long.MinValue)
    // ids ride the LONG-payload aggregator — the double-payload variant
    // silently corrupts ids above 2^53 (round-14 advice)
    val ids = labels
      .select(col("y"), col("id"),
        mixFlip(col("id").cast("long")).as("_h"))
      .groupBy(col("y"))
      .agg(graft.plans.BottomKAggregator.bottom_k_sample_long(sampleCap)(
        col("_h"), col("id").cast("long")).as("ids"))
      .select(explode(col("ids")).as("id"))
      .collect().map(_.getLong(0))
    require(ids.length <= 2 * sampleCap,
      s"QualityModel.sampleIds: ${ids.length} ids exceed the 2×$sampleCap bound")
    ids
  }

  /** The shared fit pipeline: labels and feature rows (persisted via
    * the caches contract), the capped per-class sample ids, and the
    * driver-local weights. */
  private def fitCore(corpus: DataFrame, idCol: String, textCol: String,
      label: Column, sampleCap: Int)
      : (DataFrame, DataFrame, Array[Long], Array[Long]) = {
    val labels = OperatorCaches.track(corpus.select(col(idCol).as("id"),
      when(label, 1).otherwise(0).as("y")).persist())
    val feats = OperatorCaches.track(
      featureRows(corpus, idCol, textCol).persist())
    val ids = sampleIds(labels, sampleCap)
    val sampleRows = feats.join(labels, Seq("id"))
      .filter(col("id").isInCollection(ids))
      .select(col("id"), col("y"), col("b"), col("x"))
      .collect()
    val byDoc = new scala.collection.mutable.HashMap[Long, SampleDoc]()
    sampleRows.foreach { r =>
      val doc = byDoc.getOrElseUpdate(r.getLong(0),
        SampleDoc(r.getLong(0), r.getInt(1), new Array[Long](Dim)))
      doc.x(r.getInt(2)) = r.getLong(3)
    }
    require(byDoc.size <= 2 * sampleCap,
      s"QualityModel.fitCore: sample of ${byDoc.size} docs exceeds 2×$sampleCap")
    (labels, feats, ids, fit(byDoc.values.toArray.sortBy(_.id)))
  }

  /** Fit only: the Dim weights from the capped per-class sample — for
    * callers that score elsewhere (the streaming gate closes a
    * row-wise scorer over these). */
  def fitWeights(corpus: DataFrame, idCol: String, textCol: String,
      label: Column, sampleCap: Int = SampleCap): Array[Long] =
    fitCore(corpus, idCol, textCol, label, sampleCap)._4

  /** ROW-WISE integer scorer over fitted weights: one pass per doc,
    * accumulating w[probe1(tok)] + w[probe2(tok)] per token + the bias
    * weight — by linearity exactly the distributed groupBy-then-dot
    * score (Σ_b w(b)·x(b)), proven equal by spec. STATELESS, so it
    * scores a streaming frame with zero state store; the weights ride
    * in the closure (65 longs). Token basis matches [[featureRows]]:
    * whitespace tokens of the lowercased text, empties dropped. */
  def scoreText(w: Array[Long]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(w.length == Dim, s"scoreText: ${w.length} weights, want $Dim")
    udf((text: String) => {
      var z = w(BiasIdx)
      if (text != null) {
        val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) {
            z += w((graft.functions.TextFunctions.fnv1a64(t)
              & (NumBuckets - 1L)).toInt)
            z += w(NumBuckets + (graft.functions.TextFunctions.fnv1a64(t.reverse)
              & (NumBuckets - 1L)).toInt)
          }
          i += 1
        }
      }
      z
    })
  }

  /** Full operator: label every doc with `label` (1 = keep), train on
    * the mix64 bottom-`sampleCap` docs OF EACH CLASS — a constant-
    * bounded deterministic sample whatever the corpus size or label
    * skew, and still one rank predicate in SQL, which is what lets
    * the oracle rebuild the exact sample — then score EVERY doc with
    * the broadcast weights.
    *
    * Returns (id, label, score, pred, in_sample): score is the exact
    * integer dot product w·x, pred = score > 0. */
  def classify(corpus: DataFrame, idCol: String, textCol: String,
      label: Column, sampleCap: Int = SampleCap): DataFrame = {
    val (labels, feats, ids, w) =
      fitCore(corpus, idCol, textCol, label, sampleCap)
    val spark = corpus.sparkSession
    import spark.implicits._
    val wDf = w.zipWithIndex.map { case (wv, b) => (b, wv) }.toSeq
      .toDF("b", "w")
    feats.join(broadcast(wDf), Seq("b"))
      .groupBy(col("id"))
      .agg(sum(col("w") * col("x")).as("score"))
      .join(labels, Seq("id"))
      .select(col("id"), col("y").cast("long").as("label"),
        col("score"),
        when(col("score") > 0, 1L).otherwise(0L).as("pred"),
        when(col("id").isInCollection(ids), 1L)
          .otherwise(0L).as("in_sample"))
  }
}
