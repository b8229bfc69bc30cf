package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

import graft.plans.BottomKAggregator

/** Deterministic, cross-engine-replayable sketches.
  *
  * Spark's own approx aggregates (HLL `approx_count_distinct`,
  * `percentile_approx`) are implementation-defined — correct but not
  * comparable against another engine (q25 stays a rows-only check for
  * exactly that reason). A KMV (k-minimum-values / bottom-k) sketch over
  * a SPECIFIED hash is different: every stage is plain integer and IEEE
  * double arithmetic, so a second engine replays it bit-for-bit — the
  * q106 oracle rebuilds the whole sketch in DuckDB (the same
  * split-multiply mod-2^64 machinery as the MinHash oracles).
  *
  * Scale shape: one `(group, value)` dedup shuffle, then a bounded-heap
  * aggregation ([[graft.plans.BottomKAggregator]]) whose shuffle carries
  * ≤ k longs per group per map task. Sketches are mergeable by
  * construction (union the lists, keep the k smallest), which is what
  * makes them partition-friendly at 100 TB.
  */
object Sketches {

  /** splitmix64 finalizer — THE kernel the MinHash oracles already
    * replay (TextFunctions.mix64), lifted to a Column. A JVM udf, not
    * Column arithmetic: the wrapping multiplies would throw under ANSI
    * mode (same reason srpSignature is a fused kernel). Bijection on
    * 64-bit inputs: distinct values stay distinct, outputs uniform —
    * exactly what the KMV estimator needs. Null-safe INSIDE the udf
    * (the optimizer may evaluate it before any null filter). */
  private val mix64Udf = udf((x: java.lang.Long) =>
    if (x == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(graft.functions.TextFunctions.mix64(x)))

  def mix64Col(x: Column): Column = mix64Udf(x)

  /** mix64 ∘ fnv1a64 over UTF-8 — the STRING hash path. fnv1a64 is the
    * token hash the MinHash oracles already replay in DuckDB
    * (TextQueries.lshCandidateCtes' HUGEINT fold), so string-keyed
    * sketches stay cross-engine replayable. Null-safe inside the udf for
    * the same reason as [[mix64Udf]]. */
  private val mix64StrUdf = udf((s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(graft.functions.TextFunctions.mix64(
      graft.functions.TextFunctions.fnv1a64(s))))

  /** Hash a sketch key column to a uniform 64-bit value, dispatching on
    * the column's DECLARED type: integral → mix64(long) (the original
    * oracled path, a bijection — distinct values stay distinct); string →
    * mix64(fnv1a64(utf8 bytes)) (collisions theoretically possible, the
    * standard sketch trade — and the q109/q110 oracles replay the
    * identical fold in DuckDB, so cross-engine exactness is unaffected,
    * gated every round). Any other type is rejected
    * LOUDLY: the old unconditional `cast("long")` turned a non-null
    * string into a null long, which then NPE'd the primitive bottom-k
    * aggregator input — exactly the columns (user ids, URLs, doc keys) a
    * pipeline user would sketch first. */
  private[graft] def hashInput(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      // ByteType|ShortType|IntegerType|LongType spelled out: the obvious
      // `case _: IntegralType` doesn't compile — Spark 4.1.2 marks the
      // IntegralType abstract class private[sql] in its Scala signature
      case ByteType | ShortType | IntegerType | LongType =>
        mix64Col(col(colName).cast("long"))
      case StringType      => mix64StrUdf(col(colName))
      case dt => throw new IllegalArgumentException(
        s"Sketches: key column '$colName' has type ${dt.simpleString}; " +
          "sketch keys must be integral (byte/short/int/long) or string. " +
          "Cast explicitly first if a lossy encoding is intended.")
    }

  private[graft] val TwoPow64: Double = math.pow(2, 64)

  /** JVM twin of the Column-form estimator in [[kmvDistinct]] — the SAME
    * IEEE op sequence (signed k-th → double → +2^64 when negative), used
    * by the streaming state operator so stream and batch estimates are
    * bit-identical. `ks` = ascending flipped hashes (sign-bit-flipped →
    * signed order == unsigned order). */
  private[graft] def kmvEstimateKernel(ks: Seq[Long], k: Int): Double =
    if (ks.size < k) ks.size.toDouble
    else {
      val vk = ks(k - 1) ^ Long.MinValue // undo the flip
      val u = if (vk >= 0) vk.toDouble else vk.toDouble + TwoPow64
      (k - 1).toDouble * TwoPow64 / u
    }

  /** KMV distinct-count estimate per group: hash the values with mix64,
    * keep the k smallest distinct hashes (unsigned order — the sign bit
    * is flipped so signed compare gives unsigned order), and estimate
    *
    *   D̂ = (k−1) · 2^64 / u_k      (u_k = k-th smallest hash, unsigned)
    *
    * — the classic KMV/bottom-k estimator: if D distinct uniform hashes
    * land in [0, 2^64), the k-th smallest sits near k/D of the range.
    * Fewer than k distinct values ⇒ the sketch holds ALL of them and the
    * estimate is exact by definition.
    *
    * Numeric discipline for cross-engine exactness: u_k is derived from
    * the SIGNED k-th hash via `double(v) + double(2^64) when v < 0` —
    * the oracle performs the identical IEEE op sequence (a direct
    * unsigned→double cast on one side vs signed-then-add on the other
    * can double-round differently near 2^53). */
  /** The Column-form KMV estimator over a bottom-k list column (ascending
    * FLIPPED hashes) — the exact IEEE sequence of [[kmvEstimateKernel]];
    * one expression shared by the batch and event-time-windowed forms so
    * the arithmetic cannot drift between their gates. */
  private[graft] def kmvEstimateColumn(ks: Column, k: Int): Column = {
    val kth = element_at(ks, k)
    // undo the flip (xor, not subtraction — ANSI-safe, no overflow)
    val vk = kth.bitwiseXOR(lit(Long.MinValue))
    val uK = when(vk >= 0, vk.cast("double"))
      .otherwise(vk.cast("double") + lit(TwoPow64))
    when(size(ks) < k, size(ks).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow64) / uK)
  }

  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // sign-bit flip: signed order of (h ^ Long.MinValue) == unsigned
    // order of h; on the integral path the hash is a bijection, so
    // distinct-on-hash == distinct-on-value (string path: standard
    // sketch collision trade, replayed identically by the oracle)
    val flipped = hashInput(df, valueCol)
      .bitwiseXOR(lit(Long.MinValue))
    // null values are excluded, matching COUNT(DISTINCT)'s null semantics
    // — and a null would NPE the primitive-Long aggregator input anyway
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), flipped.as("_h"))
      .distinct()
      .groupBy(col(groupCol))
      .agg(BottomKAggregator.bottom_k(k)(col("_h")).as("_ks"))
      .select(col(groupCol),
        kmvEstimateColumn(col("_ks"), k).as("kmv_estimate"))
  }

  /** KMV set algebra: distinct-count estimates for two groups, their
    * UNION and their INTERSECTION, plus a Jaccard estimate — from the two
    * bottom-k sketches alone. The union sketch is just the k smallest of
    * the merged lists (KMV is mergeable); the intersection uses the
    * standard ρ-estimator: of the union sketch's hashes, the fraction
    * present in BOTH group sketches, scaled by the union estimate. This
    * is how cross-source overlap (shared users, shared documents) is
    * estimated at 100 TB without ever joining the sources — the sketches
    * are a few hundred bytes each.
    *
    * The per-group sketches are computed distributed (same plan as
    * [[kmvDistinct]]); the set algebra runs on the driver over 2×k longs
    * — that is the point of a sketch. Estimates are exact whenever the
    * true cardinality fits the sketch ([[kmvEstimateKernel]]'s `< k`
    * branch; the intersection divides by the union-sketch SIZE, so the
    * all-fits case degrades to exact set arithmetic). */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String, k: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val flipped = hashInput(df, valueCol)
      .bitwiseXOR(lit(Long.MinValue))
    val sketches = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("g"), flipped.as("_h"))
      .distinct()
      .groupBy(col("g"))
      .agg(BottomKAggregator.bottom_k(k)(col("_h")).as("_ks"))
      .as[(String, Seq[Long])].collect().toMap
    val a = sketches.getOrElse(groupA, Seq.empty)
    val b = sketches.getOrElse(groupB, Seq.empty)
    val union = (a ++ b).distinct.sorted.take(k)
    val dU = kmvEstimateKernel(union, k)
    val aSet = a.toSet
    val bSet = b.toSet
    val c = union.count(h => aSet(h) && bSet(h))
    val (dI, jac) =
      if (union.isEmpty) (0.0, 0.0)
      else (c.toDouble / union.size * dU, c.toDouble / union.size)
    Seq((groupA, groupB, kmvEstimateKernel(a, k), kmvEstimateKernel(b, k),
      dU, dI, jac))
      .toDF("group_a", "group_b", "d_a", "d_b", "d_union", "d_intersect",
        "jaccard_est")
  }

  /** Approximate quantiles from a DETERMINISTIC uniform sample: keep the
    * k rows whose mix64(id) hashes are smallest per group (hash order is
    * independent of the value, so the sample is uniform over rows — the
    * no-RNG reservoir), then nearest-rank quantiles over the sorted
    * sample: element at index floor(q·(n−1)) (0-based, n = sample size).
    *
    * vs Spark's `percentile_approx` (GK sketch — correct, but its
    * internals are engine-specific so its output can never be compared
    * across engines): every step here is specified arithmetic, replayed
    * bit-for-bit by the q107 oracle. Accuracy is the standard sampling
    * bound (quantile stderr ≈ sqrt(q(1−q)/k)); state is k doubles per
    * group per map task, mergeable, one shuffle.
    *
    * `idCol` must be a unique row key (its hash is the sample order AND
    * the dedup key — a task-retry replay cannot double-insert a row).
    * String ids: the effective dedup key is mix64(fnv1a64(id)), so the
    * uniqueness guarantee holds only up to hash collisions — two distinct
    * ids that collide share one sample slot (the standard sketch trade,
    * same as the kmv paths; ~n²/2^65 expected collisions, negligible at
    * any real sample size). Integral ids keep the exact guarantee (the
    * hash is a bijection). */
  /** Deterministic HLL-shaped distinct sketch — the register form of
    * cardinality estimation (fixed memory: 64 registers per group,
    * vs KMV's k hashes), with every stage SPECIFIED so a second engine
    * replays it bit-for-bit; Spark's own `approx_count_distinct` HLL is
    * implementation-defined (q25 stays rows-only for that reason), this
    * is the comparable-by-construction counterpart.
    *
    * Spec: hash = [[hashInput]] (the oracled mix64 dispatch); register
    * index = top 6 bits of the unsigned hash (m = 64 registers); rho =
    * 1 + leading zeros of the remaining 58-bit window (59 when the
    * window is all-zero), CAPPED at 40 so the per-register term
    * 2^(40−rho) stays a long and the per-group SUM (≤ 64·2^40 = 2^46)
    * converts to double exactly — summation order cannot matter, which
    * is what makes the estimate cross-engine exact. Estimate =
    * α₆₄·m²·2^40 / Σ 2^(40−M_j) with α₆₄ = 0.709 — the raw HLL
    * estimator, deliberately WITHOUT the small/large-range corrections
    * (those need ln/linear-counting branches whose libm values differ
    * across engines; the raw form is one IEEE multiply chain + divide).
    * Empty registers contribute 2^40 (M_j = 0), as in standard HLL.
    *
    * Scale shape: one (group, idx) max-aggregation — partial max
    * map-side, 64 slim rows per group per map task — then a per-group
    * fold. Registers merge by max, so the sketch is partition- and
    * stream-mergeable by construction. */
  // idx and capped rho fused in one udf (wrapping/unsigned long ops —
  // Column arithmetic would trip ANSI), encoded idx*256 + rho
  private[graft] val hllRegUdf = udf((x: java.lang.Long) =>
    if (x == null) null
    else {
      val u = x.longValue()
      val idx = (u >>> 58).toInt
      val w = u & ((1L << 58) - 1)
      val rho = if (w == 0L) 59 else java.lang.Long.numberOfLeadingZeros(w) - 5
      java.lang.Integer.valueOf(idx * 256 + math.min(rho, 40))
    })

  /** JVM twin of [[hllEstimate]] over a FULL 64-register array — the
    * same IEEE sequence (the integer term sum over all 64 registers
    * equals present-sum + (64−n)·2^40 exactly, then one double divide),
    * used by the streaming state operator so stream and batch estimates
    * are bit-identical. */
  private[graft] def hllEstimateKernel(regs: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < 64) { s += 1L << (40 - regs(i)); i += 1 }
    0.709 * 4096.0 * 1099511627776.0 / s.toDouble
  }

  /** The raw α₆₄ estimator over a register frame's (term-sum, register
    * count) — shared by [[hllRaw]] and [[hllAlgebra]] so the IEEE op
    * sequence cannot drift between them. coalesce: an EMPTY population
    * has no registers at all (sum null, count 0) → all-empty sum. */
  private def hllEstimate(ps: Column, np: Column): Column =
    lit(0.709) * lit(4096.0) * lit(1099511627776.0) /
      (coalesce(ps, lit(0L)) +
        (lit(64L) - coalesce(np, lit(0L))) * lit(1099511627776L)).cast("double")

  /** Per-population register frame (_idx, _reg) — max per register. */
  private def hllRegs(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(hllRegUdf(hashInput(df, valueCol)).as("_im"))
      .select(expr("_im DIV 256").as("_idx"), expr("_im % 256").as("_m"))
      .groupBy(col("_idx")).agg(max(col("_m")).as("_reg"))

  /** Per-key estimates from a register frame (`keyCols` + `_idx`,
    * `_reg`) — the estimator tail of [[hllRaw]], shared with the
    * event-time-windowed streaming form (whose registers arrive from a
    * windowed max aggregation instead): one fold per key, the identical
    * IEEE sequence. */
  private[graft] def hllEstimateOver(regs: DataFrame,
      keyCols: Seq[String]): DataFrame =
    regs.groupBy(keyCols.map(col): _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - _reg)")).as("_ps"),
        count(lit(1)).as("_np"))
      .select(keyCols.map(col) :+
        hllEstimate(col("_ps"), col("_np")).as("hll_estimate"): _*)

  def hllRaw(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    hllEstimateOver(
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol), hllRegUdf(hashInput(df, valueCol)).as("_im"))
        .select(col(groupCol), expr("_im DIV 256").as("_idx"),
          expr("_im % 256").as("_m"))
        .groupBy(col(groupCol), col("_idx"))
        .agg(max(col("_m")).as("_reg")),
      Seq(groupCol))

  /** HLL set algebra: distinct-count estimates for two populations,
    * their UNION, and their INTERSECTION — from the registers alone,
    * never joining the populations (the q108 cross-source-overlap story
    * in the register-sketch form). Union is EXACT sketch algebra (HLL
    * registers merge by max — the union's sketch IS the elementwise max,
    * by construction, which is why HLL survives any partitioning or
    * shard layout at 100 TB); intersection is inclusion–exclusion over
    * the three raw estimates, clamped at 0 (the standard trade — I–E
    * variance grows when the overlap is small). Emits one row:
    * est_a, est_b, est_union, est_intersection (unrounded doubles;
    * callers round ONCE for display). */
  def hllAlgebra(dfA: DataFrame, dfB: DataFrame, valueCol: String): DataFrame = {
    val ra = hllRegs(dfA, valueCol)
    val rb = hllRegs(dfB, valueCol)
    val ru = ra.union(rb).groupBy(col("_idx")).agg(max(col("_reg")).as("_reg"))
    def est(regs: DataFrame, name: String): DataFrame =
      regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - _reg)")).as("_ps"),
          count(lit(1)).as("_np"))
        .select(hllEstimate(col("_ps"), col("_np")).as(name))
    est(ra, "est_a").crossJoin(est(rb, "est_b")).crossJoin(est(ru, "est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersection"))
  }

  /** Count–Min frequency sketch — the third classic sketch family next
    * to distinct counts (KMV/HLL) and quantiles (hash sample): a d×w
    * counter matrix; est(x) = min over rows of counter[r][pos_r(x)],
    * never an underestimate, overestimates only on collisions. The
    * position kernel is [[Bloom.positions]] (Kirsch–Mitzenmacher double
    * hashing over the oracled mix64, power-of-two w), so the q123
    * oracle replays positions, counters AND estimates exactly.
    *
    * Scale shape: the counter build is one explode + count — the
    * (r, pos) domain is bounded by d·w, so map-side partial aggregation
    * caps every task's shuffle output at d·w slim rows; counters are
    * mergeable by plain addition (shard, window, or stream merges are
    * sums). Estimation joins the probe's d positions against the
    * counter table — counters are ≤ d·w rows, a broadcast at any
    * realistic width. */
  def cmCounters(df: DataFrame, valueCol: String, w: Int, d: Int): DataFrame = {
    Bloom.checkParams(w, d, who = "Sketches.cmCounters", mName = "w", kName = "d")
    // posexplode over the shared position kernel: the array INDEX is the
    // hash-row number r — build and probe cannot desynchronize because
    // neither defines its own pairing
    df.filter(col(valueCol).isNotNull)
      .select(posexplode(
        Bloom.positionsCol(df, valueCol, w, d, who = "Sketches.cmCounters")))
      .select(col("pos").as("r"), col("col").as("pos"))
      .groupBy(col("r"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a probe frame's `valueCol` against a
    * [[cmCounters]] table: min over the d row counters, absent cells
    * counting 0 (a never-seen key estimates 0 exactly). */
  def cmEstimates(counters: DataFrame, probe: DataFrame, valueCol: String,
      w: Int, d: Int): DataFrame = {
    Bloom.checkParams(w, d, who = "Sketches.cmEstimates", mName = "w", kName = "d")
    probe.filter(col(valueCol).isNotNull)
      .select(col(valueCol), posexplode(
        Bloom.positionsCol(probe, valueCol, w, d, who = "Sketches.cmEstimates")))
      .select(col(valueCol), col("pos").as("r"), col("col").as("pos"))
      .join(broadcast(counters), Seq("r", "pos"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_cm"))
  }

  /** The shared gate shape for the CM queries (q123/q126/q127): top-20
    * true frequencies (count desc, key asc — a total order) next to
    * their CM estimates from `counters`. */
  private[graft] def cmTopKGate(df: DataFrame, counters: DataFrame,
      keyCol: String, w: Int, d: Int): DataFrame = {
    val truth = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_true"))
      .orderBy(desc("n_true"), asc(keyCol)).limit(20)
    truth.join(cmEstimates(counters, truth.select(col(keyCol)), keyCol, w, d),
        Seq(keyCol))
      .select(col(keyCol), col("n_true"), col("n_cm"))
  }

  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, qs: Seq[Double], k: Int = 256): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q < 1.0))
    // null id/value rows are excluded (a null would NPE the primitive
    // aggregator input; quantiles over nulls are undefined anyway)
    val sampled = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), hashInput(df, idCol).as("_h"),
        col(valueCol).cast("double").as("_v"))
      .groupBy(col(groupCol))
      .agg(BottomKAggregator.bottom_k_sample(k)(col("_h"), col("_v"))
        .as("_sample"))
      .withColumn("_sorted", sort_array(col("_sample")))
    sampled.select(col(groupCol) +: quantileCols(col("_sorted"), qs): _*)
  }

  /** Nearest-rank selection columns over a sorted sample array — shared
    * by the batch ([[sampleQuantiles]]), windowed and streaming forms so
    * the index arithmetic can never diverge. floor(q·(n−1)) in double,
    * +1 for 1-based element_at — the oracle performs the identical
    * sequence. Labels are exact decimals (p50, p99, p99_9, p12_5):
    * rounding would collide 0.99 with 0.994. */
  private[graft] def quantileCols(sorted: Column, qs: Seq[Double]): Seq[Column] =
    qs.map { q =>
      val idx = floor(lit(q) * (size(sorted) - 1)).cast("int") + 1
      val label = "p" + BigDecimal(q.toString).*(100)
        .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
      element_at(sorted, idx).as(label)
    }
}
