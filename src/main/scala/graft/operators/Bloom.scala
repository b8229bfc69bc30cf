package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic Bloom filter — the runtime-filter / semi-join-pruning
  * primitive: build a bit array over the small side's join keys, ship it
  * (KBs) to the big side's scan, and drop probe rows whose bits aren't
  * all set BEFORE the shuffle. At 100 TB this is the difference between
  * shuffling the full fact table and shuffling the ~matching slice; Spark
  * has its own runtime bloom (`spark.sql.optimizer.runtime.bloomFilter`),
  * but its filter is implementation-defined — this one's position
  * arithmetic is SPECIFIED (mix64 double hashing, power-of-two m), so a
  * second engine replays build and probe bit-for-bit and the gate hashes
  * the verdicts (q119), false positives included.
  *
  * Position spec: h1 = mix64(key), h2 = mix64(key ^ H2Seed) | 1 (odd →
  * the probe sequence (h1 + i·h2) mod m visits distinct residues for
  * power-of-two m), pos_i = (h1 + i·h2) & (m−1) for i < k — Kirsch–
  * Mitzenmacher double hashing over the splitmix64 kernel the sketch
  * oracles already replay. All wrapping long arithmetic lives in fused
  * JVM udfs (Column multiplies would throw under ANSI mode — the
  * [[Sketches]] precedent).
  *
  * Build shape: explode each key's k positions and `distinct` them — the
  * position domain is bounded by m, so map-side partial aggregation caps
  * every task's shuffle output at m slim ints and the driver collects
  * ≤ m of them (m/8 bytes of filter; 64 KB at m = 2^19). The distinct
  * position SET is the filter — packing it into words is driver-side
  * bookkeeping. No unbounded collect anywhere.
  */
object Bloom {
  private val H2Seed = 0x9e3779b97f4a7c15L

  private val strKeyUdf = udf((s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else java.lang.Long.valueOf(TextFunctions.fnv1a64(s)))

  private[graft] def checkParams(m: Int, k: Int): Unit = {
    require(m >= 64 && Integer.bitCount(m) == 1,
      s"bloom m must be a power of two >= 64, got $m")
    require(k >= 1 && k <= 16, s"bloom k must be in [1, 16], got $k")
  }

  /** Map a key column to the 64-bit value the position kernel hashes —
    * the Sketches.hashInput discipline: integral → the raw long
    * (positions mix64 it, a bijection); string → fnv1a64 of the UTF-8
    * bytes (the fold the LSH/sketch oracles replay in DuckDB — q125
    * gates this path). An fnv collision merges two keys' position sets,
    * which can only ADD false positives, never false negatives — the
    * safe direction for a filter. Any other type is rejected LOUDLY: a
    * silent `cast("long")` would null-cast string keys, build an EMPTY
    * filter, and make `prune` drop every probe row — false negatives
    * from the one structure that must never produce one. */
  def keyHash(df: DataFrame, keyCol: String): Column =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        col(keyCol).cast("long")
      case org.apache.spark.sql.types.StringType =>
        // null-guarded fold (TextFunctions.fnv1a64Col would NPE on null
        // input — here the expression runs on every row, pre-filter)
        strKeyUdf(col(keyCol))
      case dt => throw new IllegalArgumentException(
        s"Bloom: key column '$keyCol' has type ${dt.simpleString}; bloom keys " +
          "must be integral (byte/short/int/long) or string — a lossy cast " +
          "would null-cast keys and silently break the no-false-negative guarantee")
    }

  /** The shared position kernel — build and probe both go through here,
    * and the q119 oracle replays it in SQL. */
  private[graft] def positions(key: Long, m: Int, k: Int): Array[Long] = {
    val h1 = TextFunctions.mix64(key)
    val h2 = TextFunctions.mix64(key ^ H2Seed) | 1L
    Array.tabulate(k)(i => (h1 + i.toLong * h2) & (m - 1).toLong)
  }

  /** Build the filter over a key column (nulls are skipped — a null key
    * never matches an equi-join anyway). Returns the packed bit words,
    * length m/64. */
  def build(df: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    checkParams(m, k)
    val posUdf = udf((x: java.lang.Long) =>
      if (x == null) null else positions(x.longValue(), m, k))
    val ps = df.filter(col(keyCol).isNotNull)
      .select(explode(posUdf(keyHash(df, keyCol))).as("pos"))
      .distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](m / 64)
    ps.foreach(p => words((p >> 6).toInt) |= 1L << (p & 63).toInt)
    words
  }

  /** Membership test as a Column (fused udf over the packed words — the
    * words ride the closure, m/8 bytes per task). `key` must already be
    * the 64-bit key value: a long column directly, or [[keyHash]] for
    * the typed dispatch (string keys). Null key → null. */
  def mightContain(words: Array[Long], m: Int, k: Int)(key: Column): Column = {
    checkParams(m, k)
    require(words.length == m / 64,
      s"words length ${words.length} != m/64 = ${m / 64}")
    val probeUdf = udf((x: java.lang.Long) =>
      if (x == null) null
      else {
        val ps = positions(x.longValue(), m, k)
        java.lang.Boolean.valueOf(
          ps.forall(p => (words((p >> 6).toInt) >>> (p & 63).toInt & 1L) == 1L))
      })
    probeUdf(key.cast("long"))
  }

  /** The runtime-filter use: keep only probe rows whose key passes the
    * filter built from `buildSide` — a may-contain pre-filter with the
    * build side's exact FP rate; follow with the exact join. */
  def prune(probe: DataFrame, probeKey: String,
      buildSide: DataFrame, buildKey: String,
      m: Int = 1 << 16, k: Int = 3): DataFrame = {
    val words = build(buildSide, buildKey, m, k)
    // null probe keys get a null verdict and are dropped here — correct
    // for the runtime-filter use (a null key never matches an equi-join)
    probe.filter(mightContain(words, m, k)(keyHash(probe, probeKey)))
  }
}
