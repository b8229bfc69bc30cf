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

  /** `who`/`mName`/`kName` label the error for the calling operator —
    * Count–Min shares this kernel and its users should see "Sketches
    * ... w" in diagnostics, not "Bloom ... m". */
  private[graft] def checkParams(m: Int, k: Int, who: String = "Bloom",
      mName: String = "m", kName: String = "k"): Unit = {
    require(m >= 64 && Integer.bitCount(m) == 1,
      s"$who: $mName must be a power of two >= 64, got $m")
    require(k >= 1 && k <= 16, s"$who: $kName must be in [1, 16], got $k")
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
  def keyHash(df: DataFrame, keyCol: String, who: String = "Bloom"): Column =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        col(keyCol).cast("long")
      case org.apache.spark.sql.types.StringType =>
        // null-guarded fold (TextFunctions.fnv1a64Col would NPE on null
        // input — here the expression runs on every row, pre-filter)
        strKeyUdf(col(keyCol))
      case dt => throw new IllegalArgumentException(
        s"$who: key column '$keyCol' has type ${dt.simpleString}; keys " +
          "must be integral (byte/short/int/long) or string — a lossy cast " +
          "would null-cast keys and silently break the no-false-negative guarantee")
    }

  /** The k positions of every key as ONE fused udf per row — type
    * dispatch happens at plan time, the string path folds fnv + double
    * hashing in a single closure (no boxed handoff between two udfs on
    * the per-row hot path). Shared by the filter build and the
    * Count–Min build/probe (via `posexplode`: the array INDEX is the
    * hash-row number r). */
  private[graft] def positionsCol(df: DataFrame, keyCol: String,
      m: Int, k: Int, who: String = "Bloom"): Column =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        val u = udf((s: String) =>
          if (s == null) null
          else positions(TextFunctions.fnv1a64(s), m, k))
        u(col(keyCol))
      case _ =>
        // integral (or rejected loudly by keyHash's dispatch)
        val u = udf((x: java.lang.Long) =>
          if (x == null) null else positions(x.longValue(), m, k))
        u(keyHash(df, keyCol, who))
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
    val ps = df.filter(col(keyCol).isNotNull)
      .select(explode(positionsCol(df, keyCol, m, k)).as("pos"))
      .distinct()
      .collect().map(_.getLong(0))
    pack(ps, m)
  }

  /** Pack a distinct position set into filter words — shared by the
    * batch build and the streaming build (whose position set arrives
    * from a streaming distinct aggregation instead). */
  private[graft] def pack(ps: Array[Long], m: Int): Array[Long] = {
    val words = new Array[Long](m / 64)
    ps.foreach(p => words((p >> 6).toInt) |= 1L << (p & 63).toInt)
    words
  }

  /** Membership test over a key COLUMN with the full type dispatch —
    * the safe public entry point: integral and string keys both route
    * through the specified kernel in one fused udf (string: fnv +
    * positions + bit test in a single closure), anything else is
    * rejected loudly at plan time. Null key → null verdict. The words
    * ride the closure, m/8 bytes per task. */
  def mightContainIn(df: DataFrame, keyCol: String,
      words: Array[Long], m: Int, k: Int, who: String = "Bloom"): Column = {
    checkWords(words, m, k)
    def test(ps: Array[Long]): java.lang.Boolean = java.lang.Boolean.valueOf(
      ps.forall(p => (words((p >> 6).toInt) >>> (p & 63).toInt & 1L) == 1L))
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        val u = udf((s: String) =>
          if (s == null) null
          else test(positions(TextFunctions.fnv1a64(s), m, k)))
        u(col(keyCol))
      case _ =>
        // `who` forwarded: a Count–Min (or other sharing) caller hitting
        // the type error here must see ITS name, not "Bloom:"
        val u = udf((x: java.lang.Long) =>
          if (x == null) null
          else test(positions(x.longValue(), m, k)))
        u(keyHash(df, keyCol, who))
    }
  }

  /** Membership test as a Column over an already-64-bit key value (a
    * LongType column, or [[keyHash]]'s output). NO implicit cast: a
    * lossy coercion here once reopened the false-negative hole the df
    * entry points close — pass a long column or use [[mightContainIn]]
    * for the typed dispatch. Null key → null. */
  def mightContain(words: Array[Long], m: Int, k: Int)(key: Column): Column = {
    checkWords(words, m, k)
    val probeUdf = udf((x: java.lang.Long) =>
      if (x == null) null
      else {
        val ps = positions(x.longValue(), m, k)
        java.lang.Boolean.valueOf(
          ps.forall(p => (words((p >> 6).toInt) >>> (p & 63).toInt & 1L) == 1L))
      })
    probeUdf(key)
  }

  private def checkWords(words: Array[Long], m: Int, k: Int): Unit = {
    checkParams(m, k)
    require(words.length == m / 64,
      s"words length ${words.length} != m/64 = ${m / 64}")
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
    probe.filter(mightContainIn(probe, probeKey, words, m, k))
  }
}
