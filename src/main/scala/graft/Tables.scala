package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] receive the scale-factor directory
  * and read through here, so schema/pathing lives in one place. Reads are
  * plain parquet scans — Catalyst pushes filters/projections down to the
  * vectorized reader (verify with `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in several physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects, so it is read as a long (legacy flag) and
    * floor-divided to micros — and TIMESTAMP(MICROS, isAdjustedToUTC=
    * false), which Spark 4 infers as TIMESTAMP_NTZ. Branch on the type
    * the reader actually produced and normalize ALL of them to the
    * session-zone TimestampType (sessions here run UTC), so a testdata
    * regeneration that flips the physical type cannot break every events
    * query with an analysis error. DuckDB reads the same file natively
    * and treats naive timestamps as UTC — identical epoch semantics. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, NOT `/`: long `/` is double division, and doubles
        // round 1.7e18-ns epochs to ~256 ns — enough to cross µs/ms edges.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // naive micros; session tz is UTC, so this cast is epoch-preserving
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other (expected nanos-as-long or timestamp)")
    }
  }

  /** Registers every table as a temp view (for the few SQL-expressed
    * queries: grouping sets etc.). Idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Cache key for a derived on-disk fixture: a content FINGERPRINT of
    * the source frame (row count + a value extremum), not just the sf
    * dir path — if the testdata at that path is ever regenerated with
    * different content, a path-keyed cache would silently serve stale
    * rows while the oracle reads the fresh table, surfacing as an
    * unexplained hash mismatch (or worse, a stale pass).
    *
    * The aggregate is a real column scan (Spark does not read parquet
    * footer stats for count/max unless aggregate pushdown is enabled),
    * so it is MEMOIZED per (key, column) for the JVM's lifetime —
    * fixture lookups inside benched query bodies pay it once, not once
    * per run. The staleness the fingerprint exists to catch is
    * CROSS-session (driver regenerates testdata between rounds);
    * mid-JVM regeneration of a read-only fixture dir is not a case. */
  private val fingerprints =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  private[graft] def fingerprint(df: DataFrame, fpCol: String,
      memoKey: String): String =
    fingerprints.computeIfAbsent((memoKey, fpCol), { _ =>
      import org.apache.spark.sql.functions._
      // (count, max-id, content) triple. The content term — order-free
      // bit_xor of a per-row xxhash64 over EVERY column — is what makes
      // this a true content fingerprint: regenerated testdata with the
      // same row count and max id but changed payloads must NOT reuse a
      // stale create-once fixture dir (bucketed tables, partitioned
      // docs, incremental-dedup batches all key their dirs off this).
      // Same single scan as before; xxhash64 is codegen'd per row.
      val hashAll = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      val r = df.agg(count(lit(1)), max(col(fpCol)),
        bit_xor(hashAll)).collect()(0)
      val content =
        if (r.isNullAt(2)) "0" else java.lang.Long.toHexString(r.getLong(2))
      s"${r.get(0)}_${r.get(1)}_$content".replaceAll("[^a-zA-Z0-9_]", "_")
    })

  private val maxima =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()

  /** max of an integral column, memoized per (key, column) for the JVM
    * lifetime — for data-shape ASSERTIONS on read-only inputs (e.g. the
    * graph namespace-offset guard) that would otherwise re-scan per
    * query run. Same staleness contract as [[fingerprint]]. */
  private[graft] def memoizedMax(df: DataFrame, colName: String,
      memoKey: String): Long =
    maxima.computeIfAbsent((memoKey, colName), { _ =>
      import org.apache.spark.sql.functions._
      val r = df.agg(max(col(colName))).collect()(0)
      // max over zero rows is null — fail with a diagnosis, not the bare
      // NPE getLong would throw (and which would mask the caller's own
      // data-shape assertion)
      require(!r.isNullAt(0),
        s"memoizedMax($memoKey.$colName): input frame is empty")
      r.getLong(0)
    })
}
