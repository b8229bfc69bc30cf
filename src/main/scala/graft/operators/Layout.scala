package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout primitives — the write-side half of scan performance at
  * 100 TB: what column you CLUSTER files by decides which min/max file
  * statistics can prune later reads. Z-ordering (Delta/Iceberg
  * `ZORDER BY`) sorts by an interleaved-bit code so rows close in ANY of
  * the interleaved dimensions land in the same files, giving multi-
  * dimensional pruning from one sort key.
  *
  * [[morton2]] is deliberately PURE Column arithmetic — shifts, masks
  * and ORs never overflow, so ANSI mode is safe and the whole expression
  * stays inside whole-stage codegen (asserted in spec); no udf in a
  * write path that touches every row of a 100 TB table. The bit
  * arithmetic is exactly replayable in SQL, so the q124 oracle rebuilds
  * the codes in DuckDB.
  */
object Layout {
  /** RENDEZVOUS (highest-random-weight) sharding — stable doc→shard
    * assignment across shard-count changes (Thaler & Ravishankar 1998;
    * the assignment rule behind consistent routing in distributed
    * stores): doc d lands on argmax over shards s of h(d, s), here
    * h = mix64(id·31 + s) compared SIGNED with (h DESC, s DESC)
    * tie-break. The property that makes it the right key→shard rule for
    * an incremental pipeline: growing S→S+1 moves ONLY the ~1/(S+1) of
    * docs whose new-shard weight wins — every moved doc lands on the
    * NEW shard, nothing reshuffles among the old ones (an id%S scheme
    * moves ~S/(S+1) of the corpus instead, invalidating every
    * shard-local epoch index).
    *
    * Output per doc: (doc_id, shard8 = assignment at `oldShards`,
    * shard9 = assignment at `newShards`, moved 0/1).
    *
    * Scale shape: per-doc independent — an explode to S+1 slim rows and
    * two windows PARTITIONED BY doc over ≤S+1 rows each; no global
    * state, no shuffle beyond the doc-keyed window exchange. */
  def rendezvousShards(df: DataFrame, idCol: String,
      oldShards: Int, newShards: Int): DataFrame = {
    require(0 < oldShards && oldShards <= newShards)
    import org.apache.spark.sql.expressions.Window
    val mixH = udf((id: Long, s: Int) =>
      graft.functions.TextFunctions.mix64(id * 31L + s))
    val withS = df.select(col(idCol).as("doc_id"))
      .select(col("doc_id"),
        explode(array((0 until newShards).map(lit): _*)).as("s"))
      .withColumn("h", mixH(col("doc_id"), col("s")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("h").desc, col("s").desc)
    def assign(frame: DataFrame, name: String): DataFrame = frame
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("s").cast("long").as(name))
    assign(withS.filter(col("s") < oldShards), "shard_old")
      .join(assign(withS, "shard_new"), Seq("doc_id"))
      .select(col("doc_id"), col("shard_old"), col("shard_new"),
        when(col("shard_old") =!= col("shard_new"), 1L).otherwise(0L)
          .as("moved"))
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * NONNEGATIVE integral columns: bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Values wider than `bits` bits alias into the
    * same code range (high bits are masked off) — callers choose `bits`
    * to cover their domain. */
  def morton2(x: Column, y: Column, bits: Int = 16): Column =
    mortonN(Seq(x, y), bits)

  /** N-dimensional Morton interleave — the general ZORDER BY key: bit i
    * of column j lands at position i·n + j (n = number of columns), so
    * [[morton2]] is exactly `mortonN(Seq(x, y), bits)`. Same contract:
    * NONNEGATIVE integral columns, values wider than `bits` bits alias
    * into the code range (high bits masked), pure Column shift/mask/OR
    * — codegen'd, ANSI-safe, and replayable term-for-term in SQL (the
    * q131 oracle). `bits · n ≤ 63` keeps the code a nonnegative long. */
  def mortonN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"mortonN needs at least 2 columns, got $n")
    require(bits >= 1 && bits * n <= 63,
      s"bits must satisfy 1 <= bits and bits*$n <= 63, got $bits")
    val longs = cols.map(_.cast("long"))
    val terms = for {
      i <- 0 until bits
      (c, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve code over two NONNEGATIVE integral columns (low
    * `bits` bits each — callers size `bits` to the domain; wider values
    * are masked like [[morton2]]). Better locality than Z-order: the
    * curve is CONTINUOUS (consecutive codes are always adjacent cells —
    * spec-proven; a z-curve jumps at every quadrant seam), so equal-code
    * chunks span tighter rectangles and file stats prune harder.
    *
    * The classic xy2d transform: per bit level (high to low), the
    * quadrant index contributes `s² · ((3·rx) xor ry)` to the code and
    * the coordinate frame is reflected/swapped into that quadrant. A
    * DataFrame TRANSFORM, not a single Column: each level reads the
    * previous level's (x, y) several times, so one nested expression
    * would grow ~5× per level (Column trees don't share subtrees) —
    * per-level projections keep the plan linear in `bits` while staying
    * pure Column arithmetic end-to-end (no udf in a write path;
    * codegen asserted in spec). All arithmetic is bounded (d < 4^bits,
    * reflections stay in [0, 2^bits)) — ANSI-safe, and the q132 oracle
    * replays the identical level chain as SQL CTEs. */
  def withHilbert2(df: DataFrame, x: Column, y: Column, bits: Int,
      out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val internal = Set("_hx", "_hy", "_hd", "_hrx", "_hry", "_hx_n", "_hy_n")
    val clash = df.columns.filter(internal)
    require(clash.isEmpty,
      s"withHilbert2 uses internal column names ${clash.mkString(", ")} — rename them first")
    // the out name too: out = "_hd" would alias the accumulator and then
    // be dropped with it — the caller would get a frame with NO code
    // column and fail far from the cause
    require(!internal.contains(out),
      s"withHilbert2 output column '$out' collides with an internal name — pick another")
    val n = 1L << bits
    var cur = df
      .withColumn("_hx", x.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hy", y.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("_hrx",
          when(col("_hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_hry",
          when(col("_hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
      val nd = col("_hd") +
        lit(s * s) * (lit(3L) * col("_hrx")).bitwiseXOR(col("_hry"))
      // rotate into the quadrant: if ry == 0, reflect (when rx == 1)
      // then swap x and y; if ry == 1, the frame is unchanged
      val nx = when(col("_hry") === 0,
          when(col("_hrx") === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
        .otherwise(col("_hx"))
      val ny = when(col("_hry") === 0,
          when(col("_hrx") === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
        .otherwise(col("_hy"))
      cur = cur.withColumn("_hd", nd)
        .withColumn("_hx_n", nx).withColumn("_hy_n", ny)
        .withColumn("_hx", col("_hx_n")).withColumn("_hy", col("_hy_n"))
    }
    cur.withColumn(out, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_hrx", "_hry", "_hx_n", "_hy_n")
  }

  /** The write-side half of the operator: cluster a frame by a layout
    * code so min/max file statistics can prune later multi-dimensional
    * reads. Range-partition into `numSplits` output splits by `code`
    * (each split owns a contiguous code range — at 100 TB this is the
    * one full shuffle a re-layout costs, and it is the point of the
    * job) and sort rows by the code within each split, so every output
    * file AND every row group inside it covers a narrow code range —
    * by the locality property (LayoutSpec), a narrow range in BOTH
    * interleaved dimensions. The code column is dropped before the
    * write: it is derivable, and the pruning works off the stats of the
    * ORIGINAL columns.
    *
    * Callers write the result with `.write.parquet(...)`; reads then
    * prune row groups via pushed-down min/max checks with no layout
    * awareness at all (proven end-to-end in LayoutSpec and gated as
    * q130). */
  /** Save `df` as a BUCKETED (and per-bucket sorted) catalog table and
    * return the table-backed frame — the co-located-join / co-located-
    * iteration layout: every later join or aggregation on `keyCol`
    * reads the buckets already partitioned, paying ZERO exchange on
    * this side (q140 proves the join form, q145 the iteration form).
    * At 100 TB this is the difference between re-shuffling a static
    * fact/edge table once per consumer and never shuffling it again.
    *
    * Create-once semantics: callers key `tableName` on the CONTENT
    * (Tables.fingerprint of each source — its own fingerprint per
    * table, the round-8 stale-fixture lesson), so a regenerated input
    * gets a fresh table and a warm catalog reuses the existing one.
    * The warehouse directory outlives the in-memory catalog (a fresh
    * JVM sees files but no table) and `saveAsTable` refuses an
    * existing managed location — the stale location is dropped before
    * recreation. */
  def bucketize(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      tableName: String, buckets: Int, keyCol: String): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    if (!spark.catalog.tableExists(tableName)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tableName)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the layout contract the on-disk files were written under — the
      // content fingerprint in the table name covers the DATA, not the
      // spec, so re-registering must prove the spec too: registering
      // 8-bucket files as a 16-bucket table would silently drop rows
      // from co-located joins (bucket ids parse from file names). The
      // SCHEMA is part of the contract for the same reason: the
      // register path builds CREATE TABLE columns from the CALLER's
      // frame, so a caller whose schema drifted (order/type/name) while
      // the fingerprint-keyed name stayed would otherwise re-register
      // the old files under a mismatched column list and reads would
      // silently misbind (ADVICE r18) — mismatch falls to the rewrite
      // branch instead.
      val schemaSig = df.schema.fields
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      val spec = s"buckets=$buckets;key=$keyCol;schema=$schemaSig"
      val specPath = new org.apache.hadoop.fs.Path(loc, "_BUCKET_SPEC")
      def onDiskSpec: Option[String] =
        if (!fs.exists(specPath)) None
        else {
          val in = fs.open(specPath)
          try Some(new String(
            in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        }
      if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")) &&
          onDiskSpec.contains(spec)) {
        // CREATE-ONCE EPOCH ARTIFACT (r17 bench hygiene): the bucketed
        // files outlive the session but the in-memory catalog does not,
        // so a fresh JVM used to RE-WRITE both tables — a pure fixture
        // cost that dwarfed the measured join and false-flagged q140
        // four rounds running. Data currency rides the fingerprint in
        // the name, layout currency the _BUCKET_SPEC marker just
        // checked: re-REGISTER instead of re-writing. Bucket identity
        // rides the datasource file naming (part-*_NNNNN), which the
        // registered spec re-interprets identically — the PlanSpec
        // single-exchange pin holds on this path too.
        spark.sql(s"CREATE TABLE `$tableName` ($schemaSig) USING parquet " +
          s"CLUSTERED BY (`$keyCol`) SORTED BY (`$keyCol`) " +
          s"INTO $buckets BUCKETS LOCATION '${loc.toString}'")
      } else {
        if (fs.exists(loc)) fs.delete(loc, true)
        df.write.bucketBy(buckets, keyCol).sortBy(keyCol)
          .mode("overwrite").saveAsTable(tableName)
        val out = fs.create(specPath, true)
        try out.write(spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    spark.table(tableName)
  }

  def clusterBy(df: DataFrame, code: Column, numSplits: Int): DataFrame = {
    require(numSplits >= 1, s"numSplits must be >= 1, got $numSplits")
    // same reserved-name hygiene as withHilbert2: silently overwriting a
    // caller's _layout_code and then dropping it would lose their column
    require(!df.columns.contains("_layout_code"),
      "clusterBy uses the internal column name _layout_code — rename it first")
    df.withColumn("_layout_code", code)
      .repartitionByRange(numSplits, col("_layout_code"))
      .sortWithinPartitions("_layout_code")
      .drop("_layout_code")
  }
}
