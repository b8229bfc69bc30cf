package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the file-granularity half of data layout
  * (the clustering half is [[Layout]]): long-running ingest (streaming
  * sinks, per-batch appends, the reference's one-file-per-S3-object
  * model) accumulates files far below the efficient scan size, and at
  * 100 TB the metadata and open-file overhead of millions of small
  * files dominates scan cost. Compaction rewrites a directory's rows
  * into ~`targetBytes`-sized files.
  *
  * Spark-first shape: sizing comes from the filesystem listing (works
  * for any Hadoop-visible store), and the rewrite is `coalesce` — a
  * NARROW dependency, no shuffle (spec-asserted): merging files needs
  * no data movement beyond concatenating partitions. When asked to
  * produce MORE files than input partitions (splitting oversized
  * files), the write uses `maxRecordsPerFile` instead of a shuffle:
  * each task rolls to a new file every N records, so splitting is ALSO
  * narrow — no repartition of the whole directory just to cut a few
  * oversized files (the per-file record budget is sized from the
  * directory's own rows-per-byte). The residual trade: splitting
  * cannot MERGE leftovers across input files, so an input mix of one
  * huge and many tiny files compacts in two passes (split, then
  * shrink) — each pass still shuffle-free. Row preservation is gated
  * (q137): an aggregate over the compacted copy must hash-match the
  * oracle over the original table.
  */
object Compaction {
  final case class Plan(df: DataFrame, inputFiles: Int, inputBytes: Long,
      targetFiles: Int, shuffles: Boolean,
      maxRecordsPerFile: Option[Long] = None)

  /** Size up a parquet directory and plan its rewrite: ceil(bytes /
    * targetBytes) output files — coalesce when shrinking (narrow),
    * per-task file rolling (`maxRecordsPerFile`, also narrow) when
    * growing. */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Plan = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getLen
      }
      buf.toSeq
    }
    require(files.nonEmpty, s"no parquet files under $dir")
    val totalBytes = files.sum
    // clamp BEFORE the Int narrowing: a tiny targetBytes against a huge
    // directory yields a ratio past Int.MaxValue, and .toInt would wrap
    // it negative (repartition(negative) throws deep inside Spark) or
    // to a silently wrong positive count
    val nOut = math.min(Int.MaxValue.toLong,
      math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)).toInt
    val df = spark.read.parquet(dir)
    val inParts = df.rdd.getNumPartitions
    if (nOut <= inParts)
      Plan(df.coalesce(nOut), files.size, totalBytes, nOut, shuffles = false)
    else {
      // grow path: rows-per-output-file from the directory's own
      // rows-per-byte. One counting scan (cheap next to the rewrite,
      // which scans anyway); the write then rolls files per task with
      // zero data movement.
      val totalRows = df.count()
      // divide-first: totalRows * targetBytes overflows Long at the
      // design point (~1e12 rows × 128 MB target ≈ 2^87) and the old
      // product form would clamp recordsPerFile to 1 — one file per
      // record. rows-per-output-file = rows / number-of-output-files.
      val recordsPerFile =
        math.max(1L, totalRows / math.max(1L, (totalBytes + targetBytes - 1) / targetBytes))
      Plan(df, files.size, totalBytes, nOut, shuffles = false,
        maxRecordsPerFile = Some(recordsPerFile))
    }
  }

  /** Rewrite `inDir` into `outDir` at ~targetBytes per file; returns the
    * executed plan's stats. The write is a full rewrite into a fresh
    * directory — swapping it over the original atomically is the
    * caller's (table format's) business; this operator owns the data
    * movement only. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Plan = {
    val pl = plan(spark, inDir, targetBytes)
    val w = pl.maxRecordsPerFile match {
      case Some(n) => pl.df.write.option("maxRecordsPerFile", n)
      case None => pl.df.write
    }
    w.mode("overwrite").parquet(outDir)
    pl
  }

  /** Per-partition compaction of a hive-partitioned table — the real
    * table-maintenance loop (q159's layout composed with q137's
    * compaction): each `col=value` partition directory is compacted
    * INDEPENDENTLY into the same directory under `outDir`, so the
    * partitioned layout (and every pruning property it buys) survives
    * the rewrite, and each per-partition plan is the narrow shrink/
    * grow path — zero Exchange anywhere (spec-asserted).
    *
    * A shuffle-free GLOBAL rewrite of a partitioned table is not
    * possible through one `partitionBy` write (tasks mix partition
    * values, so files-per-dir would be tasks-touching-that-value, not
    * bytes/target); the per-directory loop is how table formats run
    * OPTIMIZE, and the driver-side iteration is over PARTITION COUNT
    * (thousands at 100 TB, each a cheap narrow job — parallelize
    * across a job pool if partition count dominates wall clock).
    *
    * @return (partition dir name, plan) per partition, sorted */
  def compactPartitioned(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Seq[(String, Plan)] = {
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName).sorted
    require(parts.nonEmpty, s"no hive partition dirs (col=value) under $inDir")
    // single-level layouts only: a nested col=value level under a
    // partition dir would be read with partition discovery and
    // rewritten FLAT, silently destroying the inner level — refuse
    // loudly instead (nested layouts want a recursive walk to the leaf
    // dirs, which nothing here needs yet)
    parts.foreach { part =>
      val nested = fs.listStatus(new Path(p, part))
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      require(nested.isEmpty,
        s"nested hive partition level under $inDir/$part " +
          s"(${nested.map(_.getPath.getName).mkString(", ")}); " +
          "compactPartitioned handles single-level layouts only")
    }
    parts.map { part =>
      part -> compact(spark, s"$inDir/$part", s"$outDir/$part", targetBytes)
    }
  }
}
