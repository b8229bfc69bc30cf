package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Compaction: file-count arithmetic, the no-shuffle guarantee of the
  * shrink path, row preservation, and the grow fallback. */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("shrinking compaction: planned file count lands on disk, rows preserved, NO shuffle") {
    val src = java.nio.file.Files.createTempDirectory("cmp-src").toString
    val out = java.nio.file.Files.createTempDirectory("cmp-out").toString
    (0L until 5000L).map(i => (i, s"row-$i")).toDF("id", "payload")
      .repartition(32).write.mode("overwrite").parquet(src)
    assert(parquetFiles(src).length == 32)

    val pl = Compaction.compact(spark, src, out, targetBytes = 1L << 30)
    assert(pl.inputFiles == 32 && pl.targetFiles == 1 && !pl.shuffles)
    assert(parquetFiles(out).length == 1,
      s"expected 1 compacted file, got ${parquetFiles(out).length}")
    // the shrink path is a NARROW coalesce — merging files must not pay
    // a shuffle (the whole point of compaction vs re-layout)
    val p = pl.df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "shrink compaction must not shuffle:\n" + p)
    assert(p.contains("Coalesce"), p)
    // row preservation, exactly
    val a = spark.read.parquet(src).as[(Long, String)].collect().toSet
    val b = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("intermediate target: multiple output files, still narrow") {
    val src = java.nio.file.Files.createTempDirectory("cmp-src2").toString
    val out = java.nio.file.Files.createTempDirectory("cmp-out2").toString
    (0L until 20000L).map(i => (i, s"payload-$i-$i")).toDF("id", "payload")
      .repartition(16).write.mode("overwrite").parquet(src)
    val total = parquetFiles(src).map(_.length).sum
    // target ~= a third of the data → 3-4 output files, fewer than 16 in
    val pl = Compaction.compact(spark, src, out, targetBytes = total / 3)
    assert(pl.targetFiles >= 2 && pl.targetFiles < 16 && !pl.shuffles,
      s"plan: $pl")
    assert(parquetFiles(out).length == pl.targetFiles)
    assert(spark.read.parquet(out).count() == 20000L)
  }

  test("growing splits via per-task file rolling — still NO shuffle") {
    val src = java.nio.file.Files.createTempDirectory("cmp-src3").toString
    val out = java.nio.file.Files.createTempDirectory("cmp-out3").toString
    (0L until 1000L).map(i => (i, s"payload-$i")).toDF("id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(src)
    assert(parquetFiles(src).length == 1)
    val total = parquetFiles(src).map(_.length).sum
    val pl = Compaction.compact(spark, src, out, targetBytes = total / 4)
    assert(!pl.shuffles,
      "splitting oversized files must roll per task, not repartition")
    assert(pl.maxRecordsPerFile.exists(n => n >= 1 && n < 1000), s"plan: $pl")
    assert(pl.targetFiles > 1)
    // maxRecordsPerFile rolls a new file every N records inside the one
    // input task — multiple output files with zero data movement
    val got = parquetFiles(out).length
    assert(got > 1, s"expected multiple split files, got $got")
    val p = pl.df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "grow compaction must not shuffle:\n" + p)
    // row preservation, exactly
    val a = spark.read.parquet(src).as[(Long, String)].collect().toSet
    val b = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("empty / bad input is rejected loudly") {
    val empty = java.nio.file.Files.createTempDirectory("cmp-empty").toString
    intercept[IllegalArgumentException] {
      Compaction.plan(spark, empty, targetBytes = 1024)
    }
    intercept[IllegalArgumentException] {
      Compaction.plan(spark, empty, targetBytes = 0)
    }
  }

  test("partitioned compaction: layout preserved, per-dir file counts, no shuffle") {
    val src = java.nio.file.Files.createTempDirectory("cmp-psrc").toString
    val out = java.nio.file.Files.createTempDirectory("cmp-pout").toString
    // 3 partitions, fragmented into up to 8 files each
    (0L until 3000L).map(i => (i, s"cat${i % 3}", s"payload-$i"))
      .toDF("id", "cat", "payload")
      .repartition(8).write.partitionBy("cat").mode("overwrite").parquet(src)
    val inCounts = (0 until 3).map(c =>
      parquetFiles(s"$src/cat=cat$c").length)
    assert(inCounts.forall(_ >= 2), s"fixture not fragmented: $inCounts")

    val plans = Compaction.compactPartitioned(spark, src, out, 1L << 30)
    assert(plans.map(_._1) == Seq("cat=cat0", "cat=cat1", "cat=cat2"))
    plans.foreach { case (part, pl) =>
      assert(!pl.shuffles && pl.targetFiles == 1, s"$part: $pl")
      // zero Exchange in every per-partition plan — the whole point
      val p = pl.df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"$part plan shuffles:\n" + p)
      assert(parquetFiles(s"$out/${part}").length == 1, part)
    }
    // hive layout survives: the partition column still reads back, and
    // every row is preserved
    val a = spark.read.parquet(src).select("id", "cat", "payload")
      .as[(Long, String, String)].collect().toSet
    val b = spark.read.parquet(out).select("id", "cat", "payload")
      .as[(Long, String, String)].collect().toSet
    assert(a == b && a.size == 3000)
    // and the compacted table still partition-prunes
    val pruned = spark.read.parquet(out).filter(col("cat") === "cat1")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cat1"),
      "compacted layout must still prune:\n" + scan.take(2000))
    assert(pruned.count() == 1000)
  }

  test("partitioned compaction refuses nested col=value layouts loudly") {
    val src = java.nio.file.Files.createTempDirectory("cmp-nest").toString
    val out = java.nio.file.Files.createTempDirectory("cmp-nout").toString
    // two-level layout a=.../b=... — compacting per top-level dir would
    // read b with partition discovery and rewrite it FLAT, silently
    // destroying the inner level; the guard must refuse instead
    (0L until 600L).map(i => (i, s"a${i % 2}", s"b${i % 3}", s"p-$i"))
      .toDF("id", "a", "b", "payload")
      .repartition(4).write.partitionBy("a", "b").mode("overwrite").parquet(src)
    val ex = intercept[IllegalArgumentException] {
      Compaction.compactPartitioned(spark, src, out, 1L << 30)
    }
    assert(ex.getMessage.contains("nested hive partition level"),
      ex.getMessage)
    assert(ex.getMessage.contains("b="), ex.getMessage)
  }
}
