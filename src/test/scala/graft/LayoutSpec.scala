package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order codes: bit-exact against a reference interleave, locality
  * property (sorting by code narrows per-chunk ranges in BOTH
  * dimensions), and the no-udf/codegen guarantee. */
class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton2 matches the reference interleave bit-for-bit") {
    val pts = for (x <- 0L until 40L; y <- 0L until 40L) yield (x * 7, y * 13)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton2(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y, 16), s"($x, $y)")
    }
  }

  test("sorting by morton code narrows per-chunk ranges in BOTH dimensions") {
    // 64×64 grid shuffled; 16 chunks of a z-sort must each span far less
    // than the full domain in x AND y — the property file-stat pruning
    // relies on (a single-column sort gives this in one dimension only)
    val pts = scala.util.Random.shuffle(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toList)
    val sorted = pts.sortBy { case (x, y) => refMorton(x, y, 6) }
    val chunks = sorted.grouped(sorted.size / 16).toList
    val spans = chunks.map { c =>
      val xs = c.map(_._1); val ys = c.map(_._2)
      (xs.max - xs.min, ys.max - ys.min)
    }
    // every chunk spans ≤ half the domain in each dimension (z-chunks of
    // a 64×64 grid are 16×16 or 32×16 tiles; 63 would mean no locality)
    assert(spans.forall { case (sx, sy) => sx <= 32 && sy <= 32 },
      s"chunk spans: $spans")
  }

  /** Sum of rows MATERIALIZED by the parquet scans of `df` after full
    * execution — i.e. rows surviving row-group-stat pruning (the
    * vectorized reader skips whole row groups whose min/max can't match
    * the pushed filter; it does not filter inside a kept group, so this
    * metric is exactly "rows the layout forced the scan to read"). */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, "no parquet scan in plan:\n" + plan)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-clustered layout prunes the scan: same 2-D rectangle, same answer, a fraction of the rows read") {
    val li = Tables.load(spark, sf("sf0.01"), "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val base = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    val zdir = s"$base/z"
    val udir = s"$base/u"
    Layout.clusterBy(li,
        Layout.morton2(col("l_partkey"), col("l_suppkey"), 16), 16)
      .write.mode("overwrite").parquet(zdir)
    // the adversarial baseline: hash-scattered layout — every file spans
    // the full domain in both dimensions, so stats can prune nothing
    li.repartition(16, col("l_orderkey"))
      .write.mode("overwrite").parquet(udir)

    def rect(dir: String) = spark.read.parquet(dir)
      .filter(col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 5))
    val total = li.count()
    val zRead = scannedRows(rect(zdir))
    val uRead = scannedRows(rect(udir))
    // answers identical — a layout must never change a result
    val zAns = rect(zdir).agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
    val uAns = rect(udir).agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
    assert(zAns == uAns)
    assert(zAns.getLong(0) > 0, "rectangle must be non-empty for the test to mean anything")
    // the theorem: the scattered layout reads everything, the z layout a
    // fraction (the locality lemma above is WHY: each z-contiguous chunk
    // spans ≤ half the domain in BOTH dims, so most row groups' min/max
    // exclude the rectangle and the reader skips them)
    assert(uRead == total,
      s"hash layout should read all $total rows, read $uRead")
    assert(zRead * 2 <= uRead,
      s"z layout should read < half the rows: z=$zRead vs unsorted=$uRead")
  }

  test("morton2 is pure Column arithmetic — no ScalaUDF, stays in codegen") {
    // a real source, not a Seq literal — Catalyst constant-folds a local
    // relation into a LocalTableScan (itself proof the expression is
    // pure), which would leave no codegen stage to assert on
    val df = spark.range(100)
      .select(Layout.morton2(col("id"), col("id") + 1).as("z"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !df.queryExecution.analyzed.toString.contains("UDF("),
      "layout key must not be a udf")
    // `*(n)` is the compact WholeStageCodegen marker in plan toString
    assert(p.contains("*(1)"), p.take(1000))
  }
}
