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

  test("bucketize register path proves the SCHEMA, not just buckets/key") {
    // ADVICE r18: the register branch builds CREATE TABLE columns from
    // the CALLER's frame; files written under (k, v) registered as
    // (k, w) would read w as all-null (parquet binds by name). The
    // _BUCKET_SPEC marker now carries the schema; mismatch must fall to
    // the rewrite branch.
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(conf)
    val base = spark.range(20).select(col("id").as("k"),
      (col("id") * 7).as("v"))
    val t1 = "bspec_schema_src"
    Seq(t1, "bspec_schema_drift", "bspec_schema_same").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val p = new Path(wh, t)
      if (fs.exists(p)) fs.delete(p, true)
    }
    Layout.bucketize(spark, base, t1, 4, "k").count()

    // simulate a fresh JVM (files persist, in-memory catalog does not):
    // copy the table dir to a name the catalog has never seen
    def cloneTo(t: String): Path = {
      val dst = new Path(wh, t)
      FileUtil.copy(fs, new Path(wh, t1), fs, dst, false, conf)
      dst
    }

    // (a) drifted caller schema (v renamed to w) → rewrite, not misbind
    val driftDir = cloneTo("bspec_schema_drift")
    val drifted = base.withColumnRenamed("v", "w")
    val out = Layout.bucketize(spark, drifted, "bspec_schema_drift", 4, "k")
    assert(out.columns.toSeq == Seq("k", "w"))
    val rows = out.orderBy("k").collect()
    assert(rows.length == 20 && rows.forall(r => r.getLong(1) == r.getLong(0) * 7),
      "drifted register must rewrite — a misbound register reads w as null")
    val driftSpec = {
      val in = fs.open(new Path(driftDir, "_BUCKET_SPEC"))
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(driftSpec.contains("`w` BIGINT"), s"spec not rewritten: $driftSpec")

    // (b) identical schema → register reuses the on-disk files untouched
    val sameDir = cloneTo("bspec_schema_same")
    def dataFiles(p: Path) = fs.listStatus(p)
      .filter(_.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet
    val beforeFiles = dataFiles(sameDir)
    val reg = Layout.bucketize(spark, base, "bspec_schema_same", 4, "k")
    assert(reg.orderBy("k").collect().map(_.getLong(1)).toSeq ==
      (0 until 20).map(_ * 7L))
    assert(dataFiles(sameDir) == beforeFiles,
      "same-schema register must NOT rewrite the data files")
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

  private def refMortonN(vs: Seq[Long], bits: Int): Long = {
    val n = vs.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((vs(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("mortonN matches the reference interleave in 3 dimensions (and morton2 == mortonN(2))") {
    val pts = for (x <- 0L until 12L; y <- 0L until 12L; z <- 0L until 12L)
      yield (x * 3, y * 5, z * 7)
    val got = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        Layout.mortonN(Seq(col("x"), col("y"), col("z")), 8).as("m"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, m) =>
      assert(m == refMortonN(Seq(x, y, z), 8), s"($x, $y, $z)")
    }
    // morton2 delegates to mortonN — same bit layout (q124 stays exact)
    val two = Seq((5L, 9L), (100L, 3L), (65535L, 65535L)).toDF("x", "y")
      .select(Layout.morton2(col("x"), col("y"), 16).as("a"),
        Layout.mortonN(Seq(col("x"), col("y")), 16).as("b"))
      .as[(Long, Long)].collect()
    two.foreach { case (a, b) => assert(a == b) }
  }

  test("3-D morton sort narrows per-chunk ranges in ALL three dimensions") {
    val pts = scala.util.Random.shuffle(
      (for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
        yield (x, y, z)).toList)
    val sorted = pts.sortBy { case (x, y, z) => refMortonN(Seq(x, y, z), 4) }
    val chunks = sorted.grouped(sorted.size / 8).toList
    chunks.foreach { c =>
      val spans = Seq(c.map(_._1), c.map(_._2), c.map(_._3))
        .map(vs => vs.max - vs.min)
      assert(spans.forall(_ <= 8), s"chunk spans $spans > half domain")
    }
  }

  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1); var y = y0 & (n - 1)
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("withHilbert2 matches the reference xy2d transform bit-for-bit") {
    val pts = for (x <- 0L until 48L; y <- 0L until 48L) yield (x * 5, y * 3)
    val got = Layout.withHilbert2(pts.toDF("x", "y"),
        col("x"), col("y"), 8, "h")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) =>
      assert(h == refHilbert(x, y, 8), s"($x, $y): got $h, want ${refHilbert(x, y, 8)}")
    }
  }

  test("hilbert curve is CONTINUOUS: consecutive codes are adjacent cells (z-order is not)") {
    // the property that makes hilbert strictly better locality than
    // morton: walk the full 32×32 grid in code order — every step moves
    // exactly one cell in exactly one dimension. A z-curve violates this
    // at every quadrant seam (the (3,3)→(4,0) style jumps).
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val walk = Layout.withHilbert2(grid, col("x"), col("y"), 5, "h")
      .orderBy("h")
      .as[(Long, Long, Long)].collect()
    assert(walk.length == 1024)
    assert(walk.map(_._3).toSeq == (0L until 1024L)) // bijection onto [0, n²)
    walk.sliding(2).foreach { case Array((x0, y0, _), (x1, y1, _)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump from ($x0,$y0) to ($x1,$y1)")
    }
    // and the z-curve does NOT satisfy it (sanity that the test bites)
    val zWalk = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .sortBy { case (x, y) => refMorton(x, y, 3) }
    val zJumps = zWalk.sliding(2).count {
      case Seq((x0, y0), (x1, y1)) => math.abs(x1 - x0) + math.abs(y1 - y0) != 1
    }
    assert(zJumps > 0)
  }

  test("withHilbert2 is pure Column arithmetic — no ScalaUDF anywhere in the plan") {
    val df = Layout.withHilbert2(
      spark.range(100).toDF("id"), col("id"), col("id") + 1, 8, "h")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") &&
      !df.queryExecution.analyzed.toString.contains("UDF("),
      "layout key must not be a udf")
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

    // hilbert-clustered layout prunes at least as well in aggregate:
    // same rectangle, same answer, and the scan still reads < half —
    // continuity gives tighter per-chunk bounding boxes, so hilbert
    // should match or beat morton at equal split counts (allow equality:
    // at 16 splits both often isolate the same corner files)
    val hdir = s"$base/h"
    Layout.clusterBy(
        Layout.withHilbert2(li, col("l_partkey"), col("l_suppkey"), 11, "_h"),
        col("_h"), 16)
      .drop("_h")
      .write.mode("overwrite").parquet(hdir)
    val hRead = scannedRows(rect(hdir))
    val hAns = rect(hdir).agg(count(lit(1)), sum(col("l_orderkey"))).collect()(0)
    assert(hAns == uAns)
    assert(hRead * 2 <= uRead,
      s"hilbert layout should read < half the rows: h=$hRead vs unsorted=$uRead")
  }

  test("rendezvous sharding: minimal disruption — moved docs all land on the NEW shard") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("doc_id")
    val g = graft.operators.Layout.rendezvousShards(ids, "doc_id", 8, 9)
      .as[(Long, Long, Long, Long)].collect()
    assert(g.length == 2000)
    // the HRW guarantee: growing 8→9 only ever moves a doc TO shard 8
    g.filter(_._4 == 1L).foreach { r =>
      assert(r._3 == 8L, s"doc ${r._1} moved to old shard ${r._3}") }
    assert(g.filter(_._4 == 0L).forall(r => r._2 == r._3))
    // movement is ~1/9 (binomial bounds at n=2000), never ~8/9 like id%S
    val frac = g.count(_._4 == 1L).toDouble / g.length
    assert(frac > 0.06 && frac < 0.18, s"moved fraction $frac")
    // assignment balances across shards (each ≤ 2× the uniform share)
    val byShard = g.groupBy(_._2).view.mapValues(_.length)
    assert(byShard.values.forall(n => n > 125 && n < 500), byShard.toMap.toString)
    // and is a pure function of the id (stable across runs)
    val again = graft.operators.Layout.rendezvousShards(ids, "doc_id", 8, 9)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == g.sortBy(_._1).toSeq)
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
