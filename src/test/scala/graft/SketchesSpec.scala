package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Sketches

/** KMV bottom-k distinct sketch: kernel bridge, exact-below-k contract,
  * estimator accuracy, determinism. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("mix64Col is TextFunctions.mix64 (incl. negatives) — no kernel drift") {
    val xs = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val got = xs.toDF("x").select(Sketches.mix64Col(col("x")))
      .as[Long].collect().toSeq
    assert(got == xs.map(TextFunctions.mix64))
  }

  test("fewer than k distinct values → the estimate IS the exact count") {
    // 10 distinct values, repeated — dedup must collapse them first
    val df = (1L to 30L).map(i => ("g", i % 10)).toDF("grp", "v")
    val est = Sketches.kmvDistinct(df, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head()
    assert(est == 10.0)
  }

  test("estimator lands near truth for n >> k, and is deterministic") {
    val n = 5000L
    val df = spark.range(n).select(lit("g").as("grp"), col("id").as("v"))
    def run() = Sketches.kmvDistinct(df, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head()
    val est = run()
    // KMV stderr ≈ 1/sqrt(k-2) ≈ 13% at k=64; 40% is a safe determinism-
    // friendly bound (the hash is fixed, so this never flakes)
    assert(math.abs(est / n - 1.0) < 0.4, s"estimate $est for $n distinct")
    assert(run() == est)
    // bigger k → the same data can only be estimated as well or better
    val est256 = Sketches.kmvDistinct(df, "grp", "v", k = 256)
      .select("kmv_estimate").as[Double].head()
    assert(math.abs(est256 / n - 1.0) <= math.abs(est / n - 1.0) + 0.05)
  }

  test("sample quantiles: exact when the group fits in k, near-true beyond") {
    // group fits the sample entirely → nearest-rank quantiles are EXACT
    val small = (0L until 101L).map(i => ("g", i, i.toDouble))
      .toDF("grp", "id", "v")
    val exact = Sketches.sampleQuantiles(small, "grp", "id", "v",
      Seq(0.5, 0.9), k = 256).select("p50", "p90")
      .as[(Double, Double)].head()
    assert(exact == ((50.0, 90.0)))
    // 100k uniform values, k=256 sample: p50 within the sampling bound
    val big = spark.range(100000L)
      .select(lit("g").as("grp"), col("id"), (col("id") % 1000L).cast("double").as("v"))
    def run() = Sketches.sampleQuantiles(big, "grp", "id", "v",
      Seq(0.5), k = 256).select("p50").as[Double].head()
    val p50 = run()
    // true median 499.5; stderr ≈ sqrt(0.25/256) ≈ 3.1% of the range
    assert(math.abs(p50 - 499.5) < 100.0, s"sampled p50 = $p50")
    assert(run() == p50, "no-RNG reservoir must be reproducible")
  }

  test("string keys hash as mix64∘fnv1a64, exact below k, nulls excluded") {
    // the dispatch must route strings through mix64(fnv1a64(s)) — verify
    // against the JVM kernels directly (no drift between Column and JVM)
    val strs = Seq("", "a", "hello world", "Ünïcode ✓", "{\"k\": 87}")
    val hashed = strs.toDF("s")
    val got = hashed.select(graft.operators.Sketches
        .hashInput(hashed, "s").as("h")).as[Long].collect().toSeq
    assert(got == strs.map(s => TextFunctions.mix64(TextFunctions.fnv1a64(s))))
    // 10 distinct strings (repeated) fit k=64 → estimate is EXACT
    val df = (1L to 30L).map(i => ("g", s"user-${i % 10}")).toDF("grp", "v")
    assert(Sketches.kmvDistinct(df, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head() == 10.0)
    // null strings excluded, like null longs
    val withNull = Seq(("g", "x"), ("g", null), ("g", "y")).toDF("grp", "v")
    assert(Sketches.kmvDistinct(withNull, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head() == 2.0)
    // string-keyed estimator branch: n >> k lands near truth, deterministic
    val big = spark.range(5000L)
      .select(lit("g").as("grp"), concat(lit("id-"), col("id")).as("v"))
    def run() = Sketches.kmvDistinct(big, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head()
    val est = run()
    assert(math.abs(est / 5000.0 - 1.0) < 0.4, s"estimate $est")
    assert(run() == est)
    // string id for the quantile sample (the q110 shape)
    val q = (0L until 101L).map(i => ("g", s"row-$i", i.toDouble))
      .toDF("grp", "id", "v")
    assert(Sketches.sampleQuantiles(q, "grp", "id", "v", Seq(0.5), k = 256)
      .select("p50").as[Double].head() == 50.0)
  }

  test("non-integral non-string key types are rejected loudly, not null-cast") {
    val dbl = Seq(("g", 1.5)).toDF("grp", "v")
    val eDbl = intercept[IllegalArgumentException](
      Sketches.kmvDistinct(dbl, "grp", "v", k = 64))
    assert(eDbl.getMessage.contains("double"))
    val ts = Seq(("g", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("grp", "v")
    intercept[IllegalArgumentException](
      Sketches.kmvDistinct(ts, "grp", "v", k = 64))
    // and the same guard on the quantile sample's id column
    intercept[IllegalArgumentException](
      Sketches.sampleQuantiles(Seq(("g", 1.5, 2.0)).toDF("grp", "id", "v"),
        "grp", "id", "v", Seq(0.5)))
  }

  test("null values are excluded (countDistinct semantics), never NPE the sketch") {
    val df = Seq(("g", java.lang.Long.valueOf(1L)), ("g", null.asInstanceOf[java.lang.Long]),
      ("g", java.lang.Long.valueOf(2L))).toDF("grp", "v")
    assert(Sketches.kmvDistinct(df, "grp", "v", k = 64)
      .select("kmv_estimate").as[Double].head() == 2.0)
    val q = Seq(("g", java.lang.Long.valueOf(1L), java.lang.Double.valueOf(5.0)),
      ("g", null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(9.0)),
      ("g", java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double]),
      ("g", java.lang.Long.valueOf(3L), java.lang.Double.valueOf(7.0)))
      .toDF("grp", "id", "v")
    // only rows 1 and 3 survive → p50 over {5.0, 7.0} = 5.0
    assert(Sketches.sampleQuantiles(q, "grp", "id", "v", Seq(0.5), k = 64)
      .select("p50").as[Double].head() == 5.0)
    // fractional/colliding quantiles get exact, distinct labels
    val cols = Sketches.sampleQuantiles(q, "grp", "id", "v",
      Seq(0.99, 0.994, 0.125), k = 64).columns.toSeq
    assert(cols == Seq("grp", "p99", "p99_4", "p12_5"))
  }

  test("KMV overlap: exact when populations fit the sketch, near-true beyond") {
    // A = {0..9}, B = {5..14}: everything fits k=64 → EXACT set algebra
    val small = ((0L until 10L).map(("A", _)) ++ (5L until 15L).map(("B", _)))
      .toDF("grp", "v")
    val ex = Sketches.kmvOverlap(small, "grp", "v", "A", "B", k = 64)
      .select("d_a", "d_b", "d_union", "d_intersect", "jaccard_est")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(ex == ((10.0, 10.0, 15.0, 5.0, 5.0 / 15.0)))
    // 10k/10k with 5k overlap, k=256: estimates land near truth
    val big = ((0L until 10000L).map(("A", _)) ++ (5000L until 15000L).map(("B", _)))
      .toDF("grp", "v")
    val est = Sketches.kmvOverlap(big, "grp", "v", "A", "B", k = 256)
      .select("d_union", "d_intersect").as[(Double, Double)].head()
    assert(math.abs(est._1 / 15000.0 - 1.0) < 0.3, s"union ${est._1}")
    assert(math.abs(est._2 / 5000.0 - 1.0) < 0.5, s"intersect ${est._2}")
  }

  test("streaming KMV == batch KMV bit-for-bit, across arbitrary batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (0L until 3000L).map(i => (s"g${i % 3}", i * 7L))
    val batchDf = all.toDF("grp", "v")
    val expected = Sketches.kmvDistinct(batchDf, "grp", "v", k = 64)
      .select("grp", "kmv_estimate").as[(String, Double)].collect().toMap

    val ms = MemoryStream[(String, Long)](spark)
    val q = graft.streaming.EventStream
      .kmvDistinctStream(spark, ms.toDF().toDF("grp", "v"), "grp", "v", k = 64)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("kmv_stream").start()
    try {
      // three uneven batches, second overlaps the first (re-seen values
      // must not re-enter the sketch — distinct-by-hash state)
      ms.addData(all.take(1000): _*); q.processAllAvailable()
      ms.addData(all.slice(500, 2200): _*); q.processAllAvailable()
      ms.addData(all.drop(2200): _*); q.processAllAvailable()
    } finally q.stop()
    // the estimate is monotone non-decreasing as values arrive (the k-th
    // smallest hash only ever decreases), so the final per-group estimate
    // is the max over all Update-mode emissions — no sink-order reliance
    val got = spark.table("kmv_stream")
      .groupBy(col("group")).agg(max(col("kmv_estimate")).as("e"))
      .as[(String, Double)].collect().toMap
    assert(got == expected,
      s"stream $got != batch $expected — sketch merge must commute")
  }

  test("streaming quantiles == batch quantiles bit-for-bit, across batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // (group, unique id, value): ids are the sample key, values skewed
    val all = (0L until 3000L).map(i => (s"g${i % 3}", i, (i * i % 997).toDouble))
    val batchDf = all.toDF("grp", "id", "v")
    val expected = Sketches.sampleQuantiles(batchDf, "grp", "id", "v",
        Seq(0.5, 0.9, 0.99), k = 64)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    val ms = MemoryStream[(String, Long, Double)](spark)
    val q = graft.streaming.EventStream
      .sampleQuantilesStream(spark, ms.toDF().toDF("grp", "id", "v"),
        "grp", "id", "v", k = 64)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("quant_stream").start()
    try {
      // uneven batches, the second overlapping the first: a re-seen id
      // must not re-enter the sample (distinct-by-hash state)
      ms.addData(all.take(1000): _*); q.processAllAvailable()
      ms.addData(all.slice(500, 2200): _*); q.processAllAvailable()
      ms.addData(all.drop(2200): _*); q.processAllAvailable()
    } finally q.stop()
    // quantiles are NOT monotone — the final state is the emission with
    // the max accepted-row counter, exactly the q167 selection rule
    val got = spark.table("quant_stream")
      .groupBy(col("group"))
      .agg(max_by(struct(col("p50"), col("p90"), col("p99")),
        col("n_seen")).as("q"))
      .select(col("group"), col("q.p50"), col("q.p90"), col("q.p99"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expected, s"stream $got != batch $expected")
  }

  test("STRING-keyed streaming KMV == batch KMV bit-for-bit (shared hash dispatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // pre-fix regression shape: a string value column used to null-cast
    // and crash the (String, Long) decode; now it must match batch exactly
    val all = (0L until 2000L).map(i => (s"g${i % 2}", s"key-${i * 7}"))
    val batchDf = all.toDF("grp", "v")
    val expected = Sketches.kmvDistinct(batchDf, "grp", "v", k = 64)
      .select("grp", "kmv_estimate").as[(String, Double)].collect().toMap

    val ms = MemoryStream[(String, String)](spark)
    val q = graft.streaming.EventStream
      .kmvDistinctStream(spark, ms.toDF().toDF("grp", "v"), "grp", "v", k = 64)
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("kmv_stream_str").start()
    try {
      ms.addData(all.take(700): _*); q.processAllAvailable()
      ms.addData(all.slice(300, 1500): _*); q.processAllAvailable()
      ms.addData(all.drop(1500): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kmv_stream_str")
      .groupBy(col("group")).agg(max(col("kmv_estimate")).as("e"))
      .as[(String, Double)].collect().toMap
    assert(got == expected,
      s"string-keyed stream $got != batch $expected")
  }

  test("streaming HLL == batch hllRaw bit-for-bit, across arbitrary batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (0L until 3000L).map(i => (s"g${i % 3}", i * 11L))
    val batchDf = all.toDF("grp", "v")
    val expected = Sketches.hllRaw(batchDf, "grp", "v")
      .select("grp", "hll_estimate").as[(String, Double)].collect().toMap

    val ms = MemoryStream[(String, Long)](spark)
    val q = graft.streaming.EventStream
      .hllDistinctStream(spark, ms.toDF().toDF("grp", "v"), "grp", "v")
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("hll_stream").start()
    try {
      // uneven, overlapping batches — register max must commute
      ms.addData(all.take(1000): _*); q.processAllAvailable()
      ms.addData(all.slice(500, 2200): _*); q.processAllAvailable()
      ms.addData(all.drop(2200): _*); q.processAllAvailable()
    } finally q.stop()
    // registers only grow → estimate monotone → max emission == final
    val got = spark.table("hll_stream")
      .groupBy(col("group")).agg(max(col("hll_estimate")).as("e"))
      .as[(String, Double)].collect().toMap
    assert(got == expected,
      s"stream $got != batch $expected — register merge must commute")
  }

  test("STRING-keyed streaming HLL == batch (shared dispatch); TTL validated eagerly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (0L until 1500L).map(i => (s"g${i % 2}", s"url-${i * 3}"))
    val expected = Sketches.hllRaw(all.toDF("grp", "v"), "grp", "v")
      .select("grp", "hll_estimate").as[(String, Double)].collect().toMap
    val ms = MemoryStream[(String, String)](spark)
    val q = graft.streaming.EventStream
      .hllDistinctStream(spark, ms.toDF().toDF("grp", "v"), "grp", "v")
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("hll_stream_str").start()
    try {
      ms.addData(all.take(800): _*); q.processAllAvailable()
      ms.addData(all.drop(800): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hll_stream_str")
      .groupBy(col("group")).agg(max(col("hll_estimate")).as("e"))
      .as[(String, Double)].collect().toMap
    assert(got == expected)
    intercept[IllegalArgumentException](
      graft.streaming.EventStream.hllDistinctStream(spark,
        Seq(("g", 1L)).toDF("grp", "v"), "grp", "v",
        groupTtl = Some("not a duration")))
  }

  test("streaming HLL TTL branch: timeout removes state, survivors keep registers") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.EventStream
    val fn = EventStream.hllStateUpdate(Some("10 minutes")) _
    val st = TestGroupState.create[EventStream.HllState](
      optionalState = Optional.empty[EventStream.HllState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    // encoded im = idx*256 + rho
    val out = fn("g", Iterator(("g", 3 * 256 + 7), ("g", 3 * 256 + 5)), st).toSeq
    assert(out.size == 1 && st.exists)
    assert(st.get.regs(3) == 7, "register keeps the max rho")
    val timedOut = TestGroupState.create[EventStream.HllState](
      optionalState = Optional.of(st.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    assert(fn("g", Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved, "timed-out group must release its state")
  }

  test("Count-Min never underestimates; exact at low load; unseen keys estimate 0") {
    val df = (0L until 3000L).map(i => i % 100).toDF("v") // 100 keys × 30
    val counters = Sketches.cmCounters(df, "v", 1024, 4)
    val probe = (0L until 100L).toDF("v")
    val est = Sketches.cmEstimates(counters, probe, "v", 1024, 4)
      .as[(Long, Long)].collect().toMap
    // CM property: estimate >= true count, always
    assert(est.values.forall(_ >= 30L))
    // 100 keys in 1024 cells × 4 rows: min-over-rows is exact here
    assert(est.values.forall(_ == 30L), s"unexpected collisions: $est")
    val unseen = Sketches.cmEstimates(counters, Seq(99999L).toDF("v"), "v", 1024, 4)
      .as[(Long, Long)].collect().toMap
    assert(unseen(99999L) == 0L, "never-seen key must estimate 0 exactly")
  }

  test("Count-Min counters are partition-invariant and merge by addition") {
    val df = (0L until 2000L).map(i => i % 37).toDF("v")
    def cells(parts: Int) = Sketches.cmCounters(df.repartition(parts), "v", 256, 3)
      .as[(Int, Long, Long)].collect().toSet
    assert(cells(1) == cells(16), "counter cells must not depend on partitioning")
    // merging two halves by summing cells == building over the whole
    val a = Sketches.cmCounters(df.filter(col("v") < 20), "v", 256, 3)
    val b = Sketches.cmCounters(df.filter(col("v") >= 20), "v", 256, 3)
    val merged = a.union(b).groupBy(col("r"), col("pos"))
      .agg(sum(col("cnt")).as("cnt")).as[(Int, Long, Long)].collect().toSet
    assert(merged == cells(1), "CM must merge by plain cell addition")
  }

  test("streaming Count-Min cells == batch build, across arbitrary batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (0L until 2000L).map(i => i % 61)
    val expected = Sketches.cmCounters(all.toDF("v"), "v", 256, 3)
      .as[(Int, Long, Long)].collect().toSet

    val ms = MemoryStream[Long](spark)
    val q = graft.streaming.EventStream
      .cmCountersStream(ms.toDF().toDF("v"), "v", 256, 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("cm_stream").start()
    try {
      ms.addData(all.take(700): _*); q.processAllAvailable()
      ms.addData(all.drop(700): _*); q.processAllAvailable()
    } finally q.stop()
    // cell counts are monotone → max emission per cell == final table
    val got = spark.table("cm_stream")
      .groupBy(col("r"), col("pos")).agg(max(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got == expected, "streaming CM cells must equal the batch build")
  }

  test("HLL raw sketch: near truth at n >> m, deterministic, partition-invariant") {
    val n = 10000L
    val df = spark.range(n).select(lit("g").as("grp"), col("id").as("v"))
    def est(parts: Int) = Sketches.hllRaw(df.repartition(parts), "grp", "v")
      .select("hll_estimate").as[Double].head()
    val e1 = est(1)
    // m=64 registers → relative error ~1.04/sqrt(64) = 13%; raw estimator
    // (no corrections) at n/m ≈ 156 sits well inside 35%
    assert(math.abs(e1 - n) / n < 0.35, s"estimate $e1 vs $n")
    assert(est(16) == e1, "register max must commute across partitionings")
  }

  test("HLL raw sketch: string keys route through the same dispatch; other types loud") {
    val sdf = (1 to 2000).map(i => ("g", s"user-$i")).toDF("grp", "v")
    val e = Sketches.hllRaw(sdf, "grp", "v")
      .select("hll_estimate").as[Double].head()
    assert(math.abs(e - 2000) / 2000 < 0.35, s"estimate $e vs 2000")
    val dbl = Seq(("g", 1.5)).toDF("grp", "v")
    intercept[IllegalArgumentException](Sketches.hllRaw(dbl, "grp", "v"))
  }

  test("HLL algebra: union IS the max-merge (bit-equal to sketching the union)") {
    val a = (0L until 6000L).toDF("v")
    val b = (3000L until 9000L).toDF("v")
    val alg = Sketches.hllAlgebra(a, b, "v")
      .as[(Double, Double, Double, Double)].head()
    // the union estimate must equal hllRaw over the actual unioned rows —
    // registers merge by max, so the sketch of the union IS the merge
    val direct = Sketches.hllRaw(
      a.union(b).withColumn("g", lit("g")), "g", "v")
      .select("hll_estimate").as[Double].head()
    assert(alg._3 == direct)
    // inclusion–exclusion lands near the true overlap (|I| = 3000)
    assert(math.abs(alg._4 - 3000.0) / 3000.0 < 0.5, s"intersection ${alg._4}")
    assert(math.abs(alg._1 - 6000.0) / 6000.0 < 0.35, s"est_a ${alg._1}")
  }

  test("HLL algebra: empty population yields the raw all-empty estimate (documented)") {
    val a = (0L until 100L).toDF("v")
    val b = a.filter(col("v") < 0) // empty
    val alg = Sketches.hllAlgebra(a, b, "v")
      .as[(Double, Double, Double, Double)].head()
    // raw estimator of 64 empty registers = 0.709 * 64 — the documented
    // no-linear-counting artifact (corrections need ln, which is not
    // cross-engine replayable)
    assert(alg._2 == 45.376)
    assert(alg._3 == alg._1, "union with empty == est_a")
    assert(alg._4 == 0.0 || alg._4 == alg._1 + alg._2 - alg._3)
  }

  test("streaming KMV rejects non-integral non-string keys loudly (same dispatch)") {
    val dbl = Seq(("g", 1.5)).toDF("grp", "v")
    intercept[IllegalArgumentException](
      graft.streaming.EventStream.kmvDistinctStream(spark, dbl, "grp", "v"))
  }

  test("streaming KMV validates groupTtl at construction, not mid-stream") {
    val df = Seq(("g", 1L)).toDF("grp", "v")
    // a RUNTIME-VALID TTL must construct — the first validator used a
    // lookalike parser (JavaUtils) whose grammar is disjoint from the
    // runtime's (GroupStateImpl.parseDuration), so it rejected exactly
    // the strings the state operator accepts; only invalid-input tests
    // existed, so the suite stayed green
    graft.streaming.EventStream.kmvDistinctStream(spark, df, "grp", "v",
      groupTtl = Some("10 minutes"))
    graft.streaming.EventStream.kmvDistinctStream(spark, df, "grp", "v",
      groupTtl = Some("1 hour"))
    val e = intercept[IllegalArgumentException](
      graft.streaming.EventStream.kmvDistinctStream(spark, df, "grp", "v",
        groupTtl = Some("10 minuets")))
    assert(e.getMessage.contains("10 minuets"))
    intercept[IllegalArgumentException](
      graft.streaming.EventStream.kmvDistinctStream(spark, df, "grp", "v",
        groupTtl = Some("0 seconds"))) // parses, but must be positive
    intercept[IllegalArgumentException](
      graft.streaming.EventStream.kmvDistinctStream(spark, df, "grp", "v",
        groupTtl = Some("-5 minutes")))
  }

  test("streaming KMV TTL branch: timeout removes state, updates re-arm the clock") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.EventStream
    val fn = EventStream.kmvStateUpdate(64, Some("10 minutes")) _
    // normal update: estimate emitted, state written, timeout armed
    val st = TestGroupState.create[EventStream.KmvState](
      optionalState = Optional.empty[EventStream.KmvState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = false)
    val out = fn("g", Iterator(("g", 1L), ("g", 2L), ("g", 1L)), st).toSeq
    assert(out.map(_.kmv_estimate) == Seq(2.0))
    assert(st.exists && st.get.ks.length == 2)
    assert(st.getTimeoutTimestampMs.isPresent &&
      st.getTimeoutTimestampMs.get == 1000L + 10 * 60 * 1000L)
    // timeout invocation: state dropped, nothing emitted
    val timedOut = TestGroupState.create[EventStream.KmvState](
      optionalState = Optional.of(st.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = Optional.empty[Long](), hasTimedOut = true)
    assert(fn("g", Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved)
  }

  test("windowed KMV (Append): closed window emits ONCE, equals batch over admitted rows; watermark-late data is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // window W1 = Jan 1; six distinct users, then an advance event on
    // Jan 3 that pushes the watermark (max − 1 h) past W1's end + delay
    val w1Users = (1L to 6L).map(u => ("a", u, t(1, (u % 23).toInt)))
    val ms = MemoryStream[(String, Long, java.sql.Timestamp)](spark)
    val q = graft.streaming.EventStream.kmvWindowed(
        ms.toDF().toDF("event_type", "user_id", "ts"),
        "event_type", "user_id", k = 4, "1 day", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("kmv_windowed").start()
    try {
      ms.addData(w1Users :+ (("a", 999L, t(3, 12))): _*)
      q.processAllAvailable() // wm → Jan 3 11:00; W1 closes and emits
      // LATE: a W1 row arriving after W1 closed — must be dropped, not
      // re-open or re-emit the window
      ms.addData(("a", 77L, t(1, 5)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("kmv_windowed")
      .as[(java.sql.Timestamp, String, Double)].collect()
    // exactly one emission: W1 for group "a" (Jan 3's window never closes)
    assert(rows.length == 1, s"want exactly W1, got ${rows.toSeq}")
    val (ws, g, est) = rows(0)
    assert(ws == t(1, 0) && g == "a")
    // the emission equals the BATCH sketch over the admitted rows only —
    // user 77 is excluded (late), user 999 is another window
    val expected = Sketches.kmvDistinct(
        w1Users.toDF("event_type", "user_id", "ts"),
        "event_type", "user_id", k = 4)
      .select("kmv_estimate").as[Double].head()
    assert(est == expected, s"windowed stream $est != batch $expected")
    // sanity that the late-drop mattered: including user 77 changes the
    // sketch (otherwise the assertion above cannot distinguish)
    val withLate = Sketches.kmvDistinct(
        (w1Users :+ (("a", 77L, t(1, 5)))).toDF("event_type", "user_id", "ts"),
        "event_type", "user_id", k = 4)
      .select("kmv_estimate").as[Double].head()
    assert(withLate != expected)
  }

  test("windowed CM cells (Append) merged by addition == batch cmCounters over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // two closable windows with overlapping keys + an advance event
    val rows = (0L until 300L).map(i => (i % 17, t(1 + (i % 2).toInt, (i % 23).toInt)))
    val ms = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val q = graft.streaming.EventStream.cmCountersWindowed(
        ms.toDF().toDF("user_id", "ts"), "user_id", 256, 3, "1 day", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("cm_windowed").start()
    try {
      ms.addData(rows :+ ((999L, t(4, 12))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val merged = spark.table("cm_windowed")
      .groupBy(col("r"), col("pos")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect()
      .map { case (r, p, c) => ((r, p), c) }.toMap
    val batch = Sketches.cmCounters(
        rows.toDF("user_id", "ts"), "user_id", 256, 3)
      .as[(Int, Long, Long)].collect()
      .map { case (r, p, c) => ((r, p), c) }.toMap
    assert(merged == batch,
      "summed per-window cells must equal the batch build over admitted rows")
  }
}
