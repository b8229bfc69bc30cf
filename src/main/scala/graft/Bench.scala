package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry.queries on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is materialized through the noop sink — count() would let
  * Catalyst prune the projections and under-measure scan+compute. A small
  * warm-up query pays the JIT/classloading cost once instead of billing
  * it to the first query.
  *
  * The artifact must survive a contended machine: round 6's driver-side
  * run was killed by an external timeout (rc 124) under co-tenant load,
  * losing the whole round's perf signal even though the solo run took
  * ~73 s. Two defenses: (a) the min-of-n extra iterations stop once a
  * wall-clock budget (SPARK_GRAFT_BENCH_BUDGET, seconds) is spent — the
  * first full pass always runs, so coverage never shrinks, only noise
  * robustness degrades; (b) an INTERNAL deadline
  * (SPARK_GRAFT_BENCH_DEADLINE, seconds): measurement runs on a daemon
  * worker thread while the main thread waits at most the deadline, then
  * prints whatever is measured (marked "partial":true) and exits 0.
  * Signals are useless here — the forked JVM's stdout pump dies with
  * sbt when an external `timeout` TERMs it (verified: a shutdown hook's
  * line never reaches the captured tail) — so the only reliable defense
  * is finishing, by the clock, before the external killer fires.
  */
object Bench {
  /** The FIXED bench anchor: round-7 per-query minima (sec, sf0.1,
    * local[32], min-of-2 — BENCH_r07.json, the first clean artifact
    * after the timeout-proof rewrite), recorded so the ≤2× gate has a
    * mechanical denominator instead of being re-litigated round-over-
    * round (BASELINE.md "Bench anchor"). Keys are the compact bench
    * keys; queries added after r7 have no anchor and are excluded from
    * the ratio (the ratio compares like-for-like totals). */
  private[graft] val anchor: Map[String, Double] = Map(
    "q01"->1.872, "q02"->0.31, "q03"->1.345, "q04"->0.561, "q05"->0.52, "q06"->0.764,
    "q07"->1.353, "q08"->0.536, "q09"->0.498, "q10"->0.863, "q11"->0.215, "q12"->0.834,
    "q13"->0.308, "q14"->0.4, "q15"->0.29, "q16"->0.261, "q17"->0.191, "q18"->0.152,
    "q19"->0.211, "q20"->0.993, "q21"->0.672, "q22"->0.403, "q23"->0.419, "q24"->0.514,
    "q25"->0.425, "q26"->0.415, "q27"->0.286, "q28"->0.284, "q29"->0.269, "q30"->0.201,
    "q31"->0.217, "q32"->1.145, "q33"->0.32, "q34"->0.341, "q35"->0.515, "q36"->1.425,
    "q37"->0.942, "q38"->0.235, "q39"->2.217, "q40"->1.739, "q41"->1.221, "q42"->1.653,
    "q43"->0.263, "q44"->3.152, "q45"->0.739, "q46"->2.359, "q50"->1.089, "q51"->0.2,
    "q52"->0.201, "q53"->0.31, "q54"->0.227, "q55"->0.194, "q56"->0.178, "q57"->0.292,
    "q58"->0.233, "q59"->0.54, "q60"->0.822, "q61"->0.654, "q62"->1.077, "q63"->0.271,
    "q64"->0.119, "q65"->0.345, "q66"->0.229, "q67"->0.734, "q68"->0.172, "q69"->0.152,
    "q70"->1.989, "q71"->0.333, "q72"->0.677, "q73"->0.251, "q74"->0.414, "q75"->0.56,
    "q76"->2.804, "q77"->2.813, "q78"->0.356, "q79"->0.96, "q80"->0.252, "q81"->0.411,
    "q82"->0.555, "q83"->0.667, "q84"->0.165, "q85"->0.185, "q86"->0.488, "q87"->0.322,
    "q88"->0.991, "q89"->0.525, "q90"->0.629, "q91"->0.857, "q92"->0.263, "q93"->0.314,
    "q94"->0.47, "q95"->1.816, "q96"->0.483, "q97"->0.304, "q98"->0.292, "q99"->0.302,
    "q100"->0.324, "q101"->0.305, "q102"->0.245, "q103"->2.602, "q104"->0.366, "q105"->1.489,
    "q106"->0.598, "q107"->0.916, "q108"->0.376, "q109"->0.416, "q110"->0.985, "q111"->1.915,
    "q112"->1.829, "q113"->5.126, "q114"->1.542, "q115"->1.102, "q116"->0.33, "q117"->2.335,
    "q118"->6.449, "q119"->1.001, "q120"->0.469, "q121"->0.428, "q122"->0.718, "q123"->0.449,
    "q124"->0.602, "q125"->0.653, "q126"->0.414, "q127"->1.147, "q128"->4.739, "q129"->1.188)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val t0Jvm = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0Jvm) / 1e9

    // The line must stay SHORT: the driver records only a bounded stdout
    // tail, and round 1's full-name/full-precision line (~3.2 KB) was
    // truncated into unparseable JSON. Compact keys (qNN — unique by
    // construction) + 3-decimal seconds put a ~130-query line at ~1.9 KB
    // (measured: 126 queries → 1.78 KB in BENCH_r07), well under the
    // ~3.2 KB bound that truncated round 1's line.
    // All number formatting is Locale.ROOT: under a non-English default
    // JVM locale the f-interpolator renders decimals with commas and the
    // artifact becomes unparseable JSON.
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val sfName = sfDir.split('/').last
    val best = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val order = Registry.all.map(_.name) // stable declaration order
    val printed = new AtomicBoolean(false)
    def printLine(partial: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      val done = order.filter(best.containsKey)
      val qs = done.map { k =>
        "\"" + k.takeWhile(_ != '_') + "\":" + fmt(best.get(k))
      }.mkString("{", ",", "}")
      val total = done.map(best.get(_)).filter(_ >= 0).sum
      val partialField = if (partial) "\"partial\":true," else ""
      // vs_anchor: measured/anchor totals over the queries BOTH sides
      // have (anchored + measured successfully this run) — the mechanical
      // form of BASELINE.md's ≤2× gate. "anchor":"ok" ≤1.5 < "warn" ≤2
      // < "fail"; partial runs skip the verdict (an interrupted run's
      // ratio over a truncated subset is not a perf signal).
      val shared = done.filter(k => best.get(k) >= 0 &&
        anchor.contains(k.takeWhile(_ != '_')))
      val anchorSum = shared.map(k => anchor(k.takeWhile(_ != '_'))).sum
      val anchorField =
        if (partial || anchorSum <= 0) ""
        else {
          val ratio = shared.map(best.get(_)).sum / anchorSum
          val status =
            if (ratio <= 1.5) "ok" else if (ratio <= 2.0) "warn" else "fail"
          s""""vs_anchor":${fmt(ratio)},"anchor":"$status","""
        }
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$partialField$anchorField"queries":$qs,"sf":"$sfName"}""")
      System.out.flush()
    }

    // n iterations per query, report the MIN — single-shot numbers have
    // flagged phantom 2× regressions (GC pause / first-touch page faults
    // landing on one query) two rounds running; min-of-n is the standard
    // noise-robust point estimate for a deterministic workload.
    // malformed env must not kill the run before the JSON line prints —
    // a config typo would otherwise read as a total bench failure.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(_.toIntOption).getOrElse(2).max(1)
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET")
      .flatMap(_.toDoubleOption).getOrElse(600.0).max(1.0)
    val deadlineSec = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE")
      .flatMap(_.toDoubleOption).getOrElse(780.0).max(1.0)

    val worker = new Thread(() => {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      // warm-up: JIT, codegen, parquet reader paths (not billed to queries)
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).limit(1).collect())
      // q50's on-disk fixture is generate-once/reuse — build it here so a
      // cold /tmp bills fixture generation to warm-up, not to the query
      graft.sources.SnapshotFixture.generate("/tmp/graft-fixture-q50",
        graft.sources.SnapshotFixture.defaultTopics(100, 1000))

      def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        // release() inside the timed region: dropping a query's operator
        // caches is part of that query's cost, and carrying them over would
        // skew later queries' memory
        try graft.operators.OperatorCaches.withCaches {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }

      // pass 1: every query exactly once — full coverage before any re-runs
      Registry.all.foreach(q => best.put(q.name, runOnce(q.fn)))
      // passes 2..n: tighten the min while the budget lasts; under co-tenant
      // load this degrades to single-shot numbers instead of a killed run
      var pass = 1
      while (pass < iters && elapsed < budgetSec) {
        Registry.all.foreach { q =>
          if (elapsed < budgetSec && best.get(q.name) >= 0) {
            val t = runOnce(q.fn)
            if (t >= 0 && t < best.get(q.name)) best.put(q.name, t)
          }
        }
        pass += 1
      }
      printLine(partial = false)
      spark.stop()
    }, "bench-worker")
    worker.setDaemon(true)
    worker.start()
    worker.join((deadlineSec * 1000).toLong)
    if (worker.isAlive) {
      // deadline hit mid-measurement: emit what we have and exit cleanly —
      // a partial artifact beats a killed run with no line at all
      printLine(partial = true)
      System.exit(0)
    } else if (!printed.get) {
      // the worker DIED (session build, warm-up, fixture) before printing
      // — emit the partial line so the tail stays parseable, but exit
      // nonzero: an environment failure must stay loud, not read as a
      // clean run with a silently missing artifact
      printLine(partial = true)
      System.exit(1)
    }
  }
}
