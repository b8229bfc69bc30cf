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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val t0Jvm = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0Jvm) / 1e9

    // The line must stay SHORT: the driver records only a bounded stdout
    // tail, and round 1's full-name/full-precision line (~3.2 KB) was
    // truncated into unparseable JSON. Compact keys (q01..q116 — unique by
    // construction) + 3-decimal seconds keep the whole line under ~1.3 KB.
    val sfName = sfDir.split('/').last
    val best = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val order = Registry.all.map(_.name) // stable declaration order
    val printed = new AtomicBoolean(false)
    def printLine(partial: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      val done = order.filter(best.containsKey)
      val qs = done.map { k =>
        "\"" + k.takeWhile(_ != '_') + "\":" + f"${best.get(k)}%.3f"
      }.mkString("{", ",", "}")
      val total = done.map(best.get(_)).filter(_ >= 0).sum
      val partialField = if (partial) "\"partial\":true," else ""
      println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",$partialField"queries":$qs,"sf":"$sfName"}""")
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
