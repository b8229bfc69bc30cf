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
  /** The FIXED bench anchor: round-8 per-query minima (sec, sf0.1,
    * local[32], min-of-2 — BENCH_r08.json, clean rc 0, full 137-query
    * coverage; re-anchored from r7 in round 10 per BASELINE.md's
    * append-only rule), recorded so the ≤2× gate has a mechanical
    * denominator instead of being re-litigated round-over-round
    * (BASELINE.md "Bench anchor"). Keys are the compact bench keys;
    * queries added after r8 have no anchor and are excluded from the
    * ratio (the ratio compares like-for-like totals).
    *
    * The anchor was recorded on round 8's machine; rounds run on
    * whatever host the harness lands on, and round 10 measured a
    * UNIFORM ~1.8× inflation across all 137 queries (including
    * trivial fixed-cost ones) on a slower Xeon — host speed, not
    * regression. The sum ratio (vs_anchor) cannot tell those apart,
    * so the line also carries host-invariant signals:
    * vs_anchor_med (median per-query ratio — uniform host slowdown
    * moves the median, a few regressed queries cannot) and regress
    * (count of queries whose ratio exceeds 1.5× that median — a true
    * code regression stands out above the host factor). calib_sec is
    * a deterministic single-thread spin (JIT-warmed xorshift64*)
    * giving future rounds an absolute same-artifact host-speed
    * witness (r8's host predates the field; its calib is unknown).
    *
    * q142–q174 were appended in round 12 (the r11 verdict's "anchor
    * blind spot": regress could never see post-r8 queries). They were
    * measured in one clean solo min-of-3 pass (calib 2.059 s,
    * regress 0 over 12 anchored controls spanning the cost classes)
    * and NORMALIZED to the r8 scale by dividing each minimum by that
    * run's control median ratio (1.4412), so the whole map shares one
    * host scale and vs_anchor_med keeps its uniform-host-factor
    * reading. Recorded in BASELINE.md "Bench anchor" per the
    * append-only rule. */
  private[graft] val anchor: Map[String, Double] = Map(
    "q01"->0.453, "q02"->0.151, "q03"->1.101, "q04"->0.357, "q05"->0.205, "q06"->0.272,
    "q07"->0.683, "q08"->0.356, "q09"->0.323, "q10"->0.512, "q11"->0.145, "q12"->0.631,
    "q13"->0.171, "q14"->0.25, "q15"->0.188, "q16"->0.097, "q17"->0.093, "q18"->0.121,
    "q19"->0.13, "q20"->0.478, "q21"->0.402, "q22"->0.233, "q23"->0.224, "q24"->0.36,
    "q26"->0.239, "q27"->0.126, "q28"->0.189, "q29"->0.197, "q30"->0.137, "q31"->0.132,
    "q32"->0.917, "q33"->0.222, "q34"->0.223, "q35"->0.272, "q36"->1.114, "q37"->0.744,
    "q38"->0.156, "q39"->1.387, "q40"->1.309, "q41"->0.886, "q42"->1.015, "q43"->0.152,
    "q44"->2.394, "q45"->0.441, "q46"->1.868, "q50"->0.951, "q51"->0.154, "q52"->0.155,
    "q53"->0.242, "q54"->0.177, "q55"->0.131, "q56"->0.128, "q57"->0.196, "q58"->0.142,
    "q59"->0.353, "q60"->0.502, "q61"->0.446, "q62"->0.83, "q63"->0.333, "q64"->0.185,
    "q65"->0.188, "q66"->0.263, "q67"->0.409, "q68"->0.132, "q69"->0.138, "q70"->1.718,
    "q71"->0.272, "q72"->0.492, "q73"->0.161, "q74"->0.26, "q75"->0.302, "q76"->1.699,
    "q77"->1.988, "q78"->0.301, "q79"->0.634, "q80"->0.168, "q81"->0.202, "q82"->0.37,
    "q83"->0.425, "q84"->0.107, "q85"->0.124, "q86"->0.372, "q87"->0.227, "q88"->0.657,
    "q89"->0.343, "q90"->0.388, "q91"->0.646, "q92"->0.214, "q93"->0.264, "q94"->0.392,
    "q95"->1.711, "q96"->0.441, "q97"->0.221, "q98"->0.17, "q99"->0.197, "q100"->0.237,
    "q101"->0.252, "q102"->0.233, "q103"->1.753, "q104"->0.243, "q105"->1.064,
    "q106"->0.363, "q107"->0.693, "q108"->0.217, "q109"->0.264, "q110"->0.588,
    "q111"->1.583, "q112"->1.463, "q113"->4.451, "q114"->1.326, "q115"->0.959,
    "q116"->0.198, "q117"->2.05, "q118"->5.042, "q119"->0.519, "q120"->0.292,
    "q121"->0.298, "q122"->0.588, "q123"->0.303, "q124"->0.461, "q125"->0.397,
    "q126"->0.265, "q127"->0.91, "q128"->3.608, "q129"->0.956, "q130"->0.155,
    "q131"->0.328, "q132"->0.575, "q133"->1.04, "q134"->1.163, "q135"->1.659,
    "q136"->1.835, "q137"->0.248, "q138"->0.116, "q139"->0.335, "q140"->0.335,
    "q141"->0.139,
    // round-12 append (r8-normalized, see scaladoc)
    "q142"->0.316, "q143"->0.12, "q144"->0.579, "q145"->3.571, "q146"->0.205,
    "q147"->1.862, "q148"->0.349, "q149"->0.619, "q150"->0.386, "q151"->3.029,
    "q152"->0.913, "q153"->0.271, "q154"->1.376, "q155"->1.302, "q156"->1.229,
    "q157"->0.176, "q158"->0.846, "q159"->0.164, "q160"->0.229, "q161"->3.838,
    "q162"->2.848, "q163"->0.357, "q164"->2.302, "q165"->0.17, "q166"->0.764,
    "q167"->1.007, "q168"->1.337, "q169"->1.866, "q170"->3.355, "q171"->0.928,
    "q172"->0.905, "q173"->1.107, "q174"->0.586,
    // round-12 new queries (same normalization, control median 1.502,
    // calib 2.026 — recorded so next round's regress covers them too)
    "q175"->1.055, "q176"->0.558, "q177"->0.42, "q178"->1.041,
    "q179"->1.144, "q180"->2.08, "q181"->1.703,
    // round-12 late additions: two contended control runs (medians
    // 1.695 / 1.806, calib 2.03 / 2.14, regress 0 both — uniform
    // inflation), each query normalized within its own run, best
    // host-adjusted reading kept
    "q182"->1.134, "q183"->0.94, "q184"->1.214)

  /** Deterministic single-thread host-speed witness: a fixed xorshift64*
    * spin, JIT-warmed, whose wall time depends only on per-core speed.
    * The returned state is folded into a comparison so the loop cannot
    * be dead-code-eliminated. */
  private def calibrate(): Double = {
    def spin(iters: Long): Long = {
      var x = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < iters) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        i += 1
      }
      x * 0x2545F4914F6CDD1DL
    }
    val sink = spin(1L << 24) // JIT warm-up
    val t0 = System.nanoTime()
    val sink2 = spin(1L << 30)
    val dt = (System.nanoTime() - t0) / 1e9
    if (sink == 0 && sink2 == 0) println("") // DCE guard, never taken
    dt
  }

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
    val calibSec = new java.util.concurrent.atomic.AtomicReference[Double](-1.0)
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
          // host-invariant companions (scaladoc on `anchor`): median
          // per-query ratio absorbs a uniformly slower host; `regress`
          // counts queries above 1.5× that median — the true-regression
          // signal a host-speed shift cannot fake.
          val ratios = shared
            .map(k => best.get(k) / anchor(k.takeWhile(_ != '_'))).sorted
          val med =
            if (ratios.isEmpty) 0.0
            else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
            else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
          // absolute floor too: a 0.1→0.3 s jitter spike on a trivial
          // query is below this class of host's noise floor, not a
          // regression worth flagging (measured: q16 spiked 0.10→0.90 s
          // in exactly one r10 pass, both its neighbors clean)
          val regress = shared.count { k =>
            val a = anchor(k.takeWhile(_ != '_'))
            best.get(k) / a > 1.5 * med && best.get(k) - a > 0.3
          }
          s""""vs_anchor":${fmt(ratio)},"anchor":"$status","vs_anchor_med":${fmt(med)},"regress":$regress,"""
        }
      val calibField =
        if (calibSec.get() < 0) "" else s""""calib_sec":${fmt(calibSec.get())},"""
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$partialField$anchorField$calibField"queries":$qs,"sf":"$sfName"}""")
      // SECOND line — compact headline-only summary (~150 bytes), printed
      // AFTER the per-query line. The driver captures a bounded stdout
      // TAIL; at 156 queries the per-query line alone is ~2.1 KB and
      // BENCH_r10.json recorded parsed:null because the tail window cut
      // off the line's FRONT (where the headline fields live). Growing
      // the registry must never blind the perf gate again: this trailer
      // is what the tail always ends with, parseable standalone, and it
      // stays <500 bytes no matter how many queries register.
      println(s"""{"metric":"summary","total_sec":${fmt(total)},"unit":"sec",$partialField$anchorField$calibField"n_queries":${done.size},"sf":"$sfName"}""")
      System.out.flush()
    }

    // n iterations per query, report the MIN — single-shot numbers have
    // flagged phantom 2× regressions (GC pause / first-touch page faults
    // landing on one query) two rounds running; min-of-n is the standard
    // noise-robust point estimate for a deterministic workload.
    // malformed env must not kill the run before the JSON line prints —
    // a config typo would otherwise read as a total bench failure.
    // default raised 2 → 3 in round 10: on a co-tenant-noisy host a
    // 30-second CPU burst can span BOTH passes of one query (measured:
    // q13 spiked 4.7× with clean neighbors, twice in one run) and
    // min-of-2 then false-flags `regress`; a third pass makes the min
    // robust to any single burst. ~65 s extra, still far inside the
    // budget/deadline envelope.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    // optional targeted subset (comma-separated compact keys, e.g.
    // "q46,q105") for solo regression re-checks — never set by the
    // driver, whose artifact always covers the full registry
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def selected = Registry.all.filter(q =>
      only.forall(_.contains(q.name.takeWhile(_ != '_'))))
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
      // host-speed witness, measured after JIT warm-up, not billed to queries
      calibSec.set(calibrate())

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
      selected.foreach(q => best.put(q.name, runOnce(q.fn)))
      // passes 2..n: tighten the min while the budget lasts; under co-tenant
      // load this degrades to single-shot numbers instead of a killed run
      var pass = 1
      while (pass < iters && elapsed < budgetSec) {
        selected.foreach { q =>
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
