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
  * ~73 s. Two defenses: (a) re-runs (consecutive per-query, adaptive —
  * see the measurement loop) stop once a wall-clock budget
  * (SPARK_GRAFT_BENCH_BUDGET, seconds) is spent — every query's first
  * run always executes, so coverage never shrinks, only noise
  * robustness degrades, and the artifact records the degradation
  * (passes / cold_only fields); (b) an INTERNAL deadline
  * (SPARK_GRAFT_BENCH_DEADLINE, seconds): measurement runs on a daemon
  * worker thread while the main thread waits at most the deadline, then
  * prints whatever is measured (marked "partial":true) and exits 0.
  * Signals are useless here — the forked JVM's stdout pump dies with
  * sbt when an external `timeout` TERMs it (verified: a shutdown hook's
  * line never reaches the captured tail) — so the only reliable defense
  * is finishing, by the clock, before the external killer fires.
  */
object Bench {
  /** The FIXED bench anchor: round-13 per-query minima (sec, sf0.1,
    * local[32], min-of-3 — one clean solo pass at round-13 close,
    * calib 2.053 s, 185-query coverage, rc 0; q186–q199 late additions
    * appended from solo control runs, see BASELINE.md), recorded so the
    * ≤2× gate has a mechanical denominator instead of being
    * re-litigated round-over-round (BASELINE.md "Bench anchor").
    *
    * Re-anchored from the r8 scale per the r12 verdict: the old map
    * had accreted FOUR normalization regimes (r8 raw; r12 appends
    * ÷1.4412; ÷1.502; per-run best for q182–q184) — correct but
    * unauditable. This map is ONE scale measured in ONE run; the
    * retired entries and every normalization are preserved in
    * BASELINE.md (append-only). The recording host's calib (2.053 s)
    * is the cross-round bridge: r8-class hosts read vs_anchor ≈ 0.65,
    * r10-class ≈ 1.0–1.2.
    *
    * Rounds run on whatever host the harness lands on; the sum ratio
    * (vs_anchor) cannot distinguish a uniformly slower host from a
    * real regression, so the line also carries host-invariant
    * signals: vs_anchor_med (median per-query ratio — a uniform host
    * factor moves the median, a few regressed queries cannot) and
    * regress (count of queries above 1.5× that median and 0.3 s over
    * anchor — the true-regression signal). calib_sec is a
    * deterministic single-thread spin (JIT-warmed xorshift64*), an
    * absolute same-artifact host-speed witness. */
  private[graft] val anchor: Map[String, Double] = Map(
    "q01"->0.689, "q02"->0.219, "q03"->1.659, "q04"->0.656, "q05"->0.324, "q06"->0.385,
    "q07"->0.865, "q08"->0.481, "q09"->0.496, "q10"->0.808, "q11"->0.231, "q12"->1.128,
    "q13"->0.24, "q14"->0.343, "q15"->0.277, "q16"->0.136, "q17"->0.14, "q18"->0.176,
    "q19"->0.207, "q20"->0.633, "q21"->0.396, "q22"->0.398, "q23"->0.347, "q24"->0.514,
    "q26"->0.36, "q27"->0.2, "q28"->0.317, "q29"->0.28, "q30"->0.232, "q31"->0.242,
    "q32"->1.331, "q33"->0.4, "q34"->0.362, "q35"->0.489, "q36"->1.699, "q37"->1.089,
    "q38"->0.25, "q39"->2.378, "q40"->1.83, "q41"->1.226, "q42"->1.474, "q43"->0.257,
    "q44"->3.482, "q45"->0.612, "q46"->2.64, "q50"->1.562, "q51"->0.277, "q52"->0.276,
    "q53"->0.407, "q54"->0.315, "q55"->0.191, "q56"->0.183, "q57"->0.337, "q58"->0.131,
    "q59"->0.368, "q60"->0.703, "q61"->0.605, "q62"->1.02, "q63"->0.281, "q64"->0.134,
    "q65"->0.203, "q66"->0.254, "q67"->0.415, "q68"->0.134, "q69"->0.114, "q70"->2.514,
    "q71"->0.5, "q72"->0.468, "q73"->0.247, "q74"->0.413, "q75"->0.488, "q76"->2.698,
    "q77"->3.117, "q78"->0.518, "q79"->0.808, "q80"->0.293, "q81"->0.293, "q82"->0.567,
    "q83"->0.664, "q84"->0.169, "q85"->0.204, "q86"->0.545, "q87"->0.37, "q88"->0.944,
    "q89"->0.555, "q90"->0.591, "q91"->1.071, "q92"->0.327, "q93"->0.442, "q94"->0.609,
    "q95"->2.231, "q96"->0.764, "q97"->0.331, "q98"->0.289, "q99"->0.466, "q100"->0.399,
    "q101"->0.431, "q102"->0.37, "q103"->2.414, "q104"->0.395, "q105"->1.701, "q106"->0.623,
    "q107"->0.905, "q108"->0.342, "q109"->0.432, "q110"->0.919, "q111"->2.475, "q112"->2.532,
    "q113"->6.233, "q114"->2.029, "q115"->1.417, "q116"->0.321, "q117"->2.709, "q118"->7.389,
    "q119"->0.95, "q120"->0.453, "q121"->0.581, "q122"->0.879, "q123"->0.546, "q124"->0.68,
    "q125"->0.735, "q126"->0.449, "q127"->1.496, "q128"->5.325, "q129"->1.629, "q130"->0.288,
    "q131"->0.473, "q132"->0.769, "q133"->1.579, "q134"->1.899, "q135"->2.413, "q136"->2.738,
    "q137"->0.364, "q138"->0.184, "q139"->0.483, "q140"->0.583, "q141"->0.236, "q142"->0.496,
    "q143"->0.176, "q144"->0.8, "q145"->5.475, "q146"->0.343, "q147"->2.499, "q148"->0.507,
    "q149"->1.037, "q150"->0.595, "q151"->4.768, "q152"->1.248, "q153"->0.505, "q154"->2.1,
    "q155"->1.913, "q156"->1.877, "q157"->0.26, "q158"->1.187, "q159"->0.27, "q160"->0.417,
    "q161"->4.7, "q162"->4.146, "q163"->0.484, "q164"->3.445, "q165"->0.228, "q166"->1.164,
    "q167"->1.524, "q168"->2.151, "q169"->2.681, "q170"->5.186, "q171"->1.597, "q172"->1.189,
    "q173"->1.813, "q174"->0.81, "q175"->1.589, "q176"->0.65, "q177"->0.611, "q178"->1.56,
    "q179"->1.715, "q180"->3.654, "q181"->2.327, "q182"->1.065, "q183"->1.101, "q184"->1.738,
    "q185"->2.129, "q186"->2.844, "q187"->6.157, "q188"->4.306, "q189"->0.22,
    // round-13 late additions (min over two solo passes, calib 2.04-2.12;
    // mild ~1.1x contention errs these HIGH = conservative for regress)
    "q190"->1.804, "q191"->1.319, "q192"->4.779, "q193"->3.971,
    "q194"->2.568, "q195"->2.747, "q196"->1.051, "q197"->0.638, "q198"->0.793, "q199"->1.582,
    // round-14 additions (clean solo min-of-3, calib 2.034, rc 0;
    // normalized to the anchor scale by the same run's 12-control
    // median ratio 1.0658 — BASELINE.md "round-14 append")
    "q200"->3.331, "q201"->2.043, "q202"->0.558, "q203"->1.230,
    "q204"->3.750, "q205"->0.586, "q206"->0.834,
    // round-14 late additions (clean solo min-of-3, calib 2.082,
    // 12-control median 0.995, regress 0 — BASELINE.md)
    "q207"->2.346, "q208"->2.694, "q209"->0.878,
    // round-14 third wave (clean solo min-of-3, calib 2.021,
    // 12-control median 0.9385, regress 0 — BASELINE.md)
    "q210"->2.794, "q211"->0.539, "q212"->0.238, "q213"->1.414, "q214"->3.219,
    // round-14 fourth wave (clean solo min-of-3, calib 2.170,
    // 12-control median 0.9849, regress 0 — BASELINE.md; q215 anchored
    // AFTER its O(len²)→O(len) kernel fix, 13.9 s → 0.34 s)
    "q215"->0.342, "q216"->0.512, "q217"->0.735,
    // round-14 fifth wave (clean solo min-of-3, calib 2.042,
    // 12-control median 0.973, regress 0 — BASELINE.md)
    "q218"->1.095, "q219"->4.275, "q220"->0.787, "q221"->0.936,
    "q222"->0.654, "q223"->0.621, "q224"->6.562, "q225"->0.397,
    "q226"->1.591, "q227"->1.883, "q228"->0.896, "q229"->1.667,
    "q230"->0.806,
    // round-14 sixth wave (clean solo min-of-3, calib 2.009,
    // 12-control median 0.964, regress 0 — BASELINE.md)
    "q231"->0.860, "q232"->3.902, "q233"->1.578, "q234"->0.596,
    "q235"->0.643, "q236"->0.284,
    // round-14 seventh wave (clean solo min-of-3, calib 2.124,
    // 12-control median 1.051, regress 0 — BASELINE.md)
    "q237"->2.012, "q238"->3.472,
    // round-15 additions (clean solo FORCE_MIN min-of-3, calib 2.059,
    // 12-control median 0.8758, regress 0, cold_only 0 — BASELINE.md)
    "q239"->0.686, "q240"->0.628, "q241"->5.734, "q242"->2.439,
    "q243"->0.248, "q244"->6.994,
    // round-15 second wave (clean solo FORCE_MIN min-of-3, calib 2.209,
    // 12-control median 0.8996, regress 0, cold_only 0 — BASELINE.md)
    "q245"->3.393, "q246"->6.029, "q247"->3.786, "q248"->1.426,
    "q249"->2.136,
    // round-15 third wave (clean solo FORCE_MIN min-of-3, calib 2.019,
    // 12-control median 0.9103, regress 0, cold_only 0 — BASELINE.md)
    "q250"->7.742, "q251"->2.476,
    // round-15 fourth wave (clean solo FORCE_MIN min-of-3, calib 2.021,
    // 12-control median 0.9245, regress 0, cold_only 0 — BASELINE.md)
    "q252"->0.969, "q253"->2.266,
    // round-16 wave (clean solo FORCE_MIN min-of-3, calib 2.080,
    // 12-control median 1.0177, regress 0, cold_only 0 — BASELINE.md)
    "q254"->4.429, "q255"->1.132, "q256"->0.963, "q257"->6.827,
    "q258"->0.967, "q259"->0.658, "q260"->6.203, "q261"->1.156,
    "q262"->3.261, "q263"->7.312, "q264"->1.478,
    // round-16 second wave (clean solo FORCE_MIN min-of-3, calib 2.037,
    // 12-control median 1.0677, regress 0, cold_only 0 — BASELINE.md)
    "q265"->1.169, "q266"->0.700, "q267"->1.574, "q268"->2.543,
    "q269"->0.542, "q270"->1.451, "q271"->2.354, "q272"->2.688,
    "q273"->1.300, "q274"->2.095, "q275"->1.279, "q276"->3.030,
    "q277"->1.347,
    // round-16 third wave (two clean solo FORCE_MIN min-of-3 runs,
    // calib 2.094/2.131, 12-control medians 1.0611/1.1722, regress 0,
    // cold_only 0 — BASELINE.md; q281 re-anchored after its chunk
    // persist landed)
    "q278"->0.973, "q279"->1.480, "q280"->2.896, "q281"->8.271,
    // round-16 fourth wave (clean solo FORCE_MIN min-of-3, calib 2.103,
    // 12-control median 0.9962, regress 0, cold_only 0 — BASELINE.md)
    "q282"->1.395,
    // round-16 fifth wave (clean solo FORCE_MIN min-of-3, calib 2.024,
    // 12-control median 0.872, regress 0, cold_only 0 — BASELINE.md)
    "q283"->0.859, "q284"->3.133,
    // round-16 sixth wave (clean solo FORCE_MIN min-of-3, calib 2.186,
    // 12-control median 0.9404, regress 0, cold_only 0 — BASELINE.md)
    "q285"->0.756,
    // round-16 seventh wave (clean solo FORCE_MIN min-of-3, calib 2.030,
    // 12-control median 0.8688, regress 0, cold_only 0 — BASELINE.md)
    "q286"->1.091,
    // round-16 eighth wave (clean solo FORCE_MIN min-of-3, calib 2.301,
    // 12-control median 0.7849, regress 0, cold_only 0 — BASELINE.md)
    "q287"->1.058, "q288"->0.678, "q289"->4.495, "q290"->1.571,
    "q291"->1.614,
    // round-16 ninth wave (clean solo FORCE_MIN min-of-3, calib 2.318,
    // 12-control median 0.829, regress 0, cold_only 0 — BASELINE.md)
    "q292"->3.917, "q293"->1.515,
    // round-16 tenth wave (clean solo FORCE_MIN min-of-3, calib 2.284,
    // 12-control median 0.8148, regress 0, cold_only 0 — BASELINE.md)
    "q294"->0.61, "q295"->0.843, "q296"->5.067,
    // round-16 eleventh wave (clean solo FORCE_MIN min-of-3, calib
    // 2.289, 12-control median 0.812, regress 0, cold_only 0)
    "q297"->1.589, "q298"->2.363,
    // round-16 twelfth wave (clean solo FORCE_MIN min-of-3, calib
    // 2.290, 12-control median 0.8731, regress 0, cold_only 0)
    "q299"->3.39,
    // round-16 thirteenth wave (clean solo FORCE_MIN min-of-3, calib
    // 2.412, 12-control median 0.895, regress 0, cold_only 0)
    "q300"->0.61, "q301"->1.781, "q302"->3.238,
    // round-16 fourteenth wave (clean solo FORCE_MIN min-of-3, calib
    // 2.317, 12-control median 0.8761, regress 0, cold_only 0)
    // q304 re-anchored r19 per the r18 three-solo-run watch note: raw
    // solo minimum stable at ~1.93 s across two clean FORCE_MIN waves
    // (control medians 0.8265 / 0.7977); min normalized = 2.329. No
    // code change touches the fuzzy path — the r17 1.458 anchor was
    // simply a fast outlier.
    "q303"->2.943, "q304"->2.329,
    // round-16 fifteenth wave (clean solo FORCE_MIN min-of-3, calib
    // 2.297, 12-control median 0.9025, regress 0, cold_only 0)
    "q305"->1.069,
    // r17 appends — clean solo FORCE_MIN wave (calib 2.290, regress 0,
    // cold_only 0), normalized by the wave's 12-control median 0.855
    "q306"->2.398, "q307"->2.855, "q308"->4.372,
    // q309 re-anchored after the wordpiece leg landed (median 0.915)
    "q309"->0.952,
    "q310"->6.645,
    // r17 second wave — clean solo FORCE_MIN (calib 2.443, regress 0,
    // cold_only 0), 12-control median 0.9095
    "q311"->2.494, "q312"->0.975, "q313"->0.156,
    // r19 re-anchor (CDC cycles → partitioned versioned artifacts,
    // IndexArtifact: per-batch folds touch only the batch's hash
    // partitions — O(batch) I/O at scale, more driver metadata ops at
    // sf0.1; min of two normalized FORCE_MIN waves, control medians
    // 0.8948 / 0.8265)
    "q314"->10.589,
    // r18 re-anchor (percolate → rarest-term routing; min of two
    // normalized FORCE_MIN waves, control medians 1.0826 / 1.0147)
    "q315"->1.100,
    "q316"->3.774,
    // r17 sixth wave — clean solo FORCE_MIN, 12-control median 0.9621
    "q317"->3.058,
    // r18 wave — clean solo FORCE_MIN, 12-control median 0.9383
    "q318"->2.839,
    "q319"->6.401,
    "q320"->3.794,
    // r19 re-anchor — same partitioned-artifact re-shape as q314
    "q321"->13.964,
    "q322"->1.149,
    "q323"->2.273,
    // r18 second wave 0.9009; re-anchored after percolate routing
    // (min of two normalized FORCE_MIN waves, medians 1.0826 / 1.0147)
    "q324"->3.797,
    // r18 third wave — clean solo FORCE_MIN, 12-control median 1.0034
    "q325"->5.293,
    "q326"->1.678,
    // r19 wave — min of two clean solo FORCE_MIN waves (12-control
    // medians 0.8915 / 0.8126, regress 0, cold_only 0 both)
    "q327"->1.785,
    "q328"->4.025,
    "q329"->1.025,
    "q330"->5.512,
    "q331"->3.814,
    // r19 second wave — min of two clean solo FORCE_MIN waves
    // (12-control medians 0.8153 / 0.9347, regress 0, cold_only 0 both)
    "q332"->0.784,
    // r19 third wave — min of two normalized FORCE_MIN waves
    // (12-control medians 1.1260 / 1.0750; wave 2 regress 0,
    // cold_only 0)
    "q333"->7.551, "q334"->1.820, "q335"->5.282, "q336"->0.862,
    // r19 fourth wave — min of two clean solo FORCE_MIN waves
    // (12-control medians 0.8399 / 0.9305, regress 0, cold_only 0 both)
    "q337"->2.287, "q338"->0.702, "q339"->8.257, "q340"->1.005,
    "q341"->2.121)

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
    // protocol self-description (round-15, after BENCH_r14's silent
    // degradation): per-query run counts + the set of queries whose
    // WANTED re-run was denied by the budget. A degraded artifact must
    // be distinguishable from a regressed one.
    val runCounts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    val coldOnly = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val calibSec = new java.util.concurrent.atomic.AtomicReference[Double](-1.0)
    val order = Registry.all.map(_.name) // stable declaration order
    val printed = new AtomicBoolean(false)
    // The session is stashed so EVERY print path (normal, deadline,
    // worker-death) can silence Spark logging before emitting the JSON
    // lines. BENCH_r15 was lost to exactly this: rc 0, measurement fine,
    // but a FetchFailedException stack trace + BlockManager WARNs printed
    // by executor threads during shutdown displaced the trailer from the
    // driver's bounded 2000-char stdout tail. The trailer guarantee
    // ("the tail always ends with this") only holds if the JSON lines are
    // the process's literal last stdout bytes — so: log OFF, stop the
    // session, THEN print.
    val sparkRef = new java.util.concurrent.atomic.AtomicReference[SparkSession](null)
    def silenceAndPrint(partial: Boolean): Unit = {
      val s = sparkRef.get()
      if (s != null) {
        try s.sparkContext.setLogLevel("OFF") catch { case _: Throwable => () }
        // stop BEFORE printing only on the non-partial path: the partial
        // paths fire while the worker may still be mid-query, and a
        // concurrent stop can throw from under it — there, log-OFF alone
        // guarantees silence and System.exit's shutdown hook stops the
        // context without being able to print.
        if (!partial) { try s.stop() catch { case _: Throwable => () } }
      }
      printLine(partial)
    }
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
      // < "fail". Partial runs emit the fields too (r17): the ratio and
      // median are computed over the SHARED measured subset, so
      // truncation cannot skew them — and a partial artifact without
      // vs_anchor_med/regress was unadjudicable (the driver's r17-class
      // 311-query runs brush the deadline; "partial":true stays the
      // caveat flag).
      val shared = done.filter(k => best.get(k) >= 0 &&
        anchor.contains(k.takeWhile(_ != '_')))
      val anchorSum = shared.map(k => anchor(k.takeWhile(_ != '_'))).sum
      val anchorField =
        if (anchorSum <= 0) ""
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
      // protocol fields (verdict r14 #1c): `passes` = total query
      // executions this run, `cold_only` = queries whose wanted re-run
      // the budget denied. A healthy adaptive run reads cold_only:0;
      // cold_only>0 says "these numbers may be cold artifacts, not
      // regressions" — the r14 blind spot, now self-describing.
      val passes = done.map(k => runCounts.getOrDefault(k, 1)).sum
      val protoField = s""""passes":$passes,"cold_only":${coldOnly.size()},"""
      println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$partialField$anchorField$calibField$protoField"queries":$qs,"sf":"$sfName"}""")
      // SECOND line — compact headline-only summary (~150 bytes), printed
      // AFTER the per-query line. The driver captures a bounded stdout
      // TAIL; at 156 queries the per-query line alone is ~2.1 KB and
      // BENCH_r10.json recorded parsed:null because the tail window cut
      // off the line's FRONT (where the headline fields live). Growing
      // the registry must never blind the perf gate again: this trailer
      // is what the tail always ends with, parseable standalone, and it
      // stays <500 bytes no matter how many queries register.
      println(s"""{"metric":"summary","total_sec":${fmt(total)},"unit":"sec",$partialField$anchorField$calibField$protoField"n_queries":${done.size},"sf":"$sfName"}""")
      System.out.flush()
      // ALSO persist the full per-query map to the repo root (r19 verdict
      // #2): the driver records only a bounded stdout TAIL, which at 300+
      // queries truncates the per-query line's FRONT and blinds the
      // round-over-round PERF table. The file is additive — the stdout
      // contract above is unchanged — and rewritten atomically per run
      // (tmp + rename) so a killed run leaves the previous artifact
      // intact. Full query names (stdout uses compact keys for size; the
      // file has no size bound), plus the protocol self-description.
      try {
        val pq = done.map { k =>
          "\"" + k + "\":{\"sec\":" + fmt(best.get(k)) +
            ",\"runs\":" + runCounts.getOrDefault(k, 1) +
            ",\"cold_only\":" + coldOnly.contains(k) + "}"
        }.mkString("{", ",", "}")
        val body = s"""{"partial":$partial,"total_sec":${fmt(total)},""" +
          s""""calib_sec":${fmt(calibSec.get())},"sf":"$sfName",""" +
          s""""n_queries":${done.size},"queries":$pq}"""
        val tmp = java.nio.file.Paths.get("BENCH_per_query.json.tmp")
        java.nio.file.Files.writeString(tmp, body)
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get("BENCH_per_query.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case _: Throwable => () } // best-effort; never break stdout
    }

    // n max runs per query, report the MIN — single-shot numbers have
    // flagged phantom 2× regressions (GC pause / first-touch page faults
    // landing on one query) two rounds running; min-of-n is the standard
    // noise-robust point estimate for a deterministic workload.
    // malformed env must not kill the run before the JSON line prints —
    // a config typo would otherwise read as a total bench failure.
    // default raised 2 → 3 in round 10: on a co-tenant-noisy host a
    // 30-second CPU burst can span BOTH passes of one query (measured:
    // q13 spiked 4.7× with clean neighbors, twice in one run) and
    // min-of-2 then false-flags `regress`; a third pass makes the min
    // robust to any single burst.
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    // SPARK_GRAFT_BENCH_FORCE_MIN=1 disables the adaptive skip: every
    // query runs the full `iters` times (budget-gated) regardless of its
    // anchor ratio — for ANCHORING waves (control medians must be true
    // minima, not adaptive first-runs) and solo adjudication re-runs.
    // Never set by the driver.
    val forceMin = sys.env.get("SPARK_GRAFT_BENCH_FORCE_MIN")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    // optional targeted subset (comma-separated compact keys, e.g.
    // "q46,q105") for solo regression re-checks — never set by the
    // driver, whose artifact always covers the full registry
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def selected = Registry.all.filter(q =>
      only.forall(_.contains(q.name.takeWhile(_ != '_'))))
    // budget 660 (was 600): the adaptive per-query re-run scheme below
    // spends re-run time only on suspicious queries, so budget exhaustion
    // means ~the whole registry already ran — the remaining cold
    // first-runs comfortably fit in the 780 s deadline's tail
    // r17 re-size: the anchor sum alone is ~493 s at 311 queries, so
    // 660/780 could not fit one clean pass plus re-runs (the first
    // 311-query run read partial at 275 queries). 760/1020 keeps the
    // worst case (deadline + sbt overhead) ~18 min — inside the
    // driver's ~20-min external killer, and the internal deadline
    // still guarantees a parsable partial line if the host is slow.
    // r19: anchor sum grew 537 → 560 s (327 queries; includes the
    // honest q314/q321/q304 re-anchors); 830 keeps first-pass +
    // re-run headroom at the r18 proportion while staying ~190 s
    // inside the 1020 s deadline.
    // r18: anchor sum grew 506 → 537 s (322 queries); 805 keeps the
    // same ~1.5× contention headroom before re-runs get budget-denied
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET")
      .flatMap(_.toDoubleOption).getOrElse(830.0).max(1.0)
    val deadlineSec = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE")
      .flatMap(_.toDoubleOption).getOrElse(1020.0).max(1.0)

    val worker = new Thread(() => {
      // spark.local.dir off /tmp (BENCH_r15 post-mortem): the sandbox's
      // /tmp cleaner reaped blockmgr shuffle files MID-RUN
      // (shuffle_625_9423_0.data "No such file or directory" →
      // FetchFailedException), corrupting the run's tail. A workspace
      // dir is outside any external reaper's remit.
      val localDir = new java.io.File("target/spark-local").getAbsolutePath
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", localDir)
        .getOrCreate()
      sparkRef.set(spark)
      spark.sparkContext.setLogLevel("WARN")

      // warm-up: JIT, codegen, parquet reader paths (not billed to queries)
      spark.range(1000000).selectExpr("sum(id)").collect()
      // FULL scan of every base table, all columns (same shape as the
      // Tables.fingerprint scan): pre-pays OS page cache + vectorized
      // reader codegen so the first query touching each table isn't
      // billed the cold read of the whole file (verdict r14 #1a). The
      // per-query one-time costs this can't reach (derived fixture dirs,
      // driver fits, memoKey-specific fingerprint scans) are absorbed by
      // the consecutive per-query re-run below instead.
      Tables.names.foreach { n =>
        import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
        val df = Tables.load(spark, sfDir, n)
        df.agg(bit_xor(xxhash64(df.columns.map(col).toIndexedSeq: _*))).collect()
      }
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

      // CONSECUTIVE PER-QUERY adaptive min (round-15 protocol, replacing
      // whole-registry passes): BENCH_r14 proved the old degradation mode
      // blind — at 234 queries, pass 1 alone ate the budget and the
      // artifact silently became a cold single-shot vs warm min-of-3
      // anchors (vs_anchor 1.872 "warn", 27 false regress flags; judge
      // solo re-run read 1.005 "ok", regress 0). Re-runs now happen
      // back-to-back per query, so a query's one-time cold costs
      // (derived-fixture builds, driver fits, first-execution codegen)
      // are absorbed by its OWN immediate warm re-run, not deferred to a
      // second registry pass that never comes. Adaptive: a first run at
      // or below 1.25× its anchor cannot flag `regress` (threshold
      // 1.5×med) and a min can only move DOWN, so re-running it buys
      // nothing — the re-run budget goes entirely to suspicious reads
      // (cold artifact or true regression; the warm re-run tells them
      // apart) and to unanchored queries (whose minima become the next
      // round's anchors). First runs always execute — coverage never
      // shrinks; only re-runs are budget-gated.
      selected.foreach { q =>
        val key = q.name.takeWhile(_ != '_')
        val t1 = runOnce(q.fn)
        best.put(q.name, t1)
        runCounts.put(q.name, 1)
        def minNow = best.get(q.name)
        def suspicious: Boolean = forceMin || (minNow match {
          case t if t < 0 => true // transient failure: one retry
          case t => anchor.get(key) match {
            case Some(a) => t > 1.25 * a
            case None    => runCounts.get(q.name) < 2 // unanchored: min-of-2
          }
        })
        var budgetHit = false
        while (!budgetHit && runCounts.get(q.name) < iters && suspicious) {
          if (elapsed >= budgetSec) {
            // wanted a re-run, budget said no — the query stays a cold
            // single-shot and the artifact must SAY so (cold_only)
            coldOnly.add(q.name); budgetHit = true
          } else {
            val t = runOnce(q.fn)
            if (t >= 0 && (minNow < 0 || t < minNow)) best.put(q.name, t)
            runCounts.put(q.name, runCounts.get(q.name) + 1)
          }
        }
      }
      // log OFF + stop BEFORE printing (inside silenceAndPrint): the two
      // JSON lines must be the process's literal last stdout bytes.
      silenceAndPrint(partial = false)
    }, "bench-worker")
    worker.setDaemon(true)
    worker.start()
    worker.join((deadlineSec * 1000).toLong)
    if (worker.isAlive) {
      // deadline hit mid-measurement: emit what we have and exit cleanly —
      // a partial artifact beats a killed run with no line at all
      silenceAndPrint(partial = true)
      System.exit(0)
    } else if (!printed.get) {
      // the worker DIED (session build, warm-up, fixture) before printing
      // — emit the partial line so the tail stays parseable, but exit
      // nonzero: an environment failure must stay loud, not read as a
      // clean run with a silently missing artifact
      silenceAndPrint(partial = true)
      System.exit(1)
    }
  }
}
