package graft.operators

/** Deterministic driver-local Lloyd's k-means over a collected sample.
  *
  * Why not MLlib KMeans: each MLlib fit is maxIter driver-iterative Spark
  * jobs. PQ trains m=8 codebooks and IVF one coarse quantizer — at 5
  * iterations that was ~45 scheduled jobs per index build, and job-
  * scheduling latency (not compute) dominated q42/q46 bench time. The
  * training sample is hash-capped at ~100k vectors (≤ ~25 MB at dim 64)
  * regardless of corpus size, so fitting it ON THE DRIVER is O(sample),
  * not O(corpus) — the 100 TB story is unchanged: one distributed pass to
  * sample, a local fit, then broadcast centroids for the one distributed
  * assignment/encode pass.
  *
  * Determinism: callers sort the collected sample by id before passing
  * (collect() order varies with partitioning); seeding is sorted-Forgy
  * (first k points), so (data, k) → centroids is a pure function with no
  * RNG at all — which is also what lets the q42/q46 oracles replay the
  * fit in SQL.
  */
object LocalKMeans {

  /** Sorted-Forgy fit, the ORACLE-GATED path (IVF + PQ): no RNG — the
    * first `k` points of the (caller-sorted) sample seed the centroids,
    * and everything stays in double precision so the DuckDB oracle can
    * replay the exact arithmetic (ascending-fold distances, members
    * summed in sorted order, mean = sum/count, empty cluster keeps its
    * centroid, ties to the lowest index). Early exit is parity-safe: a
    * converged round is a no-op, so an oracle unrolling maxIter fixed
    * stages lands on the same fixed point. */
  def fitSortedForgy(points: Array[Array[Float]], k: Int,
      maxIter: Int = 10): Array[Array[Double]] = {
    require(points.nonEmpty, "LocalKMeans.fitSortedForgy: no points")
    val n = points.length
    val dim = points(0).length
    val kk = math.min(k, n)
    val centroids = Array.tabulate(kk) { c =>
      Array.tabulate(dim)(i => points(c)(i).toDouble)
    }
    val assign = Array.fill(n)(-1)
    val sums = Array.ofDim[Double](kk, dim)
    val counts = new Array[Long](kk)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      java.util.Arrays.fill(counts, 0L)
      var ci = 0
      while (ci < kk) { java.util.Arrays.fill(sums(ci), 0.0); ci += 1 }
      var j = 0
      while (j < n) {
        val p = points(j)
        val best = nearestDouble(p, centroids)
        if (assign(j) != best) { assign(j) = best; changed = true }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        j += 1
      }
      ci = 0
      while (ci < kk) {
        if (counts(ci) > 0) {
          var i = 0
          while (i < dim) { centroids(ci)(i) = sums(ci)(i) / counts(ci); i += 1 }
        }
        ci += 1
      }
      iter += 1
    }
    centroids
  }

  /** [[fitSortedForgy]] over DOUBLE-precision points — the residual-PQ
    * training path: residuals are v − centroid, already double, and a
    * float round-trip would break the oracle's exact replay. Same
    * algorithm, seeding, tie rules, and fold order. */
  def fitSortedForgyD(points: Array[Array[Double]], k: Int,
      maxIter: Int = 10): Array[Array[Double]] = {
    require(points.nonEmpty, "LocalKMeans.fitSortedForgyD: no points")
    val n = points.length
    val dim = points(0).length
    val kk = math.min(k, n)
    val centroids = Array.tabulate(kk)(c => points(c).clone())
    val assign = Array.fill(n)(-1)
    val sums = Array.ofDim[Double](kk, dim)
    val counts = new Array[Long](kk)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      java.util.Arrays.fill(counts, 0L)
      var ci = 0
      while (ci < kk) { java.util.Arrays.fill(sums(ci), 0.0); ci += 1 }
      var j = 0
      while (j < n) {
        val p = points(j)
        val best = nearestD(p, centroids)
        if (assign(j) != best) { assign(j) = best; changed = true }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        j += 1
      }
      ci = 0
      while (ci < kk) {
        if (counts(ci) > 0) {
          var i = 0
          while (i < dim) { centroids(ci)(i) = sums(ci)(i) / counts(ci); i += 1 }
        }
        ci += 1
      }
      iter += 1
    }
    centroids
  }

  /** [[nearestDouble]] for double-precision points (residual encode). */
  def nearestD(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cb = centroids(c)
      var d = 0.0; var i = 0
      while (i < cb.length) { val t = v(i) - cb(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Dominant vector length in a sample: the fit dimension is decided by
    * MAJORITY, not by whichever row sorts first — one truncated row with
    * the lowest id must not flip `dim` and silently disqualify every
    * well-formed vector from the fit (ties break to the larger length,
    * deterministically). */
  def dominantDim(sample: Array[Array[Float]]): Int = {
    require(sample.nonEmpty, "dominantDim: empty sample")
    sample.map(_.length).groupBy(identity)
      .maxBy { case (len, g) => (g.length, len) }._1
  }

  /** Double-precision nearest-centroid kernel (pairs with
    * [[fitSortedForgy]]: `float − double` promotes exactly, matching the
    * oracle's CAST arithmetic; strict < breaks ties to the lowest
    * index). */
  def nearestDouble(v: Seq[Float], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cb = centroids(c)
      var d = 0.0; var i = 0
      while (i < cb.length) { val t = v(i) - cb(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

}
