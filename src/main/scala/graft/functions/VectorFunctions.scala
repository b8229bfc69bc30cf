package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels: higher-order Column expressions for the
  * oracle-parity forms (dot/norm/cosine) plus fused JVM kernels (dotFast/
  * normFast/srpSignature) for the hot paths — identical numerics (no
  * MLlib Vector boxing): dot/norm/cosine over ARRAY<FLOAT|DOUBLE>.
  *
  * Floats are cast to double *before* any arithmetic — float multiply then
  * double add gives different last-ulp results than double multiply, and
  * the DuckDB oracle computes in double.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (compute norms once per row, not once
    * per pair — the pair join is the hot path). */
  def cosinePre(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Signed-random-projection bit signature: bit p = sign(v · r_p) where
    * r_p is a deterministic Rademacher (±1) vector derived from
    * mix64(seed, plane, dim). Returns an INT bitmask (planes ≤ 31).
    *
    * Rademacher entries make the projection a valid SRP family. One JVM
    * pass per row — the equivalent higher-order-expression form costs
    * interpreted-lambda evals per (dim × plane) and measured ~1.7 s /
    * 4k vectors.
    */
  /** Memoized Rademacher sign tables (r20, guide §1.2 per-task work):
    * sign(p, i) = ±1.0 from mix64(seed ^ mix64(p<<32|i)) is a CONSTANT of
    * (seed, planes, dim) — the kernels were recomputing two mix64 calls
    * per (plane × dim) per ROW (1024 hashes per 64-dim row per
    * evaluation). Tables grow to the max dim seen; `acc += v * (±1.0)`
    * is IEEE-exact negation, so accumulation order and every partial sum
    * are bit-identical to the branch form (oracles unchanged). The cache
    * is a pure function of constants, never of data — not result
    * caching. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Array[Array[Double]]]()
  private def signTable(seed: Long, planes: Int,
      dims: Int): Array[Array[Double]] = {
    val key = (seed, planes)
    var t = signCache.get(key)
    if (t == null || t(0).length < dims) {
      val n = math.max(dims, 64)
      t = Array.tabulate(planes, n)((p, i) =>
        if ((mix64(seed ^ mix64(p.toLong << 32 | i.toLong)) & 1L) == 0L) 1.0
        else -1.0)
      signCache.put(key, t)
    }
    t
  }

  def srpSignatureKernel(v: Seq[Float], planes: Int, seed: Long): Int = {
    val signs = signTable(seed, planes, v.length)
    var sig = 0
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        acc += v(i).toDouble * sp(i)
        i += 1
      }
      if (acc >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** [[srpSignatureKernel]] over DOUBLE vectors — for callers whose
    * vectors are already double-constructed (probe fixtures, q231-style
    * surgery). Same accumulation numerics: ±v(i) summed sequentially,
    * so the SQL replay (`list_dot_product(v, sv)` with ±1.0 sign rows
    * over DOUBLE[]) is bit-identical. */
  def srpSignatureKernelD(v: Seq[Double], planes: Int, seed: Long): Int = {
    val signs = signTable(seed, planes, v.length)
    var sig = 0
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        acc += v(i) * sp(i)
        i += 1
      }
      if (acc >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Column form of [[srpSignatureKernelD]]. */
  def srpSignatureD(v: Column, planes: Int, seed: Long): Column = {
    val f = udf((x: Seq[Double]) =>
      if (x == null) None else Some(srpSignatureKernelD(x, planes, seed)))
    f(v)
  }

  /** Multi-probe SRP bucket set: the base (band, bucket) pairs of the
    * signature PLUS, for each of the `nProbes` planes with the smallest
    * projection magnitude |v·r_p| (ties to the lower plane), the bucket
    * obtained by flipping that plane's bit in its own band — the
    * standard multi-probe LSH trick (query MORE buckets instead of
    * storing more tables): a near-zero projection means the true
    * neighbor sits on the other side of that hyperplane with
    * probability ≈ 1/2, so the single-bit-flip buckets are exactly the
    * highest-yield extra probes. Flipped buckets are always distinct
    * from their band's base (the flipped bit differs), so the result
    * has nBands + nProbes entries. The margin ordering is
    * oracle-replayable: accumulation order matches list_dot_product
    * over the ±1 sign rows bit-for-bit (the q40/q41-proven kernel). */
  def multiProbeBucketsKernel(v: Seq[Float], planes: Int, bandBits: Int,
      seed: Long, nProbes: Int): Array[(Int, Int)] = {
    val signs = signTable(seed, planes, v.length)
    val accs = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        acc += v(i).toDouble * sp(i)
        i += 1
      }
      accs(p) = acc
      p += 1
    }
    var sig = 0
    p = 0
    while (p < planes) { if (accs(p) >= 0) sig |= (1 << p); p += 1 }
    val mask = (1 << bandBits) - 1
    val nBands = planes / bandBits
    val out = Array.newBuilder[(Int, Int)]
    var b = 0
    while (b < nBands) {
      out += ((b, (sig >>> (b * bandBits)) & mask)); b += 1
    }
    (0 until planes).sortBy(q => (math.abs(accs(q)), q)).take(nProbes)
      .foreach { q =>
        val band = q / bandBits
        out += ((band, ((sig ^ (1 << q)) >>> (band * bandBits)) & mask))
      }
    out.result()
  }

  private[graft] def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val srpUdf = udf((v: Seq[Float], p: Int, s: Long) =>
    srpSignatureKernel(v, p, s))

  def srpSignature(v: Column, planes: Int, seed: Long): Column = {
    require(planes <= 31, "signature packed into an INT")
    srpUdf(v, lit(planes), lit(seed))
  }

  /** Pair-scoring dot product as one JVM pass — the hot-path form used by
    * ALL the similarity operators (including the oracle-checked brute
    * force: inputs are cast to ARRAY<DOUBLE> first, so float inputs see
    * exactly the expression form's numerics — double-cast then sequential
    * double accumulation — proven by the DuckDB oracle staying bit-exact).
    *
    * Null columns and mismatched lengths yield null (sorts last under the
    * desc sim ordering, like the expression form); null *elements* are
    * out of contract. */
  def dotKernel(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    if (a == null || b == null || a.length != b.length) return None
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    Some(acc)
  }

  private val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => dotKernel(a, b))

  def dotFast(a: Column, b: Column): Column =
    dotUdf(a.cast("array<double>"), b.cast("array<double>"))

  /** Fused-kernel norm (companion of [[norm]]). */
  def normFast(v: Column): Column = sqrt(dotFast(v, v))
}
