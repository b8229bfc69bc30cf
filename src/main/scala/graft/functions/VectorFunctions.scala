package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels as higher-order Column expressions (no UDF, no
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
    * mix(seed, p, dim index). Returns an INT bitmask column (planes ≤ 31).
    *
    * Rademacher entries make the projection a valid SRP family and keep it
    * expressible with higher-order functions: v·r = Σ ±v_i.
    */
  def srpSignature(v: Column, planes: Int, seed: Long): Column = {
    require(planes <= 31, "signature packed into an INT")
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(toDouble(v), sequence(lit(0), size(v) - 1), (x, i) => {
          // deterministic ±1 from (seed, plane, dim)
          val h = hash(lit(seed), lit(p), i)
          when(pmod(h, lit(2)) === 0, x).otherwise(-x)
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
