package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout primitives — the write-side half of scan performance at
  * 100 TB: what column you CLUSTER files by decides which min/max file
  * statistics can prune later reads. Z-ordering (Delta/Iceberg
  * `ZORDER BY`) sorts by an interleaved-bit code so rows close in ANY of
  * the interleaved dimensions land in the same files, giving multi-
  * dimensional pruning from one sort key.
  *
  * [[morton2]] is deliberately PURE Column arithmetic — shifts, masks
  * and ORs never overflow, so ANSI mode is safe and the whole expression
  * stays inside whole-stage codegen (asserted in spec); no udf in a
  * write path that touches every row of a 100 TB table. The bit
  * arithmetic is exactly replayable in SQL, so the q124 oracle rebuilds
  * the codes in DuckDB.
  */
object Layout {
  /** Morton (Z-order) interleave of the low `bits` bits of two
    * NONNEGATIVE integral columns: bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Values wider than `bits` bits alias into the
    * same code range (high bits are masked off) — callers choose `bits`
    * to cover their domain. */
  def morton2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The write-side half of the operator: cluster a frame by a layout
    * code so min/max file statistics can prune later multi-dimensional
    * reads. Range-partition into `numSplits` output splits by `code`
    * (each split owns a contiguous code range — at 100 TB this is the
    * one full shuffle a re-layout costs, and it is the point of the
    * job) and sort rows by the code within each split, so every output
    * file AND every row group inside it covers a narrow code range —
    * by the locality property (LayoutSpec), a narrow range in BOTH
    * interleaved dimensions. The code column is dropped before the
    * write: it is derivable, and the pruning works off the stats of the
    * ORIGINAL columns.
    *
    * Callers write the result with `.write.parquet(...)`; reads then
    * prune row groups via pushed-down min/max checks with no layout
    * awareness at all (proven end-to-end in LayoutSpec and gated as
    * q130). */
  def clusterBy(df: DataFrame, code: Column, numSplits: Int): DataFrame = {
    require(numSplits >= 1, s"numSplits must be >= 1, got $numSplits")
    df.withColumn("_layout_code", code)
      .repartitionByRange(numSplits, col("_layout_code"))
      .sortWithinPartitions("_layout_code")
      .drop("_layout_code")
  }
}
