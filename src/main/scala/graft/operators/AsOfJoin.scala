package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (SURVEY §2.6 /
  * spark_guide "custom operator" family).
  *
  * For every left row, attach the value columns of the LATEST right row
  * with `right.ts <= left.ts` within the same partition keys (left-join
  * semantics: unmatched left rows keep nulls).
  *
  * Implementation is the union + running-last trick, not a join at all:
  * tag both sides, union, window `last(value, ignoreNulls)` ordered by
  * (ts, side) with right rows sorting FIRST at equal ts (≤ semantics),
  * keep left rows. One shuffle on the partition keys + one sort — the
  * same cost as a sort-merge join, but no O(matches) pair blow-up and no
  * range-duplicate handling. Scales as sum of per-key group sizes.
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    // left side carries its own columns + nulls for the value columns
    val lTagged = valueCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, v) => df.withColumn(s"_asof_$v", lit(null).cast(
        right.schema(v).dataType))
    }
    // right side carries partition keys + ts + values, nulls elsewhere
    val rTagged = leftCols.filterNot(partitionCols.contains(_))
      .filterNot(_ == tsCol)
      .foldLeft(right.select((partitionCols :+ tsCol).map(col) ++
        valueCols.map(v => col(v).as(s"_asof_$v")): _*)
        .withColumn("_side", lit(0))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val unioned = lTagged.unionByName(rTagged)
    // right rows order BEFORE left rows at equal ts → `<=` semantics
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(s"_asof_$v",
        last(col(s"_asof_$v"), ignoreNulls = true).over(w))
    }
    attached.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"_asof_$v").as(s"asof_$v")): _*)
  }
}
