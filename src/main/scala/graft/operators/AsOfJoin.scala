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
    // Right values travel wrapped in a single-field struct: the struct is
    // non-null even when the value is genuinely NULL, so the running
    // `last(ignoreNulls)` skips ONLY left-row placeholders — a matching
    // right row whose value column is NULL correctly attaches NULL instead
    // of falling through to an older right row.
    val lTagged = valueCols.foldLeft(left.withColumn("_side", lit(1))) {
      (df, v) => df.withColumn(s"_asof_$v", lit(null).cast(
        new org.apache.spark.sql.types.StructType()
          .add("w", right.schema(v).dataType)))
    }
    // right side carries partition keys + ts + wrapped values, nulls elsewhere
    val rTagged = leftCols.filterNot(partitionCols.contains(_))
      .filterNot(_ == tsCol)
      .foldLeft(right.select((partitionCols :+ tsCol).map(col) ++
        valueCols.map(v => struct(col(v).as("w")).as(s"_asof_$v")): _*)
        .withColumn("_side", lit(0))) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val unioned = lTagged.unionByName(rTagged)
    // right rows order BEFORE left rows at equal ts → `<=` semantics; among
    // right rows sharing (keys, ts) the wrapped value structs are a
    // deterministic tiebreak (the max struct wins), so the attached value
    // no longer depends on partition/sort luck.
    val tiebreak = valueCols.map(v => col(s"_asof_$v").asc)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(Seq(col(tsCol).asc, col("_side").asc) ++ tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(s"_asof_$v",
        last(col(s"_asof_$v"), ignoreNulls = true).over(w))
    }
    attached.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"_asof_$v").getField("w").as(s"asof_$v")): _*)
  }
}
