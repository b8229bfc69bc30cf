package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the first query anyone runs against
  * an unfamiliar table: per column, row count, null count, exact
  * distinct count, min and max. ONE scan: all per-column aggregates run
  * in a single `agg` (Spark plans the multi-column distinct counts via
  * Expand — one pass over the data, expanded rows per distinct-column,
  * map-side partial everywhere), then the single stats row is unpivoted
  * driver-side into one row per column.
  *
  * min/max are computed in the column's NATIVE type and stringified
  * afterwards — numeric order, not lexicographic ("9" < "10" holds).
  * Callers choose the columns; exact-distinct on a high-cardinality
  * column is an expanded shuffle by design (use the KMV sketch family
  * for the approximate form). */
object Profiling {

  final case class ColumnProfile(col_name: String, n_rows: Long,
      n_nulls: Long, n_distinct: Long, min_s: String, max_s: String)

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: columns.flatMap(c => Seq(
      count(col(c)).as(s"_cnt_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0) // one stats row
    val n = row.getAs[Long]("_n")
    columns.map { c =>
      ColumnProfile(c, n,
        n - row.getAs[Long](s"_cnt_$c"),
        row.getAs[Long](s"_nd_$c"),
        row.getAs[String](s"_min_$c"),
        row.getAs[String](s"_max_$c"))
    }.toDF()
  }
}
