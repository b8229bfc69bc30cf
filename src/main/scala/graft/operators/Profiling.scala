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

  final case class ColumnHistProfile(col_name: String, n_rows: Long,
    n_nulls: Long, n_distinct: Long, min_s: String, max_s: String,
    bucket: Int, lo: Double, hi: Double)

  /** CBO-grade profile: [[profile]]'s per-column stats PLUS per-column
    * equi-depth histogram bounds, still in ONE scan — every column's
    * profile aggregates AND its bottom-k row sample (the q107
    * hash-sample kernel: deterministic, no RNG, SQL-replayable) run in
    * the SAME `agg`. Driver-side, each column's sorted sample yields B
    * nearest-rank bucket bounds: bucket i spans
    * [s(⌊i/B·(n−1)⌋), s(⌊(i+1)/B·(n−1)⌋)] — equal sample mass per
    * bucket, the histogram a cost-based optimizer wants.
    *
    * Output is denormalized: B rows per column, each carrying the
    * column's full profile stats plus (bucket, lo, hi).
    *
    * Null discipline: rows with a null `idCol` are excluded globally
    * (the id is the sample key); a null/NaN VALUE in one column is
    * excluded from THAT column's sample only — it rides in as a
    * (Long.MaxValue, NaN) sentinel that any real row's mix64 hash
    * evicts, and at most one survives an under-full sample, stripped
    * before the bounds are cut. The profile side still counts the
    * nulls. Collision assumption: a real row whose mix64(id) happens
    * to equal Long.MaxValue ties with the sentinel and may be dropped
    * from that column's SAMPLE (never from the exact profile stats) —
    * probability 2⁻⁶⁴ per row, and the histogram is an approximation
    * by construction, so this is accepted rather than guarded. */
  def profileWithHistogram(df: DataFrame, columns: Seq[String],
      idCol: String, buckets: Int = 8, k: Int = 256): DataFrame = {
    require(columns.nonEmpty, "profileWithHistogram needs columns")
    require(buckets >= 1 && k >= buckets,
      s"need k >= buckets for distinct bounds: k=$k buckets=$buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(idCol).isNotNull)
    val h = Sketches.hashInput(df, idCol)
    val profAggs: Seq[Column] = count(lit(1)).as("_n") +: columns.flatMap(c => Seq(
      count(col(c)).as(s"_cnt_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    val histAggs: Seq[Column] = columns.map { c =>
      val v = col(c).cast("double")
      val ok = v.isNotNull && !isnan(v)
      graft.plans.BottomKAggregator.bottom_k_sample(k)(
        when(ok, h).otherwise(lit(Long.MaxValue)),
        when(ok, v).otherwise(lit(Double.NaN))).as(s"_samp_$c")
    }
    val all = profAggs ++ histAggs
    val row = base.agg(all.head, all.tail: _*).collect()(0) // one stats row
    val n = row.getAs[Long]("_n")
    columns.flatMap { c =>
      val sample = row.getAs[Seq[Double]](s"_samp_$c")
        .filterNot(_.isNaN).sorted.toIndexedSeq
      val m = sample.size
      val prof = (n, n - row.getAs[Long](s"_cnt_$c"),
        row.getAs[Long](s"_nd_$c"), row.getAs[String](s"_min_$c"),
        row.getAs[String](s"_max_$c"))
      if (m == 0) Seq.empty // all-null column: stats row only via profile()
      else (0 until buckets).map { b =>
        def at(q: Double): Double = sample(math.floor(q * (m - 1)).toInt)
        ColumnHistProfile(c, prof._1, prof._2, prof._3, prof._4, prof._5,
          b, at(b.toDouble / buckets), at((b + 1).toDouble / buckets))
      }
    }.toDF()
  }
}
