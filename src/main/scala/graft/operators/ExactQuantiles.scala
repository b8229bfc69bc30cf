package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT integer percentiles over a distinct-value census — the index
  * data cards' shared machinery ([[Bm25.indexCard]],
  * [[ProductQuantization.annIndexCard]]). Values collapse to
  * DISTINCT-value counts first, so the only ordering in the plan is
  * over |distinct values| rows however large the input, and the
  * percentile threshold is the exact integer ceil(n·pct/100) —
  * `(n·pct + 99) DIV 100` — never a double product that can round
  * across an integer boundary (the r17 advice both cards must agree
  * on; one shared implementation keeps them agreeing). */
object ExactQuantiles {

  /** Build a percentile probe over `values`' LONG column `valueCol`:
    * the returned function maps pct ∈ (0, 100] to a one-row frame
    * holding the smallest value whose cumulative count reaches
    * ceil(n·pct/100). The cumulative census persists once (tracked via
    * [[OperatorCaches]]) and every pct probes it with a broadcast
    * one-row total. */
  def probe(values: DataFrame, valueCol: String): Int => DataFrame = {
    val dc = values.groupBy(col(valueCol)).agg(count(lit(1)).as("_c"))
    val wCum = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = OperatorCaches.track(
      dc.withColumn("_cum", sum(col("_c")).over(wCum)).persist())
    val n = values.agg(count(lit(1)).as("_n"))
    pct => cum.crossJoin(broadcast(n))
      .filter(col("_cum") >= expr(s"(_n * $pct + 99) DIV 100"))
      .orderBy(col(valueCol)).limit(1).select(col(valueCol))
  }
}
