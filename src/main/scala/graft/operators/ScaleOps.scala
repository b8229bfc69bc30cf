package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives: bucketed co-located joins and skew mitigation.
  *
  * These are the knobs a 100 TB deployment turns when the default
  * shuffle-on-key plans hit their limits: bucketing removes the join
  * shuffle entirely for repeatedly-joined tables; salting bounds the
  * largest task when a key is pathologically hot.
  */
object ScaleOps {

  /** Writes `df` as a bucketed+sorted managed table. Joins between two
    * tables bucketed the same way on the join key need NO exchange and
    * NO sort — verified by PlanSpec (zero ShuffleExchange in the plan). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, saltFactor); the right side is replicated
    * once per salt value, so every (key, salt) pair finds its match. The
    * hot key's rows spread across saltFactor tasks instead of one.
    *
    * Result == left.join(right, keys) exactly (checked in ScaleSpec).
    * AQE's skew-join handles moderate skew automatically; explicit
    * salting is for the pathological single-key case where even one
    * key's rows exceed a task's budget. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    // any deterministic spread works — hash all left columns
    val salted = left.withColumn("_salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), final on key. Supports the decomposable
    * aggregates (sum/count/min/max). Map-side partial aggregation already
    * does this for hash aggs; the explicit form also bounds the SHUFFLE
    * fan-in per key when one group dominates. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(valueCol)), lit(saltFactor)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("count"))
  }
}
