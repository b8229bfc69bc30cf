package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability (reference A4: ~19 Prometheus counters pushed to
  * a gateway, MetricsConfiguration.kt:20-93).
  *
  * Spark-first shape: `Dataset.observe` nodes ride inside the executed
  * plan (exact, no extra pass, aggregated map-side) and a
  * QueryExecutionListener collects them per action. A Prometheus bridge
  * would subscribe to the same collector; the engine itself stays
  * push-gateway-agnostic (K6 is out of engine scope per SURVEY §2.5).
  */
object PipelineMetrics {

  final class Collector extends QueryExecutionListener {
    private val store = TrieMap.empty[String, Map[String, Long]]

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        val m = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
          f -> (row.get(i) match {
            case l: Long => l
            case i2: Int => i2.toLong
            case null => 0L
            case other => other.toString.toLong
          })
        }.toMap
        store.put(name, m)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def get(observation: String): Option[Map[String, Long]] = store.get(observation)

    /** Listener delivery is async; poll briefly. */
    def await(observation: String, timeoutMs: Long = 10000): Map[String, Long] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < deadline) {
        store.get(observation) match {
          case Some(m) => return m
          case None => Thread.sleep(50)
        }
      }
      sys.error(s"observation '$observation' not delivered within ${timeoutMs}ms")
    }

    def snapshot: Map[String, Map[String, Long]] = store.toMap
  }

  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  /** Scan-side counters (files seen / valid / quarantined / blocked).
    * files_rejected mirrors SnapshotPipeline.quarantine's rule (bad
    * grammar OR missing encryption metadata). */
  def observeScan(df: DataFrame, blocked: Seq[String]): DataFrame =
    df.observe("graft_scan",
      count(lit(1)).as("files_scanned"),
      sum(when(col("database") === "" || col("iv").isNull ||
        col("dataKeyEncryptionKeyId").isNull || col("cipherTextDataKey").isNull,
        1L).otherwise(0L)).as("files_rejected"),
      sum(when(col("topic").isin(blocked: _*), 1L).otherwise(0L))
        .as("files_blocked"),
      sum(col("length")).as("bytes_scanned"))

  /** Delivery-side counters (files posted + payload bytes — the
    * reference's filesSent / bytes counters). */
  def observeDelivery(df: DataFrame): DataFrame =
    df.observe("graft_delivery",
      count(lit(1)).as("files_delivered"),
      sum(length(col("content"))).as("bytes_delivered"),
      approx_count_distinct(col("topic")).as("topics_seen"))
}
