package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.SnapshotPipeline.DeliveryConf
import graft.sources.Retry

/** K5 publish seam (reference SnsServiceImpl.kt:25-51): how the one
  * monitoring message per completed run leaves the engine. Driver-side —
  * the completion rollup is a single row. */
trait SnsPublisher extends Serializable {
  /** @return published message id */
  def publish(topicArn: String, payload: String): String
}

/** Local stand-in for the SNS publish (no AWS endpoint in this
  * environment): each publish lands as one JSON file under `dir`, so a
  * harness can observe exactly-once behavior the way mock-sns would. */
final case class LocalFsSnsPublisher(dir: String) extends SnsPublisher {
  override def publish(topicArn: String, payload: String): String = {
    val id = java.util.UUID.randomUUID().toString
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, s"$id.json"),
      s"""{"topicArn":"$topicArn","messageId":"$id","payload":$payload}"""
        .getBytes(StandardCharsets.UTF_8))
    id
  }
}

/** K6 metrics-push seam (reference PushGatewayServiceImpl.kt:23-44). */
trait MetricsPusher extends Serializable {
  def push(job: String, groupingKey: Map[String, String],
      metrics: Map[String, Long]): Unit
  def delete(job: String, groupingKey: Map[String, String]): Unit
}

/** Real Prometheus Pushgateway wire: PUT the text exposition format to
  * `<base>/metrics/job/<job>/<k>/<v>...`, DELETE to the same URL — the
  * protocol io.prometheus.client.exporter.PushGateway speaks
  * (PushGatewayServiceImpl.kt:25,44). Zero-dependency java.net.http
  * client; non-2xx retried with backoff like every other wire here. */
final case class HttpPushGatewayPusher(baseUrl: String, maxAttempts: Int = 5,
    initialDelayMs: Long = 1000) extends MetricsPusher {

  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def url(job: String, groupingKey: Map[String, String]): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    (Seq(baseUrl.stripSuffix("/"), "metrics", "job", enc(job)) ++
      groupingKey.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(enc(k), enc(v)) }).mkString("/")
  }

  private def send(method: String, u: String, body: String): Unit =
    Retry.withBackoff(attempts = maxAttempts, initialDelayMs = initialDelayMs) {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(u))
      val req = (method match {
        case "PUT" => b.header("Content-Type", "text/plain; version=0.0.4")
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        case _ => b.DELETE()
      }).build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"pushgateway $method $u returned ${resp.statusCode()}")
    }

  override def push(job: String, groupingKey: Map[String, String],
      metrics: Map[String, Long]): Unit = {
    // Prometheus metric names: [a-zA-Z_:][a-zA-Z0-9_:]*
    def sane(n: String) = n.map(c =>
      if (c.isLetterOrDigit || c == '_' || c == ':') c else '_')
    val body = metrics.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${sane(k)} $v"
    }.mkString("", "\n", "\n")
    send("PUT", url(job, groupingKey), body)
  }

  override def delete(job: String, groupingKey: Map[String, String]): Unit =
    send("DELETE", url(job, groupingKey), "")
}

/** File-backed pusher for harness observation: one file per (job,
  * groupingKey), `name value` lines; delete removes it. */
final case class LocalFsMetricsPusher(dir: String) extends MetricsPusher {
  private def path(job: String, groupingKey: Map[String, String]) =
    Paths.get(dir, (job +: groupingKey.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }).mkString("_"))

  override def push(job: String, groupingKey: Map[String, String],
      metrics: Map[String, Long]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(path(job, groupingKey),
      metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k $v" }
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  override def delete(job: String, groupingKey: Map[String, String]): Unit =
    Files.deleteIfExists(path(job, groupingKey))
}

/** Monitoring wiring for a run (MonitoringConf) + the after-run block
  * (reference JobCompletionNotificationListener.kt:31-75). */
final case class MonitoringConf(
    sns: SnsPublisher,
    topicArn: String,
    pusher: Option[MetricsPusher] = None,
    metrics: Option[PipelineMetrics.Collector] = None,
    pushJob: String = "snapshot_sender",
    instanceName: String = "graft",
    /** reference `metrics.delete` flag: delete the grouping key from the
      * gateway after the final push (minus the scrape-interval sleep — a
      * batch engine shouldn't block the driver on a scrape schedule). */
    deleteOnFinal: Boolean = false,
    snsMaxAttempts: Int = 5,
    snsInitialDelayMs: Long = 1000,
    /** wire-level run counters; when present the final push carries the
      * reference's full Counter/Gauge inventory name for name
      * (PipelineMetrics.referenceInventory). */
    counters: Option[PipelineMetrics.RunCounters] = None)

object Monitoring {

  /** The reference's afterJob sequence, reshaped for a completed Spark
    * run: (1) publish the monitoring message — skipped for NIFI_HEARTBEAT
    * runs, blank ARNs, and NOT_COMPLETED rollups
    * (JobCompletionNotificationListener.kt:60-75, SnsServiceImpl.kt:29-38;
    * both COMPLETED_SUCCESSFULLY and COMPLETED_UNSUCCESSFULLY publish) —
    * with SNS-style backoff retry; then (2) push the final metrics
    * snapshot to the gateway under (type, instance, correlation_id)
    * grouping, optionally deleting the group afterwards
    * (PushGatewayServiceImpl.kt:29-44).
    *
    * @param completion single-row rollup from Delivery.runCompletion
    * @param statuses per-collection status frame (tiny, cached by the
    *   caller) — feeds the completed/failed-collection counters of the
    *   reference inventory; pass an empty frame to skip those
    * @return the published message id, if a message was sent */
  def afterRun(m: MonitoringConf, conf: DeliveryConf,
      completion: DataFrame, statuses: Option[DataFrame] = None): Option[String] = {
    val status = completion.select("completionStatus").head().getString(0)
    val sent =
      if (!Delivery.shouldSendMonitoring(conf.exportDate, m.topicArn)) None
      else if (status == "NOT_COMPLETED") None
      else {
        val payload = Delivery
          .monitoringPayload(completion, conf.exportDate, conf.snapshotType)
          .head().getString(0)
        Some(Retry.withBackoff(attempts = m.snsMaxAttempts,
          initialDelayMs = m.snsInitialDelayMs) {
          m.sns.publish(m.topicArn, payload)
        })
      }
    sent.foreach(_ =>
      m.counters.foreach(_.monitoringMessagesSent.incrementAndGet()))
    m.pusher.foreach { p =>
      val obs = m.metrics.map(_.snapshot).getOrElse(Map.empty)
      val flat = obs.flatMap { case (o, fields) =>
        fields.map { case (f, v) => s"${o}_$f" -> v }
      }
      val statusRows = statuses.map(
        _.select(col("CollectionStatus"), col("FilesSent"))
          .collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
        .getOrElse(Seq.empty)
      val inventory = PipelineMetrics.referenceInventory(
        obs, statusRows, status, m.counters)
      val gk = Map("type" -> conf.snapshotType, "instance" -> m.instanceName,
        "correlation_id" -> conf.correlationId)
      p.push(m.pushJob, gk, flat ++ inventory)
      if (m.deleteOnFinal) p.delete(m.pushJob, gk)
    }
    sent
  }
}
