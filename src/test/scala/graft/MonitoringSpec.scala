package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.{LocalKeyService, SnapshotFixture}

/** K5/K6 after-run block: exactly-one SNS publish per completed run, the
  * reference skip matrix (heartbeat / blank ARN / NOT_COMPLETED), and the
  * Pushgateway PUT/DELETE wire contract. */
class MonitoringSpec extends SparkSuite {
  import spark.implicits._

  private final class RecordingSns extends SnsPublisher {
    val published = new ConcurrentHashMap[String, (String, String)]()
    override def publish(topicArn: String, payload: String): String = {
      val id = s"msg-${published.size()}"
      published.put(id, (topicArn, payload))
      id
    }
  }

  private def freshRun(blockExpected: Boolean = false) = {
    val fixture = "/tmp/graft-fixture-monitoring"
    SnapshotFixture.generate(fixture, SnapshotFixture.defaultTopics(2, 5))
    val exp =
      if (blockExpected) Seq(("db.core.claimant", 99L)) // sent < expected
      else Seq(("db.core.claimant", 2L), ("db.database.sent", 1L),
        ("db.database.empty", 0L))
    (fixture, exp.toDF("topic", "FilesExported"))
  }

  test("completed run publishes exactly one monitoring message") {
    val (fixture, expected) = freshRun()
    val sns = new RecordingSns
    val out = Files.createTempDirectory("mon-out").toString
    val status = Files.createTempDirectory("mon-status").toString
    val conf = SnapshotPipeline.DeliveryConf(correlationId = "mon-run")
    SnapshotJob.run(spark, fixture, out, status, expected, LocalKeyService,
      conf, monitoring = Some(MonitoringConf(sns, "arn:local:monitoring",
        snsInitialDelayMs = 1)))
    assert(sns.published.size() == 1, "exactly one publish per completed run")
    val (arn, payload) = sns.published.values().iterator().next()
    assert(arn == "arn:local:monitoring")
    assert(payload.contains("\"Correlation Id\"") && payload.contains("mon-run"))
    assert(payload.contains("Information")) // COMPLETED_SUCCESSFULLY severity
  }

  test("skip matrix: heartbeat, blank arn, NOT_COMPLETED publish nothing") {
    val sns = new RecordingSns
    val completionOk = Seq(("c1", true, false, "COMPLETED_SUCCESSFULLY"))
      .toDF("correlationId", "all_ok", "any_failed", "completionStatus")
    val completionNot = Seq(("c1", false, false, "NOT_COMPLETED"))
      .toDF("correlationId", "all_ok", "any_failed", "completionStatus")
    val base = SnapshotPipeline.DeliveryConf()

    // heartbeat: export date sentinel suppresses the message
    assert(Monitoring.afterRun(
      MonitoringConf(sns, "arn:x", snsInitialDelayMs = 1),
      base.copy(exportDate = "NIFI_HEARTBEAT"), completionOk).isEmpty)
    // blank ARN
    assert(Monitoring.afterRun(
      MonitoringConf(sns, "", snsInitialDelayMs = 1), base, completionOk).isEmpty)
    // NOT_COMPLETED rollup
    assert(Monitoring.afterRun(
      MonitoringConf(sns, "arn:x", snsInitialDelayMs = 1), base,
      completionNot).isEmpty)
    assert(sns.published.isEmpty)
    // sanity: the unskipped case does publish — and failure runs publish too
    val completionBad = Seq(("c1", false, true, "COMPLETED_UNSUCCESSFULLY"))
      .toDF("correlationId", "all_ok", "any_failed", "completionStatus")
    assert(Monitoring.afterRun(
      MonitoringConf(sns, "arn:x", snsInitialDelayMs = 1), base,
      completionBad).nonEmpty)
    assert(sns.published.size() == 1)
  }

  test("final metrics push bridges observe counters to the gateway seam") {
    val (fixture, expected) = freshRun()
    val sns = new RecordingSns
    val collector = PipelineMetrics.install(spark)
    val pushDir = Files.createTempDirectory("mon-push").toString
    val out = Files.createTempDirectory("mon-out2").toString
    val status = Files.createTempDirectory("mon-status2").toString
    val conf = SnapshotPipeline.DeliveryConf(correlationId = "push-run")
    try SnapshotJob.run(spark, fixture, out, status, expected, LocalKeyService,
      conf, monitoring = Some(MonitoringConf(sns, "arn:x",
        pusher = Some(LocalFsMetricsPusher(pushDir)),
        metrics = Some(collector), snsInitialDelayMs = 1)))
    finally spark.listenerManager.unregister(collector)
    val files = new java.io.File(pushDir).listFiles()
    assert(files.length == 1)
    val content = new String(Files.readAllBytes(files.head.toPath), "UTF-8")
    assert(content.contains("graft_scan_files_scanned"))
    assert(content.contains("graft_delivery_files_delivered"))
    assert(files.head.getName.contains("correlation_id=push-run"))
  }

  test("HttpPushGatewayPusher speaks the Pushgateway PUT/DELETE protocol") {
    val puts = new ConcurrentHashMap[String, String]()
    val deletes = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      ex.getRequestMethod match {
        case "PUT" => puts.put(ex.getRequestURI.getPath, body)
        case "DELETE" => deletes.incrementAndGet()
        case _ =>
      }
      ex.sendResponseHeaders(202, -1); ex.close()
    })
    server.start()
    try {
      val p = HttpPushGatewayPusher(
        s"http://127.0.0.1:${server.getAddress.getPort}", initialDelayMs = 1)
      val gk = Map("type" -> "full", "instance" -> "i1")
      p.push("snapshot_sender", gk, Map("files_sent" -> 5L, "bad-name!" -> 1L))
      p.delete("snapshot_sender", gk)
      assert(puts.size() == 1)
      val (path, body) = {
        val e = puts.entrySet().iterator().next(); (e.getKey, e.getValue)
      }
      assert(path == "/metrics/job/snapshot_sender/instance/i1/type/full")
      assert(body == "bad_name_ 1\nfiles_sent 5\n") // sanitized + sorted
      assert(deletes.get() == 1)
    } finally server.stop(0)
  }
}
