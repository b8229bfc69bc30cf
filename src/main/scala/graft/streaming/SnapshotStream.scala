package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Delivery, SnapshotPipeline}
import graft.operators.SnapshotPipeline._
import graft.sources.{EncryptedSnapshotSource, KeyService}

/** The snapshot pipeline as a CONTINUOUS stream: new encrypted objects
  * appearing under the input prefix are discovered by the file source,
  * flow through the SAME stage functions as the batch job, and are
  * delivered per micro-batch via foreachBatch. The streaming checkpoint
  * supersedes the `.finished`-marker anti-join for restart semantics (the
  * markers are still written — downstream consumers and batch re-runs
  * keep their commit log).
  *
  * This is the reference's re-run loop with the loop removed: instead of
  * "run again with reprocess=false and skip delivered files", the file
  * source only ever hands each object to exactly one micro-batch.
  */
object SnapshotStream {

  def start(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      statusDir: String,
      checkpointDir: String,
      keys: KeyService,
      conf: DeliveryConf = DeliveryConf()) = {

    val stream = spark.readStream
      .format("binaryFile")
      .option("pathGlobFilter", "*.enc")
      .schema(spark.read.format("binaryFile").load(inputDir).schema)
      .load(inputDir)

    val meta = spark.read.schema(EncryptedSnapshotSource.metaSchema)
      .json(s"$inputDir/*.meta.json")

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions._
        val files = batch.select(
          col("path").as("fullPath"),
          element_at(split(col("path"), "/"), -1).as("fileName"),
          col("length"), col("content"))
          .join(broadcast(meta), Seq("fileName"), "left")
        val (valid, _) = quarantine(withTopic(files))
        val (allowed, _) = splitBlockedTopics(valid, conf.blockedTopics)
        val ready = nifiHeaders(decrypt(resolveKeys(allowed, keys)), conf)
        Delivery.deliver(ready, outDir, statusDir)
        ()
      }
      .start()
  }
}
