package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media ride as opaque BINARY columns with
  * typed metadata; decode/feature-extract runs per-partition so a real
  * decoder (libjpeg/ffmpeg via JNI, or an external process pool) amortizes
  * its setup across a partition, exactly like a Pandas-UDF batch would.
  *
  * The decode kernel itself is STUBBED with a deterministic fake — the
  * container has no image/audio libraries — but everything Spark-side is
  * real and tested: schema, encoder, partition batching, and the
  * downstream feature pipeline (the fake features feed the real
  * Similarity operators unchanged).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaMeta(width: Int, height: Int, channels: Int, bytes: Long)
  final case class DecodedRow(doc_id: Long, media_type: String,
      meta: MediaMeta, features: Array[Float])

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg:
    * "dimensions" are parsed from the first content bytes, "features" are
    * a 16-dim byte-histogram sketch. A real decoder replaces ONLY this
    * function; signature and batching stay. */
  def decodeStub(media: Array[Byte]): (MediaMeta, Array[Float]) = {
    val w = if (media.length > 0) 1 + (media(0) & 0x7f) else 0
    val h = if (media.length > 1) 1 + (media(1) & 0x7f) else 0
    val hist = new Array[Float](16)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, media.length).toFloat
    (MediaMeta(w, h, 3, media.length.toLong), hist.map(_ / n))
  }

  /** binary columns → decoded metadata + features, one decoder init per
    * partition (mapPartitions, not per-row UDF). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the native decoder HERE, once per partition
      rows.map { r =>
        val (meta, feats) = decodeStub(r.media)
        DecodedRow(r.doc_id, r.media_type, meta, feats)
      }
    }
  }

  /** Synthetic media table derived from documents (documents.text bytes as
    * the opaque payload) — deterministic stand-in for an ingest of real
    * image bytes. */
  def syntheticMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image/jpeg")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Frame/sample selection: for "video", one row per sampled frame —
    * frame_no = k·everyN for k in [0, bytes/everyN) (the explode pattern
    * a real frame sampler uses). Zero-byte media emit no frames. */
  def sampleFrames(decoded: Dataset[DecodedRow], everyN: Int = 4): DataFrame =
    decoded.toDF()
      .filter(col("media_type") === "video/mp4" && col("meta.bytes") >= everyN)
      .withColumn("k",
        explode(sequence(lit(0), (col("meta.bytes") / everyN).cast("int") - 1)))
      .select(col("doc_id"), (col("k") * everyN).as("frame_no"),
        col("meta.width"), col("meta.height"))
}
