package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual VIDEO deduplication — the temporal member of the media
  * near-dup family ([[ImageDedup]] spatial, [[AudioDedup]] acoustic),
  * completing dedup coverage across every media class the engine
  * ingests.
  *
  * The container has no video decoder (as the project brief
  * prescribes), so the DECODE step is the deterministic STUB layer:
  * "frames" are the stride-4 byte groups [[Multimodal.sampleFrames]]
  * already models, and a frame's "signature" is the integer sum of its
  * 4 bytes — a real decoder (ffmpeg keyframe luma means) replaces ONLY
  * that kernel; everything around it is the real pipeline: per-object
  * framing, the 33-window mean-comparison temporal fingerprint (the
  * [[AudioDedup]] discipline over the frame-signature sequence —
  * means compared by exact integer cross-multiplication, never
  * divided), 8-bit pigeonhole blocking and bit_count verification.
  * Videos with fewer than 33 complete frames cannot fill the windows
  * and are dropped (the one-bad-object contract).
  *
  * Scale shape: framing + fingerprint are one mapPartitions pass;
  * everything downstream rides (id, fp) — video bytes never
  * shuffle. */
object VideoDedup {

  /** Bytes per stub "frame" (the sampleFrames stride). */
  val FrameBytes = 4

  /** Temporal fingerprint of a media payload: frame signatures →
    * 33-window adjacent-mean comparisons → 32-bit fingerprint. None
    * when fewer than 33 complete frames exist. */
  def fingerprintFromStub(media: Array[Byte]): Option[Long] = {
    if (media == null) return None
    val nFrames = media.length / FrameBytes
    if (nFrames < 33) return None
    val sig = new Array[Long](nFrames)
    var k = 0
    while (k < nFrames) {
      var s = 0L
      var j = 0
      while (j < FrameBytes) { s += media(k * FrameBytes + j) & 0xff; j += 1 }
      sig(k) = s
      k += 1
    }
    val sums = new Array[Long](33)
    val lens = new Array[Long](33)
    var b = 0
    while (b < 33) {
      val s = b * nFrames / 33
      val e = (b + 1) * nFrames / 33
      var i = s
      var acc = 0L
      while (i < e) { acc += sig(i); i += 1 }
      sums(b) = acc
      lens(b) = e - s
      b += 1
    }
    var fp = 0L
    b = 0
    while (b < 32) {
      // 128-bit exact compare (AudioDedup.productGt): frame signatures
      // are ≤ 1020 so int64 would suffice today, but the shared kernel
      // keeps the no-wrap guarantee if the stub signature is replaced
      // by a real decoder's wider luma sums
      if (AudioDedup.productGt(sums(b + 1), lens(b), sums(b), lens(b + 1)))
        fp |= 1L << b
      b += 1
    }
    Some(fp)
  }

  /** Fingerprint table (doc_id, fp): mapPartitions (decoder-init
    * seam), too-short/undecodable rows dropped. */
  def fingerprints(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => fingerprintFromStub(r.media).map(fp => (r.doc_id, fp)))
    }.toDF("doc_id", "fp")
  }

  /** Near-duplicate pairs: the fingerprint is the same 32-bit shape as
    * [[AudioDedup]]'s, so the 8-bit pigeonhole pairing is reused
    * verbatim (exact recall at Hamming ≤ 3). */
  def hammingPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame =
    AudioDedup.hammingPairs(fps, maxHamming)

  /** The once-per-epoch blocked fingerprint index — same 32-bit/8-bit
    * shape as audio, shared verbatim (q202/q203). */
  def blockedIndex(fps: DataFrame): DataFrame =
    AudioDedup.blockedIndex(fps)

  /** INCREMENTAL near-dup gate for video (q202): the [[AudioDedup]]
    * kernel verbatim — the fingerprints are the same 32-bit shape, so
    * the 8-bit blocking, Hamming verification and per-incoming verdict
    * are one shared code path across both temporal media classes. */
  def incrementalMatches(epochFps: DataFrame, incomingFps: DataFrame,
      maxHamming: Int = 3): DataFrame =
    AudioDedup.incrementalMatches(epochFps, incomingFps, maxHamming)
}
