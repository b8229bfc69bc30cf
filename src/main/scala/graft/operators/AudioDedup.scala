package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual AUDIO deduplication — the acoustic sibling of
  * [[ImageDedup]], completing near-dup coverage across all three media
  * classes (text ×3 modalities, images dHash, audio here). The
  * fingerprint is the audio analogue of dHash (the
  * chromaprint/echoprint family idea reduced to its deterministic
  * core): split the PCM stream into [[NumBlocks]] equal-ish windows
  * and emit one bit per adjacent-window MEAN comparison — robust to
  * small sample-level perturbations, invariant to a global DC offset.
  *
  * Exactness: means are never divided — the comparison
  * mean(b+1) > mean(b) is the exact integer cross-multiplication
  * sum(b+1)·len(b) > sum(b)·len(b+1), evaluated as a 128-bit signed
  * product compare (Math.multiplyHigh), so it cannot wrap at ANY
  * stream length (a full-range int16 stream overflows a 64-bit
  * product past ~5e8 samples — ~3.5 h at 44.1 kHz). The SQL replay
  * keeps plain BIGINT products: at fixture sizes they are orders of
  * magnitude inside int64, and DuckDB errors loudly (never wraps) if
  * a future fixture crossed the line.
  *
  * Decode is the REAL JDK stack (AudioSystem, signed LE16 PCM, the
  * q45 discipline); candidate pairing is 8-bit pigeonhole blocking
  * over the 32-bit fingerprint (4 blocks ⇒ exact recall at Hamming
  * ≤ 3) with bit_count verification. Scale shape: decode is
  * mapPartitions; everything downstream rides (id, fp) — audio bytes
  * never shuffle. */
object AudioDedup {

  /** Window count: NumBlocks − 1 = 32 comparisons = a 32-bit
    * fingerprint (always nonnegative in a long — no sign handling
    * anywhere). */
  val NumBlocks = 33

  /** Exact signed compare a·b > c·d in 128 bits (b, d > 0 here —
    * window lengths — so order is preserved; the high/low split is
    * sign-correct for any a, c). Never wraps, whatever the stream
    * length. */
  private[operators] def productGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val h1 = Math.multiplyHigh(a, b); val l1 = a * b
    val h2 = Math.multiplyHigh(c, d); val l2 = c * d
    if (h1 != h2) h1 > h2 else java.lang.Long.compareUnsigned(l1, l2) > 0
  }

  /** Fingerprint of a decodable WAV via AudioSystem. None for
    * undecodable bytes, any format other than MONO SIGNED
    * little-endian 16-bit PCM (a multi-channel or PCM_UNSIGNED stream
    * would be silently misread as mono signed samples — reject, don't
    * guess), or streams shorter than [[NumBlocks]] samples (a window
    * would be empty). */
  def fingerprintFromWav(media: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getChannels != 1) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          if (n < NumBlocks) None
          else {
            val sums = new Array[Long](NumBlocks)
            val lens = new Array[Long](NumBlocks)
            var b = 0
            while (b < NumBlocks) {
              val s = b * n / NumBlocks
              val e = (b + 1) * n / NumBlocks
              var i = s
              var acc = 0L
              while (i < e) {
                acc += ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
                i += 1
              }
              sums(b) = acc
              lens(b) = e - s
              b += 1
            }
            var fp = 0L
            b = 0
            while (b < NumBlocks - 1) {
              if (productGt(sums(b + 1), lens(b), sums(b), lens(b + 1)))
                fp |= 1L << b
              b += 1
            }
            Some(fp)
          }
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Fingerprint table (doc_id, fp): mapPartitions (decoder-init
    * seam), undecodable rows dropped. */
  def fingerprints(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => fingerprintFromWav(r.media).map(fp => (r.doc_id, fp)))
    }.toDF("doc_id", "fp")
  }

  /** The four 8-BIT block values of the 32-bit fingerprint (shared by
    * the batch operators and the q195 streaming gate). */
  private[graft] def blockVals8(fp: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array((0 until 4).map(b =>
      shiftrightunsigned(fp, b * 8).bitwiseAND(lit(255L))): _*)

  private def blocked(fps: DataFrame): DataFrame =
    fps.select(col("doc_id"), col("fp"),
      posexplode(blockVals8(col("fp"))).as(Seq("block", "bv")))

  /** The once-per-epoch BLOCKED fingerprint index (block, bv, eid,
    * efp) — the static side a daily batch or stream joins
    * (q194/q195); in production saved bucketed on (block, bv). */
  def blockedIndex(fps: DataFrame): DataFrame =
    blocked(fps).select(col("block"), col("bv"),
      col("doc_id").as("eid"), col("fp").as("efp"))

  /** Near-duplicate pairs (idA < idB, hamming ≤ maxHamming) via 8-BIT
    * pigeonhole blocks over the 32-bit fingerprint — exact recall at
    * Hamming ≤ 3 by the same 4-block argument as [[ImageDedup]]. */
  def hammingPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-block pigeonhole guarantees recall only to Hamming 3, got $maxHamming")
    val bl = blocked(fps)
    val a = bl.select(col("block"), col("bv"),
      col("doc_id").as("idA"), col("fp").as("fpA"))
    val b = bl.select(col("block"), col("bv"),
      col("doc_id").as("idB"), col("fp").as("fpB"))
    a.join(b, Seq("block", "bv"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("fpA").bitwiseXOR(col("fpB"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** INCREMENTAL near-dup gate for audio — the q190 discipline at
    * acoustic granularity: per incoming stream, distinct epoch audios
    * within `maxHamming` against a once-per-epoch 4-byte-per-audio
    * fingerprint index; n_matches = 0 ⇒ the audio is NEW. Returns
    * (in_id, n_matches, best_hamming [-1 when none]). */
  def incrementalMatches(epochFps: DataFrame, incomingFps: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-block pigeonhole guarantees recall only to Hamming 3, got $maxHamming")
    val e = blockedIndex(epochFps)
    val i = blocked(incomingFps).select(col("block"), col("bv"),
      col("doc_id").as("in_id"), col("fp").as("ifp"))
    val matches = i.join(e, Seq("block", "bv"))
      .select(col("in_id"), col("eid"),
        bit_count(col("ifp").bitwiseXOR(col("efp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("in_id"))
      .agg(countDistinct(col("eid")).as("n_matches"),
        min(col("hamming")).as("best_hamming"))
    incomingFps.select(col("doc_id").as("in_id"))
      .join(matches, Seq("in_id"), "left")
      .select(col("in_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_hamming"), lit(-1)).cast("int").as("best_hamming"))
  }
}
