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
  * sum(b+1)·len(b) > sum(b)·len(b+1), so the whole
  * decode→fingerprint→block→verify chain replays bit-for-bit in SQL
  * (sums ≤ 127·2048 and lens ≤ 4: products far inside int64).
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

  /** Fingerprint of a decodable WAV via AudioSystem. None for
    * undecodable bytes, non-16-bit/big-endian formats, or streams
    * shorter than [[NumBlocks]] samples (a window would be empty). */
  def fingerprintFromWav(media: Array[Byte]): Option[Long] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
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
              if (sums(b + 1) * lens(b) > sums(b) * lens(b + 1))
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

  /** Near-duplicate pairs (idA < idB, hamming ≤ maxHamming) via 8-BIT
    * pigeonhole blocks over the 32-bit fingerprint — exact recall at
    * Hamming ≤ 3 by the same 4-block argument as [[ImageDedup]]. */
  def hammingPairs(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-block pigeonhole guarantees recall only to Hamming 3, got $maxHamming")
    val blockVals = array((0 until 4).map(b =>
      shiftrightunsigned(col("fp"), b * 8).bitwiseAND(lit(255L))): _*)
    val blocked = fps.select(col("doc_id"), col("fp"),
      posexplode(blockVals).as(Seq("block", "bv")))
    val a = blocked.select(col("block"), col("bv"),
      col("doc_id").as("idA"), col("fp").as("fpA"))
    val b = blocked.select(col("block"), col("bv"),
      col("doc_id").as("idB"), col("fp").as("fpB"))
    a.join(b, Seq("block", "bv"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("fpA").bitwiseXOR(col("fpB"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
