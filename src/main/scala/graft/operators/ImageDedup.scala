package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image deduplication — dHash (difference hash) over decoded
  * pixel rasters, closing the modality gap: text gets three dedup
  * modalities (literal / semantic / substring), images get this one.
  *
  * dHash (the standard perceptual fingerprint, cf. pHash family):
  * downsample the luminance raster (see [[dhashFromImage]] for the
  * exact-integer BT.601 basis on color inputs) to a 9×8 grid, then
  * bit (y·8 + x) =
  * [grid(x+1, y) > grid(x, y)] — 8 adjacent-column comparisons per row
  * × 8 rows = a 64-bit fingerprint invariant to scale and robust to
  * small brightness/compression perturbations (a global shift flips
  * only comparisons straddling a wrap/clip boundary).
  *
  * Downsampling is NEAREST-NEIGHBOR on integer arithmetic —
  * px = ⌊x·W/9⌋, py = ⌊y·H/8⌋ — not area-averaging: the comparison
  * structure (what dHash actually measures) is preserved, and every
  * sampled value is an exact integer function the SQL oracle can
  * recompute, so the whole decode→fingerprint→block→verify chain is
  * gated bit-for-bit. (A production variant would area-average; the
  * blocking and pairing layers are unchanged by that swap.)
  *
  * Candidate pairing is the q37 SimHash pigeonhole discipline: split
  * the 64-bit fingerprint into four 16-bit blocks — any pair within
  * Hamming distance 3 agrees on ≥ 1 block exactly — shuffle on
  * (block, value), pair inside buckets only, verify with
  * bit_count(xor). No all-pairs product; bucket width bounds the
  * quadratic term, signatures are 8 bytes/image.
  *
  * Scale shape (100 TB): decode is mapPartitions (one decoder init per
  * partition, the Multimodal.decode seam); everything after rides on
  * (id, fp) rows — the images themselves never shuffle. */
object ImageDedup {

  /** dHash of a decodable image via the REAL JDK decode stack
    * (ImageIO). None for undecodable bytes — the one-bad-object
    * contract. Images narrower than 2px or shorter than 1px cannot
    * carry comparisons and are dropped too.
    *
    * Luminance basis: single-band (grayscale) rasters compare the band
    * directly; RGB(A) rasters compare the exact-integer BT.601
    * combination 299·R + 587·G + 114·B — UNSCALED (dHash only compares
    * values, so dividing by 1000 would add nothing but rounding), with
    * alpha ignored. A gray+alpha raster compares band 0. This makes
    * the luminance contract explicit instead of silently hashing color
    * images on the red channel. */
  def dhashFromImage(media: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      if (img == null || img.getWidth < 2 || img.getHeight < 1) None
      else {
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val rgb = r.getNumBands >= 3
        def lum(px: Int, py: Int): Int =
          if (rgb) 299 * r.getSample(px, py, 0) + 587 * r.getSample(px, py, 1) +
            114 * r.getSample(px, py, 2)
          else r.getSample(px, py, 0)
        var fp = 0L
        var y = 0
        while (y < 8) {
          val py = y * h / 8
          var x = 0
          while (x < 8) {
            val pxA = x * w / 9
            val pxB = (x + 1) * w / 9
            if (lum(pxB, py) > lum(pxA, py))
              fp |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(fp)
      }
    } catch { case _: Exception => None }

  /** Fingerprint table (doc_id, fp) over a media table: mapPartitions
    * (decoder-init seam), undecodable rows dropped. */
  def fingerprints(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => dhashFromImage(r.media).map(fp => (r.doc_id, fp)))
    }.toDF("doc_id", "fp")
  }

  /** (doc_id, fp, block, bv) rows — the q37 SimHash block arithmetic
    * verbatim (Dedup.simhashPairs): logical shift + 16-bit mask;
    * oracles replay it as the signed `(fp >> s) & 65535`, identical
    * for s ≤ 48 since the mask keeps only bits the sign extension
    * can't reach. */
  /** The four 16-bit block values of a fingerprint column (shared by
    * the batch operators and the q193 streaming gate, which inlines
    * the explode on the stream side). */
  private[graft] def blockVals16(fp: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array((0 until 4).map(b =>
      shiftrightunsigned(fp, b * 16).bitwiseAND(lit(65535L))): _*)

  private def blocked(fps: DataFrame): DataFrame =
    fps.select(col("doc_id"), col("fp"),
      posexplode(blockVals16(col("fp"))).as(Seq("block", "bv")))

  /** The once-per-epoch BLOCKED fingerprint index (block, bv, eid,
    * efp) — the static side a daily batch or stream joins
    * (q190/q193); in production saved bucketed on (block, bv) via
    * Layout.bucketize. */
  def blockedIndex(fps: DataFrame): DataFrame =
    blocked(fps).select(col("block"), col("bv"),
      col("doc_id").as("eid"), col("fp").as("efp"))

  /** Near-duplicate pairs (idA < idB, hamming ≤ maxHamming) via 16-bit
    * pigeonhole blocking. Exact recall for maxHamming ≤ 3 (4 blocks);
    * larger thresholds would need more/narrower blocks. */
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

  /** INCREMENTAL near-dup gate: per INCOMING image, how many DISTINCT
    * epoch images sit within `maxHamming` — the crawl-ingest question
    * ("is this image already in the corpus?") answered against a
    * once-per-epoch fingerprint index, the q174/q152 epoch-index
    * discipline at image granularity. The epoch side is 8 bytes per
    * image (in production saved bucketed on (block, bv) via
    * Layout.bucketize, so a daily batch joins it with ZERO epoch-side
    * recompute — images are never re-decoded); only the incoming
    * batch decodes and blocks per run. n_matches = 0 ⇒ the image is
    * NEW. Returns one row per incoming id:
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
