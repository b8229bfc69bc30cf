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

  // ---- Real container-header layer (no media libs needed) ----------------
  //
  // Pixel/sample DECODE needs libjpeg/ffmpeg and stays stubbed, but the
  // container headers are plain bytes — parsing them is real work a
  // 100 TB ingest does on every object (dimensions/sample-rate filters
  // run BEFORE any expensive decode). Builders construct valid headers;
  // the parser reads them back; both are exercised against each other
  // and against hand-written byte fixtures in MultimodalSpec.

  final case class MediaHeader(format: String, width: Int, height: Int,
      channels: Int, sample_rate: Int, payload_bytes: Long)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG (IHDR), WAV (RIFF/fmt) and MP4 (ftyp) header parsing — returns
    * None for unrecognized/truncated bytes (one bad object must not kill
    * the scan). */
  def parseHeader(media: Array[Byte]): Option[MediaHeader] = {
    if (media == null) return None
    if (media.length >= 33 && media.take(8).sameElements(pngSig) &&
        media.slice(12, 16).sameElements("IHDR".getBytes)) {
      // sig(8) + len(4) + "IHDR"(4) + 13-byte payload + CRC(4) = 33 bytes
      // minimum; width/height BE at 16/20; color type at 25
      // (2 = truecolor RGB, 6 = RGBA, 4 = gray+alpha, else gray/palette)
      val channels = media(25) match {
        case 2 => 3
        case 6 => 4
        case 4 => 2
        case _ => 1
      }
      Some(MediaHeader("png", be32(media, 16), be32(media, 20), channels,
        0, media.length.toLong - 33))
    } else if (media.length >= 44 &&
        media.take(4).sameElements("RIFF".getBytes) &&
        media.slice(8, 12).sameElements("WAVE".getBytes) &&
        media.slice(12, 16).sameElements("fmt ".getBytes)) {
      // canonical fmt chunk directly at offset 12 (a LIST/JUNK-first WAV
      // would need a chunk walk — reject rather than read garbage):
      // channels LE16 at 22, sample rate LE32 at 24
      Some(MediaHeader("wav", 0, 0, le16(media, 22), le32(media, 24),
        media.length.toLong - 44))
    } else if (media.length >= 12 &&
        media.slice(4, 8).sameElements("ftyp".getBytes)) {
      // declared box size must be sane and inside the buffer — a
      // mid-box-truncated download would otherwise yield negative
      // payload_bytes
      val sz = be32(media, 0)
      if (sz < 12 || sz > media.length) None
      else Some(MediaHeader(new String(media.slice(8, 12),
          java.nio.charset.StandardCharsets.US_ASCII).trim, 0, 0, 0, 0,
        media.length.toLong - sz))
    } else None
  }

  /** Minimal valid PNG: signature + IHDR chunk (no zlib — the payload
    * rides as an opaque trailing chunk, which header parsers skip). */
  def pngBytes(width: Int, height: Int, colorType: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33 + payload.length)
    out.put(pngSig)
    out.putInt(13).put("IHDR".getBytes)
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(colorType.toByte) // bit depth 8
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.putInt(0) // CRC placeholder (header parsers don't verify)
    out.put(payload)
    out.array()
  }

  /** Canonical 44-byte WAV header + payload as PCM data. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * bitsPerSample / 8
    out.put("RIFF".getBytes).putInt(36 + payload.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1.toShort) // PCM
    out.putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
    out.putShort((channels * bitsPerSample / 8).toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes).putInt(payload.length)
    out.put(payload)
    out.array()
  }

  /** Minimal MP4: a single ftyp box, payload appended as opaque mdat-less
    * tail (box walkers stop at the declared size). */
  def mp4Bytes(brand: String, payload: Array[Byte]): Array[Byte] = {
    require(brand.length == 4)
    val out = java.nio.ByteBuffer.allocate(12 + payload.length)
    out.putInt(12).put("ftyp".getBytes).put(brand.getBytes)
    out.put(payload)
    out.array()
  }

  /** Media table with REAL container headers, every field a deterministic
    * function of doc_id (the q98 oracle recomputes them in SQL):
    * doc_id % 3 == 0 → PNG  (width 16 + id%113, height 16 + (id/7)%97, RGB)
    * doc_id % 3 == 1 → WAV  (44100/16000 Hz by id parity, 1+id%2 channels)
    * otherwise       → MP4  ("isom" brand). */
  def headeredMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id % 3) match {
          case 0 => MediaRow(id, "image/png",
            pngBytes((16 + id % 113).toInt, (16 + (id / 7) % 97).toInt, 2, payload))
          case 1 => MediaRow(id, "audio/wav",
            wavBytes(if (id % 2 == 0) 44100 else 16000, (1 + id % 2).toInt,
              16, payload))
          case _ => MediaRow(id, "video/mp4", mp4Bytes("isom", payload))
        }
      }
  }

  /** Header extraction over a media table: mapPartitions (same batching
    * seam as decode), unparseable rows dropped with a null-safe flatMap. */
  def extractHeaders(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => parseHeader(r.media).map(h => (r.doc_id, h)))
    }.toDF("doc_id", "header")
      .select(col("doc_id"), col("header.*"))
  }

  // ---- Real JDK decode layer (no native libs needed) ---------------------
  //
  // The stub above stands in for libjpeg/ffmpeg formats the JDK can't
  // read; PNG pixels and WAV PCM the stock JDK decodes for real
  // (javax.imageio.ImageIO / javax.sound.sampled.AudioSystem). The
  // builders below emit REAL compressed PNGs (zlib IDAT, correct CRCs)
  // and canonical PCM WAVs whose pixel/sample values are deterministic
  // integer functions of doc_id — so the q45 oracle recomputes the
  // decoded SUMS in SQL and a decode bug anywhere (encoder, zlib round-
  // trip, byte-offset, sign handling) breaks the hash. All sums are
  // integer arithmetic: bit-exact across engines by construction.

  final case class RealDecoded(doc_id: Long, media_type: String,
      width: Int, height: Int, unit_count: Long, value_sum: Long)

  private def pngChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val tagB = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(tagB); crc.update(body)
    val out = java.nio.ByteBuffer.allocate(12 + body.length)
    out.putInt(body.length).put(tagB).put(body).putInt(crc.getValue.toInt)
    out.array()
  }

  /** REAL 8-bit grayscale PNG: IHDR + zlib-deflated filter-0 scanlines in
    * IDAT + IEND, all CRCs genuine — `ImageIO.read` accepts it. */
  def pngEncoded(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val raw = new Array[Byte](height * (width + 1))
    var p = 0
    var y = 0
    while (y < height) {
      raw(p) = 0 // filter type None per scanline
      p += 1
      var x = 0
      while (x < width) { raw(p) = (pixel(x, y) & 0xff).toByte; p += 1; x += 1 }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    // loop until finished(): incompressible content can exceed any fixed
    // buffer (stored-block overhead), and a single deflate() call would
    // silently truncate the IDAT
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    pngSig ++ pngChunk("IHDR", ihdr.array()) ++
      pngChunk("IDAT", out.toByteArray) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decode through the actual JDK stacks: PNG → ImageIO raster walk
    * (unit_count = pixels, value_sum = Σ gray values); WAV → AudioSystem
    * frame stream, signed LE16 PCM (unit_count = samples, value_sum =
    * Σ sample values). Unsupported/corrupt bytes → None (one bad object
    * must not kill a 100 TB scan — same contract as parseHeader). */
  def decodeReal(mediaType: String, media: Array[Byte]): Option[RealDecoded] =
    try mediaType match {
      case "image/png" =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
        if (img == null) None
        else {
          val r = img.getRaster
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { s += r.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Some(RealDecoded(0L, mediaType, img.getWidth, img.getHeight,
            img.getWidth.toLong * img.getHeight, s))
        }
      case "audio/wav" =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(media))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
          else {
            val bytes = ais.readAllBytes()
            var s = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              s += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toLong
              i += 2
            }
            Some(RealDecoded(0L, mediaType, 0, 0, bytes.length.toLong / 2, s))
          }
        } finally ais.close()
      case _ => None
    } catch { case _: Exception => None }

  /** Media table with REAL decodable payloads, every value a deterministic
    * integer function of doc_id (the q45 oracle replays the sums in SQL):
    * doc_id % 3 == 0 → PNG gray 8-bit, w = 8 + id%16, h = 8 + (id/3)%16,
    *                   pixel(x,y) = (id·31 + x·7 + y·13) mod 256
    * doc_id % 3 == 1 → WAV PCM16 mono 8 kHz, n = 64 + id%64 samples,
    *                   sample(i) = ((id·37 + i·11) mod 4096) − 2048
    * otherwise       → MP4 (no JDK decoder — exercises the drop path).
    *
    * doc_id must be NONNEGATIVE: the oracle's pixel/sample formulas use
    * SQL `%` on nonnegative ids, and Scala's signed `%` (plus the
    * `8 + id % 16` dimension arithmetic) diverges below zero — rejected
    * loudly here rather than surfacing as a NegativeArraySizeException
    * in the PNG builder or a silent oracle divergence. */
  def realMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      require(id >= 0, s"realMedia: doc_id must be nonnegative, got $id " +
        "(oracle formulas use nonnegative % semantics)")
      (id % 3) match {
        case 0 =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id / 3) % 16).toInt
          MediaRow(id, "image/png",
            pngEncoded(w, h, (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
        case 1 =>
          val n = (64 + id % 64).toInt
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = ((id * 37 + i * 11) % 4096 - 2048).toShort
            pcm(i * 2) = (v & 0xff).toByte
            pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          MediaRow(id, "audio/wav", wavBytes(8000, 1, 16, pcm))
        case _ => MediaRow(id, "video/mp4", mp4Bytes("isom", Array.emptyByteArray))
      }
    }
  }

  /** Image table for the perceptual-dedup gate (q186): one REAL gray
    * PNG per document (dims and pixels deterministic in doc_id, the
    * q45 discipline, with an (id%7)·x·y cross term so fingerprints
    * differ across ids instead of collapsing into the linear formula's
    * residue classes), plus a NEAR-DUPLICATE partner (+40000) for every
    * even doc: same geometry, every pixel shifted +2 mod 256 — a
    * brightness nudge that flips only the dHash comparisons straddling
    * a wrap boundary, exactly the perturbation class perceptual
    * hashing exists to catch.
    *
    * pixel(x,y) = (id·31 + 7x + 13y + (id%7)·x·y + shift) mod 256,
    * w = 8 + id%16, h = 8 + (id/3)%16 — partner dims from the BASE id.
    * doc_id must be nonnegative (oracle `%` semantics, as realMedia). */
  /** Formula-A gray PNG for base id `bid` with brightness `shift` —
    * dims and pixels the documented doc_id functions. */
  private def dhashPngA(bid: Long, shift: Long): Array[Byte] = {
    require(bid >= 0, s"dhash media: doc_id must be nonnegative, got $bid " +
      "(oracle formulas use nonnegative % semantics)")
    pngEncoded((8 + bid % 16).toInt, (8 + (bid / 3) % 16).toInt, (x, y) =>
      ((bid * 31 + x * 7 + y * 13 + (bid % 7) * x * y + shift) % 256).toInt)
  }

  /** Formula-B gray PNG (the NOVEL-content formula for the incremental
    * gate): same dims as A, unrelated pixel pattern. */
  private def dhashPngB(bid: Long): Array[Byte] = {
    require(bid >= 0, s"dhash media: doc_id must be nonnegative, got $bid")
    pngEncoded((8 + bid % 16).toInt, (8 + (bid / 3) % 16).toInt, (x, y) =>
      ((bid * 53 + x * 11 + y * 17 + (bid % 5) * x * y + 3) % 256).toInt)
  }

  def dhashMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].flatMap { id =>
      val base = MediaRow(id, "image/png", dhashPngA(id, 0))
      if (id % 2 == 0)
        Seq(base, MediaRow(id + 40000L, "image/png", dhashPngA(id, 2)))
      else Seq(base)
    }
  }

  /** The EPOCH side of the incremental image gate (q190): one base
    * formula-A PNG per document, no partners. */
  def dhashEpoch(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, "image/png", dhashPngA(id, 0)))
  }

  /** The INCOMING batch for the incremental image gate (q190): even
    * docs arrive as +2-brightness near-dups of their epoch image
    * (+40000); odd docs arrive as NOVEL formula-B images (+50000) the
    * epoch has never seen. */
  def dhashIncoming(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) MediaRow(id + 40000L, "image/png", dhashPngA(id, 2))
      else MediaRow(id + 50000L, "image/png", dhashPngB(id))
    }
  }

  /** Audio table for the perceptual-dedup gate (q191): one REAL PCM16
    * mono 8 kHz WAV per document — n = 64 + id%64 samples,
    * sample(i) = (id·37 + 11i + i²·(1 + id%13)) mod 4096 − 2048. The
    * id-dependent QUADRATIC term matters: a linear-in-i family wraps
    * at most once over ≤127 samples, so adjacent-mean comparisons see
    * a near-monotone ramp and every id collapses onto its length
    * class's fingerprint (measured: 64 distinct fps over 7500 audios
    * → 15M degenerate pairs); the chirp wraps many times at
    * id-dependent positions (measured: 4432 distinct fps, largest
    * class 5, full partner recovery at Hamming ≤ 3). Plus a NEAR-DUPLICATE partner (+40000) for every even
    * doc: the same stream with +7 added to every 13th sample — a
    * sparse perturbation that nudges a few window means, exactly the
    * robustness class the mean-comparison fingerprint absorbs.
    * doc_id must be nonnegative (oracle `%` semantics). */
  /** kind 0 = formula A; 1 = A with +7 on every 13th sample (the
    * near-dup perturbation); 2 = formula B, the NOVEL chirp for the
    * incremental gate: (id·41 + 13i + i²·(2 + id%11)) mod 4096 − 2048. */
  private def audioWav(id: Long, kind: Int): Array[Byte] = {
    require(id >= 0, s"audio media: doc_id must be nonnegative, got $id " +
      "(oracle formulas use nonnegative % semantics)")
    val n = (64 + id % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val base =
        if (kind == 2) (id * 41 + i * 13 + i.toLong * i * (2 + id % 11)) % 4096 - 2048
        else (id * 37 + i * 11 + i.toLong * i * (1 + id % 13)) % 4096 - 2048
      val v = (base + (if (kind == 1 && i % 13 == 0) 7 else 0)).toShort
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    wavBytes(8000, 1, 16, pcm)
  }

  def audioMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].flatMap { id =>
      val base = MediaRow(id, "audio/wav", audioWav(id, 0))
      if (id % 2 == 0)
        Seq(base, MediaRow(id + 40000L, "audio/wav", audioWav(id, 1)))
      else Seq(base)
    }
  }

  /** The EPOCH side of the incremental audio gate (q194/q195): one
    * base formula-A WAV per document, no partners. */
  def audioEpoch(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, "audio/wav", audioWav(id, 0)))
  }

  /** The INCOMING batch for the incremental audio gate: even docs
    * arrive as sparse-perturbation near-dups of their epoch audio
    * (+40000); odd docs arrive as NOVEL formula-B chirps (+50000). */
  def audioIncoming(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) MediaRow(id + 40000L, "audio/wav", audioWav(id, 1))
      else MediaRow(id + 50000L, "audio/wav", audioWav(id, 2))
    }
  }

  /** Video table for the perceptual-dedup gate (q197): one MP4 per
    * document (ftyp header + the text bytes as the opaque payload —
    * the syntheticMedia stand-in), plus a NEAR-DUPLICATE partner
    * (+40000) for every even doc: the payload with byte value +1 at
    * every 31st payload position — a sparse corruption the
    * frame-window means mostly absorb. The 12-byte ftyp header is
    * 4-aligned, so stub frames 0–2 are the (shared) header and every
    * later frame covers exactly 4 payload bytes — replayable. */
  def videoMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        require(id >= 0, s"videoMedia: doc_id must be nonnegative, got $id")
        val payload = Option(text).getOrElse("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val base = MediaRow(id, "video/mp4", mp4Bytes("isom", payload))
        if (id % 2 == 0) {
          val p2 = payload.clone()
          var i = 0
          while (i < p2.length) {
            if (i % 31 == 0) p2(i) = (p2(i) + 1).toByte
            i += 1
          }
          Seq(base, MediaRow(id + 40000L, "video/mp4", mp4Bytes("isom", p2)))
        } else Seq(base)
      }
  }

  /** One stub MP4 for the video gates: kind 0 = base (the text bytes as
    * payload), 1 = near-dup perturbation (+1 on every 31st payload
    * byte — the videoMedia partner), 2 = NOVEL content (every payload
    * byte remapped (3·code + 7) mod 128 — stays ASCII-range so the
    * oracle replays it as pure unicode(c) arithmetic). */
  private def videoStub(id: Long, text: String, kind: Int): MediaRow = {
    require(id >= 0, s"videoStub: doc_id must be nonnegative, got $id")
    val payload = Option(text).getOrElse("")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val p = payload.clone()
    var i = 0
    while (i < p.length) {
      if (kind == 2) p(i) = (((p(i) & 0xff) * 3 + 7) % 128).toByte
      else if (kind == 1 && i % 31 == 0) p(i) = (p(i) + 1).toByte
      i += 1
    }
    MediaRow(id, "video/mp4", mp4Bytes("isom", p))
  }

  /** Doc-keyed images for the cross-modal pair gate (q201): EVEN docs
    * carry a fresh formula-A scene of their own id; ODD docs carry a
    * +2-brightness NEAR-DUP of the previous even id's scene —
    * cross-document image duplication under different captions, the
    * exact case pair-level dedup exists for (keep-lowest-id keeps the
    * even doc's pair). */
  def pairMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long]
      .map(id => MediaRow(id, "image/png",
        dhashPngA(id - id % 2, 2 * (id % 2))))
  }

  /** The EPOCH side of the incremental video gate (q202/q203): one
    * base stub MP4 per document, no partners. */
  def videoEpoch(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => videoStub(id, text, 0) }
  }

  /** The INCOMING batch for the incremental video gate: even docs
    * arrive as sparse-corruption near-dups of their epoch video
    * (+40000); odd docs arrive as NOVEL remapped-payload videos
    * (+50000) the epoch has never seen. */
  def videoIncoming(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 2 == 0) videoStub(id + 40000L, text, 1)
        else videoStub(id + 50000L, text, 2)
      }
  }

  /** Real-decode over a media table: mapPartitions (one decoder warm-up
    * per partition — ImageIO's plugin registry scan is per-JVM but the
    * seam is where a native decoder would init), unsupported rows
    * dropped. */
  def decodeRealTable(media: Dataset[MediaRow]): Dataset[RealDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r =>
        decodeReal(r.media_type, r.media).map(_.copy(doc_id = r.doc_id)))
    }
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
