package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaHeader

/** Container-header layer: builders and parser against each other AND
  * against hand-written byte fixtures (so a matching bug in both
  * directions can't hide), plus garbage robustness. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("PNG round-trip and hand-built IHDR bytes") {
    val p = Multimodal.pngBytes(640, 480, colorType = 2, payload = Array[Byte](1, 2, 3))
    assert(Multimodal.parseHeader(p).contains(
      MediaHeader("png", 640, 480, 3, 0, 3L)))
    // hand-written: signature + IHDR with width 1, height 2, RGBA
    val hand = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // len + type
      0, 0, 0, 1, 0, 0, 0, 2,                      // w=1 h=2 (BE)
      8, 6, 0, 0, 0,                               // depth 8, RGBA
      0, 0, 0, 0                                   // CRC
    ).map(_.toByte)
    assert(Multimodal.parseHeader(hand).contains(
      MediaHeader("png", 1, 2, 4, 0, 0L)))
  }

  test("WAV round-trip: LE fields land at canonical offsets") {
    val w = Multimodal.wavBytes(44100, channels = 2, bitsPerSample = 16,
      payload = new Array[Byte](10))
    val h = Multimodal.parseHeader(w)
    assert(h.contains(MediaHeader("wav", 0, 0, 2, 44100, 10L)))
    assert(w.length == 54)
  }

  test("MP4 ftyp brand extraction") {
    val m = Multimodal.mp4Bytes("isom", new Array[Byte](7))
    assert(Multimodal.parseHeader(m).contains(
      MediaHeader("isom", 0, 0, 0, 0, 7L)))
  }

  test("garbage, truncated, and null bytes parse to None, never throw") {
    assert(Multimodal.parseHeader(null).isEmpty)
    assert(Multimodal.parseHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseHeader("not a media file".getBytes).isEmpty)
    // valid PNG signature but truncated before IHDR completes
    val trunc = Multimodal.pngBytes(9, 9, 2, Array.empty[Byte]).take(20)
    assert(Multimodal.parseHeader(trunc).isEmpty)
    // truncated INSIDE the IHDR payload (26-32 bytes): must reject, not
    // return a negative payload_bytes
    assert(Multimodal.parseHeader(
      Multimodal.pngBytes(9, 9, 2, Array.empty[Byte]).take(30)).isEmpty)
    // ftyp declaring a box size beyond the buffer (mid-box truncation)
    val bigFtyp = Multimodal.mp4Bytes("isom", Array.empty[Byte])
    bigFtyp(3) = 100.toByte // declared size 100 > 12-byte buffer
    assert(Multimodal.parseHeader(bigFtyp).isEmpty)
    // RIFF/WAVE whose first chunk is not the canonical "fmt " (LIST-first
    // encoders): reject rather than read garbage offsets
    val listWav = Multimodal.wavBytes(44100, 1, 16, Array.empty[Byte])
    System.arraycopy("LIST".getBytes, 0, listWav, 12, 4)
    assert(Multimodal.parseHeader(listWav).isEmpty)
  }

  test("REAL PNG round-trip: pngEncoded → ImageIO → exact pixel recovery") {
    // pixel function with every value class: 0, 255, mid-range
    val px = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val bytes = Multimodal.pngEncoded(23, 17, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JDK ImageIO must accept the generated PNG")
    assert(img.getWidth == 23 && img.getHeight == 17)
    val r = img.getRaster
    for (y <- 0 until 17; x <- 0 until 23)
      assert(r.getSample(x, y, 0) == px(x, y), s"pixel ($x,$y)")
    // and through the decode kernel: exact integer sums
    val d = Multimodal.decodeReal("image/png", bytes).get
    val expSum = (for (y <- 0 until 17; x <- 0 until 23) yield px(x, y).toLong).sum
    assert(d.width == 23 && d.height == 17 &&
      d.unit_count == 23L * 17 && d.value_sum == expSum)
  }

  test("large incompressible PNG survives the deflate loop (no IDAT truncation)") {
    // pseudo-random pixels: compressed size exceeds any single fixed
    // buffer's slack (stored-block overhead), exercising the
    // multi-call deflate loop
    val px = (x: Int, y: Int) => ((x * 2654435761L + y * 40503L) >>> 13).toInt & 0xff
    val bytes = Multimodal.pngEncoded(600, 600, px)
    val d = Multimodal.decodeReal("image/png", bytes).get
    assert(d.width == 600 && d.height == 600 && d.unit_count == 360000L)
    val expSum = (for (y <- 0 until 600; x <- 0 until 600) yield px(x, y).toLong).sum
    assert(d.value_sum == expSum)
  }

  test("REAL WAV round-trip: wavBytes PCM16 → AudioSystem → exact sample sums") {
    val samples = (0 until 100).map(i => ((i * 11) % 4096 - 2048).toShort)
    val pcm = new Array[Byte](200)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val d = Multimodal.decodeReal("audio/wav",
      Multimodal.wavBytes(8000, 1, 16, pcm)).get
    assert(d.unit_count == 100L)
    assert(d.value_sum == samples.map(_.toLong).sum) // negatives sign-extend
  }

  test("decodeReal drops unsupported and corrupt media, never throws") {
    assert(Multimodal.decodeReal("video/mp4",
      Multimodal.mp4Bytes("isom", Array.emptyByteArray)).isEmpty)
    assert(Multimodal.decodeReal("image/png", "garbage".getBytes).isEmpty)
    assert(Multimodal.decodeReal("audio/wav", "garbage".getBytes).isEmpty)
    // a real table with all three classes: mp4 rows dropped, rest decoded
    val docs = Seq((0L, ""), (1L, ""), (2L, ""), (3L, "")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeRealTable(Multimodal.realMedia(docs))
      .collect().map(r => r.doc_id -> r.media_type).toMap
    assert(decoded == Map(0L -> "image/png", 1L -> "audio/wav", 3L -> "image/png"))
  }

  test("ImageDedup: dHash through the real decode equals the formula, partners pair") {
    import graft.operators.ImageDedup
    // hand-compute the dHash straight from the pixel formula (no PNG,
    // no decode) — the decoded path must land on the same bits
    def refDhash(id: Long, shift: Long): Long = {
      val w = (8 + id % 16).toInt
      val h = (8 + (id / 3) % 16).toInt
      def v(x: Int, y: Int): Long =
        (id * 31 + x * 7 + y * 13 + (id % 7) * x * y + shift) % 256
      var fp = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val py = y * h / 8
        if (v((x + 1) * w / 9, py) > v(x * w / 9, py))
          fp |= 1L << (y * 8 + x)
      }
      fp
    }
    for (id <- Seq(0L, 5L, 13L, 100L)) {
      val w = (8 + id % 16).toInt
      val h = (8 + (id / 3) % 16).toInt
      val png = Multimodal.pngEncoded(w, h, (x, y) =>
        ((id * 31 + x * 7 + y * 13 + (id % 7) * x * y) % 256).toInt)
      assert(ImageDedup.dhashFromImage(png).contains(refDhash(id, 0)),
        s"decoded dHash must equal the formula dHash for id $id")
    }
    // garbage bytes drop, never throw
    assert(ImageDedup.dhashFromImage("not a png".getBytes).isEmpty)
    // end-to-end: brightness-shifted partners land within small Hamming
    // distance and the blocking recovers every pair the threshold keeps
    val docs = (0L until 30L).map((_, "")).toDF("doc_id", "text")
    val fps = ImageDedup.fingerprints(Multimodal.dhashMedia(docs))
    val pairs = ImageDedup.hammingPairs(fps, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val planted = pairs.filter(p => p._2 == p._1 + 40000L)
    assert(planted.nonEmpty, "some brightness-shifted partner must pair")
    assert(planted.forall(_._3 <= 3))
    // recall check: every planted pair with true Hamming ≤ 3 is found
    val trueClose = (0L until 30L by 2).filter { id =>
      java.lang.Long.bitCount(refDhash(id, 0) ^ refDhash(id, 2)) <= 3
    }.toSet
    assert(planted.map(_._1).toSet == trueClose,
      "pigeonhole blocking must have exact recall at Hamming ≤ 3")
  }

  test("ImageDedup incremental: partners match their base, novel images report brute-force truth") {
    import graft.operators.ImageDedup
    def refDhash(bid: Long, shift: Long, fm: Int): Long = {
      val w = (8 + bid % 16).toInt
      val h = (8 + (bid / 3) % 16).toInt
      def v(x: Int, y: Int): Long =
        if (fm == 0) (bid * 31 + x * 7 + y * 13 + (bid % 7) * x * y + shift) % 256
        else (bid * 53 + x * 11 + y * 17 + (bid % 5) * x * y + 3) % 256
      var fp = 0L
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val py = yy * h / 8
        if (v((xx + 1) * w / 9, py) > v(xx * w / 9, py)) fp |= 1L << (yy * 8 + xx)
      }
      fp
    }
    val docs = (0L until 24L).map((_, "")).toDF("doc_id", "text")
    val got = ImageDedup.incrementalMatches(
        ImageDedup.fingerprints(Multimodal.dhashEpoch(docs)),
        ImageDedup.fingerprints(Multimodal.dhashIncoming(docs)), 3)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 24, "one verdict per incoming image")
    val epoch = (0L until 24L).map(id => id -> refDhash(id, 0, 0)).toMap
    for (id <- 0L until 24L) {
      val (inId, fp) =
        if (id % 2 == 0) (id + 40000L, refDhash(id, 2, 0))
        else (id + 50000L, refDhash(id, 0, 1))
      val truth = epoch.values.count(e => java.lang.Long.bitCount(e ^ fp) <= 3)
      assert(got(inId)._2 == truth,
        s"incoming $inId: got ${got(inId)._2} matches, brute force says $truth")
    }
  }

  test("AudioDedup: decoded fingerprint equals the formula, exact blocking recall") {
    import graft.operators.AudioDedup
    def refFp(bid: Long, pert: Boolean): Long = {
      val n = (64 + bid % 64).toInt
      val v = (0 until n).map(i => (bid * 37 + i * 11 + i.toLong * i * (1 + bid % 13)) % 4096 - 2048 +
        (if (pert && i % 13 == 0) 7 else 0))
      val sums = (0 until 33).map { b =>
        val s = b * n / 33; val e = (b + 1) * n / 33
        ((s until e).map(v).sum, (e - s).toLong)
      }
      (0 until 32).foldLeft(0L) { (fp, b) =>
        if (sums(b + 1)._1 * sums(b)._2 > sums(b)._1 * sums(b + 1)._2)
          fp | (1L << b) else fp
      }
    }
    val docs = (0L until 30L).map((_, "")).toDF("doc_id", "text")
    val fps = AudioDedup.fingerprints(Multimodal.audioMedia(docs))
      .as[(Long, Long)].collect().toMap
    for (id <- 0L until 30L) {
      assert(fps(id) == refFp(id, pert = false),
        s"decoded fp must equal formula fp for id $id")
      if (id % 2 == 0)
        assert(fps(id + 40000L) == refFp(id, pert = true))
    }
    assert(AudioDedup.fingerprintFromWav("garbage".getBytes).isEmpty)
    // exact recall: blocking finds precisely the brute-force ≤3 pairs
    val pairs = AudioDedup.hammingPairs(
        AudioDedup.fingerprints(Multimodal.audioMedia(docs)), 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    val all = fps.toSeq
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute, "pigeonhole blocking must have exact recall at Hamming ≤ 3")
  }

  test("AudioDedup incremental: partners match their base, novel chirps report brute-force truth") {
    import graft.operators.AudioDedup
    def refFp(bid: Long, kind: Int): Long = {
      val n = (64 + bid % 64).toInt
      val v = (0 until n).map { i =>
        val base =
          if (kind == 2) (bid * 41 + i * 13 + i.toLong * i * (2 + bid % 11)) % 4096 - 2048
          else (bid * 37 + i * 11 + i.toLong * i * (1 + bid % 13)) % 4096 - 2048
        base + (if (kind == 1 && i % 13 == 0) 7 else 0)
      }
      val sums = (0 until 33).map { b =>
        val st = b * n / 33; val e = (b + 1) * n / 33
        ((st until e).map(v).sum, (e - st).toLong)
      }
      (0 until 32).foldLeft(0L) { (fp, b) =>
        if (sums(b + 1)._1 * sums(b)._2 > sums(b)._1 * sums(b + 1)._2)
          fp | (1L << b) else fp
      }
    }
    val docs = (0L until 24L).map((_, "")).toDF("doc_id", "text")
    val got = AudioDedup.incrementalMatches(
        AudioDedup.fingerprints(Multimodal.audioEpoch(docs)),
        AudioDedup.fingerprints(Multimodal.audioIncoming(docs)), 3)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 24)
    val epoch = (0L until 24L).map(id => refFp(id, 0))
    for (id <- 0L until 24L) {
      val (inId, fp) =
        if (id % 2 == 0) (id + 40000L, refFp(id, 1))
        else (id + 50000L, refFp(id, 2))
      val truth = epoch.count(e => java.lang.Long.bitCount(e ^ fp) <= 3)
      assert(got(inId)._2 == truth,
        s"incoming $inId: got ${got(inId)._2}, brute force says $truth")
    }
    // every perturbed partner must actually be recovered (the formula
    // was chosen so the sparse perturbation stays within Hamming 3)
    for (id <- 0L until 24L by 2)
      assert(got(id + 40000L)._2 >= 1, s"partner of $id must match its base")
  }

  test("VideoDedup: stub-frame fingerprint equals the formula, exact blocking recall") {
    import graft.operators.VideoDedup
    def refFp(text: String, pert: Boolean): Option[Long] = {
      val header = Seq(0, 0, 0, 12, 102, 116, 121, 112, 105, 115, 111, 109)
      val payload = text.getBytes("UTF-8").zipWithIndex.map { case (b, i) =>
        (b & 0xff) + (if (pert && i % 31 == 0) 1 else 0)
      }
      val cs = header ++ payload
      val nf = cs.length / 4
      if (nf < 33) return None
      val sig = (0 until nf).map(k => (0 until 4).map(j => cs(4 * k + j).toLong).sum)
      val sums = (0 until 33).map { b =>
        val st = b * nf / 33; val e = (b + 1) * nf / 33
        ((st until e).map(sig).sum, (e - st).toLong)
      }
      Some((0 until 32).foldLeft(0L) { (fp, b) =>
        if (sums(b + 1)._1 * sums(b)._2 > sums(b)._1 * sums(b + 1)._2)
          fp | (1L << b) else fp
      })
    }
    val texts = (0L until 20L).map(i =>
      (i, ("the quick brown fox jumps over lazy dogs " * (4 + (i % 5).toInt))))
    val docs = texts.toDF("doc_id", "text")
    val fps = VideoDedup.fingerprints(Multimodal.videoMedia(docs))
      .as[(Long, Long)].collect().toMap
    for ((id, t) <- texts) {
      assert(fps.get(id) == refFp(t, pert = false),
        s"stub-decoded fp must equal formula fp for id $id")
      if (id % 2 == 0) assert(fps.get(id + 40000L) == refFp(t, pert = true))
    }
    // short payloads (< 33 frames) drop
    assert(VideoDedup.fingerprintFromStub("tiny".getBytes).isEmpty)
    assert(VideoDedup.fingerprintFromStub(null).isEmpty)
    // exact recall vs brute force
    val pairs = VideoDedup.hammingPairs(
        VideoDedup.fingerprints(Multimodal.videoMedia(docs)), 3)
      .as[(Long, Long, Int)].collect().map(pr => (pr._1, pr._2)).toSet
    val all = fps.toSeq
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)
  }

  test("headeredMedia fields are the documented doc_id functions") {
    val docs = Seq((0L, "abc"), (1L, "de"), (2L, "f"), (7L, "xyz"))
      .toDF("doc_id", "text")
    val got = Multimodal.extractHeaders(Multimodal.headeredMedia(docs))
      .as[(Long, String, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, "png", 16, 16, 3, 0, 3L)))
    assert(got(7L) == ((7L, "wav", 0, 0, 2, 16000, 3L))) // odd id → 16 kHz, 2ch
    assert(got(2L) == ((2L, "isom", 0, 0, 0, 0, 1L)))
    assert(got(1L) == ((1L, "wav", 0, 0, 2, 16000, 2L)))
  }
}
