package graft

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Crypto
import graft.sources.{LocalKeyService, SnapshotFixture}

class CryptoSpec extends AnyFunSuite {

  private def b64(bytes: Array[Byte]) = Base64.getEncoder.encodeToString(bytes)

  // deterministic pseudo-random byte arrays (no scalacheck bridge on the
  // offline classpath; seeded java.util.Random is property-testing enough)
  private def cases: Seq[Array[Byte]] = {
    val rnd = new java.util.Random(42)
    Seq(0, 1, 15, 16, 17, 1000, 65536).map { n =>
      val a = new Array[Byte](n); rnd.nextBytes(a); a
    }
  }

  test("aesCtr is an involution: decrypt(encrypt(x)) == x, sizes 0..64k") {
    val keyB64 = b64(Array.fill[Byte](16)(7))
    val ivB64 = b64(Array.fill[Byte](16)(3))
    cases.foreach { arr =>
      assert(Crypto.aesCtr(Crypto.aesCtr(arr, keyB64, ivB64), keyB64, ivB64)
        .sameElements(arr), s"size ${arr.length}")
    }
  }

  test("aesCtr with a different IV does not round-trip") {
    val keyB64 = b64(Array.fill[Byte](16)(7))
    val iv1 = b64(Array.fill[Byte](16)(1))
    val iv2 = b64(Array.fill[Byte](16)(2))
    val msg = "attack at dawn".getBytes(StandardCharsets.UTF_8)
    assert(!Crypto.aesCtr(Crypto.aesCtr(msg, keyB64, iv1), keyB64, iv2)
      .sameElements(msg))
  }

  test("gunzip(gzip(x)) == x") {
    cases.foreach { arr =>
      assert(Crypto.gunzip(Crypto.gzip(arr)).sameElements(arr), s"size ${arr.length}")
    }
  }

  test("LocalKeyService decrypts what it encrypted") {
    val plain = SnapshotFixture.dataKeyB64("db.core.claimant")
    val cipher = LocalKeyService.encryptKey("key-1", plain)
    assert(cipher != plain)
    assert(LocalKeyService.decryptKey("key-1", cipher) == plain)
  }

  test("empty gzip payload is the reference's 20-byte stream") {
    // SuccessServiceImpl.kt:97-104 posts a 20-byte empty gzip
    assert(Crypto.emptyGzip.length == 20)
    assert(Crypto.gunzip(Crypto.emptyGzip).isEmpty)
  }
}
