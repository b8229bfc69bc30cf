package graft.sources

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Cipher

import graft.functions.Crypto

/** Envelope data-key resolution (reference: HttpKeyService.kt:43-101).
  *
  * The reference POSTs each (keyId, ciphertextDataKey) pair to an external
  * Data Key Service with a per-key memo cache and exponential-backoff
  * retry. In Spark the cache becomes structural: the pipeline resolves
  * `distinct(keyId, cipherTextKey)` — a handful of rows — on the driver
  * and broadcast-joins the plaintext back (SURVEY.md §3.2). The trait is
  * the seam where a real HTTP client would plug in; retry/backoff lives
  * in [[Retry]] so any impl gets it.
  */
trait KeyService extends Serializable {
  /** @return base64 plaintext data key */
  def decryptKey(keyId: String, cipherTextKeyB64: String): String
}

/** Retry with exponential backoff (reference defaults: 5 attempts, 1 s,
  * ×2 — HttpKeyService.kt:37-40). */
object Retry {
  def withBackoff[T](attempts: Int = 5, initialDelayMs: Long = 1000, multiplier: Double = 2.0)(
      f: => T): T = {
    var delay = initialDelayMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        // NonFatal only: OOM/interrupt must propagate immediately, not
        // burn 5 sleep-backoff attempts masking a cancellation
        case scala.util.control.NonFatal(e) =>
          last = e
          i += 1
          if (i < attempts) {
            try Thread.sleep(delay)
            catch {
              case ie: InterruptedException =>
                Thread.currentThread().interrupt(); throw ie
            }
            delay = (delay * multiplier).toLong
          }
      }
    }
    throw last
  }
}

/** Local deterministic stand-in for the DKS: the master key for `keyId`
  * is sha256(keyId) truncated to 16 bytes; the ciphertext data key is
  * AES-ECB(master, plaintextKey). Mirrors envelope encryption honestly
  * while staying self-contained (the real service is an HTTP call —
  * reference HttpKeyService.kt:53-61). */
object LocalKeyService extends KeyService {
  def masterKey(keyId: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256")
      .digest(keyId.getBytes(StandardCharsets.UTF_8)).take(16)

  def encryptKey(keyId: String, plaintextKeyB64: String): String =
    Base64.getEncoder.encodeToString(
      Crypto.aesEcb(Cipher.ENCRYPT_MODE,
        Base64.getDecoder.decode(plaintextKeyB64), masterKey(keyId)))

  override def decryptKey(keyId: String, cipherTextKeyB64: String): String =
    Retry.withBackoff(attempts = 5, initialDelayMs = 1) {
      Base64.getEncoder.encodeToString(
        Crypto.aesEcb(Cipher.DECRYPT_MODE,
          Base64.getDecoder.decode(cipherTextKeyB64), masterKey(keyId)))
    }
}
