package graft.sources

import java.nio.file.{Files, Paths}
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Mutual-TLS client material (reference SecureHttpClientProvider.kt:30-80:
  * identity keystore = the client certificate presented to the server,
  * trust store = the CAs/certs the client accepts from the server; both
  * the NiFi delivery wire and the DKS key wire ride the same provider).
  *
  * Holds PATHS + passwords, not the stores themselves: instances ride
  * `foreachPartition` closures to executors, where [[sslContext]] loads
  * the material from the executor-local filesystem once per JVM (the
  * deployment ships keystores via `--files`/secret mounts). `keyPassword`
  * defaults to the store password (the reference separates them —
  * identity.key.password vs identity.store.password).
  *
  * Unlike the reference there is no alias pin: the JDK KeyManager offers
  * every key entry and servers pick by issuer — single-entry client
  * stores (the deployed shape) behave identically. */
final case class TlsConfig(
    identityStore: String,
    identityStorePassword: String,
    trustStore: String,
    trustStorePassword: String,
    keyPassword: Option[String] = None,
    storeType: String = "PKCS12") extends Serializable {

  private def load(path: String, password: String): KeyStore = {
    val ks = KeyStore.getInstance(storeType)
    val in = Files.newInputStream(Paths.get(path))
    try ks.load(in, password.toCharArray) finally in.close()
    ks
  }

  /** Fresh SSLContext from the on-disk material. Callers hold it in a
    * `@transient lazy val` so each executor builds exactly one. */
  def sslContext: SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(identityStore, identityStorePassword),
      keyPassword.getOrElse(identityStorePassword).toCharArray)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(load(trustStore, trustStorePassword))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers,
      new java.security.SecureRandom())
    ctx
  }
}
