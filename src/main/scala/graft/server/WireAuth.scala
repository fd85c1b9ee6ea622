package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64

import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (public specs: RFC 5802 SCRAM, RFC 7677
  * SHA-256 variant, and the PostgreSQL "SASL Authentication" protocol
  * pages) shared by [[WireServer]]'s backend exchange and
  * [[WireClient]]'s frontend side — both sides computing from the same
  * primitives is exactly how the algorithm is meant to be checked, since
  * every value is keyed off the two nonces and the shared password.
  *
  * The reference serves trust-auth only (cmd/main/main.go:68 — the
  * psql-wire default); auth here is beyond-parity surface for real
  * deployments.
  */
object WireAuth {

  val Mechanism = "SCRAM-SHA-256"
  val Iterations = 4096 // RFC 7677 minimum recommendation

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(UTF_8))
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Hi(password, salt, i) = PBKDF2-HMAC-SHA256, 32-byte output. */
  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] =
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(
        new PBEKeySpec(password.toCharArray, salt, iterations, 256))
      .getEncoded

  def clientKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Client Key")
  def serverKey(salted: Array[Byte]): Array[Byte] = hmac(salted, "Server Key")
  def storedKey(ck: Array[Byte]): Array[Byte] = sha256(ck)

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "xor operand length mismatch")
    Array.tabulate(a.length)(i => (a(i) ^ b(i)).toByte)
  }

  /** Printable random nonce (base64 of 18 bytes — no ',' or '=' issues:
    * base64 alphabet excludes the attribute separators). */
  def freshNonce(rnd: SecureRandom): String = {
    val b = new Array[Byte](18)
    rnd.nextBytes(b)
    b64(b)
  }

  /** Parse "k1=v1,k2=v2,..." SCRAM attributes; values keep any '='
    * (base64 padding) because only the FIRST '=' per segment splits. */
  def attrs(message: String): Map[Char, String] =
    message.split(",").iterator
      .filter(s => s.length >= 2 && s.charAt(1) == '=')
      .map(s => s.charAt(0) -> s.substring(2))
      .toMap
}
