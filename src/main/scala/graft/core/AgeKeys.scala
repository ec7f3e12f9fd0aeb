package graft.core

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{ChaCha20ParameterSpec, SecretKeySpec}

/** age key encoding/parsing + keypair generation.
  *
  * Behavior mirrors /root/reference rust/src/lib.rs:27-37 (`age_keygen`:
  * fresh X25519 identity, bech32 "age1…" recipient / "AGE-SECRET-KEY-1…"
  * identity) and rust/src/lib.rs:307-359 (`age_keygen_from_seed`). The
  * reference's from_seed ignores the seed (rust/src/lib.rs:345-353, known
  * TODO); we implement the documented *intent* (FUNCTIONS.md:504):
  * SHA-256(seed) keys a ChaCha20 stream whose first 32 bytes, RFC
  * 7748-clamped, become the private scalar — fully deterministic.
  */
object AgeKeys {
  val RecipientHrp = "age"
  val IdentityHrp = "age-secret-key-"
  val RecipientPrefix = "age1"
  val IdentityPrefix = "AGE-SECRET-KEY-1"

  final case class KeyPair(publicKey: String, privateKey: String)

  def encodeRecipient(publicU: Array[Byte]): String =
    Bech32.encode(RecipientHrp, publicU)

  def encodeIdentity(scalar: Array[Byte]): String =
    Bech32.encode(IdentityHrp, scalar).toUpperCase

  /** Parse an "age1…" recipient → 32-byte public u-coordinate. */
  def parseRecipient(s: String): Either[String, Array[Byte]] =
    Bech32.decode(s) match {
      case Right((RecipientHrp, bytes)) if bytes.length == 32 => Right(bytes)
      case Right(_)  => Left("not an age recipient")
      case Left(err) => Left(err)
    }

  /** Parse an "AGE-SECRET-KEY-1…" identity → 32-byte private scalar. */
  def parseIdentity(s: String): Either[String, Array[Byte]] =
    Bech32.decode(s) match {
      case Right((IdentityHrp, bytes)) if bytes.length == 32 => Right(bytes)
      case Right(_)  => Left("not an age identity")
      case Left(err) => Left(err)
    }

  def generate(): KeyPair = {
    val (priv, pub) = X25519.generateKeyPair()
    KeyPair(encodeRecipient(pub), encodeIdentity(priv))
  }

  /** Deterministic keypair from arbitrary seed bytes (see scaladoc above). */
  def fromSeed(seed: Array[Byte]): KeyPair = {
    val hash = MessageDigest.getInstance("SHA-256").digest(seed)
    val cipher = Cipher.getInstance("ChaCha20")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(hash, "ChaCha20"),
      new ChaCha20ParameterSpec(new Array[Byte](12), 0))
    val scalar = X25519.clamp(cipher.doFinal(new Array[Byte](32)))
    KeyPair(encodeRecipient(X25519.derivePublic(scalar)), encodeIdentity(scalar))
  }
}
