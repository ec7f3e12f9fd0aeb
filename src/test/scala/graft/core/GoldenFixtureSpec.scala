package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden wire-format fixtures: ciphertexts committed once (round 2) under
  * src/test/resources/golden and decrypted here every round. Any regression
  * in header parsing, HKDF labels/salts, payload chunking, or armor breaks
  * these — the cross-round lock the age CLI interop test would otherwise
  * provide (the container has no age binary; VERDICT r1 "What's missing" #2).
  *
  * Keypairs are seed-derived (AgeKeys.fromSeed "golden-fixture-seed[-2]"),
  * so key derivation is ALSO pinned: fromSeed drifting breaks decryption.
  */
class GoldenFixtureSpec extends AnyFunSuite {
  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def keys(file: String): (String, String) = {
    val Array(pub, priv) = new String(res(file), "UTF-8").trim.split("\n")
    (pub, priv)
  }

  private val (pub1, priv1) = keys("keypair.txt")
  private val (pub2, priv2) = keys("keypair2.txt")
  private def id(priv: String) = AgeKeys.parseIdentity(priv).toOption.get

  private val smallPt = Array.tabulate[Byte](1024)(i => (i % 256).toByte)
  private val largePt = Array.tabulate[Byte](130 * 1024)(i => ((i * 31 + 7) % 256).toByte)

  test("seeded keypair derivation is stable across rounds") {
    val kp = AgeKeys.fromSeed("golden-fixture-seed".getBytes("UTF-8"))
    assert(kp.publicKey == pub1 && kp.privateKey == priv1)
    val kp2 = AgeKeys.fromSeed("golden-fixture-seed-2".getBytes("UTF-8"))
    assert(kp2.publicKey == pub2 && kp2.privateKey == priv2)
  }

  test("golden small ciphertext decrypts (single chunk, all byte values)") {
    assert(java.util.Arrays.equals(AgeFormat.decrypt(res("small.age"), id(priv1)), smallPt))
  }

  test("golden large ciphertext decrypts (64K chunk boundaries)") {
    assert(java.util.Arrays.equals(AgeFormat.decrypt(res("large.age"), id(priv1)), largePt))
  }

  test("golden armored ciphertext decrypts via auto-detect") {
    assert(java.util.Arrays.equals(AgeFormat.decrypt(res("small.age.txt"), id(priv1)), smallPt))
  }

  test("golden multi-recipient ciphertext decrypts with either identity") {
    val ct = res("multi.age")
    assert(java.util.Arrays.equals(AgeFormat.decrypt(ct, id(priv1)), smallPt))
    assert(java.util.Arrays.equals(AgeFormat.decrypt(ct, id(priv2)), smallPt))
  }

  test("golden passphrase (scrypt stanza) ciphertext decrypts") {
    assert(java.util.Arrays.equals(
      AgeFormat.decryptWithPassphrase(res("passphrase.age"), "golden-passphrase"),
      smallPt))
  }

  // Cross-IMPLEMENTATION fixtures (r16d): ciphertexts produced by the
  // independent Python age-v1 implementation (tools/age_interop.py —
  // OpenSSL-backed primitives, written from the public spec, zero shared
  // code) and committed here. Every round the JDK-stack decryptor must
  // read them byte-exactly — the standing two-stack wire-format lock that
  // caught the scrypt salt-label bug (AgeFormat.scala r16d). Plaintexts
  // are AgeInteropLane's deterministic `pt(n, seed)` ladder (shared
  // definition — a ladder change + fixture regen can't silently drift).
  private def interopPt(n: Int, seed: Int) = graft.tools.AgeInteropLane.pt(n, seed)

  test("python-encrypted multi-recipient ciphertext decrypts (both identities)") {
    val ct = res("python_multi.age")
    val want = interopPt(200001, 5)
    val kp1 = AgeKeys.fromSeed("interop-seed-1".getBytes("UTF-8"))
    val kp2 = AgeKeys.fromSeed("interop-seed-2".getBytes("UTF-8"))
    assert(java.util.Arrays.equals(AgeFormat.decrypt(ct, id(kp1.privateKey)), want))
    assert(java.util.Arrays.equals(AgeFormat.decrypt(ct, id(kp2.privateKey)), want))
  }

  test("python-encrypted scrypt-passphrase ciphertext decrypts") {
    val ct = res("python_pass.age")
    assert(java.util.Arrays.equals(
      AgeFormat.decryptWithPassphrase(ct, "interop pass-phrase"),
      interopPt(70000, 7)))
  }

  test("golden header structure: v1 magic, X25519 stanzas, mac line") {
    val header = new String(res("small.age").takeWhile(_ != 0).take(200), "UTF-8")
    assert(header.startsWith("age-encryption.org/v1\n"))
    assert(header.contains("-> X25519 "))
    val multi = new String(res("multi.age").take(400), "UTF-8")
    assert(multi.split("-> X25519 ").length == 3) // two recipient stanzas
  }
}
