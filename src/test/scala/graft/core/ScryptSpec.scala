package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RFC 7914 §12 test vectors for the scrypt KDF, plus the age scrypt-stanza
  * (passphrase) encryption path built on it. The 2^20 RFC vector is skipped
  * (1 GiB ROMix scratch). */
class ScryptSpec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("RFC 7914 vector 1: empty password/salt, N=16") {
    val dk = Scrypt.derive("".getBytes, "".getBytes, 16, 1, 1, 64)
    assert(dk.sameElements(hex("""
      77 d6 57 62 38 65 7b 20 3b 19 ca 42 c1 8a 04 97
      f1 6b 48 44 e3 07 4a e8 df df fa 3f ed e2 14 42
      fc d0 06 9d ed 09 48 f8 32 6a 75 3a 0f c8 1f 17
      e8 d3 e0 fb 2e 0d 36 28 cf 35 e2 0c 38 d1 89 06""")))
  }

  test("RFC 7914 vector 2: password/NaCl, N=1024 r=8 p=16") {
    val dk = Scrypt.derive("password".getBytes, "NaCl".getBytes, 1024, 8, 16, 64)
    assert(dk.sameElements(hex("""
      fd ba be 1c 9d 34 72 00 78 56 e7 19 0d 01 e9 fe
      7c 6a d7 cb c8 23 78 30 e7 73 76 63 4b 37 31 62
      2e af 30 d9 2e 22 a3 88 6f f1 09 27 9d 98 30 da
      c7 27 af b9 4a 83 ee 6d 83 60 cb df a2 cc 06 40""")))
  }

  test("RFC 7914 vector 3: pleaseletmein/SodiumChloride, N=16384 r=8 p=1") {
    val dk = Scrypt.derive("pleaseletmein".getBytes, "SodiumChloride".getBytes,
      16384, 8, 1, 64)
    assert(dk.sameElements(hex("""
      70 23 bd cb 3a fd 73 48 46 1c 06 cd 81 fd 38 eb
      fd a8 fb ba 90 4f 8e 3e a9 b5 43 f6 54 5d a1 f2
      d5 43 29 55 61 3f 0f cf 62 d4 97 05 24 2a 9a f9
      e6 1e 85 dc 0d 65 1e 40 df cf 01 7b 45 57 58 87""")))
  }

  test("age passphrase roundtrip, armored variant, all byte values") {
    val pt = Array.tabulate[Byte](1024)(i => (i % 256).toByte)
    val ct = AgeFormat.encryptWithPassphrase(pt, "correct horse battery", logN = 10)
    assert(java.util.Arrays.equals(
      AgeFormat.decryptWithPassphrase(ct, "correct horse battery"), pt))
    val armored = AgeFormat.armor(ct).getBytes("UTF-8")
    assert(java.util.Arrays.equals(
      AgeFormat.decryptWithPassphrase(armored, "correct horse battery"), pt))
  }

  test("scrypt stanza structure: sole stanza, salt + log2(N) args") {
    val ct = AgeFormat.encryptWithPassphrase("x".getBytes, "pw", logN = 10)
    val header = new String(ct.take(120), "UTF-8")
    assert(header.startsWith("age-encryption.org/v1\n-> scrypt "))
    val args = header.split('\n')(1).split(' ')
    assert(args.length == 4 && args(3) == "10") // "->", "scrypt", salt, logN
  }

  test("wrong passphrase and wrong-path decryption fail with age error messages") {
    val ct = AgeFormat.encryptWithPassphrase("data".getBytes, "right", logN = 10)
    val e1 = intercept[AgeInvalidInputException](
      AgeFormat.decryptWithPassphrase(ct, "wrong"))
    assert(e1.getMessage.contains("incorrect passphrase"))
    // X25519 identity against an scrypt file: no matching stanza
    val kp = AgeKeys.generate()
    val id = AgeKeys.parseIdentity(kp.privateKey).toOption.get
    val e2 = intercept[AgeInvalidInputException](AgeFormat.decrypt(ct, id))
    assert(e2.getMessage.contains("no matching key found"))
    // passphrase against an X25519 file: no scrypt stanza
    val pub = AgeKeys.parseRecipient(kp.publicKey).toOption.get
    val xct = AgeFormat.encrypt("data".getBytes, Seq(pub))
    val e3 = intercept[AgeInvalidInputException](
      AgeFormat.decryptWithPassphrase(xct, "pw"))
    assert(e3.getMessage.contains("no scrypt stanza found"))
  }

  test("hostile work factor is rejected") {
    // hand-build a header claiming logN=25 (32 GiB scratch): must refuse
    // before doing any KDF work
    val ct = AgeFormat.encryptWithPassphrase("x".getBytes, "pw", logN = 10)
    val text = new String(ct, "ISO-8859-1")
    val tampered = text.replaceFirst(" 10\n", " 25\n").getBytes("ISO-8859-1")
    val e = intercept[AgeInvalidInputException](
      AgeFormat.decryptWithPassphrase(tampered, "pw"))
    assert(e.getMessage.contains("scrypt work factor too large"))
  }
}
