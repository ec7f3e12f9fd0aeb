package graft.core

/** scrypt KDF (RFC 7914) — required for the age v1 `scrypt` recipient
  * stanza (passphrase encryption). The reference extension supports only
  * X25519 recipients; this completes the age spec's second stanza type.
  * Implementation is the RFC construction verbatim: PBKDF2-HMAC-SHA256
  * (JDK) around ROMix/BlockMix with the Salsa20/8 core, all little-endian
  * 32-bit lanes. Verified against the RFC 7914 §12 test vectors.
  */
object Scrypt {

  /** scrypt(P=passphrase bytes, S=salt, N, r, p, dkLen). */
  def derive(passphrase: Array[Byte], salt: Array[Byte],
             n: Int, r: Int, p: Int, dkLen: Int): Array[Byte] = {
    require(n > 1 && (n & (n - 1)) == 0, "scrypt N must be a power of two > 1")
    val mfLen = 128 * r
    val b = pbkdf2(passphrase, salt, p * mfLen)
    val out = new Array[Byte](p * mfLen)
    var i = 0
    while (i < p) {
      val block = toIntsLE(b, i * mfLen, mfLen)
      roMix(block, n, r)
      fromIntsLE(block, out, i * mfLen)
      i += 1
    }
    pbkdf2(passphrase, out, dkLen)
  }

  // PBKDF2-HMAC-SHA256 with c=1 (both invocations in RFC 7914 use c=1).
  // The JDK PBEKeySpec takes char[]; its UTF-8 encoding of ASCII/BMP chars
  // matches the byte passphrase for all practical inputs, but to keep the
  // byte-level RFC semantics exact we run HMAC manually instead.
  private def pbkdf2(pass: Array[Byte], salt: Array[Byte], dkLen: Int): Array[Byte] = {
    val out = new Array[Byte](dkLen)
    val nBlocks = (dkLen + 31) / 32
    var i = 1
    var off = 0
    while (i <= nBlocks) {
      val block = Hkdf.hmacSha256(pass,
        salt ++ Array[Byte](
          (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte))
      val len = math.min(32, dkLen - off)
      System.arraycopy(block, 0, out, off, len)
      off += len
      i += 1
    }
    out
  }

  private def toIntsLE(b: Array[Byte], off: Int, len: Int): Array[Int] = {
    val out = new Array[Int](len / 4)
    var i = 0
    while (i < out.length) {
      val o = off + i * 4
      out(i) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      i += 1
    }
    out
  }

  private def fromIntsLE(ints: Array[Int], out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < ints.length) {
      val v = ints(i); val o = off + i * 4
      out(o) = v.toByte; out(o + 1) = (v >>> 8).toByte
      out(o + 2) = (v >>> 16).toByte; out(o + 3) = (v >>> 24).toByte
      i += 1
    }
  }

  /** ROMix in place over a 32r-int block. */
  private def roMix(block: Array[Int], n: Int, r: Int): Unit = {
    val len = 32 * r
    val v = new Array[Int](n * len)
    val x = block.clone()
    val y = new Array[Int](len)
    var i = 0
    while (i < n) {
      System.arraycopy(x, 0, v, i * len, len)
      blockMix(x, y, r)
      i += 1
    }
    i = 0
    while (i < n) {
      val j = x(len - 16) & (n - 1) // integerify: first LE word of last 64B block
      var k = 0
      val base = j * len
      while (k < len) { x(k) ^= v(base + k); k += 1 }
      blockMix(x, y, r)
      i += 1
    }
    System.arraycopy(x, 0, block, 0, len)
  }

  /** BlockMix_salsa8: b (32r ints) -> shuffled output, in place via scratch y. */
  private def blockMix(b: Array[Int], y: Array[Int], r: Int): Unit = {
    val x = new Array[Int](16)
    System.arraycopy(b, (2 * r - 1) * 16, x, 0, 16)
    var i = 0
    while (i < 2 * r) {
      var k = 0
      while (k < 16) { x(k) ^= b(i * 16 + k); k += 1 }
      salsa8(x)
      System.arraycopy(x, 0, y, i * 16, 16)
      i += 1
    }
    // even blocks first, then odd
    i = 0
    while (i < r) {
      System.arraycopy(y, 2 * i * 16, b, i * 16, 16)
      System.arraycopy(y, (2 * i + 1) * 16, b, (r + i) * 16, 16)
      i += 1
    }
  }

  private def salsa8(b: Array[Int]): Unit = {
    val x = b.clone()
    var i = 0
    @inline def rotl(v: Int, c: Int): Int = (v << c) | (v >>> (32 - c))
    while (i < 8) {
      // column rounds
      x(4) ^= rotl(x(0) + x(12), 7); x(8) ^= rotl(x(4) + x(0), 9)
      x(12) ^= rotl(x(8) + x(4), 13); x(0) ^= rotl(x(12) + x(8), 18)
      x(9) ^= rotl(x(5) + x(1), 7); x(13) ^= rotl(x(9) + x(5), 9)
      x(1) ^= rotl(x(13) + x(9), 13); x(5) ^= rotl(x(1) + x(13), 18)
      x(14) ^= rotl(x(10) + x(6), 7); x(2) ^= rotl(x(14) + x(10), 9)
      x(6) ^= rotl(x(2) + x(14), 13); x(10) ^= rotl(x(6) + x(2), 18)
      x(3) ^= rotl(x(15) + x(11), 7); x(7) ^= rotl(x(3) + x(15), 9)
      x(11) ^= rotl(x(7) + x(3), 13); x(15) ^= rotl(x(11) + x(7), 18)
      // row rounds
      x(1) ^= rotl(x(0) + x(3), 7); x(2) ^= rotl(x(1) + x(0), 9)
      x(3) ^= rotl(x(2) + x(1), 13); x(0) ^= rotl(x(3) + x(2), 18)
      x(6) ^= rotl(x(5) + x(4), 7); x(7) ^= rotl(x(6) + x(5), 9)
      x(4) ^= rotl(x(7) + x(6), 13); x(5) ^= rotl(x(4) + x(7), 18)
      x(11) ^= rotl(x(10) + x(9), 7); x(8) ^= rotl(x(11) + x(10), 9)
      x(9) ^= rotl(x(8) + x(11), 13); x(10) ^= rotl(x(9) + x(8), 18)
      x(12) ^= rotl(x(15) + x(14), 7); x(13) ^= rotl(x(12) + x(15), 9)
      x(14) ^= rotl(x(13) + x(12), 13); x(15) ^= rotl(x(14) + x(13), 18)
      i += 2
    }
    i = 0
    while (i < 16) { b(i) += x(i); i += 1 }
  }
}
