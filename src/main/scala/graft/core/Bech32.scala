package graft.core

/** Bech32 (BIP-173) codec — the only hand-rolled codec the age key format
  * needs. age encodes X25519 recipients with HRP "age" (lowercase display)
  * and identities with HRP "age-secret-key-" (uppercase display).
  *
  * Reference behavior mirrored from the age spec (age-encryption.org/v1)
  * as exercised by /root/reference/test/sql/age.test:9-17 (key prefixes) and
  * rust/src/lib.rs:27-37 (bech32 encodings via the `age` crate).
  */
object Bech32 {
  private val Charset = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
  private val CharsetRev: Array[Byte] = {
    val rev = Array.fill[Byte](128)(-1)
    Charset.zipWithIndex.foreach { case (c, i) => rev(c.toInt) = i.toByte }
    rev
  }
  private val Gen = Array(0x3b6a57b2, 0x26508e6d, 0x1ea119fa, 0x3d4233dd, 0x2a1462b3)

  private def polymod(values: Array[Int]): Int = {
    var chk = 1
    var i = 0
    while (i < values.length) {
      val top = chk >>> 25
      chk = ((chk & 0x1ffffff) << 5) ^ values(i)
      var j = 0
      while (j < 5) {
        if (((top >>> j) & 1) != 0) chk ^= Gen(j)
        j += 1
      }
      i += 1
    }
    chk
  }

  private def hrpExpand(hrp: String): Array[Int] =
    hrp.map(_.toInt >>> 5).toArray ++ Array(0) ++ hrp.map(_.toInt & 31).toArray

  private def createChecksum(hrp: String, data: Array[Int]): Array[Int] = {
    val values = hrpExpand(hrp) ++ data ++ Array(0, 0, 0, 0, 0, 0)
    val mod = polymod(values) ^ 1 // bech32 constant (not bech32m)
    (0 until 6).map(i => (mod >>> (5 * (5 - i))) & 31).toArray
  }

  private def verifyChecksum(hrp: String, data: Array[Int]): Boolean =
    polymod(hrpExpand(hrp) ++ data) == 1

  /** 8-bit → 5-bit regrouping with padding (encode direction). */
  private def to5bit(data: Array[Byte]): Array[Int] = {
    val out = collection.mutable.ArrayBuffer[Int]()
    var acc = 0
    var bits = 0
    data.foreach { b =>
      acc = (acc << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) {
        bits -= 5
        out += (acc >>> bits) & 31
      }
    }
    if (bits > 0) out += (acc << (5 - bits)) & 31
    out.toArray
  }

  /** 5-bit → 8-bit regrouping, rejecting non-zero padding (decode direction). */
  private def to8bit(data: Array[Int]): Option[Array[Byte]] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    var acc = 0
    var bits = 0
    data.foreach { v =>
      acc = (acc << 5) | v
      bits += 5
      if (bits >= 8) {
        bits -= 8
        out += ((acc >>> bits) & 0xff).toByte
      }
    }
    if (bits >= 5 || ((acc << (8 - bits)) & 0xff) != 0) None
    else Some(out.toArray)
  }

  /** Encode `data` with the given (lowercase) HRP; returns lowercase string. */
  def encode(hrp: String, data: Array[Byte]): String = {
    val d5 = to5bit(data)
    val full = d5 ++ createChecksum(hrp, d5)
    hrp + "1" + full.map(Charset(_)).mkString
  }

  /** Decode; accepts all-lower or all-upper input. Returns (hrp, bytes). */
  def decode(s: String): Either[String, (String, Array[Byte])] = {
    if (s.exists(c => c < 33 || c > 126)) return Left("invalid character")
    val hasLower = s.exists(_.isLower)
    val hasUpper = s.exists(_.isUpper)
    if (hasLower && hasUpper) return Left("mixed case")
    val lower = s.toLowerCase
    val pos = lower.lastIndexOf('1')
    if (pos < 1 || pos + 7 > lower.length) return Left("invalid separator position")
    val hrp = lower.substring(0, pos)
    val dataPart = lower.substring(pos + 1)
    val data = new Array[Int](dataPart.length)
    var i = 0
    while (i < dataPart.length) {
      val c = dataPart.charAt(i)
      val v = if (c < 128) CharsetRev(c.toInt) else -1
      if (v < 0) return Left("invalid data character")
      data(i) = v
      i += 1
    }
    if (!verifyChecksum(hrp, data)) return Left("invalid checksum")
    to8bit(data.dropRight(6)) match {
      case Some(bytes) => Right((hrp, bytes))
      case None        => Left("invalid padding")
    }
  }
}
