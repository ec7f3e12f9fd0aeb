package graft.core

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HKDF-SHA256 (RFC 5869). age uses it for the X25519 wrap key, the header
  * HMAC key, and the payload key (labels per the age v1 spec). */
object Hkdf {
  private def hmac(key: Array[Byte], data: Array[Byte]*): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    val k = if (key.isEmpty) new Array[Byte](32) else key
    mac.init(new SecretKeySpec(k, "HmacSHA256"))
    data.foreach(mac.update)
    mac.doFinal()
  }

  def extract(salt: Array[Byte], ikm: Array[Byte]): Array[Byte] = hmac(salt, ikm)

  def expand(prk: Array[Byte], info: Array[Byte], len: Int): Array[Byte] = {
    require(len <= 255 * 32, "HKDF output too long")
    val out = new Array[Byte](len)
    var t = Array.emptyByteArray
    var pos = 0
    var counter = 1
    while (pos < len) {
      t = hmac(prk, t, info, Array(counter.toByte))
      val n = math.min(t.length, len - pos)
      System.arraycopy(t, 0, out, pos, n)
      pos += n
      counter += 1
    }
    out
  }

  def derive(ikm: Array[Byte], salt: Array[Byte], info: String, len: Int): Array[Byte] =
    expand(extract(salt, ikm), info.getBytes("UTF-8"), len)

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = hmac(key, data)
}
