package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Differential fuzz for the CdcChunks byte walker: 4000 seeded-random
  * documents (word runs, separator runs, unicode, degenerate shapes) ×
  * mods 1/2/8/13 checked against an INDEPENDENT reference built from the
  * JDK string API (`split(" ", -1)`, per-word md5-prefix boundary test,
  * imperative chunk accumulation, md5 over the re-joined chunk string,
  * `codePointCount` for n_chars) — no shared code with the walker.
  * Guards the field-boundary arithmetic, the h28 nibble extraction, the
  * incremental space-joined digest, and the UTF-8 char counting that the
  * fixed-case spec can only spot-check. */
class CdcChunksFuzzSpec extends AnyFunSuite {

  private def md5hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  private def referenceChunks(text: String, mod: Int): Seq[(Long, String, Int)] = {
    val words = text.split(" ", -1).filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    for (w <- words) {
      cur += w
      val h28 = java.lang.Long.parseLong(
        md5hex(w.getBytes("UTF-8")).substring(0, 7), 16)
      if (h28 % mod == 0) {
        val ctext = cur.mkString(" ")
        out += ((out.length.toLong, md5hex(ctext.getBytes("UTF-8")),
          ctext.codePointCount(0, ctext.length)))
        cur = scala.collection.mutable.ArrayBuffer.empty[String]
      }
    }
    if (cur.nonEmpty) {
      val ctext = cur.mkString(" ")
      out += ((out.length.toLong, md5hex(ctext.getBytes("UTF-8")),
        ctext.codePointCount(0, ctext.length)))
    }
    out.toSeq
  }

  test("walker matches the JDK-API reference on 4000 random documents × 4 mods") {
    val rnd = new scala.util.Random(20260815L)
    val alphabets = Array("abc", "xyäö", "日本語テスト", "a b", "  ", "!?.,", "\t\nq")
    var checked = 0
    for (_ <- 1 to 4000) {
      val n = rnd.nextInt(40)
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        val a = alphabets(rnd.nextInt(alphabets.length))
        val wl = rnd.nextInt(6)
        for (_ <- 0 until wl) sb.append(a.charAt(rnd.nextInt(a.length)))
        if (rnd.nextInt(4) > 0) sb.append(' ')
        if (rnd.nextInt(10) == 0) sb.append(' ') // separator runs
      }
      val text = sb.toString
      for (m <- Seq(1, 2, 8, 13)) {
        val got = CdcChunks.compute(UTF8String.fromString(text), m)
          .array.toSeq.map { e =>
            val r = e.asInstanceOf[GenericInternalRow]
            (r.getLong(0), r.getUTF8String(1).toString, r.getInt(2))
          }
        val want = referenceChunks(text, m)
        assert(got == want, s"mod=$m text=${text.take(80).replace(' ', '·')}")
        checked += 1
      }
    }
    assert(checked == 16000)
  }
}
