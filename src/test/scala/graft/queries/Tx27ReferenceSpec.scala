package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent reference gate for tx27's greedy BPE encode: a direct
  * imperative Scala implementation of greedy longest-match-first
  * tokenization (the textbook loop, nothing shared with the query's
  * `aggregate` fold OR the oracle's gaps-and-islands SQL) must reproduce
  * the query's per-doc counts and token checksum exactly on real data.
  * Three algorithmically independent derivations agreeing — fold, islands
  * SQL, and this loop — is the strongest equivalence evidence available
  * without a proof assistant.
  */
class Tx27ReferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def h28(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(4).map("%02x".format(_)).mkString.take(7), 16)
  }

  /** The textbook greedy loop: at pos i emit the 2-char merge if it is in
    * the vocab, else the single char. Returns (ntok, nmerge, cksum). */
  private def greedy(word: String, vocab: Set[String]): (Long, Long, Long) = {
    var pos = 0; var ntok = 0L; var nmerge = 0L; var ck = 0L
    while (pos < word.length) {
      if (pos + 1 < word.length && vocab(word.substring(pos, pos + 2))) {
        ck += h28(word.substring(pos, pos + 2)); nmerge += 1; pos += 2
      } else {
        ck += h28(word.substring(pos, pos + 1)); pos += 1
      }
      ntok += 1
    }
    (ntok, nmerge, ck)
  }

  test("tx27 query == direct imperative greedy reference on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // reference vocab: top-50 pairs by corpus frequency, (total desc, pair)
    val words = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
    val pairCounts = new scala.collection.mutable.HashMap[String, Long]()
    words.filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + 1L
      }
    }
    val vocab = pairCounts.toSeq
      .sortBy { case (p, n) => (-n, p) }.take(50).map(_._1).toSet
    // reference per-doc ledger
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val encs = ws.map(greedy(_, vocab))
      (id, ws.length.toLong, encs.map(_._1).sum, encs.map(_._2).sum,
        encs.map(_._3).sum)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = graft.SparkEntry.queries("tx27_bpe_encode")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.length == expect.length, s"${got.length} vs ${expect.length} docs")
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"doc ${e._1}: query $g vs reference $e")
    }
  }
}
