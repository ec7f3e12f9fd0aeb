package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** tx31's multi-round BPE trainer vs an INDEPENDENT driver-side reference
  * implementation (plain greedy leftmost merge over Vector[String]) on an
  * adversarial fixture the real corpus never exercises:
  *
  *  - self-pair runs ("aaaaaa" → best pair (a,a): overlapping eligible
  *    positions, where the every-other-from-run-head closed form and the
  *    fold's pos-skip must both pick {1,3,5});
  *  - later rounds adopting pairs that CONTAIN a merged symbol (the
  *    re-segmentation feedback the static-vocab queries can't reach);
  *  - frequency ties broken lexicographically.
  *
  * The oracle-side SQL twin (bpeRoundSql) is gated cross-engine by the
  * driver; this spec pins the SPARK side to true BPE semantics. */
class Tx31Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h28(sym: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sym.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }

  /** Reference greedy BPE trainer: per round, count adjacent symbol pairs
    * weighted by word frequency, adopt the max (ties lexicographic), and
    * re-segment with leftmost non-overlapping merges. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, Long, Long, Long)] = {
    var segs: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, seg) <- segs; i <- 0 until seg.length - 1)
        counts((seg(i), seg(i + 1))) =
          counts.getOrElse((seg(i), seg(i + 1)), 0L) + words(w)
      val ((a, b), total) =
        counts.toSeq.minBy { case ((pa, pb), t) => (-t, pa, pb) }
      segs = segs.map { case (w, seg) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i < seg.length - 1 && seg(i) == a && seg(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += seg(i); i += 1 }
        }
        w -> out.result()
      }
      val nTok = segs.map { case (w, seg) => words(w) * seg.length }.sum
      val ck = segs.map { case (w, seg) => words(w) * seg.map(h28).sum }.sum
      (r, a + b, total, nTok, ck)
    }
  }

  test("tx31 equals reference greedy BPE on self-pair runs, merged-symbol pairs, and ties") {
    // "aaaaaa" dominates round 1 with the SELF-pair (a,a) — 5 eligible
    // positions per word, greedy must take {1,3,5}; round 2's best is
    // then (aa,aa), a pair of MERGED symbols; "xy"/"yx" add an exact
    // frequency tie at the tail rounds
    val fixture = Seq(
      (1L, "aaaaaa aaaaaa aaaaaa banana"),
      (2L, "aaaaaa banana cabana xy yx"),
      (3L, "aaaaa abab xy yx banana"),
      (4L, "aaaaaa abab banana cabana"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tx31_")
    fixture.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val words = fixture.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val want = refTrain(words, 3)

    val q = TextDedup.defs.find(_.name == "tx31_bpe_train3").get
    val got = q.run(spark, dir.toString)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the fixture really exercised the adversarial regimes
    assert(want.head._2 == "aa", "round 1 should adopt the self-pair")
    assert(want(1)._2 == "aaaa", "round 2 should merge two merged symbols")
    TempDirs.deleteRecursively(dir)
  }

  test("tx31 trainer terminates gracefully when a round finds no pair (ADVICE r15)") {
    // every word collapses to ONE symbol after 2 merges ("ab","abc");
    // asking for 10 rounds used to throw ArrayIndexOutOfBounds on the
    // empty argmax collect — it must instead stop with the certificate
    // rows of the rounds that DID adopt a merge
    val docs = Seq((1L, "ab abc ab"), (2L, "abc ab abc")).toDF("doc_id", "text")
    val got = TextDedup.bpeTrainRounds(docs, 10)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(got.size < 10, "exhausted corpus must terminate early")
    assert(got.nonEmpty && got.map(_._1) == (1 to got.size),
      s"certificate rounds must be the contiguous adopted prefix: $got")
    // the adopted merges fully reduce this vocabulary
    assert(got.map(_._2).toSet == Set("ab", "abc"), s"unexpected merges: $got")
  }

  test("tx32 serve ledger equals the reference trainer's final segmentation") {
    // the trained-encode ledger must be EXACTLY what the reference
    // trainer's round-3 segmentation implies, per language, occurrence-
    // weighted — pins the train→serve composition, not just the trainer
    val fixture = Seq(
      (1L, "aaaaaa aaaaaa banana", "en"), (2L, "aaaaaa banana cabana", "de"),
      (3L, "aaaaa abab banana", "en"), (4L, "abab banana cabana", "de"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tx32_")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val words = fixture.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    // reference: re-run the merges, keep the final segmentation
    var segs: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to 3) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, seg) <- segs; i <- 0 until seg.length - 1)
        counts((seg(i), seg(i + 1))) =
          counts.getOrElse((seg(i), seg(i + 1)), 0L) + words(w)
      val ((a, b), _) =
        counts.toSeq.minBy { case ((pa, pb), t) => (-t, pa, pb) }
      segs = segs.map { case (w, seg) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i < seg.length - 1 && seg(i) == a && seg(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += seg(i); i += 1 }
        }
        w -> out.result()
      }
    }
    val want = fixture.flatMap { case (_, t, l) =>
      t.split(" ").filter(_.nonEmpty).map(w => (l, w)) }
      .groupBy(_._1).map { case (l, ws) =>
        (l, ws.size.toLong, ws.map(_._2.length.toLong).sum,
          ws.map { case (_, w) => segs(w).length.toLong }.sum,
          ws.map { case (_, w) => segs(w).map(h28).sum }.sum)
      }.toSeq.sortBy(_._1)

    val q = TextDedup.defs.find(_.name == "tx32_trained_encode").get
    val got = q.run(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    TempDirs.deleteRecursively(dir)
  }
}
