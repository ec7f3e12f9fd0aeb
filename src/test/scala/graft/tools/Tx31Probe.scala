package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-round cost of the tx31 BPE trainer beyond the gate's 3 rounds
  * (VERDICT r14 #3's BENCH_SCALING ask): run R rounds at sf10m and time
  * the incremental cost of each round's certificate materialization —
  * linear per-round cost is the "could train a tokenizer" evidence
  * (DuckDB's CTE re-inlining makes the same loop exponential). */
object Tx31Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val nRounds = sys.env.getOrElse("TX31_ROUNDS", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    if (sys.env.getOrElse("TX31_MODE", "curve") == "train") {
      // TRAIN mode (VERDICT r15 #5): one end-to-end run of >=64 merge
      // rounds producing an actual merges.txt vocab artifact, with every
      // round's certificate checked against the two exact invariants of
      // greedy leftmost non-overlapping BPE:
      //   (1) n_tokens strictly decreases each round, and
      //   (2) the decrease is in (0, pair_total] — equal only when no
      //       adopted occurrence overlapped another (pair_total counts
      //       ALL adjacent occurrences; greedy merges a non-overlapping
      //       subset of them).
      // This is the all-rounds correctness gate the DuckDB oracle can't
      // afford (its CTE re-inlining is quadratic in rounds); the 3-round
      // prefix stays cross-engine-gated by tx31 itself.
      val outDir = sys.env.getOrElse("TX31_OUT", "/root/repo/bench")
      val t0 = System.nanoTime()
      val rows = graft.queries.TextDedup.bpeTrainRounds(docs, nRounds).collect()
      val total = (System.nanoTime() - t0) / 1e9
      var ok = true; var prevTok = Long.MaxValue
      rows.foreach { r =>
        val (tok, tot) = (r.getLong(3), r.getLong(2))
        if (prevTok != Long.MaxValue) {
          val red = prevTok - tok
          if (!(red > 0 && red <= tot)) {
            ok = false
            println(s"INVARIANT VIOLATION round ${r.getInt(0)}: reduction $red vs pair_total $tot")
          }
        }
        prevTok = tok
      }
      val merges = rows.map(_.getString(1))
      val mf = java.nio.file.Paths.get(outDir, s"tx31_merges_${merges.length}.txt")
      java.nio.file.Files.write(mf, merges.mkString("\n").getBytes("UTF-8"))
      println(f"""{"mode":"train","rounds":${rows.length},"requested":$nRounds,"total_sec":$total%.3f,"sec_per_round":${total / rows.length}%.3f,"invariants_ok":$ok,"final_n_tokens":${rows.last.getLong(3)},"merges_file":"$mf","first_merges":"${merges.take(8).mkString(" ")}"}""")
      require(ok, "per-round BPE certificate invariants violated")
    } else {
      // cumulative: train r rounds end-to-end, so per-round = delta
      var prev = 0.0
      for (r <- Seq(1, 2, 3, 5, 7, 10).filter(_ <= nRounds)) {
        val t0 = System.nanoTime()
        val rows = graft.queries.TextDedup.bpeTrainRounds(docs, r).collect()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"""{"rounds":$r,"total":$t%.3f,"delta_vs_prev":${t - prev}%.3f,"last_pair":"${rows.last.getString(1)}","n_tokens":${rows.last.getLong(3)}}""")
        prev = t
      }
    }
    spark.stop()
  }
}
