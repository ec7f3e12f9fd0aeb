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
    // cumulative: train r rounds end-to-end, so per-round = delta
    var prev = 0.0
    for (r <- Seq(1, 2, 3, 5, 7, 10).filter(_ <= nRounds)) {
      val t0 = System.nanoTime()
      val rows = graft.queries.TextDedup.bpeTrainRounds(docs, r).collect()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"""{"rounds":$r,"total":$t%.3f,"delta_vs_prev":${t - prev}%.3f,"last_pair":"${rows.last.getString(1)}","n_tokens":${rows.last.getLong(3)}}""")
      prev = t
    }
    spark.stop()
  }
}
