package graft

import org.apache.spark.sql.SparkSession

/** Config-sweep harness for the bench gate: runs the 11 shared headline
  * queries under a grid of runtime-settable configs in ONE JVM (so
  * JIT/codegen caches are equally warm) and prints per-config totals.
  * Not part of the driver contract — a tuning tool for Bench defaults.
  */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shared = Seq("q01_agg_pricing", "q03_join_topn", "q05_join5_agg",
      "q06_selective_sum", "q08_window_running", "q23_count_distinct",
      "q25_events_hourly", "dd01_exact_dup_groups", "dd03_minhash_lsh_pairs",
      "sim01_cosine_topk", "tx01_tokens")
    val qs = SparkEntry.queries

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    shared.foreach(runOne); shared.foreach(runOne) // warm

    for {
      aqe <- Seq("true", "false")
      sp <- Seq("32", "64", "96")
      mpb <- Seq("8m", "16m")
    } {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      shared.foreach(runOne) // per-config warm
      val times = shared.map(n => n -> (1 to 2).map(_ => runOne(n)).min)
      val total = times.map(_._2).sum
      val detail = times.map { case (n, t) => f"${n.take(8)}=$t%.3f" }.mkString(" ")
      println(f"aqe=$aqe%-5s sp=$sp%-3s mpb=$mpb%-4s total=$total%.3f  $detail")
    }
    spark.stop()
  }
}
