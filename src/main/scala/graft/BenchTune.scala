package graft

import org.apache.spark.sql.SparkSession

/** Config-sweep harness for the sf0.1 bench gate: runs the 11 shared
  * headline queries under a grid of runtime-settable configs in ONE JVM
  * (so JIT/codegen caches are equally warm) and prints per-config totals,
  * plus a planning-vs-execution split to show where the fixed per-query
  * overhead lives. Not part of the driver contract — a tuning tool.
  */
object BenchTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
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

    // planning vs execution split: building + analyzing + optimizing +
    // physical planning happens driver-side before any task runs
    println("== plan/exec split (sp=4, aqe=off) ==")
    for (n <- shared) {
      val split = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = qs(n)(spark, sfDir)
        df.queryExecution.executedPlan // force full planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val plan = split.map(_._1).min; val ex = split.map(_._2).min
      println(f"$n%-24s plan=$plan%.3f exec=$ex%.3f")
    }

    for (cp <- Seq("true", "false")) {
      spark.conf.set("spark.sql.constraintPropagation.enabled", cp)
      shared.foreach(runOne)
      val times = shared.map(n => n -> (1 to 2).map(_ => runOne(n)).min)
      val total = times.map(_._2).sum
      println(f"constraintProp=$cp%-5s total=$total%.3f")
    }
    spark.stop()
  }
}
