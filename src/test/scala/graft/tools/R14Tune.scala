package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 sf10 measurement harness (VERDICT r13 #1/#4/#5/#3):
  *
  *  - q03/q05 shipped vs their bucketed variants' QUERY phase (q59/q60),
  *    with the one-time bucketed build timed separately — the
  *    amortization decomposition BENCH_SCALING records;
  *  - tx01 re-pair (the only r12→r13 regression) and tx28 after the
  *    native repetition_stats rewrite;
  *  - stream15 after the bucketed FpIndex rework.
  *
  * Conventions: local[32], shuffle.partitions=64, noop sink, warmed
  * best-of-3 (stream15: single timed run — it is itself a multi-batch
  * loop). Not part of the driver contract.
  */
object R14Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_r14_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(mk: => DataFrame): Unit = {
      noop(mk) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"q":"$name","best":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    def once(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime(); noop(mk)
      println(f"""{"q":"$name","best":${(System.nanoTime() - t0) / 1e9}%.3f,"runs":1}""")
    }

    val qs = SparkEntry.queries

    // shipped baselines, same session
    best3("q01_agg_pricing") { qs("q01_agg_pricing")(spark, sfDir) }
    best3("q03_join_topn") { qs("q03_join_topn")(spark, sfDir) }
    best3("q05_join5_agg") { qs("q05_join5_agg")(spark, sfDir) }

    // one-time bucketed build (the amortized cost), then query-only
    // phases — the SAME query bodies the gate's q59/q60 run and
    // PlanShapeSpec locks (graft.queries.Relational), only the bucket
    // count differs (64 at sf10 vs the gate queries' 8)
    val tb0 = System.nanoTime()
    graft.queries.Relational.buildOrderkeyBucketedTables(
      spark, sfDir, "b_lineitem", "b_orders", nb = 64, withSuppkey = true)
    println(f"""{"q":"bucketed_build","best":${(System.nanoTime() - tb0) / 1e9}%.3f,"runs":1}""")

    best3("q59_query_only") {
      graft.queries.Relational.q59QueryPhase(spark, sfDir, "b_lineitem", "b_orders")
    }
    best3("q60_query_only") {
      graft.queries.Relational.q60QueryPhase(spark, sfDir, "b_lineitem", "b_orders")
    }

    best3("tx01_tokens") { qs("tx01_tokens")(spark, sfDir) }
    best3("tx28_repetition_filter") { qs("tx28_repetition_filter")(spark, sfDir) }
    once("stream15_incremental_index") { qs("stream15_incremental_index")(spark, sfDir) }

    spark.stop()
  }
}
