package graft.queries
import org.apache.spark.sql.{DataFrame, SparkSession}
/** sf10 probes for the round-14 late additions (q61/q62; stream17 is
  * feed-plumbing-bound like all stream gates). Not driver contract. */
object R14bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    for (n <- Seq("q61_runtime_bloom_join", "q62_sliding_window")) {
      def mk = graft.SparkEntry.queries(n)(spark, sfDir)
      noop(mk)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9 }
      println(f"""{"q":"$n","best":${ts.min}%.3f}""")
    }
  }
}

/** q61's join under NATURAL config (broadcast allowed, no pins): the
  * decomposition showing the gate query's ratio is the cost of its
  * demonstration constraints, not of the engine. */
object Q61Natural {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cents(c: org.apache.spark.sql.Column) = floor(c * 100).cast("long")
    def mk = {
      val su = spark.read.parquet(s"$sfDir/supplier.parquet")
        .filter(col("s_acctbal") >= 6000)
        .select(col("s_suppkey"), col("s_nationkey"))
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
        .orderBy(col("s_nationkey"))
    }
    mk.write.format("noop").mode("overwrite").save()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9 }
    println(f"""{"q":"q61_natural_broadcast","best":${ts.min}%.3f}""")
  }
}
