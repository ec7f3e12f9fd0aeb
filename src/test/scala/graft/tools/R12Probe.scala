package graft

import org.apache.spark.sql.SparkSession

/** One-off sf10 probe for the round-12 measurements: best-of-3 warmed
  * wall-clock for the fused sim11 (VERDICT r11 #6) and any extra names
  * passed as args. Not part of the driver contract. */
object R12Probe {
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
      .config("spark.sql.warehouse.dir",
        graft.queries.TempDirs.create("graft-warehouse"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else Seq("sim11_matryoshka_recall")
    val qs = SparkEntry.queries
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      try {
        run(n); run(n) // warm: JIT + codegen + footer caches
        val best = (1 to 3).map(_ => run(n)).min
        println(f"$n%-28s $best%.2fs")
      } catch { case e: Throwable => println(s"$n FAIL ${e.getMessage}") }
    }
    spark.stop()
  }
}
