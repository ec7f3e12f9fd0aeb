package graft.tools

import org.apache.spark.sql.SparkSession

/** Scan-parallelism tune (r16d): Bench sizes maxPartitionBytes as
  * totalBytes/(cpus*3), which at sf10m (7.5 GB corpus) yields 78 MB —
  * lineitem (1.17 GB) then scans as ~15 tasks on 32 cores, leaving half
  * the machine idle through the scan stage of the q01/q06 class. This
  * lane re-times the scan-bound headline queries at several split sizes,
  * interleaved (GC/page-cache drift hits all variants equally).
  * Not part of the driver contract.
  */
object ScanParTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val names = sys.env.getOrElse("SCAN_QUERIES",
      "q01_agg_pricing,q06_selective_sum,q03_join_topn").split(',').toSeq
    val mpbs = sys.env.getOrElse("SCAN_MPB_MB", "78,32,16").split(',').map(_.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm each query once per split size
    mpbs.foreach { m =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", (m.toLong << 20).toString)
      names.foreach(run)
    }
    val acc = scala.collection.mutable.Map[(String, Int), Vector[Double]]()
      .withDefaultValue(Vector())
    val reps = sys.env.getOrElse("SCAN_REPS", "3").toInt
    (1 to reps).foreach { _ =>
      mpbs.foreach { m =>
        spark.conf.set("spark.sql.files.maxPartitionBytes", (m.toLong << 20).toString)
        names.foreach(n => acc((n, m)) = acc((n, m)) :+ run(n))
      }
    }
    names.foreach { n =>
      val row = mpbs.map { m =>
        val ts = acc((n, m)).sorted
        f"${m}MB best ${ts.head}%.2f med ${ts(ts.size / 2)}%.2f"
      }.mkString("  |  ")
      println(f"[scantune] $n%-22s $row")
    }
    spark.stop()
  }
}
