package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic single-query probe: `Test/runMain graft.QProbe q1 q2 ...`
  * runs each named SparkEntry query at SPARK_GRAFT_SF_DIR under the
  * sf10 measurement convention (local[32], shuffle.partitions=64, noop
  * sink, warmed best-of-3) and prints one JSON line per query. Not part
  * of the driver contract — a measurement tool.
  */
object QProbe {
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
        java.nio.file.Files.createTempDirectory("graft_qprobe_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_STAGES=1: print per-stage task counts + wall for the
    // LAST timed run — where did the time go, and was the scan parallel
    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, String)]()
    if (sys.env.contains("SPARK_GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stages.synchronized {
            stages += ((si.stageId, si.numTasks,
              si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
              si.name.take(50)))
          }
        }
      })

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val qs = SparkEntry.queries
    args.foreach { name =>
      val mk = () => qs(name)(spark, sfDir)
      noop(mk()) // warm
      val ts = (1 to 3).map { i =>
        if (i == 3) {
          // listener events arrive on an async bus: let run 2's tail drain
          // before clearing, or it lands inside run 3's window
          Thread.sleep(500); stages.synchronized(stages.clear())
        }
        val t0 = System.nanoTime(); noop(mk()); (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500) // same drain before reading run 3's stages
      println(f"""{"q":"$name","best":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
      stages.synchronized(stages.sortBy(-_._3).take(10).toList)
        .foreach { case (id, n, ms, nm) =>
          println(f"  stage $id%4d tasks=$n%3d ${ms / 1000.0}%7.2f s  $nm") }
    }
    spark.stop()
  }
}
