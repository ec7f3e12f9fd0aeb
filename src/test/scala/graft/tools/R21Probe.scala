package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r21 measurement probe: `Test/runMain graft.tools.R21Probe q1 q2 ...`
  * runs each named SparkEntry query at SPARK_GRAFT_SF_DIR under EXACTLY
  * Bench's conf derivation (same shuffle partitions / AQE / scan split
  * rules — QProbe's fixed sp=64+AQE measures a different plan than the
  * bench runs at small sf), noop sink, warmed best-of-3, and prints the
  * per-stage wall breakdown of the last run. Measurement tooling only.
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty).map(sizeOf).sum
      else f.length
    val totalBytes = {
      val root = new java.io.File(sfDir)
      val fs = Option(root.listFiles).map(_.toSeq).getOrElse(Seq.empty)
      fs.filter(_.getName.endsWith(".parquet")).map(sizeOf).sum
    }
    val shufflePartitions =
      math.max(4L, math.min(totalBytes / (8L << 20), cpus.toInt * 2L))
    val maxPartitionBytes = math.max(8L << 20, totalBytes / (cpus.toInt * 3L))
    val minPartitionNum =
      math.max(1L, math.min(totalBytes / (4L << 20), cpus.toLong))
    val aqe = totalBytes > (256L << 20)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes.toString)
      .config("spark.sql.files.minPartitionNum", minPartitionNum.toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"probe sf=$sfDir sp=$shufflePartitions aqe=$aqe bytes=$totalBytes")

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.name.take(60)))
        }
      }
    })

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val mk = () => qs(name)(spark, sfDir)
      noop(mk()); noop(mk()) // warm x2 (Bench warms twice)
      val ts = (1 to 3).map { i =>
        if (i == 3) { Thread.sleep(500); stages.synchronized(stages.clear()) }
        val t0 = System.nanoTime(); noop(mk()); (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500)
      println(f"""{"q":"$name","best":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
      val snap = stages.synchronized(stages.sortBy(_._1).toList)
      snap.foreach { case (id, n, ms, nm) =>
        println(f"  stage $id%4d tasks=$n%3d ${ms / 1000.0}%7.3f s  $nm") }
      println(f"  stage-sum ${snap.map(_._3).sum / 1000.0}%.3f s over ${snap.size} stages")
    }
    spark.stop()
  }
}
