package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r22 measurement probe: `tools/run_tool.sh graft.tools.R22Probe 80g q1 ...`
  * runs each named SparkEntry query at SPARK_GRAFT_SF_DIR under EXACTLY
  * Bench's conf derivation, noop sink, warmed best-of-3, and prints the
  * per-stage wall breakdown of the last run INCLUDING shuffle spill bytes
  * (VERDICT r21 #6: the dd08 band-SMJ sf10 memory-pressure probe needs
  * per-stage spill evidence). Measurement tooling only.
  */
object R22Probe {
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

    case class St(id: Int, tasks: Int, ms: Long, spillMem: Long, spillDisk: Long,
                  shWrite: Long, shRead: Long, name: String)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.numTasks,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            if (tm != null) tm.memoryBytesSpilled else -1L,
            if (tm != null) tm.diskBytesSpilled else -1L,
            if (tm != null) tm.shuffleWriteMetrics.bytesWritten else -1L,
            if (tm != null) tm.shuffleReadMetrics.totalBytesRead else -1L,
            si.name.take(60))
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
      val snap = stages.synchronized(stages.sortBy(_.id).toList)
      snap.foreach { s =>
        val spill = if (s.spillMem > 0 || s.spillDisk > 0)
          f"  SPILL mem=${s.spillMem / 1048576.0}%.1fMB disk=${s.spillDisk / 1048576.0}%.1fMB" else ""
        println(f"  stage ${s.id}%4d tasks=${s.tasks}%3d ${s.ms / 1000.0}%7.3f s " +
          f"shW=${s.shWrite / 1048576.0}%8.1fMB shR=${s.shRead / 1048576.0}%8.1fMB$spill  ${s.name}")
      }
      println(f"  stage-sum ${snap.map(_.ms).sum / 1000.0}%.3f s over ${snap.size} stages; " +
        f"spill-disk-total ${snap.map(_.spillDisk.max(0L)).sum / 1048576.0}%.1f MB")
    }
    spark.stop()
  }
}
