package graft.tools

import org.apache.spark.sql.SparkSession

/** r22 plan-artifact dumper: `Test/runMain graft.tools.R22Plans <suffix> [q...]`
  * builds a session with EXACTLY Bench's conf derivation for
  * SPARK_GRAFT_SF_DIR (so the committed plan text is the plan the bench
  * actually runs), then writes plans/r22/<query>_<suffix>.txt containing
  * `explain("formatted")` for each named query (default: the whole
  * headline list). Measurement tooling, not part of the driver contract.
  */
object R22Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // Bench's exact sizing rules (keep in sync with graft.Bench)
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

    val outDir = java.nio.file.Paths.get("plans/r22")
    java.nio.file.Files.createDirectories(outDir)
    val qs = graft.SparkEntry.queries
    names.filter(qs.contains).foreach { name =>
      val df = qs(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val hdr = s"-- $name  sf=$sfDir  sp=$shufflePartitions aqe=$aqe " +
        s"maxPartitionBytes=$maxPartitionBytes minPartitionNum=$minPartitionNum\n"
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (hdr + txt).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/r22/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
