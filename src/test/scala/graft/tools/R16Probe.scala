package graft.tools

import org.apache.spark.sql.SparkSession

/** VERDICT r15 #3: decompose the sf0.1 per-query floor. For each headline
  * query (warmed), splits wall time into
  *   plan  = DataFrame construction + analysis + optimization + physical
  *           planning (forced via queryExecution.executedPlan)
  *   exec  = running the ALREADY-PLANNED query (toRdd re-run)
  *   noop  = the full Bench convention (fresh df + noop write), best-of-3
  * so "floor" claims become a measured split: if noop ≈ plan + exec and
  * plan dominates, the fix is planning-cost, not execution. */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.sql.files.minPartitionNum", "4")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = graft.SparkEntry.queries
    val names = graft.Bench.headline.filter(qs.contains)
    // warm everything twice (Bench convention)
    names.foreach(n => qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save())
    names.foreach(n => qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save())

    println(f"${"query"}%-26s ${"plan"}%8s ${"exec"}%8s ${"noop"}%8s")
    var (tp, te, tn) = (0.0, 0.0, 0.0)
    names.foreach { n =>
      val plan = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = qs(n)(spark, sfDir)
        df.queryExecution.executedPlan // force full planning
        (System.nanoTime() - t0) / 1e9
      }.min
      val df2 = qs(n)(spark, sfDir)
      val rdd = df2.queryExecution.toRdd
      val execT = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.runJob(rdd, (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
        })
        (System.nanoTime() - t0) / 1e9
      }.min
      val noop = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      tp += plan; te += execT; tn += noop
      println(f"$n%-26s $plan%8.3f $execT%8.3f $noop%8.3f")
    }
    println(f"${"TOTAL"}%-26s $tp%8.3f $te%8.3f $tn%8.3f")
    spark.stop()
  }
}
