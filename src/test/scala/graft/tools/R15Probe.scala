package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler._

/** Why is q68 (dual layout) slower than q60 (single layout + runtime
  * custkey shuffle) on sf10m? Prints both physical plans and per-stage
  * wall/task times (MhStageProbe's listener pattern). */
object R15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
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
        java.nio.file.Files.createTempDirectory("graft_r15p_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.queries.Relational.buildOrderkeyBucketedTables(
      spark, sfDir, "b_lineitem", "b_orders", nb = 64, withSuppkey = true)
    graft.queries.Relational.buildCustkeyBucketedTables(
      spark, sfDir, "b_orders_ck", "b_customer_ck", nb = 64)

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.put(si.stageId, (si.name.take(60), wall,
          si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })

    def run(name: String)(mk: => DataFrame): Unit = {
      val df = mk
      df.write.format("noop").mode("overwrite").save() // warm
      stages.clear()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name wall=$wall%.3f s")
      import scala.jdk.CollectionConverters._
      var shuffleTotal = 0L
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (nm, w, rt, nt, sw)) =>
        shuffleTotal += sw
        println(f"  stage $id%3d wall=${w / 1e3}%.2fs taskSum=${rt / 1e3}%.2fs tasks=$nt%3d shufW=${sw / 1e6}%.1fMB  $nm")
      }
      println(f"  TOTAL shuffle bytes written: ${shuffleTotal / 1e6}%.1f MB")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Scan") || l.contains("Sort") || l.contains("Aggregate"))
        .map(_.take(160)).mkString("\n"))
    }

    run("q60_query_only") {
      graft.queries.Relational.q60QueryPhase(spark, sfDir, "b_lineitem", "b_orders")
    }
    run("q68_query_only") {
      graft.queries.Relational.q60DualLayoutPhase(
        spark, sfDir, "b_lineitem", "b_orders_ck", "b_customer_ck")
    }
    // variant: SHUFFLE-HASH the l⋈oc join (build = orders-sized oc side)
    // so the lineitem probe streams with NO Sort node at all — tests
    // whether the SMJ's Sort over the bucket-sorted scan is a real cost
    run("q68_shj_variant") {
      import org.apache.spark.sql.functions._
      val o = spark.table("b_orders_ck")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = spark.table("b_customer_ck")
      val su = spark.read.parquet(s"$sfDir/supplier.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val oc = o.join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      spark.table("b_lineitem")
        .join(oc.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents")) // layout stores rev_cents (r16)
        .orderBy(col("n_name"))
    }
    // variant: q60 with the bucketed l⋈o as SHUFFLE-HASH instead of
    // merge — both sides are bucket-distributed already, so SHJ needs
    // no exchange AND no Sort nodes (the SMJ sorts, even over
    // bucket-sorted files, still pay UnsafeExternalSorter insertion)
    run("q60_shj_variant") {
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val su = spark.read.parquet(s"$sfDir/supplier.parquet")
      val o = spark.table("b_orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      spark.table("b_lineitem")
        .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .join(c.hint("shuffle_hash"),
          col("o_custkey") === c("c_custkey") &&
            su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents")) // layout stores rev_cents (r16)
        .orderBy(col("n_name"))
    }
    // and q59 with SHJ on the bucketed join (aggregate already rides
    // the bucket distribution; the merge hint forced SMJ + sorts)
    run("q59_shj_variant") {
      import org.apache.spark.sql.functions._
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = spark.table("b_orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val lrev = spark.table("b_lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev_cents")).as("revenue_cents")) // layout stores rev_cents (r16)
      lrev.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }
    spark.stop()
  }
}
