package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B of the r22 per-row-work candidates (VERDICT r21
  * #3/#4): run at SPARK_GRAFT_SF_DIR via
  * `tools/run_tool.sh graft.tools.R22Tune 80g [q05|q03]`.
  *
  *  - q05: A = r21 production shape (groupBy n_name, nation+region probed
  *    per fact row) vs B = r22 candidate (groupBy c_nationkey int key,
  *    25-row nation⋈region dim joined onto the 25-row aggregate).
  *  - q03: A = r21 production (lineitem agg-first over ALL orders, then
  *    SHJ orders + broadcast customer drop 88%) vs B = join-first against
  *    the pre-joined o⋈c keys (the groupBy rides the join's orderkey
  *    exchange; combined date+segment selectivity ~12% applies BEFORE the
  *    aggregate's hash work).
  * Measurement tooling only.
  */
object R22Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty).map(sizeOf).sum
      else f.length
    val totalBytes = {
      val fs = Option(new java.io.File(sfDir).listFiles)
        .map(_.toSeq).getOrElse(Seq.empty)
      fs.filter(_.getName.endsWith(".parquet")).map(sizeOf).sum
    }
    val sp = math.max(4L, math.min(totalBytes / (8L << 20), cpus.toInt * 2L))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", (totalBytes > (256L << 20)).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes",
        math.max(8L << 20, totalBytes / (cpus.toInt * 3L)).toString)
      .config("spark.sql.files.minPartitionNum",
        math.max(1L, math.min(totalBytes / (4L << 20), cpus.toLong)).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // q05's production session (bloomChildSession) runs with these; set
      // them here so both A/B shapes see identical optimizer settings
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "256MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "5000000")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"tune sf=$sfDir sp=$sp bytes=$totalBytes aqe=${totalBytes > (256L << 20)}")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: Column) = floor(c * 100).cast("long")
    def big(n: String): Boolean = sizeOf(new java.io.File(s"$sfDir/$n.parquet")) > (64L << 20)
    def shjIfBig(n: String): DataFrame = {
      val df = tbl(n); if (big(n)) df.hint("shuffle_hash") else df
    }

    // --- q05, parameterized: false = r21 production, true = r22 candidate
    def q05(variant: Boolean): DataFrame = {
      val r = tbl("region"); val n = tbl("nation")
      val c = shjIfBig("customer"); val o = shjIfBig("orders")
      val su = tbl("supplier")
      val l = tbl("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
      val fact = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c,
          o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
      if (!variant) {
        fact
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_cents")).as("revenue_cents"))
          .orderBy(col("n_name"))
      } else {
        val nr = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        fact
          .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("c_nationkey"))
          .agg(sum(col("rev_cents")).as("revenue_cents"))
          .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("revenue_cents"))
          .orderBy(col("n_name"))
      }
    }

    // --- q03, parameterized: false = r21 production (agg-first),
    // true = join-first against o⋈c (agg rides the join exchange)
    def q03(variant: Boolean): DataFrame = {
      val c = tbl("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = tbl("orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      if (!variant) {
        val lrev = tbl("lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
        lrev.join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("l_orderkey"), col("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
      } else {
        val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(col("o_orderkey"))
        val l = tbl("lineitem").select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rc"))
        l.join(oc.hint("shuffle_hash"), l("l_orderkey") === oc("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("rc")).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
      }
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ab(name: String, mk: Boolean => DataFrame): Unit = {
      // sanity: identical results (sorted rows) before timing
      val ra = mk(false).collect().map(_.toString).sorted
      val rb = mk(true).collect().map(_.toString).sorted
      require(ra.sameElements(rb), s"$name A/B results differ!")
      println(s"$name results identical (${ra.length} rows)")
      noop(mk(false)); noop(mk(true)); noop(mk(false)); noop(mk(true))
      // per-PAIR steal metering: storms on this host flap at ~20 s scale,
      // so a sitting-level grade hides which pairs were clean — report
      // every (tA, tB, steal) triple and quiet-pair aggregates
      def steal(): Long =
        try {
          val src = scala.io.Source.fromFile("/proc/stat")
          try src.getLines().find(_.startsWith("cpu "))
            .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
          finally src.close()
        } catch { case _: Exception => -1L }
      val pairs = scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]()
      for (_ <- 1 to 12) {
        val s0 = steal()
        var t0 = System.nanoTime(); noop(mk(false)); val tA = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); noop(mk(true)); val tB = (System.nanoTime() - t0) / 1e9
        pairs += ((tA, tB, steal() - s0))
      }
      pairs.foreach { case (a, b, s) => println(f"$name pair A=$a%.3f B=$b%.3f steal=$s") }
      val quiet = pairs.filter(_._3 <= 100)
      def st(xs: Seq[Double]) =
        if (xs.isEmpty) "n/a"
        else f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
      println(s"$name A r21-prod: all ${st(pairs.map(_._1).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._1).toSeq)}")
      println(s"$name B r22-cand: all ${st(pairs.map(_._2).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._2).toSeq)}")
      // plan fingerprints of the candidate (bloom fired? join strategies?)
      val p = mk(true).queryExecution.executedPlan.toString
      println(s"$name B plan: might_contain=${p.contains("might_contain")} " +
        s"SHJ=${p.contains("ShuffledHashJoin")} BHJ=${p.contains("BroadcastHashJoin")} " +
        s"exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size}")
    }
    val which = args.headOption.getOrElse("all")
    if (which == "all" || which == "q05") ab("q05", q05)
    if (which == "all" || which == "q03") ab("q03", q03)
    spark.stop()
  }
}
