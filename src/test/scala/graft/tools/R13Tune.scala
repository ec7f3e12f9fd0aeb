package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf10 closure experiment for graph08 (VERDICT r12 #5): the
  * heaviest absolute runtime in the repo (256 s, 2.7×). Candidates:
  *
  *  - shipped: bounded (cust, part) self-join on part → groupBy(ca, cb)
  *    (two data-sized exchanges: part, then the wedge rows on (ca, cb)).
  *  - listexplode: pre-aggregate to (part → sorted cust list) and emit
  *    each part's C(n,2) pairs with one nested-transform explode — the
  *    self-join machinery replaced by array work inside one task; the
  *    wedge exchange on (ca, cb) remains.
  *  - packedkey: listexplode + pairs packed into ONE long (ca<<32 | cb,
  *    custkeys < 2^31) so the wedge exchange carries half the key bytes
  *    and partial aggregation hashes one word.
  *
  * Best-of-3 warmed wall-clock, identical row counts asserted. Not part
  * of the driver contract.
  */
object R13Tune {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def bounded: DataFrame = {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val cp = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      val small = cp.groupBy("part").count()
        .filter(col("count") <= 40).select("part")
      cp.join(small, "part")
    }

    def finish(common: DataFrame): DataFrame = {
      val sz = bounded.groupBy(col("cust").as("node")).agg(count(lit(1)).as("n"))
      common
        .join(sz.as("sa"), col("ca") === col("sa.node"))
        .join(sz.as("sb"), col("cb") === col("sb.node"))
        .select(col("ca"), col("cb"), col("c"),
          floor(col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")) * 10000)
            .cast("long").as("jac_x1e4"))
        .filter(col("jac_x1e4") >= 1000)
    }

    def shipped: DataFrame = {
      val b = bounded
      val common = b.as("a").join(b.as("b"),
          col("a.part") === col("b.part") && col("a.cust") < col("b.cust"))
        .groupBy(col("a.cust").as("ca"), col("b.cust").as("cb"))
        .agg(count(lit(1)).as("c"))
      finish(common)
    }

    def listexplode: DataFrame = {
      val common = bounded
        .groupBy("part").agg(sort_array(collect_list(col("cust"))).as("cs"))
        .select(explode(expr(
          """flatten(transform(cs, (x, i) ->
               transform(slice(cs, i + 2, size(cs)), y ->
                 named_struct('ca', x, 'cb', y))))""")).as("p"))
        .groupBy(col("p.ca").as("ca"), col("p.cb").as("cb"))
        .agg(count(lit(1)).as("c"))
      finish(common)
    }

    def packedkey: DataFrame = {
      val common = bounded
        .groupBy("part").agg(sort_array(collect_list(col("cust"))).as("cs"))
        .select(explode(expr(
          """flatten(transform(cs, (x, i) ->
               transform(slice(cs, i + 2, size(cs)), y ->
                 shiftleft(x, 32) + y)))""")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .select(shiftright(col("k"), 32).as("ca"),
          (col("k") % (1L << 32)).as("cb"), col("c"))
      finish(common)
    }

    val all = Map(
      "shipped" -> (() => shipped),
      "listexplode" -> (() => listexplode),
      "packedkey" -> (() => packedkey))
    // args: variant names (one JVM per variant keeps runs independent —
    // the 3-variant single-JVM form OOM'd from accumulated churn at 48g);
    // "rows" instead runs all three once and asserts identical results.
    val mode = if (args.isEmpty) Seq("shipped") else args.toSeq
    if (mode == Seq("rows")) {
      val counts = all.map { case (n, mk) => n -> mk().count() }
      println(s"row counts: $counts")
      require(counts.values.toSet.size == 1, "variants disagree!")
    } else {
      // noop write, R12Probe's convention — comparable with the 256 s
      // r12 graph08 measurement
      def run(df: DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      mode.foreach { name =>
        run(all(name)()) // warm
        val rs = (1 to 2).map(_ => run(all(name)()))
        println(f"$name%-14s best ${rs.min}%.1fs")
      }
    }
    spark.stop()
  }
}
