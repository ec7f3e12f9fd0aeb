package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q05 regression bisect (r16d): the clean sf10m pair shows q05 at 4.9-5.2 s
  * vs r15's 3.6 s. Two things changed in r16: (a) the customer-side hint
  * became size-aware and customer (30 MB < the 64 MB broadcast threshold)
  * flipped from forced shuffle-hash to planner-chosen broadcast, and (b)
  * rev_cents moved to the scan. This lane isolates each. Not part of the
  * driver contract.
  */
object R16dTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = graft.queries.Tables.load(spark, sfDir, n)
    def cents(c: org.apache.spark.sql.Column) = floor(c * 100).cast("long")

    def q05(hintOrders: Boolean, hintCust: Boolean, scanCents: Boolean): DataFrame = {
      val r = t("region"); val n = t("nation"); val su = t("supplier")
      val c0 = t("customer"); val o0 = t("orders")
      val c = if (hintCust) c0.hint("shuffle_hash") else c0
      val o = if (hintOrders) o0.hint("shuffle_hash") else o0
      val l =
        if (scanCents)
          t("lineitem").select(col("l_orderkey"), col("l_suppkey"),
            cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
        else t("lineitem")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
      (if (scanCents) joined.agg(sum(col("rev_cents")).as("revenue_cents"))
       else joined.agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
         .as("revenue_cents")))
        .orderBy(col("n_name"))
    }

    val variants: Seq[(String, () => DataFrame)] =
      if (sys.env.get("R16D_MODE").contains("ab"))
        Seq(
          "A:shipped(c_bcast)" -> (() => q05(true, false, true)),
          "B:c_shuffle_hash" -> (() => q05(true, true, true)))
      else Seq(
        "shipped_r16(o_hint,c_bcast,scancents)" -> (() => q05(true, false, true)),
        "r15(o_hint,c_hint,postcents)" -> (() => q05(true, true, false)),
        "o_hint,c_hint,scancents" -> (() => q05(true, true, true)),
        "o_hint,c_bcast,postcents" -> (() => q05(true, false, false)),
        "aqe_only(nohints,scancents)" -> (() => q05(false, false, true)))

    // interleaved reps: alternate variants so machine-state drift (GC, page
    // cache, CPU clocks) hits both sides equally; report best + median
    variants.foreach { case (_, f) => f().write.format("noop").mode("overwrite").save() }
    val reps = sys.env.getOrElse("R16D_REPS", "3").toInt
    val acc = scala.collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        acc(name) = acc(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (name, _) =>
      val ts = acc(name).sorted
      println(f"[r16dtune] $name%-40s best ${ts.head}%.3f med ${ts(ts.size / 2)}%.3f  all ${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
