package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** graph15's independent cross-check (VERDICT r19 #1): run the exact
  * integer fixed-point PageRank (graft.queries.GraphQueries — the engine
  * under test) and GraphX's staticPageRank over the SAME symmetrized
  * cust%4 co-purchase graph, rescale GraphX's float ranks by the
  * fixed-point init (base/n — both use the 0.15/0.85 update, GraphX in
  * the sum-to-N convention, ours in base-scaled sum-to-1), and require
  * LABEL-FOR-LABEL agreement within float tolerance. The DuckDB oracle
  * certifies the integer recurrence bit-for-bit; THIS lane certifies the
  * recurrence is PageRank — an independently-implemented Pregel engine
  * converging to the same vector on a skewed natural graph.
  *
  * Env: SPARK_GRAFT_SF_DIR (default localdata/sf1).
  */
object Graph15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // the engine under test: the full rank vector behind graph15's cert
    val (intRanks, tInt) = time {
      graft.queries.GraphQueries.integerPageRank(spark, sfDir, custMod = 4)
        .localCheckpoint()
    }
    val n = intRanks.count()
    val init = 1000000000000L / n

    // independent implementation: GraphX staticPageRank on the same edges
    val pairs = graft.graph.GraphOps.coPurchasePairs(spark, sfDir, custMod = 4)
      .select(col("src"), col("dst")).localCheckpoint()
    val (gxRanks, tGx) = time {
      val edges = pairs.rdd.flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq(org.apache.spark.graphx.Edge(a, b, 1),
          org.apache.spark.graphx.Edge(b, a, 1))
      }
      val v = org.apache.spark.graphx.Graph.fromEdges(edges, 0)
        .staticPageRank(3, resetProb = 0.15).vertices
      import spark.implicits._
      v.toDF("node", "gx").localCheckpoint()
    }

    // label-for-label: every node present on both sides, ranks agree after
    // rescaling (integer floors lose < 1 ulp per op; 3 iterations of
    // pr ~ 1e6+ keep relative error well under 1e-4)
    val joined = intRanks.join(gxRanks, Seq("node"), "full")
    val stats = joined.agg(
      count(lit(1)).as("n"),
      sum(when(col("pr").isNull || col("gx").isNull, 1L).otherwise(0L))
        .as("n_unmatched"),
      max(abs(col("pr").cast("double") / lit(init.toDouble) - col("gx")) /
        col("gx")).as("max_rel_dev")).collect()(0)
    val maxDev = stats.getDouble(2)
    println(f"""{"probe":"graph15_graphx_crosscheck","sf_dir":"$sfDir",""" +
      f""""n_nodes":$n,"n_unmatched":${stats.getLong(1)},""" +
      f""""max_rel_dev":$maxDev%.3e,"int_sec":$tInt%.2f,"gx_sec":$tGx%.2f}""")
    require(stats.getLong(1) == 0, "node sets diverge")
    require(maxDev < 1e-4, s"rank vectors diverge: $maxDev")
    spark.stop()
  }
}
