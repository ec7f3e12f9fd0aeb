package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** StarCC at scale: run the DataFrame-native alternating-star CC and GraphX
  * connectedComponents over the SAME full co-purchase edge set (no bound,
  * the graph04 projection) and require LABEL-FOR-LABEL equality, with wall
  * times for both. The gate (graph09) proves correctness on the bounded
  * near-dup graph against DuckDB; this lane proves the algorithm holds on
  * the real multi-hundred-thousand-edge sf1 graph and prices it against
  * the GraphX baseline it replaces at 100 TB.
  *
  * Env: SPARK_GRAFT_SF_DIR (default localdata/sf1).
  */
object Graph09Probe {
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

    // the expensive projection, derived once and shared by both runners
    val pairs = graft.graph.GraphOps.coPurchasePairs(spark, sfDir)
      .select(col("src"), col("dst")).localCheckpoint()
    val nEdges = pairs.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (starLabels, tStar) = time {
      graft.graph.StarCC.labels(pairs).localCheckpoint()
    }
    val (gxLabels, tGx) = time {
      val edges = pairs.rdd.flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq(org.apache.spark.graphx.Edge(a, b, 1),
          org.apache.spark.graphx.Edge(b, a, 1))
      }
      val v = org.apache.spark.graphx.Graph.fromEdges(edges, 0)
        .connectedComponents().vertices
      import spark.implicits._
      v.toDF("node", "lbl").localCheckpoint()
    }

    val joined = starLabels.join(gxLabels, "node")
    val stats = joined.agg(
      count(lit(1)).as("n_nodes"),
      sum(when(col("root") =!= col("lbl"), 1L).otherwise(0L)).as("n_mismatch"),
      countDistinct(col("root")).as("n_components")).collect()(0)
    val nStar = starLabels.count(); val nGx = gxLabels.count()

    println(s"""{"probe":"graph09","sf":"$sfDir","n_edges":$nEdges,""" +
      s""""n_nodes":${stats.getLong(0)},"n_star_rows":$nStar,"n_gx_rows":$nGx,""" +
      s""""n_components":${stats.getLong(2)},"n_label_mismatch":${stats.getLong(1)},""" +
      f""""star_sec":$tStar%.2f,"graphx_sec":$tGx%.2f}""")
    assert(nStar == nGx && stats.getLong(0) == nStar,
      s"vertex sets differ: star $nStar vs graphx $nGx vs joined ${stats.getLong(0)}")
    assert(stats.getLong(1) == 0L, s"${stats.getLong(1)} label mismatches")
    spark.stop()
  }
}
