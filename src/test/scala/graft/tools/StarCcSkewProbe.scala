package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r16 #5 — StarCC under REAL skew. Graph09Probe's co-purchase
  * graph is near-uniform; the 100 TB claim ("every round is a groupBy+join
  * AQE can skew-split") is exactly what a power-law graph tests. This probe
  * builds a deterministic hub graph (one vertex carrying ~10% of all edges
  * — the shape of a web/social corpus), then:
  *   (a) asserts AQE actually marks round 1's join skew-handled
  *       (skew=true + AQEShuffleRead, q54's plan-lock discipline, on the
  *       SAME largeStar/smallStar code path labels() iterates), and
  *   (b) requires label-for-label equality between StarCC and GraphX
  *       connectedComponents over the full skewed edge set.
  * Threshold shrinking mirrors q54: at probe scale the hub partition is
  * ~10 MB, so the 256 MB production default must come down for the runtime
  * stats to classify it — the SPLIT mechanics, not the threshold, are what
  * 100 TB inherits.
  *
  * Env: STARCC_SKEW_EDGES (default 8_000_000), SPARK_GRAFT_OUT (optional
  * json path).
  */
object StarCcSkewProbe {
  def main(args: Array[String]): Unit = {
    val nEdgesTarget = sys.env.getOrElse("STARCC_SKEW_EDGES", "8000000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // scale-honest stand-in (q61's discipline): at 100 TB the per-vertex
      // mins side is vertex-count-sized — NOT broadcastable — so the round
      // join must stay a shuffled join here too, or AQE just broadcasts the
      // probe-scale mins and there is no skew to split
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // the hub side unions a constant-src relation; Union constraint
      // rewriting trips on the literal alias (key not found: src#N,
      // Spark 4.1 UnionBase.rewriteConstraints) — constraints buy nothing
      // in this synthetic build, so turn propagation off for the probe
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic hub graph: vertex 0 holds 10% of edges; the rest are
    // hash-random pairs over n vertices (no Math.random — reruns identical)
    val n = nEdgesTarget / 4 // avg degree 8 → a few giant components + tail
    val nHub = nEdgesTarget / 10
    val hub = spark.range(nHub).select(lit(0L).as("src"),
      (pmod(xxhash64(col("id"), lit("hub")), lit(n - 1)) + 1).as("dst"))
    val rest = spark.range(nEdgesTarget - nHub).select(
      pmod(xxhash64(col("id"), lit("a")), lit(n)).as("src"),
      pmod(xxhash64(col("id"), lit("b")), lit(n)).as("dst"))
    // both sides alias src/dst BEFORE the union: a post-union toDF rename
    // trips Union constraint rewriting (key not found: src#N) on Spark 4.1
    val edges = hub.union(rest)
      .where(col("src") =!= col("dst")).localCheckpoint()
    val nEdges = edges.count()
    val hubDeg = edges.where(col("src") === 0 || col("dst") === 0).count()

    // (a) round-1 plan: the exact composition labels() iterates, executed
    // under the skew-tuned session — AQE must mark the join skew-handled
    val round1 = graft.graph.StarCC.smallStar(
      graft.graph.StarCC.largeStar(edges, skewSafe = true), skewSafe = true)
    // AQE finalizes a plan only when THAT QueryExecution runs — count()
    // plans its own aggregate on top, leaving round1's plan un-finalized;
    // drive the exact plan via toRdd, then read it back
    round1.queryExecution.toRdd.foreachPartition(_ => ())
    val round1Rows = round1.count()
    val plan = round1.queryExecution.executedPlan.toString
    val skewFired = plan.contains("skew=true")
    val aqeRead = plan.contains("AQEShuffleRead")
    if (!skewFired || sys.env.contains("STARCC_SKEW_DEBUG"))
      println(s"=== round-1 executed plan ===\n$plan\n===")
    assert(plan.contains("isFinalPlan=true"), "round must run under AQE")
    assert(skewFired, "AQE did not mark any round-1 join skew-handled — " +
      "the hub partition was not classified; check thresholds vs edge count")
    assert(aqeRead, "round lost the adaptive shuffle read")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // (a2) r18, VERDICT r17 #5 — skewSafe AUTO: the degree-profile
    // decision must pick the barrier on this 10%-hub graph and decline it
    // on a uniform graph of the same size (max endpoint share ~1/V).
    val autoHub = graft.graph.StarCC.skewDecision(edges)
    val uniform = spark.range(nEdgesTarget).select(
      pmod(xxhash64(col("id"), lit("u1")), lit(n)).as("src"),
      pmod(xxhash64(col("id"), lit("u2")), lit(n)).as("dst"))
      .where(col("src") =!= col("dst"))
    val autoUniform = graft.graph.StarCC.skewDecision(uniform)
    assert(autoHub, "skewDecision declined the barrier on the 10%-hub graph")
    assert(!autoUniform, "skewDecision picked the barrier on a uniform graph")

    // (b) full fixpoint, label equality vs GraphX on the same edges —
    // and the mode's own A/B: default (agg-fed join, skew split blocked)
    // vs skewSafe (mins re-exchanged, split fires) on the SAME hub graph
    val (starLabels, tStar) = time {
      graft.graph.StarCC.labels(edges, skewSafe = true).localCheckpoint()
    }
    val (_, tStarDefault) = time {
      graft.graph.StarCC.labels(edges).localCheckpoint()
    }
    val (gxLabels, tGx) = time {
      val rdd = edges.rdd.flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq(org.apache.spark.graphx.Edge(a, b, 1),
          org.apache.spark.graphx.Edge(b, a, 1))
      }
      org.apache.spark.graphx.Graph.fromEdges(rdd, 0)
        .connectedComponents().vertices.toDF("node", "lbl").localCheckpoint()
    }
    val joined = starLabels.join(gxLabels, "node")
    val stats = joined.agg(count(lit(1)),
      sum(when(col("root") =!= col("lbl"), 1L).otherwise(0L)),
      countDistinct(col("root"))).collect()(0)
    val (nStar, nGx) = (starLabels.count(), gxLabels.count())

    val out = s"""{"probe":"starcc-skew","n_edges":$nEdges,"n_vertices_target":$n,""" +
      s""""hub_degree":$hubDeg,"hub_share":${"%.3f".format(hubDeg.toDouble / nEdges)},""" +
      s""""round1_rows":$round1Rows,"skew_split_fired":$skewFired,"aqe_shuffle_read":$aqeRead,""" +
      s""""auto_decision_hub":$autoHub,"auto_decision_uniform":$autoUniform,""" +
      s""""n_nodes":${stats.getLong(0)},"n_components":${stats.getLong(2)},""" +
      s""""n_label_mismatch":${stats.getLong(1)},""" +
      f""""star_sec":$tStar%.2f,"star_default_sec":$tStarDefault%.2f,"graphx_sec":$tGx%.2f}"""
    println(out)
    sys.env.get("SPARK_GRAFT_OUT").foreach(p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), out.getBytes("UTF-8")))
    assert(nStar == nGx && stats.getLong(0) == nStar,
      s"vertex sets differ: star $nStar vs graphx $nGx vs joined ${stats.getLong(0)}")
    assert(stats.getLong(1) == 0L, s"${stats.getLong(1)} label mismatches under skew")
    spark.stop()
  }
}
