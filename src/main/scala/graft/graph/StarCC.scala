package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components WITHOUT GraphX: alternating large-star/small-star
  * rounds over pure DataFrames — the published MapReduce-scale CC algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14). Every round is a hash-partitioned groupBy + equi-join that AQE
  * can re-plan, skew-split, and spill (no RDD vertex/edge caching, no Pregel
  * vertex program), and the edge relation shrinks monotonically toward a
  * star forest in O(log n) rounds.
  *
  * Invariant maintained by both steps: every emitted edge points strictly
  * downward (src > dst), so the fixpoint is exactly a disjoint union of
  * stars rooted at component minima — the same min-label semantics GraphX
  * `connectedComponents()` produces (three-way agreement with GraphX and a
  * DuckDB recursive min-label CTE is gate-checked by graph09; label-level
  * equality at scale by Graph09Probe).
  *
  * Each round is localCheckpointed (tx31's lineage-truncation discipline:
  * iterative lazy plans otherwise grow super-linearly in analysis cost);
  * convergence is a 2-value (count, hash-sum) fixpoint certificate — one
  * bounded 1-row collect per round, never corpus-sized.
  *
  * Fault stance: by default round state is localCheckpointed — executor
  * blocks with truncated lineage, persisted at 2× replication, so
  * single-executor loss is usually absorbed (StarCcFaultLane measured
  * byte-identical survival through 1- and even 2-of-4-executor SIGKILLs
  * on the real cluster), but survival is PROBABILISTIC: lose both
  * replicas of a live round block and the job fails loudly (never a
  * wrong answer — lineage is truncated, nothing silently recomputes
  * differently). Pass `reliable = true` (with `sc.setCheckpointDir` on
  * cluster storage) to make survival deterministic: each round is in the
  * checkpoint dir and retried tasks re-read it — proven byte-identical
  * under mid-fixpoint executor SIGKILL by StarCcFaultLane (CLUSTER.md
  * r16d). Same algorithm; only durability of per-round state moves.
  * Reliable-mode round files stay in the checkpoint dir until application
  * end unless `spark.cleaner.referenceTracking.cleanCheckpoints=true`,
  * which lets the ContextCleaner delete superseded rounds on GC.
  */
object StarCC {

  /** Re-exchange the per-vertex mins relation so the round join's input is
    * a PLAIN shuffle on the join key. Why: AQE's OptimizeSkewedJoin only
    * rewrites `SMJ(Sort(ShuffleRead), Sort(ShuffleRead))`; in the direct
    * composition the mins side has its final HashAggregate BETWEEN the
    * exchange and the join, so a power-law hub partition on the edge side
    * can never be skew-split (measured: StarCcSkewProbe's 10%-hub graph,
    * skew=true absent from every round-1 join). A same-key repartition is
    * elided as redundant by the optimizer, so the barrier is a LAZY
    * partitioning break: project the join key through `greatest(u,u)` —
    * value-identical, but an expression rather than an attribute, so the
    * aggregate's hash(u) output partitioning does not propagate and
    * EnsureRequirements plans a fresh vertex-sized exchange under the
    * join's Sort, the shape OptimizeSkewedJoin matches. Nothing is
    * materialized and upstream ReusedExchange sharing is intact (the
    * rejected v1 localCheckpoint barrier cost 2.7× on a uniform graph;
    * this costs ~3%). Only paid when the caller asks for `skewSafe`. */
  private def reExchange(mins: DataFrame): DataFrame =
    // LAZY partitioning break: greatest(u,u) is value-identical for every
    // long but is an expression, not an attribute, so the aggregate's
    // hash(u) output partitioning does not propagate through the project
    // and EnsureRequirements plans a FRESH exchange under the join's Sort
    // — the shape OptimizeSkewedJoin matches — without materializing
    // anything or breaking upstream ReusedExchange sharing (the earlier
    // localCheckpoint barrier cost 23.4→62.7 s on a uniform 8M-edge graph)
    mins.select(greatest(col("u"), col("u")).as("u"), col("m"))

  /** Degree-profile decision for [[labelsAuto]] (VERDICT r17 #5): the
    * maximum share of edge ENDPOINTS carried by a single vertex, from one
    * cheap pre-agg over the edge list. A uniform graph's max share is
    * ~1/V (graph01's degree statistic: ~0 at any real scale); a power-law
    * hub concentrates a constant fraction regardless of scale. Above
    * `threshold` (default 2% — well above uniform noise, well below the
    * gate graph's ~6% hub) the post-exchange hub partition is a straggler
    * no config can split without [[reExchange]]'s barrier, so the ~3%
    * barrier premium is cheap insurance; below it the barrier is pure
    * overhead. Cost: one exchange over E (same scale as round 1's
    * groupBy), paid ONCE before the fixpoint, not per round. */
  def skewDecision(edges: DataFrame, threshold: Double = 0.02): Boolean = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (maxDeg, totalEnds) = edges
      .select(explode(array(col("src"), col("dst"))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .agg(coalesce(max(col("deg")), lit(0L)),
        coalesce(sum(col("deg")), lit(0L)))
      .as[(Long, Long)].head() // 2-value decision certificate, never edge-sized
    totalEnds > 0 && maxDeg.toDouble / totalEnds.toDouble > threshold
  }

  /** [[labels]] with `skewSafe` chosen from the graph's own degree
    * profile ([[skewDecision]]) instead of a caller flag — the "auto"
    * mode VERDICT r17 asked for. The edge list is localCheckpointed FIRST
    * so the (possibly expensive) upstream pipeline runs once for both the
    * decision pre-agg and the fixpoint; StarCcSkewProbe asserts the
    * decision picks safe on the 10%-hub graph and default on uniform. */
  def labelsAuto(edges: DataFrame, maxIter: Int = 50,
                 reliable: Boolean = false, threshold: Double = 0.02): DataFrame = {
    if (reliable) require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "StarCC.labelsAuto(reliable = true) needs setCheckpointDir (see labels)")
    val e0 =
      if (reliable) edges.select(col("src"), col("dst")).checkpoint()
      else edges.select(col("src"), col("dst")).localCheckpoint()
    labels(e0, maxIter, reliable, skewSafe = skewDecision(e0, threshold))
  }

  /** large-star: for each u, hang every HIGHER neighbor v > u under
    * m = min(N(u) ∪ {u}) — long chains collapse toward minima. */
  private[graft] def largeStar(e: DataFrame, skewSafe: Boolean = false): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins0 = sym.groupBy(col("src").as("u")).agg(min(col("dst")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    val mins = if (skewSafe) reExchange(mins0) else mins0
    sym.join(mins, col("src") === col("u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("s2"), col("m").as("d2"))
      .where(col("s2") =!= col("d2"))
      .select(col("s2").as("src"), col("d2").as("dst"))
    // no distinct here: duplicates feed smallStar's min aggregate
    // harmlessly, and the round's single distinct (end of smallStar)
    // restores set semantics — one exchange per round instead of two.
  }

  /** small-star: input edges all point downward; re-wire each node's
    * LOWER neighborhood (parents) onto its minimum parent. */
  private[graft] def smallStar(e: DataFrame, skewSafe: Boolean = false): DataFrame = {
    val mins0 = e.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
    val mins = if (skewSafe) reExchange(mins0) else mins0
    val rewired = e.join(mins, col("src") === col("u"))
      .where(col("dst") =!= col("m"))
      .select(col("dst").as("s2"), col("m").as("d2"))
      .select(col("s2").as("src"), col("d2").as("dst"))
    rewired.union(mins.select(col("u").as("src"), col("m").as("dst")))
      .distinct()
  }

  /** Component labels for an undirected edge list `(src, dst)` (long ids,
    * orientation irrelevant, self-loops ignored): returns `(node, root)`
    * with one row per vertex incident to an edge, `root` = the minimum
    * vertex id reachable from `node`. Isolated vertices (absent from the
    * edge list) are the caller's concern, matching GraphX `fromEdges`.
    *
    * `skewSafe`: re-exchange each round's vertex-sized mins relation so
    * AQE's skew-join rewrite can split a power-law hub partition on the
    * edge side (see [[reExchange]]). The lazy partitioning-break barrier
    * costs ~3% on a UNIFORM 8M-edge graph (27.2 → 28.1 s — one extra
    * vertex-sized exchange per half-round; the rejected localCheckpoint
    * variant cost 2.7× by breaking ReusedExchange sharing) and on the
    * 10%-hub graph it unblocks the split (23.5 → 21.5 s, and at 100 TB
    * the default path's hub partition is an unbounded straggler no
    * config can split). Still off by default: the flag should follow
    * the graph's degree profile, not a blanket setting. */
  def labels(edges: DataFrame, maxIter: Int = 50,
             reliable: Boolean = false, skewSafe: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "StarCC.labels(reliable = true) needs spark.sparkContext.setCheckpointDir " +
        "pointing at storage every executor can read")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    // materialized ONCE: both the fixpoint's round 0 and the final vertex
    // set read this frame, so the (possibly expensive) upstream edge
    // pipeline — graph09's minhash-LSH self-join, the probe's co-purchase
    // projection — never re-executes after the loop
    val pairs = ckpt(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")))

    var e = pairs
    var prev = (-1L, -1L)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) { // O(log n) expected; cap = backstop
      val next = ckpt(smallStar(largeStar(e, skewSafe), skewSafe))
      // (count, xor-of-hashes) set certificate: bit_xor is order-
      // independent and cannot overflow under ANSI mode (edges are
      // distinct, so set semantics are exact up to hash collision; a
      // false "converged" would surface as an oracle mismatch).
      val chk = next
        .agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)))
        .as[(Long, Long)].head() // 1-row convergence certificate
      converged = chk == prev
      prev = chk
      // superseded rounds: the driver drops its reference here and the
      // ContextCleaner releases the blocks/files on GC (Dataset.unpersist
      // would be a no-op — checkpointed frames aren't cacheManager
      // entries); peak concurrent state is therefore ~2 rounds of edges
      e = next
      it += 1
    }
    require(converged,
      s"StarCC did not reach the star-forest fixpoint in $maxIter rounds " +
        "— raise maxIter; emitting a non-converged edge set would mislabel")

    // star forest → labels: non-roots carry their root edge; roots (never
    // a src — edges point strictly downward) label themselves.
    val nodes = pairs.select(col("src").as("node"))
      .union(pairs.select(col("dst").as("node"))).distinct()
    val roots = nodes.join(e.select(col("src")), nodes("node") === col("src"), "left_anti")
      .select(col("node"), col("node").as("root"))
    e.select(col("src").as("node"), col("dst").as("root")).union(roots)
  }
}
