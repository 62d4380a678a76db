package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native PageRank (the canonical iterative graph centrality:
  * Page/Brin/Motwani/Winograd 1999) over an edge list.
  *
  * Per iteration: `pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u)/outdeg(u) +
  * danglingMass/N)` — dangling nodes (no out-edges) redistribute their mass
  * uniformly, so the ranks stay a probability distribution.
  *
  * Engine-portability: every data-derived division is snapped to the 1e-6
  * grid with `floor(x*1e6 + 0.5)/1e6` (the house ratio rule), and every SUM
  * over grid points is re-snapped — grid sums round identically regardless
  * of partition-level summation order, so iteration k's ranks are
  * bit-identical across engines and across cluster topologies. An oracle
  * can replay the iterations as unrolled SQL CTEs and hash-match.
  *
  * Scale: edges are the big side. Per iteration: one hash shuffle of
  * (dst, share) for the incoming-sum aggregation (map-side combined) plus
  * broadcast-sized joins of the rank vector (N rows — node-count-sized,
  * NOT edge-count-sized). The edges-with-outdegree frame is computed once
  * and reused every iteration; on a cluster it should be persisted and
  * pre-partitioned by `src` so the per-iteration rank join is co-located.
  * Each iteration ends in a lineage cut (reliable checkpoint when
  * `spark.graft.checkpoint.dir` is set, localCheckpoint otherwise) —
  * without it the recursive plan triples per iteration (pr feeds the
  * contribution join, the dangling aggregate, and the final left join).
  */
object PageRank {

  private def r6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)

  /** Ranks after `iters` synchronous iterations: (node, pr).
    *
    * `edges` needs `src`/`dst` long columns; duplicate edges are collapsed
    * (unweighted graph — each distinct out-edge carries pr/outdeg).
    */
  def run(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = cut(edges.select(col("src"), col("dst")).distinct())
    val nodes = cut(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    // Node count enters the plan as a literal: one tiny count job, the
    // same driver-scalar pattern as CorpusMix quotas.
    val n = nodes.count().toDouble
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = cut(e.join(outdeg, "src"))
    // Nodes with no out-edges, for the dangling-mass term.
    val dangNodes = nodes.join(outdeg, nodes("node") === outdeg("src"), "left_anti")

    var pr = cut(nodes.withColumn("pr", r6(lit(1.0) / lit(n))))
    for (_ <- 1 to iters) {
      val inSum = eDeg.join(pr, eDeg("src") === pr("node"))
        .select(col("dst"), r6(col("pr") / col("outdeg").cast("double")).as("share"))
        .groupBy("dst").agg(r6(sum(col("share"))).as("in_sum"))
      // Dangling mass as a 1-row frame (kept lazy; broadcast into the
      // update expression) — no per-iteration driver action.
      val dang = dangNodes.join(pr, Seq("node"))
        .agg(r6(coalesce(sum(col("pr")), lit(0.0d))).as("dang"))
      val next = pr.join(inSum, pr("node") === inSum("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          r6(lit(1.0 - damping) / lit(n)
            + lit(damping) * (coalesce(col("in_sum"), lit(0.0d))
              + col("dang") / lit(n))).as("pr"))
      pr = cut(next)
    }
    pr
  }

  /** Personalized PageRank: the restart (and dangling) mass returns to
    * the SEED set instead of spreading uniformly — "importance relative
    * to these nodes", the seed-expansion primitive behind related-item
    * discovery and local community detection (Jeh–Widom 2003 shape).
    * Nodes unreachable from the seeds keep rank exactly 0 (the grid
    * never injects uniform mass), so the output doubles as a soft
    * reachability measure.
    *
    * Same 1e-6-grid discipline and per-iteration lineage cut as
    * [[run]]; the only change is the restart vector `[v∈S]/|S|`. */
  def personalized(edges: DataFrame, seeds: Seq[Long], iters: Int = 5,
                   damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(seeds.nonEmpty, "personalized PageRank needs >= 1 seed")
    val e = cut(edges.select(col("src"), col("dst")).distinct())
    val nodes = cut(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    val k = seeds.length.toDouble
    val isSeed = col("node").isin(seeds: _*)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = cut(e.join(outdeg, "src"))
    val dangNodes = nodes.join(outdeg, nodes("node") === outdeg("src"),
      "left_anti")
    var pr = cut(nodes.withColumn("pr",
      when(isSeed, r6(lit(1.0) / lit(k))).otherwise(lit(0.0d))))
    for (_ <- 1 to iters) {
      val inSum = eDeg.join(pr, eDeg("src") === pr("node"))
        .select(col("dst"),
          r6(col("pr") / col("outdeg").cast("double")).as("share"))
        .groupBy("dst").agg(r6(sum(col("share"))).as("in_sum"))
      val dang = dangNodes.join(pr, Seq("node"))
        .agg(r6(coalesce(sum(col("pr")), lit(0.0d))).as("dang"))
      val next = pr.join(inSum, pr("node") === inSum("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          r6(when(isSeed, lit(1.0 - damping) / lit(k)).otherwise(lit(0.0d))
            + lit(damping) * (coalesce(col("in_sum"), lit(0.0d))
              + when(isSeed, col("dang") / lit(k)).otherwise(lit(0.0d))))
            .as("pr"))
      pr = cut(next)
    }
    pr
  }

  /** Shared iterative-operator policy: reliable checkpoint when
    * `spark.graft.checkpoint.dir` is set (survives executor loss),
    * localCheckpoint otherwise (local-mode fast path). */
  private def cut(df: DataFrame): DataFrame = Lineage.cut(df)
}
