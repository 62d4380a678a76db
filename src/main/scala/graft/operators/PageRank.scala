package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-native PageRank (the canonical iterative graph centrality:
  * Page/Brin/Motwani/Winograd 1999) over an edge list.
  *
  * Per iteration: `pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u)/outdeg(u) +
  * danglingMass/N)` — dangling nodes (no out-edges) redistribute their mass
  * uniformly, so the ranks stay a probability distribution.
  *
  * Engine-portability — the Markov/HITS integer discipline: ranks live on
  * the 1e-6 grid as BIGINT `pr6`, every per-edge share is an exact integer
  * round-half-up (`(2·pr6 + outdeg) div (2·outdeg)`), incoming and dangling
  * sums are EXACT integer sums (order-free — the previous double-grid form
  * summed grid-snapped doubles, whose 1e-6 points are not representable, so
  * partition order could flip an ulp at a `floor(x·1e6+0.5)` boundary), and
  * the damped update folds on fixed integer grids:
  * {{{
  *   base12  = ((10^6 − d6) · 10^6) div N          // restart mass, 1e-12 grid
  *   dang12  = (dang6 · 10^6) div N                // dangling share, 1e-12 grid
  *   pr6'    = (base12 + (d6·(in6·10^6 + dang12)) div 10^6 + 5·10^5) div 10^6
  * }}}
  * The `d6·(...)` product runs in decimal(38,0) (DuckDB mirrors with
  * HUGEINT): `in6` is bounded by total grid mass (~10^6) plus up to half a
  * micro-unit of round-half-up drift PER EDGE, so at 10^12 edges the long
  * product would wrap while the decimal stays exact. Iteration k's ranks
  * are therefore bit-identical across engines, partitionings, and AQE
  * re-plans, and an oracle replays the iterations as unrolled SQL CTEs.
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

  /** 6dp grid of the damping factor — one config-literal double op on
    * the driver, never a data-derived one. */
  private def d6Of(damping: Double): Long = {
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    math.floor(damping * 1e6 + 0.5).toLong
  }

  /** Ranks after `iters` synchronous iterations: (node, pr) with
    * `pr = pr6 / 1e6` (one IEEE division off the exact integer grid).
    *
    * `edges` needs `src`/`dst` columns; duplicate edges are collapsed
    * (unweighted graph — each distinct out-edge carries pr/outdeg).
    */
  def run(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val d6 = d6Of(damping)
    val e = cut(edges.select(col("src"), col("dst")).distinct())
    val nodes = cut(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    // Node count enters the plan as a literal: one tiny count job, the
    // same driver-scalar pattern as CorpusMix quotas.
    val n = nodes.count()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = cut(e.join(outdeg, "src"))
    // Nodes with no out-edges, for the dangling-mass term.
    val dangNodes = nodes.join(outdeg, nodes("node") === outdeg("src"), "left_anti")

    // round-half-up(1e6 / n) as an exact integer literal
    var pr = cut(nodes.withColumn("pr6",
      lit((2L * 1000000L + n) / (2L * n))))
    val base12 = (1000000L - d6) * 1000000L / n
    for (_ <- 1 to iters) {
      val inSum = eDeg.join(pr, eDeg("src") === pr("node"))
        .select(col("dst"),
          expr("(2L * pr6 + outdeg) div (2L * outdeg)").as("share6"))
        .groupBy("dst").agg(sum(col("share6")).as("in6"))
      // Dangling mass as a 1-row frame (kept lazy; broadcast into the
      // update expression) — no per-iteration driver action.
      val dang = dangNodes.join(pr, Seq("node"))
        .agg(coalesce(sum(col("pr6")), lit(0L)).as("dang6"))
      val next = pr.join(inSum, pr("node") === inSum("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          expr(s"($base12" +
            s" + CAST(($d6 * (CAST(coalesce(in6, 0L) AS DECIMAL(38,0)) * 1000000" +
            s"   + (dang6 * 1000000) div $n)) div 1000000 AS BIGINT)" +
            s" + 500000) div 1000000").as("pr6"))
      pr = cut(next)
    }
    pr.select(col("node"), (col("pr6").cast("double") / 1e6).as("pr"))
  }

  /** WEIGHTED PageRank: each out-edge carries mass proportional to its
    * weight — `share(u→v) = pr(u) · w(u,v) / W(u)` with `W(u)` the
    * node's total out-weight — the natural rank on similarity graphs
    * (near-dup jaccard weights, co-occurrence counts), where the
    * unweighted walk ([[run]]) would treat a 0.99-duplicate edge and a
    * barely-above-threshold one identically.
    *
    * Weights are POSITIVE INTEGERS (snap doubles to the 1e-6 grid
    * upstream — weights only matter relatively, so any positive
    * integer scale works); parallel/duplicate directed edges combine
    * by weight SUM. Integer discipline as [[run]], one grid change:
    * the per-edge share is `floor(pr6 · 10^6 · w / W)` straight on the
    * 1e-12 grid (computed in decimal(38,0) — `pr6·10^6·w` wraps a long
    * at real weight scales; DuckDB mirrors with HUGEINT), incoming
    * sums stay exact integer sums. */
  def runWeighted(edges: DataFrame, weightCol: String, iters: Int = 5,
                  damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val d6 = d6Of(damping)
    val e = cut(edges.select(col("src"), col("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0L)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")))
    val nodes = cut(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    // decimal out-weight totals: a long sum would wrap silently at
    // ~9e18 total weight per node while DuckDB widens to HUGEINT —
    // the exact cross-engine divergence class this operator exists
    // to rule out (the Markov renormalizer discipline)
    val wsum = e.groupBy("src")
      .agg(sum(col("w").cast("decimal(38,0)")).as("wsum"))
    val eW = cut(e.join(wsum, "src"))
    val dangNodes = nodes.join(wsum, nodes("node") === wsum("src"), "left_anti")
    var pr = cut(nodes.withColumn("pr6",
      lit((2L * 1000000L + n) / (2L * n))))
    val base12 = (1000000L - d6) * 1000000L / n
    for (_ <- 1 to iters) {
      val inSum = eW.join(pr, eW("src") === pr("node"))
        .select(col("dst"),
          expr("CAST((CAST(pr6 AS DECIMAL(38,0)) * 1000000 * w) div wsum" +
            " AS BIGINT)").as("share12"))
        .groupBy("dst").agg(sum(col("share12")).as("in12"))
      val dang = dangNodes.join(pr, Seq("node"))
        .agg(coalesce(sum(col("pr6")), lit(0L)).as("dang6"))
      val next = pr.join(inSum, pr("node") === inSum("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          expr(s"($base12" +
            s" + CAST(($d6 * (CAST(coalesce(in12, 0L) AS DECIMAL(38,0))" +
            s"   + (dang6 * 1000000) div $n)) div 1000000 AS BIGINT)" +
            s" + 500000) div 1000000").as("pr6"))
      pr = cut(next)
    }
    pr.select(col("node"), (col("pr6").cast("double") / 1e6).as("pr"))
  }

  /** Personalized PageRank: the restart (and dangling) mass returns to
    * the SEED set instead of spreading uniformly — "importance relative
    * to these nodes", the seed-expansion primitive behind related-item
    * discovery and local community detection (Jeh–Widom 2003 shape).
    * Nodes unreachable from the seeds keep rank exactly 0 (the grid
    * never injects uniform mass), so the output doubles as a soft
    * reachability measure.
    *
    * Same integer-grid discipline and per-iteration lineage cut as
    * [[run]]; the only change is the restart vector `[v∈S]/|S|`. */
  def personalized(edges: DataFrame, seeds: Seq[Long], iters: Int = 5,
                   damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(seeds.nonEmpty, "personalized PageRank needs >= 1 seed")
    val d6 = d6Of(damping)
    val e = cut(edges.select(col("src"), col("dst")).distinct())
    val nodes = cut(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    val k = seeds.length.toLong
    val isSeed = col("node").isin(seeds: _*)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = cut(e.join(outdeg, "src"))
    val dangNodes = nodes.join(outdeg, nodes("node") === outdeg("src"),
      "left_anti")
    var pr = cut(nodes.withColumn("pr6",
      when(isSeed, lit((2L * 1000000L + k) / (2L * k))).otherwise(lit(0L))))
    val base12 = (1000000L - d6) * 1000000L / k
    for (_ <- 1 to iters) {
      val inSum = eDeg.join(pr, eDeg("src") === pr("node"))
        .select(col("dst"),
          expr("(2L * pr6 + outdeg) div (2L * outdeg)").as("share6"))
        .groupBy("dst").agg(sum(col("share6")).as("in6"))
      val dang = dangNodes.join(pr, Seq("node"))
        .agg(coalesce(sum(col("pr6")), lit(0L)).as("dang6"))
      val next = pr.join(inSum, pr("node") === inSum("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          expr(s"(CASE WHEN ${isSeedSql("node", seeds)} THEN $base12 ELSE 0L END" +
            s" + CAST(($d6 * (CAST(coalesce(in6, 0L) AS DECIMAL(38,0)) * 1000000" +
            s"   + CASE WHEN ${isSeedSql("node", seeds)}" +
            s"     THEN (dang6 * 1000000) div $k ELSE 0L END))" +
            s"   div 1000000 AS BIGINT)" +
            s" + 500000) div 1000000").as("pr6"))
      pr = cut(next)
    }
    pr.select(col("node"), (col("pr6").cast("double") / 1e6).as("pr"))
  }

  private def isSeedSql(c: String, seeds: Seq[Long]): String =
    s"$c IN (${seeds.mkString(", ")})"

  /** Shared iterative-operator policy: reliable checkpoint when
    * `spark.graft.checkpoint.dir` is set (survives executor loss),
    * localCheckpoint otherwise (local-mode fast path). */
  private def cut(df: DataFrame): DataFrame = Lineage.cut(df)
}
