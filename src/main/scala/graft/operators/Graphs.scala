package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond PageRank: triangle counting — the
  * clustering-coefficient / community-density primitive.
  *
  * Algorithm: compact-forward (the standard distributed triangle count,
  * cf. Suri & Vassilvitskii's MapReduce formulation). Undirected edges
  * are ORIENTED from the lower-(degree, id) endpoint to the higher one;
  * every triangle then has exactly one "apex" whose two out-edges form
  * its only counted wedge, so each triangle is counted exactly once:
  *   wedges  = E ⋈ E on the apex (out-edges paired)
  *   closed  = wedges semi-joined against E on the closing edge.
  *
  * Why degree orientation matters at scale: wedge volume is
  * sum(outdeg²), and orienting toward higher degree bounds every
  * out-degree by O(sqrt(m)) — a star graph (one celebrity node) makes
  * ZERO wedges at the hub instead of deg² of them. This is the
  * difference between a plan that survives a power-law graph and one
  * that dies on its biggest hub.
  *
  * Shuffles: dedup of undirected edges; degree aggregation (edge-keyed);
  * the wedge self-join on the apex; the closing-edge semi join. All are
  * edge- or wedge-sized, never all-pairs.
  */
object Graphs {

  /** Canonical undirected edge set (u < v, deduplicated, no loops) from
    * any directed/multi edge list. */
  def undirectedEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Multi-source BFS hop distances, up to `maxHops` rounds: the
    * frontier (nodes first reached at hop h-1) joins the symmetric edge
    * list, min-dist folds new reachings in. One frontier-sized equi-join
    * plus one id-keyed min aggregation per hop — at 100 TB each round
    * shuffles the REACHED set, never all-pairs; hop count bounds total
    * work exactly like PageRank's unrolled iterations. Nodes never
    * reached within `maxHops` are absent from the output (distances are
    * exact for every emitted row).
    *
    * Each round ends in [[Lineage.cut]] (PageRank's checkpoint/persist
    * policy), so the plan per hop is CONSTANT-depth — a scan of the
    * previous round's materialization, not h nested join-aggregates —
    * which is what lets hop counts beyond a handful run at all (analysis
    * and codegen stay O(1) per round, recovery re-runs one round). An
    * exhausted frontier short-circuits the remaining rounds: on a graph
    * of diameter d the loop does min(d, maxHops) rounds of real work.
    *
    * The hop-distance query behind contamination-neighborhood expansion
    * ("everything within 2 links of a flagged item") and
    * entity-resolution blast-radius checks. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 200,
      "BFS: maxHops must be in [0, 200] (one materialized round per hop)")
    val und = undirectedEdges(edges, srcCol, dstCol)
    // cut: every hop re-joins the symmetric edge list — without the cut
    // each hop re-runs the caller's whole edge derivation (q197 feeds a
    // minhash candidate+verify pipeline here)
    val sym = Lineage.cut(und.select(col("u").as("s"), col("v").as("d"))
      .unionByName(und.select(col("v").as("s"), col("u").as("d"))))
    var dist = Lineage.cut(
      seeds.select(col(seedCol).as("id"), lit(0).as("dist")).distinct())
    var frontier = dist
    for (h <- 1 to maxHops) {
      if (!frontier.isEmpty) {
        val next = frontier.join(sym, frontier("id") === sym("s"))
          .select(col("d").as("id"), lit(h).as("dist"))
        dist = Lineage.cut(dist.unionByName(next).groupBy(col("id"))
          .agg(min(col("dist")).as("dist")))
        frontier = dist.filter(col("dist") === h)
      }
    }
    dist
  }

  /** Node degrees over the canonical undirected set. */
  private def degrees(und: DataFrame): DataFrame =
    und.select(col("u").as("x")).union(und.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))

  /** Every triangle exactly once as (apex, b, c) — apex is the
    * (deg, id)-minimum corner, b < c by id. */
  private def closedTriangles(und: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (deg, id): a -> b iff (deg_a, a) < (deg_b, b)
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("d")))
        .otherwise(struct(col("v").as("s"), col("u").as("d"))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
    // wedges at the apex: pair the apex's out-neighbors once
    val a = oriented.select(col("s").as("apex"), col("d").as("b"))
    val b = oriented.select(col("s").as("apex"), col("d").as("c"))
    val wedges = a.join(b, Seq("apex")).filter(col("b") < col("c"))
    // closing edge may be oriented either way between b and c; the
    // canonical (u, v) form of the UNDIRECTED set closes both
    wedges.join(und,
      wedges("b") === und("u") && wedges("c") === und("v"), "left_semi")
  }

  /** One row: (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirectedEdges(edges, srcCol, dstCol)
    val deg = degrees(und)
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val ecnt = und.agg(count(lit(1)).as("n_edges"))
    val tris = closedTriangles(und, deg).agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(ecnt).crossJoin(tris)
  }

  /** Local clustering coefficient, top-`k` nodes: how close each node's
    * neighborhood is to a clique — cc = triangles_through_node /
    * C(deg, 2), the community-density score per node. Nodes of degree < 2
    * have no possible triangle and score 0.
    *
    * Built on the same oriented-triangle stream: each (apex, b, c) row
    * explodes to its three corners (constant fan-out 3), counted per
    * node, left-joined onto degrees so triangle-free nodes keep cc 0.
    * The ratio is one exact-integer division on the 6dp grid. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String,
                            k: Int): DataFrame = {
    val und = undirectedEdges(edges, srcCol, dstCol)
    val deg = degrees(und)
    val tri = closedTriangles(und, deg)
      .select(explode(array(col("apex"), col("b"), col("c"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("x"), "left")
      .select(col("x").as("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("n_triangles"))
      .withColumn("cc",
        when(col("deg") >= 2,
          floor(col("n_triangles").cast("double") * 2d
            / (col("deg").cast("double") * (col("deg").cast("double") - 1d))
            * lit(1e6) + lit(0.5d)) / lit(1e6))
          .otherwise(lit(0.0d)))
      .orderBy(col("cc").desc, col("node").asc).limit(k)
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara 2007), made fully deterministic: every node starts
    * as its own label (its id), and each round every node with
    * neighbors adopts the most frequent label among its neighbors'
    * current labels, ties broken by the SMALLEST label. Isolated nodes
    * keep their own label. Classic LPA resolves ties randomly and
    * iterates to convergence; fixing the tie-break and the round count
    * makes the result a pure function of the edge set — replayable by
    * unrolled relational iterations (the PageRank oracle idiom), and
    * stable across partitionings and re-runs.
    *
    * vs [[Dedup.resolveComponents]]: connected components fuse anything
    * reachable; LPA splits a weakly-bridged blob into its dense cores —
    * the dedup-cluster QA view ("is this one community or two glued by
    * one noisy pair?").
    *
    * Scale: per round, one frontier-sized equi-join (labels onto the
    * symmetric edge list) and one (node, label)-keyed count + one
    * node-keyed argmax — all uniform hash keys; [[Lineage.cut]] after
    * each round keeps the plan constant-depth. Skewed hub nodes cost
    * one hot aggregation key, not a cross join.
    *
    * Output: (node, community, csize) for every node in `nodes`. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       nodes: DataFrame, nodeCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50,
      "LPA: iters must be in [1, 50] (one materialized round each)")
    val und = undirectedEdges(edges, srcCol, dstCol)
    // cut: every LPA round re-joins the symmetric edge list — without
    // the cut each round re-runs the caller's WHOLE edge derivation
    // (for q221/q322 that is the minhash candidate+verify pipeline,
    // once per round instead of once). Output is pair-sized — cheap to
    // materialize (guide §1.2 pass counting).
    val sym = Lineage.cut(und.select(col("u").as("s"), col("v").as("d"))
      .unionByName(und.select(col("v").as("s"), col("u").as("d"))))
    var labels = Lineage.cut(
      nodes.select(col(nodeCol).as("id")).distinct()
        .select(col("id"), col("id").as("lab")))
    for (_ <- 1 to iters) {
      val best = labels.join(sym, labels("id") === sym("s"))
        .groupBy(col("d").as("id2"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
        // argmax by (count desc, label asc) as one order-free max over
        // (cnt, -lab) structs — no per-node sort
        .groupBy(col("id2"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id2").as("id"), (-col("m.nl")).as("newlab"))
      labels = Lineage.cut(labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab")))
    }
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, Seq("lab"))
      .select(col("id").as("node"), col("lab").as("community"), col("csize"))
  }

  /** WEIGHTED label propagation: neighbor votes weighted by edge
    * weight instead of counted — on a near-dup similarity graph a
    * 0.9-jaccard neighbor should pull harder than a 0.35 one, which
    * is exactly the structure the unweighted vote throws away
    * ([[labelPropagation]] treats both as one vote). Argmax by
    * (weight-sum desc, label asc) — same deterministic tie-break, same
    * unrolled-round replayability.
    *
    * Weights are POSITIVE INTEGERS (snap similarity doubles to the
    * 1e-6 grid upstream; only relative scale matters). The graph is
    * undirected: pairs normalize to (min, max) and parallel /
    * reversed duplicates combine by weight SUM, then votes flow both
    * ways. Scale contract identical to [[labelPropagation]]. */
  def weightedLabelPropagation(edges: DataFrame, srcCol: String,
                               dstCol: String, weightCol: String,
                               nodes: DataFrame, nodeCol: String,
                               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50,
      "weighted LPA: iters must be in [1, 50] (one materialized round each)")
    val norm = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        col(weightCol).cast("long").as("w"))
      .filter(col("u") =!= col("v") && col("w") > 0L)
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    // cut: same per-round re-derivation argument as [[labelPropagation]]
    val sym = Lineage.cut(
      norm.select(col("u").as("s"), col("v").as("d"), col("w"))
        .unionByName(norm.select(col("v").as("s"), col("u").as("d"),
          col("w"))))
    var labels = Lineage.cut(
      nodes.select(col(nodeCol).as("id")).distinct()
        .select(col("id"), col("id").as("lab")))
    for (_ <- 1 to iters) {
      val best = labels.join(sym, labels("id") === sym("s"))
        .groupBy(col("d").as("id2"), col("lab"))
        // decimal vote sums — long would wrap where DuckDB widens
        .agg(sum(col("w").cast("decimal(38,0)")).as("wv"))
        .groupBy(col("id2"))
        .agg(max(struct(col("wv"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id2").as("id"), (-col("m.nl")).as("newlab"))
      labels = Lineage.cut(labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab")))
    }
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, Seq("lab"))
      .select(col("id").as("node"), col("lab").as("community"), col("csize"))
  }

  /** Weighted MODULARITY board — the community-quality score LPA
    * (q221/q315) emits nothing of: per community c,
    * `q_c = w_in(c)/m - (deg(c)/(2m))^2` and globally `Q = Σ q_c`
    * (Newman 2004), with w_in(c) the intra-community edge weight
    * (each undirected edge once), deg(c) the summed weighted degree
    * of members, m the total undirected edge weight.
    *
    * Engine-exact core: every per-community quantity is an INTEGER —
    * the board carries `q_num = 4·m·w_in - deg_sum²` on the common
    * denominator 4m² in decimal(38,0) (at 100 TB, m ~ 1e15 keeps
    * q_num under 1e31 — inside both decimal38 and HUGEINT), and the
    * global Q collapses through ONE fixed IEEE sequence
    * (`Σq_num / 4m²`, then the 6dp floor grid) mirrored by the
    * oracle. Unweighted graphs: pass a `lit(1)` weight column.
    *
    * Scale: one edge-normalization aggregation, one degree
    * aggregation, two label equi-joins keyed on node id, then
    * community-sized frames only; the global window runs over the
    * community board, never the data. Edge weights must be positive
    * integers (snap similarity doubles to the 1e-6 grid upstream —
    * the q315 convention). Output: (community, csize, w_in, deg_sum,
    * modularity) — modularity the GLOBAL 6dp Q replicated per row
    * (the board_ck idiom: per-community q_c needs no second grid). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 weightCol: Column, labels: DataFrame, nodeCol: String,
                 communityCol: String): DataFrame = {
    val norm = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        weightCol.cast("long").as("w"))
      .filter(col("u") =!= col("v") && col("w") > 0L)
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    // normRef feeds THREE aggregations (total weight, degrees, intra-
    // community weight) — cut so the caller's edge derivation runs once
    val normC = Lineage.cut(norm)
    val lab = labels.select(col(nodeCol).as("id"), col(communityCol).as("lab"))
    val mTot = normC.agg(
      sum(col("w").cast("decimal(38,0)")).as("m2"))
    val deg = normC.select(col("u").as("id"), col("w"))
      .unionByName(normC.select(col("v").as("id"), col("w")))
      .groupBy(col("id")).agg(sum(col("w").cast("decimal(38,0)")).as("k"))
    val cdeg = lab.join(deg, Seq("id"), "left")
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("csize"),
        sum(coalesce(col("k"), lit(0).cast("decimal(38,0)"))).as("deg_sum"))
    val win = normC
      .join(lab.select(col("id").as("u"), col("lab").as("la")), Seq("u"))
      .join(lab.select(col("id").as("v"), col("lab").as("lb")), Seq("v"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lab"))
      .agg(sum(col("w").cast("decimal(38,0)")).as("w_in"))
    val board = cdeg.join(win, Seq("lab"), "left")
      .withColumn("w_in",
        coalesce(col("w_in"), lit(0).cast("decimal(38,0)")))
      .crossJoin(broadcast(mTot))
      .withColumn("q_num",
        lit(4).cast("decimal(38,0)") * col("m2") * col("w_in")
          - col("deg_sum") * col("deg_sum"))
    // global Q numerator via aggregate + broadcast cross-join (the mTot
    // idiom above), NOT a partition-less window: the board is bounded
    // by #communities, but at millions of communities a single-
    // partition WindowExec is a one-task straggler while this shape
    // stays a tree-reduced aggregate. The board is lineage-cut first so
    // the edge-sized label joins behind it evaluate once, not once per
    // branch.
    val cutBoard = Lineage.cut(board)
    val qsum = cutBoard.agg(
      sum(col("q_num")).as("__qsum"))
    cutBoard
      .crossJoin(broadcast(qsum))
      .select(col("lab").as("community"), col("csize"),
        col("w_in").cast("long").as("w_in"),
        col("deg_sum").cast("long").as("deg_sum"),
        when(col("m2") > 0,
          floor(col("__qsum").cast("double")
            / (lit(4).cast("decimal(38,0)") * col("m2") * col("m2"))
              .cast("double")
            * lit(1e6) + lit(0.5d)) / lit(1e6))
          .otherwise(lit(null).cast("double")).as("modularity"))
  }

  /** One synchronous modularity-REFINEMENT round (the Louvain local
    * move, batched): every node simultaneously considers its neighbor
    * communities plus staying put, and adopts the community
    * maximizing the exact modularity gain of moving there with the
    * node first lifted out of its own community —
    * `S(u→c) = w(u,c)/m - k_u·deg'(c)/(2m²)` with
    * `deg'(c) = deg(c) - k_u` when c is u's current community. The
    * comparison is the INTEGER numerator on the common denominator
    * 2m² (`2·m·w(u,c) - k_u·deg'(c)`, decimal(38,0)), argmax by
    * (gain desc, community asc) — fully deterministic, engine-
    * replayable, no transcendentals.
    *
    * The synchronous batch round (all nodes decide against the SAME
    * snapshot) is the distributed-Louvain compromise: individual
    * moves are exact greedy steps, simultaneous application can in
    * principle overshoot (two nodes swapping), so run it as a
    * refinement PASS after LPA, not an optimizer loop — the
    * spec-asserted contract is that a misplaced node goes home and
    * the fixture's modularity does not decrease.
    *
    * Scale: one (node, candidate-community) aggregation over the
    * symmetric edge list — fan-out bounded by degree — plus
    * community/degree joins on uniform keys. Output: (node,
    * community, csize), the LPA shape, ready for another
    * [[modularity]] grading. */
  def modularityLocalMove(edges: DataFrame, srcCol: String, dstCol: String,
                          weightCol: Column, labels: DataFrame,
                          nodeCol: String,
                          communityCol: String): DataFrame = {
    val norm = edges.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        weightCol.cast("long").as("w"))
      .filter(col("u") =!= col("v") && col("w") > 0L)
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    val sym = norm.select(col("u").as("s"), col("v").as("d"), col("w"))
      .unionByName(norm.select(col("v").as("s"), col("u").as("d"), col("w")))
    val lab = labels.select(col(nodeCol).as("id"), col(communityCol).as("lab"))
    val mTot = norm.agg(sum(col("w").cast("decimal(38,0)")).as("m2"))
    val deg = sym.groupBy(col("s").as("id"))
      .agg(sum(col("w").cast("decimal(38,0)")).as("k"))
    val cdeg = lab.join(deg, Seq("id"), "left")
      .groupBy(col("lab").as("cand"))
      .agg(sum(coalesce(col("k"), lit(0).cast("decimal(38,0)")))
        .as("cdeg"))
    // candidate communities: every neighbor's label, plus staying put
    val u2c = sym
      .join(lab.select(col("id").as("d"), col("lab").as("cand")), Seq("d"))
      .groupBy(col("s").as("id"), col("cand"))
      .agg(sum(col("w").cast("decimal(38,0)")).as("w_uc"))
    val cands = u2c
      .unionByName(lab.select(col("id"), col("lab").as("cand"))
        .withColumn("w_uc", lit(0).cast("decimal(38,0)")))
      .groupBy(col("id"), col("cand"))
      .agg(max(col("w_uc")).as("w_uc"))
    val scored = cands
      .join(lab, Seq("id"))
      .join(deg, Seq("id"), "left")
      .withColumn("k", coalesce(col("k"), lit(0).cast("decimal(38,0)")))
      .join(cdeg, Seq("cand"))
      .crossJoin(broadcast(mTot))
      .withColumn("cdeg2",
        col("cdeg") - when(col("cand") === col("lab"), col("k"))
          .otherwise(lit(0).cast("decimal(38,0)")))
      .withColumn("gain_num",
        lit(2).cast("decimal(38,0)") * col("m2") * col("w_uc")
          - col("k") * col("cdeg2"))
    val moved = scored
      .groupBy(col("id"))
      .agg(max(struct(col("gain_num"), (-col("cand")).as("nc"))).as("m"))
      .select(col("id"), (-col("m.nc")).as("lab"))
    val sizes = moved.groupBy(col("lab")).agg(count(lit(1)).as("csize"))
    moved.join(sizes, Seq("lab"))
      .select(col("id").as("node"), col("lab").as("community"), col("csize"))
  }

  /** k-CORE peeling (Seidman 1983): repeatedly remove nodes whose
    * degree among SURVIVORS falls below `k`, `rounds` times — the dense
    * subgraph where every member has >= k remaining neighbors. On a
    * near-dup graph the 2-core separates genuinely dense duplicate
    * blobs (template farms, mirrored sites) from incidental pairs; the
    * pairs and pendants that connected-components would glue in are
    * peeled away.
    *
    * The output is the survivor set of EXACTLY `rounds` peels (the BFS
    * maxHops convention): a pure function of the edge set whether or
    * not peeling has converged, so the result is deterministic and
    * relationally replayable round by round. The loop short-circuits
    * once a round removes nothing (peeling is monotone — later rounds
    * are then identity), so `rounds` is a bound, not a cost.
    *
    * Scale: each round is one survivor-restricted degree count (two
    * semi-joins + one id-keyed aggregation, uniform keys) over the
    * CURRENT edge set; [[Lineage.cut]] keeps plans constant-depth.
    * Output: (node, in_core, core_deg) for every node of `nodes` —
    * core_deg the node's degree within the final core. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            nodes: DataFrame, nodeCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1 && rounds <= 50,
      "kCore: rounds must be in [1, 50] (one materialized peel each)")
    val und = undirectedEdges(edges, srcCol, dstCol)
    val sym = Lineage.cut(und.select(col("u").as("s"), col("v").as("d"))
      .unionByName(und.select(col("v").as("s"), col("u").as("d"))))
    var alive = Lineage.cut(sym.select(col("s").as("id")).distinct())
    var aliveN = alive.count()
    var done = false
    for (_ <- 1 to rounds if !done) {
      val deg = sym
        .join(alive.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
        .join(alive.withColumnRenamed("id", "d"), Seq("d"), "left_semi")
        .groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
      alive = Lineage.cut(deg.filter(col("deg") >= k).select(col("id")))
      val n = alive.count()
      done = n == aliveN
      aliveN = n
    }
    val coreDeg = sym
      .join(alive.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
      .join(alive.withColumnRenamed("id", "d"), Seq("d"), "left_semi")
      .groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
    nodes.select(col(nodeCol).as("node")).distinct()
      .join(coreDeg.withColumnRenamed("id", "node"), Seq("node"), "left")
      .select(col("node"), col("deg").isNotNull.as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_deg"))
  }

  /** Adamic–Adar link prediction over the near-dup graph: for every
    * non-adjacent pair at distance 2, score
    * `Σ_z∈N(a)∩N(b) 1/ln(deg z)` — shared RARE neighbors predict a
    * missing edge far more than shared hubs, so a high-AA non-edge is
    * "these two clusters are probably one" (a band the LSH missed) or
    * a candidate blocklist expansion.
    *
    * Plan: symmetrize, one self-join on the shared-neighbor key (the
    * wedge join — the same shape as triangle counting, shuffled on z),
    * per-neighbor 9dp-grid `1/ln(deg)` terms summed as integers, then
    * an anti-join drops pairs that are already edges. Output is bounded
    * by the wedge count of the (already-thresholded) graph. Degree-1
    * neighbors cannot appear as wedge centers, so `ln(deg) >= ln 2` —
    * no division hazard.
    *
    * Hub cap: a center of degree d schedules ~d² wedge rows, so one
    * boilerplate mega-cluster node (deg 10^5+) would put 10^10 rows on
    * a single shuffle key. Centers with `deg > maxCenterDegree` are
    * dropped BEFORE the self-join — principled, because a hub center
    * contributes only `1/ln(deg) ≤ 1/ln(cap)` per wedge, ≈ nothing to
    * AA by design; the dropped mass per surviving pair is bounded by
    * `n_droppedHubsShared/ln(cap)`. The dropped-center count rides on
    * every row as the `dropped_centers` observability column (1-row
    * broadcast scalar) so a caller can see when the cap fired. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxCenterDegree: Long = 10000L): DataFrame = {
    require(maxCenterDegree >= 2, "maxCenterDegree must be >= 2")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    val kept = deg.filter(col("d") <= maxCenterDegree)
    val dropped = deg.agg(coalesce(sum(when(col("d") > maxCenterDegree, 1L)
      .otherwise(0L)), lit(0L)).as("dropped_centers"))
    // join sym with the kept centers FIRST so hub keys never reach the
    // quadratic self-join; d rides along, replacing the later deg join
    val zs = sym.join(kept, col("a") === col("z"))
      .select(col("z"), col("b"), col("d"))
    val wedges = zs.select(col("z"), col("b").as("id_a"), col("d"))
      .join(zs.select(col("z"), col("b").as("id_b")), Seq("z"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__t9", floor(lit(1.0d) / log(col("d").cast("double"))
        * lit(1e9) + lit(0.5d)).cast("long"))
    wedges.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("__t9")).as("__s9"))
      .join(e, col("id_a") === col("a") && col("id_b") === col("b"),
        "left_anti")
      .join(broadcast(dropped))
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("__s9").cast("double") / 1e9).as("aa"), col("dropped_centers"))
  }

  /** HITS hubs and authorities (Kleinberg 1999) over a DIRECTED edge
    * list — the query-independent "which nodes point at good content /
    * are good content" pair PageRank's single score conflates. On a
    * bipartite buyer→supplier graph, authorities are the suppliers
    * many well-connected parts draw from, hubs the parts spreading
    * across strong suppliers.
    *
    * Engine-exact iterations: scores live on a 6dp INTEGER grid,
    * initialized to 10⁶; each half-step sums neighbor scores (exact
    * long sums — score ≤ 10⁶ so the sum needs 9×10¹² in-edges to
    * overflow) and renormalizes by the max via decimal(38,0) floor
    * division (the ·10⁶ renormalizer product would wrap a long at
    * ~9×10⁶ in-edges, so it widens first — identical floors on both
    * engines).
    * No float accumulation, no L2 norm — both engines replay the
    * identical integers, and dividing by the max keeps the scale
    * interpretation (best node = exactly 1.0).
    *
    * Scale: per iteration two edge-keyed joins + two map-side-combined
    * aggregations + a 1-row broadcast max; lineage cut per iteration
    * (the [[Lineage]] policy all iterative graph ops share). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = Lineage.cut(
      edges.select(col(srcCol).as("s"), col(dstCol).as("d")).distinct())
    val nodes = Lineage.cut(e.select(col("s").as("node"))
      .union(e.select(col("d").as("node"))).distinct())
    def half(scores: DataFrame, scoreCol: String, keyIn: String,
             keyOut: String, out: String): DataFrame = {
      val raw = e
        .join(scores.withColumnRenamed("node", keyIn), Seq(keyIn))
        .groupBy(col(keyOut).as("node")).agg(sum(col(scoreCol)).as("__raw"))
      val full = nodes.join(raw, Seq("node"), "left")
        .withColumn("__raw", coalesce(col("__raw"), lit(0L)))
      val mx = full.agg(max(col("__raw")).as("__mx"))
      // decimal(38,0) for the renormalizer product: __raw is bounded
      // by 10⁶ · in-degree, so a long ·10⁶ wraps silently past ~9e6
      // in-edges while DuckDB widens sum() to HUGEINT — the decimal
      // div computes the identical floor on both engines
      Lineage.cut(full.join(broadcast(mx))
        .select(col("node"), coalesce(
          expr("CAST((CAST(__raw AS DECIMAL(38,0)) * 1000000)" +
            " div __mx AS BIGINT)"), lit(0L)).as(out)))
    }
    var hub = nodes.withColumn("h6", lit(1000000L))
    var auth = nodes.withColumn("a6", lit(1000000L))
    for (_ <- 1 to iters) {
      auth = half(hub, "h6", "s", "d", "a6")
      hub = half(auth, "a6", "d", "s", "h6")
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), (col("h6").cast("double") / 1e6).as("hub"),
        (col("a6").cast("double") / 1e6).as("authority"))
  }
}
