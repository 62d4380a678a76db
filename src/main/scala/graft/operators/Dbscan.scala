package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN, Ester et al. 1996) over an
  * embedding corpus under cosine similarity — the "find dense regions
  * and the noise between them" complement of the centroid family
  * (IVF k-means, SemDeDup clusters): no k to pick, arbitrary cluster
  * shape, an explicit noise verdict per point.
  *
  * ε-neighborhood candidates come from the same two-table sign-LSH
  * bucketing the graph-ANN index uses ([[GraphAnn.tableKeys]], literal
  * hyperplanes shared with the oracle), rescored with the exact 6dp
  * cosine — the standard scale concession: the neighbor relation is
  * LSH-candidate-bounded rather than exhaustive, deterministic, and
  * replayed verbatim by the oracle; raise `planes`/`tables` to trade
  * recall for bucket size. Roles follow the classic definitions:
  * core = ≥ `minPts` ε-neighbors (self excluded), clusters = connected
  * components of the core–core ε-graph (the house star-contraction CC,
  * min-id representative), border = non-core with a core ε-neighbor
  * (assigned the SMALLEST cluster id among its core neighbors'
  * clusters — a fixed tie rule; plain DBSCAN leaves border
  * assignment order-dependent), noise =
  * the rest.
  *
  * Scale: bucket self-joins are id-only and fail loudly past
  * `maxBucket` (the linkage blockGuard idiom — a degenerate bucket
  * means the plane count no longer matches the corpus); rescoring
  * joins carry vectors only for surviving candidate pairs; everything
  * after the ε-pair stage is pair/node-sized. Star-contraction CC is
  * O(log n) rounds with lineage cuts. */
object Dbscan {

  /** Output: (vec_id, role ∈ core/border/noise, cluster_id; -1 for
    * noise). `tau` is the 6dp-rounded cosine threshold. */
  def dbscan(emb: DataFrame, idCol: String, vecCol: String,
             dim: Int, planes: Int, tables: Int,
             tau: Double, minPts: Int, maxBucket: Int = 65536): DataFrame = {
    require(minPts >= 1 && tau > 0.0 && tau < 1.0,
      "minPts >= 1 and 0 < tau < 1")
    val ck = GraphAnn.tableKeys(emb, idCol, vecCol, dim, planes, tables,
      "vec_id")
    val guard = ck.groupBy(col("tbl"), col("key"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx")).select(
        when(col("__mx") > maxBucket, raise_error(concat(
          lit(s"dbscan LSH bucket exceeds maxBucket=$maxBucket: "),
          col("__mx")))).otherwise(lit(1L)).as("__ok"))
    val cand = ck
      .join(ck.select(col("tbl"), col("key"), col("vec_id").as("dst")),
        Seq("tbl", "key"))
      .filter(col("vec_id") < col("dst"))
      .select(col("vec_id").as("id_a"), col("dst").as("id_b")).distinct()
      .join(broadcast(guard), expr("__ok = 1"))
    val c = emb.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val pairs = Lineage.cut(cand
      .join(c.select(col("vec_id").as("id_a"), col("cv").as("va")),
        Seq("id_a"))
      .join(c.select(col("vec_id").as("id_b"), col("cv").as("vb")),
        Seq("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), 6) >= tau)
      .select(col("id_a"), col("id_b")))
    val sym = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    // core feeds three consumers and coreClusters two — cut both so
    // the degree aggregation and (especially) the star-contraction CC
    // run once, not once per consumer (both frames are node-sized)
    val core = Lineage.cut(sym.groupBy(col("id_a").as("vec_id"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= minPts).select(col("vec_id")))
    val ccEdges = pairs
      .join(core.withColumnRenamed("vec_id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(core.withColumnRenamed("vec_id", "id_b"), Seq("id_b"),
        "left_semi")
    // isolated core points (no core neighbor) are singleton clusters
    val coreClusters = Lineage.cut(core
      .join(Dedup.clustersStar(ccEdges).withColumnRenamed("id", "vec_id"),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id")))
    val border = sym
      .join(coreClusters.withColumnRenamed("vec_id", "id_b"), Seq("id_b"))
      .join(core.withColumnRenamed("vec_id", "id_a"), Seq("id_a"),
        "left_anti")
      .groupBy(col("id_a").as("vec_id"))
      .agg(min(col("cluster_id")).as("cluster_id"))
    val tagged = coreClusters.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    emb.select(col(idCol).as("vec_id")).join(tagged, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }
}
