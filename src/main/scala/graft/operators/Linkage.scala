package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LinkageKernels

/** Record linkage: blocking schemes and pair scoring.
  *
  * The reference dedupes entities by exact-key groups (main.py:120-131);
  * real-world linkage needs the two classic blocking schemes — key
  * blocking and sorted neighborhood — plus a principled pair scorer
  * (Fellegi–Sunter). All three are expressed as declarative plans:
  * blocking is an equi-join Catalyst shuffles on the block key, scoring
  * is scan-side integer/codegen arithmetic, and the only collect is
  * bounded by the partition count (global-rank offsets).
  */
object Linkage {

  /** Within-block candidate pairs scored by Jaro–Winkler, `id_a < id_b`.
    *
    * One shuffle on the block key; the O(block^2) pair expansion is the
    * classic blocking trade-off, so `maxBlock` is a fail-loud guard: at
    * 100 TB a degenerate block key (empty string, 'unknown') would
    * otherwise quietly schedule a quadratic join. The check rides the
    * same shuffled layout — a tiny count aggregate, not a second scan.
    */
  def blockedJaroPairs(df: DataFrame, nameCol: String, idCol: String,
                       block: Column, threshold: Double,
                       maxBlock: Int = 1 << 20): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0, "threshold must be in [0,1]")
    val t6 = math.floor(threshold * 1e6 + 0.5).toLong
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("name")).na.drop()
      .withColumn("blk", block)
    val guard = blockGuard(rows, maxBlock)
    val a = rows.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
    val b = rows.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .join(broadcast(guard), expr("__ok = 1"))
      .withColumn("__jw6", floor(
        LinkageKernels.jaroWinklerCol(col("name_a"), col("name_b")) * 1e6
          + lit(0.5d)).cast("long"))
      .filter(col("__jw6") >= t6)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        (col("__jw6").cast("double") / 1e6).as("jw"))
  }

  /** Best fuzzy match per record among its block peers, ties broken by
    * the smaller candidate id; records whose best score stays below
    * `threshold` drop out. Output is one row per surviving record.
    *
    * EXACT distinct-name decomposition instead of the naive id-level
    * pair expansion (which is quadratic in DUPLICATED rows — 40M JW
    * evaluations on a 20k-part table whose names repeat): per block,
    * JW runs only over DISTINCT name pairs; an id's candidates are
    * then (a) its own duplicate name at jw=1.0 (partner = the smallest
    * OTHER id of that name) and (b) the best distinct-name match, each
    * name represented by its smallest id — identical to the full
    * expansion under the (jw6 desc, id asc) argmax, because every
    * same-name candidate scores the maximal 1e6 and every id of a
    * rival name scores identically (so only its minimum id can win).
    * The `maxBlock` guard bounds DISTINCT names per block — the actual
    * quadratic driver. */
  def bestMatch(df: DataFrame, nameCol: String, idCol: String,
                block: Column, threshold: Double,
                maxBlock: Int = 1 << 20): DataFrame = {
    val t6 = math.floor(threshold * 1e6 + 0.5).toLong
    val rows = df.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("name")).na.drop()
      .withColumn("blk", block)
    val w2 = Window.partitionBy(col("blk"), col("name")).orderBy(col("id").asc)
    val ranked = rows.withColumn("__rk", row_number().over(w2))
    val nameAgg = ranked.groupBy(col("blk"), col("name"))
      .agg(count(lit(1)).as("__cnt"), min(col("id")).as("__id1"),
        min(when(col("__rk") === 2, col("id"))).as("__id2"))
    val dn = nameAgg.select(col("blk"), col("name"), col("__id1"))
    val guard = blockGuard(dn, maxBlock)
    val bestd = dn
      .join(dn.select(col("blk"), col("name").as("__name_b"),
        col("__id1").as("__idb")), Seq("blk"))
      .filter(col("name") =!= col("__name_b"))
      .join(broadcast(guard), expr("__ok = 1"))
      .withColumn("__jw6", floor(
        LinkageKernels.jaroWinklerCol(col("name"), col("__name_b")) * 1e6
          + lit(0.5d)).cast("long"))
      .groupBy(col("blk"), col("name"))
      .agg(max(struct(col("__jw6"), (-col("__idb")).as("__nb"),
        col("__idb").as("id_b"), col("__name_b").as("name_b"))).as("__bd"))
    val dupPartner = when(col("id") === col("__id1"), col("__id2"))
      .otherwise(col("__id1"))
    val dupCand = when(col("__cnt") >= 2L,
      struct(lit(1000000L).as("__jw6"), (-dupPartner).as("__nb"),
        dupPartner.as("id_b"), col("name").as("name_b")))
    ranked.join(nameAgg, Seq("blk", "name"))
      .join(bestd, Seq("blk", "name"), "left")
      .withColumn("__best", greatest(dupCand, col("__bd")))
      .filter(col("__best.__jw6") >= t6)
      .select(col("id"), col("name"), col("__best.id_b").as("best_id"),
        col("__best.name_b").as("best_name"),
        (col("__best.__jw6").cast("double") / 1e6).as("jw"))
  }

  private def blockGuard(rows: DataFrame, maxBlock: Int): DataFrame =
    rows.groupBy(col("blk")).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx")).select(
        when(col("__mx") > maxBlock, raise_error(concat(
          lit(s"linkage block exceeds maxBlock=$maxBlock: "), col("__mx"))))
          .otherwise(lit(1L)).as("__ok"))

  /** Dense global rank 1..n by `(sortCols, idCol)` WITHOUT a
    * single-partition window: range-repartition, per-partition ranks
    * (a parallel window keyed by partition id), then add exclusive
    * per-partition offsets collected as one row per partition. The
    * collect is bounded by the partition count, never the data. The
    * ranged layout is materialized once (Lineage.cut) so the offset
    * count and the rank pass see identical partition boundaries. */
  def globalRank(df: DataFrame, sortCols: Seq[String], idCol: String,
                 numPartitions: Int = 0): DataFrame = {
    val np = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val order = sortCols.map(col) :+ col(idCol)
    val ranged = Lineage.cut(
      df.repartitionByRange(np, order: _*)
        .withColumn("__pid", spark_partition_id().cast("long")))
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offExpr = counts.map(_._1).zip(offsets)
      .foldLeft(lit(0L)) { case (acc, (pid, off)) =>
        when(col("__pid") === pid, lit(off)).otherwise(acc) }
    val w = Window.partitionBy(col("__pid"))
      .orderBy(order.map(_.asc): _*)
    ranged.withColumn("rank", row_number().over(w).cast("long") + offExpr)
      .drop("__pid")
  }

  /** Sorted-neighborhood linkage: records sorted by `keyCol`, each
    * paired with its next `w` neighbors in global sort order, scored by
    * Jaro–Winkler. Complements key blocking — near-misses that land in
    * different blocks (typo in the block key itself) still sort
    * adjacently. The neighbor expansion is an equi-join on rank (explode
    * of 1..w), so total pairs are exactly `w * n` — linear, not
    * quadratic, in the corpus. */
  def sortedNeighborhood(df: DataFrame, keyCol: String, idCol: String,
                         w: Int, threshold: Double): DataFrame = {
    require(w >= 1, "window must be >= 1")
    val ranked = globalRank(
      df.select(col(idCol).cast("long").as("id"), col(keyCol).as("name")).na.drop(),
      Seq("name"), "id")
    val a = ranked.select(col("rank"), col("id").as("id_a"), col("name").as("name_a"))
      .withColumn("__i", explode(sequence(lit(1), lit(w))))
      .withColumn("rank_b", col("rank") + col("__i").cast("long"))
    val b = ranked.select(col("rank").as("rank_b"), col("id").as("id_b"),
      col("name").as("name_b"))
    val t6 = math.floor(threshold * 1e6 + 0.5).toLong
    a.join(b, Seq("rank_b"))
      .withColumn("__jw6", floor(
        LinkageKernels.jaroWinklerCol(col("name_a"), col("name_b")) * 1e6
          + lit(0.5d)).cast("long"))
      .filter(col("__jw6") >= t6)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("__i").cast("long").as("rank_gap"),
        (col("__jw6").cast("double") / 1e6).as("jw"))
  }

  /** One Fellegi–Sunter comparison field: `feature` is the per-RECORD
    * comparison value (a pair agrees on the field when both records'
    * features are equal); `m` / `u` the match/unmatch agreement
    * probabilities. Weights enter the plan as 6dp integer literals
    * (`floor(log2(ratio)*1e6+0.5)`) computed HERE, driver-side, so the
    * distributed plan is pure integer addition and the oracle can embed
    * the identical literals. */
  final case class FsField(name: String, feature: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"field $name: need 0 < u < m < 1")
    private def w6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val agreeW6: Long = w6(math.log(m / u) / math.log(2.0))
    val disagreeW6: Long = w6(math.log((1 - m) / (1 - u)) / math.log(2.0))
  }

  /** Fellegi–Sunter probabilistic linkage over blocked pairs: each
    * field contributes its log2 likelihood-ratio weight (agreement ->
    * +w_a, disagreement -> w_d, both precomputed 6dp literals); the
    * summed score classifies pairs into link / possible / non-link by
    * the two thresholds. Returns per-(block, decision) aggregates —
    * bounded output no matter the pair count. One shuffle for the
    * block join, one map-side-combined aggregation. */
  def fellegiSunter(df: DataFrame, idCol: String, block: Column,
                    fields: Seq[FsField], lower: Double, upper: Double,
                    maxBlock: Int = 1 << 20): DataFrame = {
    require(fields.nonEmpty && lower <= upper, "need fields and lower <= upper")
    val rows = df.withColumn("__id", col(idCol).cast("long"))
      .withColumn("blk", block)
    val guard = blockGuard(rows, maxBlock)
    val keep = Seq(col("blk"), col("__id")) ++
      fields.map(f => f.feature.as(s"__f_${f.name}"))
    val side = rows.select(keep: _*)
    def renamed(sfx: String): DataFrame =
      fields.foldLeft(side.withColumnRenamed("__id", s"__id$sfx")) {
        (d, f) => d.withColumnRenamed(s"__f_${f.name}", s"__f_${f.name}$sfx") }
    val pairs = renamed("_a").join(renamed("_b"), Seq("blk"))
      .filter(col("__id_a") < col("__id_b"))
      .join(broadcast(guard), expr("__ok = 1"))
    val score6 = fields.map(f =>
      when(col(s"__f_${f.name}_a") === col(s"__f_${f.name}_b"),
        lit(f.agreeW6)).otherwise(lit(f.disagreeW6)))
      .reduce(_ + _)
    val lo6 = math.floor(lower * 1e6 + 0.5).toLong
    val hi6 = math.floor(upper * 1e6 + 0.5).toLong
    pairs.withColumn("__s6", score6)
      .withColumn("decision",
        when(col("__s6") >= hi6, lit("link"))
          .when(col("__s6") <= lo6, lit("non_link"))
          .otherwise(lit("possible")))
      .groupBy(col("blk").as("block"), col("decision"))
      .agg(count(lit(1)).as("n_pairs"),
        (min(col("__s6")).cast("double") / 1e6).as("min_score"),
        (max(col("__s6")).cast("double") / 1e6).as("max_score"))
  }
}
