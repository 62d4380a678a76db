package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov model of a per-user event sequence: the
  * transition matrix between event types plus the chain's stationary
  * distribution — "given a click, what comes next" and "where does a
  * user's session spend its time in the long run", the behavioral
  * summary funnels (q104) and sessionization read off in fixed stages.
  *
  * Engine-exact throughout (the q287 HITS discipline): transition
  * probabilities live on a 6dp integer grid via BIGINT floor division
  * (`(n·10⁶) div row_total` — nonnegative, so div == floor division on
  * both engines); the stationary vector iterates
  * `v' = normalize(v · P)` with exact integer row products
  * (`v_i · p6_ij div 10⁶`-free: the raw sums stay integers, the sum-
  * renormalization is again a floor division), so every iteration is
  * a sequence both engines replay bit-for-bit.
  *
  * Scale: the lag pairs come from ONE hash shuffle on user (the
  * funnel/sessionize partitioning — windows per user, never a
  * self-join); everything after the (src, dst) count aggregation is
  * |states|²-sized (event vocabularies are small by construction).
  * The power iteration runs on that tiny table with 1-row broadcast
  * normalizers — no lineage growth concern at ≤ 8 iterations over
  * |states|² rows. The integer iteration is overflow-safe up to
  * ~9·10³ states (raw mass ≤ |S|·10¹², renormalizer ·10⁶ must fit a
  * BIGINT); event-type vocabularies sit orders below that. */
object Markov {

  /** (src, dst, n, p) transition rows; `p` = 6dp grid probability. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ts").asc, col("eid").asc)
    val pairs = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(idCol).as("eid"), col(typeCol).as("st"))
      .withColumn("src", lag(col("st"), 1).over(w))
      .filter(col("src").isNotNull)
    val cnt = pairs.groupBy(col("src"), col("st").as("dst"))
      .agg(count(lit(1)).as("n"))
    val rt = cnt.groupBy(col("src")).agg(sum(col("n")).as("__t"))
    cnt.join(rt, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000000L) div __t").as("p6"))
  }

  /** Stationary distribution by `iters` exact power iterations over
    * the 6dp transition grid, started uniform; states with no
    * outgoing edges keep mass only through in-edges (their row is
    * empty — the renormalization re-spreads the lost mass, the
    * standard "remove dangling mass" convention). Output one row per
    * (src, dst): (src, dst, n, p, src_pi). */
  def stationary(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, typeCol: String, iters: Int = 6): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val tr = Lineage.cut(
      transitions(events, userCol, tsCol, idCol, typeCol))
    val states = Lineage.cut(tr.select(col("src").as("state"))
      .union(tr.select(col("dst"))).distinct())
    // fail-loud above the BIGINT-exact bound (the linkage blockGuard
    // idiom): the raw neighbor-sum itself is bounded by |S|·10¹² on
    // the uniform first iteration, so the conservative 9e3 cap keeps
    // every intermediate far inside long range (the renormalizer
    // product additionally runs in decimal below)
    val guard = states.agg(count(lit(1)).as("__k")).select(
      when(col("__k") > 9000L, raise_error(concat(
        lit("Markov.stationary: state count exceeds the integer-exact" +
          " bound (9000): "), col("__k")))).otherwise(lit(1L)).as("__ok"))
    var v = states.join(broadcast(guard), expr("__ok = 1"))
      .select(col("state"), lit(1000000L).as("v6"))
    for (_ <- 1 to iters) {
      val raw = tr.join(v.withColumnRenamed("state", "src"), Seq("src"))
        .groupBy(col("dst").as("state"))
        .agg(sum(col("v6") * col("p6")).as("__raw"))
      val full = states.join(raw, Seq("state"), "left")
        .withColumn("__raw", coalesce(col("__raw"), lit(0L)))
      val tot = full.agg(sum(col("__raw")).as("__tot"))
      // decimal(38,0) for the renormalizer product: __raw peaks at
      // |S|·10¹² on the uniform first iteration, so a long ·10⁶ wraps
      // silently past 9 states while DuckDB widens to HUGEINT — the
      // decimal div computes the identical floor on both engines
      v = Lineage.cut(full.join(broadcast(tot))
        .select(col("state"),
          expr("CAST((CAST(__raw AS DECIMAL(38,0)) * 1000000)" +
            " div __tot AS BIGINT)").as("v6")))
    }
    tr.join(v.withColumnRenamed("state", "src"), Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        (col("p6").cast("double") / 1e6).as("p"),
        (col("v6").cast("double") / 1e6).as("src_pi"))
  }
}
