package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules: which items CO-OCCUR in a basket
  * beyond what their individual frequencies predict — the classic
  * support/confidence/lift mining, here over item PAIRS (the useful and
  * tractable core; longer itemsets are the same counting pattern).
  *
  * A basket is whatever `basketCols` identify (a user-day, a session, an
  * order); items are deduplicated within a basket (presence, not
  * multiplicity — standard basket semantics).
  *
  * Determinism: all counts are exact BIGINTs; confidence and lift are
  * single divisions over exact-double products (counts < 2^26 keep every
  * product exact), snapped to the 6dp grid.
  *
  * Scale: the basket dedup and the within-basket self-join both shuffle
  * on the basket key; pair fan-out per basket is C(items, 2) — bounded
  * by the per-basket item-vocabulary, NOT corpus size (cap upstream if
  * baskets can be degenerate). Item counts are a vocabulary-sized frame
  * (broadcast); the basket total rides as a broadcast 1-row frame.
  */
object Baskets {

  def pairRules(df: DataFrame, basketCols: Seq[String], itemCol: String,
                minPairSupport: Long): DataFrame = {
    val items = df.select((basketCols.map(col) :+ col(itemCol).as("item")): _*)
      .distinct()
    val nBaskets = items.select(basketCols.map(col): _*).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val a = items.select((basketCols.map(col) :+ col("item").as("item_a")): _*)
      .alias("__ba")
    val b = items.select((basketCols.map(col) :+ col("item").as("item_b")): _*)
      .alias("__bb")
    val keyCond = basketCols.map(k => col(s"__ba.$k") === col(s"__bb.$k"))
      .reduce(_ && _)
    val pairs = a.join(b, keyCond && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    def grid(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    pairs
      .join(broadcast(itemCounts.select(col("item").as("item_a"), col("cnt").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(itemCounts.select(col("item").as("item_b"), col("cnt").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        grid(col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        grid(col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_ab"),
        grid(col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_ba"),
        grid(col("n_ab").cast("double") * col("n_baskets").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }
}
