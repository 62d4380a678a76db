package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of the big side
  * (hot customers, null-ish sentinel keys), a plain shuffle join puts the
  * whole hot key in one task. Salting splits each key into `saltFactor`
  * sub-keys: the big side gets a deterministic salt from its row content,
  * the small side is replicated once per salt value. Result set is
  * identical to the plain join; the hot key's rows spread over
  * `saltFactor` tasks.
  *
  * AQE's skew-join split handles sort-merge skew automatically when
  * statistics see it; explicit salting remains the tool when the skew is
  * known ahead (and for aggregations after the join, where AQE can't
  * rebalance the downstream groupBy).
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltFactor: Int = 8): DataFrame = {
    // Deterministic per-row salt (no rand(): results must be re-run
    // stable): hash of the full row spreads rows uniformly.
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
