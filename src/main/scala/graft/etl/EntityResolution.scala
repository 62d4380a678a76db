package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution block (SURVEY.md §2.3-§2.5 A3/A4/J4/U1/P9, §7 step 3).
  *
  * Reference: the clientes chain (main.py:120-129) — union of required client
  * ids across all fact sources, except existing, synthesize placeholder
  * clients, flag duplicate-email groups and rewrite conflicting emails so no
  * customer row is dropped (README.md:110-111).
  *
  * Scale notes: `requiredUniverse` is a union + distinct over fact key
  * columns — at 100 TB this is a single shuffle on the key, map-side
  * partial-distinct first (Spark does this automatically for distinct).
  * The except-vs-existing is a shuffle-free broadcast anti-join when the
  * existing dimension is small, sort-merge otherwise; Catalyst picks.
  */
object EntityResolution {

  /** A3/U1: distinct union of a key column across N source frames. */
  def requiredUniverse(keyCol: String, sources: DataFrame*): DataFrame =
    sources.map(_.select(col(keyCol)).na.drop())
      .reduce(_ unionByName _)
      .distinct()

  /** J4: required-minus-existing -> synthesized placeholder rows
    * (main.py:124-127). `build` turns the missing key into a full row. */
  def missingKeys(required: DataFrame, existing: DataFrame, keyCol: String): DataFrame =
    required.select(col(keyCol)).join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")

  def placeholders(required: DataFrame, existing: DataFrame, keyCol: String)
                  (build: Column => Seq[Column]): DataFrame = {
    val missing = missingKeys(required, existing, keyCol)
    missing.select(build(col(keyCol)): _*)
  }

  /** A4: flag ALL members of any duplicate group on `key` (pandas
    * `duplicated(keep=False)`, main.py:128). Window count, one shuffle. */
  def dupGroupFlag(df: DataFrame, key: String, flagCol: String): DataFrame =
    df.withColumn(flagCol,
      count(lit(1)).over(Window.partitionBy(col(key))) > 1)

  /** A4+P9 composed: rewrite `target` with `replacement` for every row in a
    * duplicate group — the email-conflict fix (main.py:128-129) that keeps
    * UNIQUE satisfiable without dropping rows. */
  def rewriteDupGroups(df: DataFrame, key: String, target: String,
                       replacement: Column): DataFrame = {
    val n = count(lit(1)).over(Window.partitionBy(col(key)))
    df.withColumn(target, when(n > 1, replacement).otherwise(col(target)))
  }
}
