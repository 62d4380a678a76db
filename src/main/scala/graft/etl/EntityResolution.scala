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

  /** Fuzzy name matching: candidate entity pairs within edit distance
    * `maxDist`, generated per blocking key (the classic blocked
    * record-linkage shape — never an all-pairs cross join).
    *
    * Resolution runs over the DISTINCT-name dimension: dedupe first, so
    * fact-table row counts never enter the pair space. The self-join
    * shuffles on the block key only; pair volume is bounded by
    * sum(block_size^2), which the caller controls via the blocking
    * function — at 100 TB the names dimension is still dimension-sized,
    * and a too-coarse block shows up as one skewed task, not a wrong
    * answer. `levenshtein` is codegen'd (built-in StringExpressions).
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, block: Column,
                 maxDist: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).na.drop().distinct()
      .withColumn("blk", block)
    val a = names.select(col("name").as("name_a"), col("blk"))
    val b = names.select(col("name").as("name_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }
}
