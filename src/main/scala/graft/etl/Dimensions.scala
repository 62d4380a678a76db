package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-building operators (SURVEY.md §2.3 A1/A2/A6, §7 step 2).
  *
  * Reference: dimension extraction `series.dropna().unique()` (main.py:92-94),
  * keep-first dedup (main.py:97,122), IDENTITY(1,1) surrogate keys
  * (Base de Datos Relacional copy.sql:54,66,72,78).
  *
  * Scale notes: dimensions are small by definition — a single-partition
  * window for surrogate keys is fine (and the only correct way to get dense,
  * re-run-stable ids; `monotonically_increasing_id` is neither dense nor
  * stable across partitionings). Fact-side dedup never uses these paths —
  * it shuffles on the dedup key (see Dedup operators).
  */
object Dimensions {

  /** A1: distinct non-null values of one column -> 1-column dimension frame. */
  def distinctExtract(df: DataFrame, col: String, as: String): DataFrame =
    df.select(trim(df(col)).as(as)).na.drop().distinct()

  /** A2: deterministic keep-first dedup. pandas `drop_duplicates(keep='first')`
    * keeps file order; Spark needs an explicit order column. `ord` is that
    * ingest ordinal (caller adds `monotonically_increasing_id()` *before any
    * shuffle* as a file-order proxy, or uses a natural key). */
  def dedupKeepFirst(df: DataFrame, key: Seq[String], ord: String): DataFrame = {
    val w = Window.partitionBy(key.map(df(_)): _*).orderBy(df(ord).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A6: IDENTITY(1,1)-equivalent surrogate keys: dense, starting at
    * `offset`+1, stable across re-runs because they're assigned by a total
    * order on the natural key — not by physical row position. */
  def surrogateKeys(df: DataFrame, naturalKey: String, idCol: String,
                    offset: Long = 0L): DataFrame = {
    // partitionBy(lit): deliberately ONE task — dimensions are bounded
    // (enum-sized) by definition, and a dense global row_number needs a
    // total order. Fact-scale top-k must never use this (see q16's
    // TakeOrderedAndProject shape instead).
    val w = Window.partitionBy(lit(0)).orderBy(col(naturalKey).asc)
    df.withColumn(idCol, (row_number().over(w) + lit(offset)).cast("long"))
  }

  /** A1+A2+A6 composed: build a ready-to-load dimension from a fact column,
    * as the reference does for Categorias/Clasificaciones/Fuentes
    * (main.py:92-100). */
  def buildDimension(src: DataFrame, valueCol: String, nameCol: String,
                     idCol: String, offset: Long = 0L): DataFrame =
    surrogateKeys(distinctExtract(src, valueCol, nameCol), nameCol, idCol, offset)
      .select(col(idCol), col(nameCol))
}
