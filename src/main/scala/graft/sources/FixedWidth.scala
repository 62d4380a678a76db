package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Fixed-width (positional) text source — the mainframe/EDI export
  * format the CSV family (SURVEY.md §2.1 S1) doesn't cover: fields live
  * at fixed byte offsets, no delimiters, no header.
  *
  * Same contract as [[CsvSources]]: explicit schema (offsets + types
  * declared, never inferred), PERMISSIVE parsing with a quarantine
  * column — a line shorter than the declared record width lands whole
  * in `_corrupt` with every field null, so one bad export line never
  * aborts a 100 TB load and the bad rows stay queryable.
  *
  * Scale: `spark.read.text` is a splittable distributed scan; field
  * extraction is codegen'd `substring`/`trim`/`cast` projections —
  * zero shuffle, scan-speed parsing. Type-cast failures on well-sized
  * lines follow the engine's coerce convention (null, ANSI off).
  */
object FixedWidth {

  /** One field: 1-based `start`, byte length, target type. */
  final case class FwField(name: String, start: Int, len: Int, dt: DataType)

  def read(spark: SparkSession, path: String,
           fields: Seq[FwField]): DataFrame = {
    require(fields.nonEmpty, "fixed-width schema must declare fields")
    require(fields.forall(f => f.start >= 1 && f.len >= 1),
      "fields need 1-based start and positive length")
    val width = fields.map(f => f.start + f.len - 1).max
    val raw = spark.read.text(path)
    val ok: Column = length(col("value")) >= width
    val parsed = fields.map { f =>
      when(ok, trim(substring(col("value"), f.start, f.len)).cast(f.dt))
        .otherwise(lit(null)).as(f.name)
    }
    raw.select(parsed :+ when(!ok, col("value")).as("_corrupt"): _*)
  }
}
