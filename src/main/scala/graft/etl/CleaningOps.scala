package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar cleaning / coercion operators (SURVEY.md §2.2).
  *
  * Reference semantics reproduced (cited file:line in the reference repo
  * ITLA-Dextron03/Proceso-de-ETL, studied read-only):
  *  - P6 `limpiar_id` (main.py:38-41): strip a one-letter prefix like "C123"
  *    -> 123, unparseable -> null (pandas `to_numeric(errors='coerce')`).
  *  - P7 (main.py:98-99): datetime parse with coerce -> null, then drop.
  *  - P9/P10 (main.py:126-129): conditional rewrite + string templating.
  *  - P12 (sql:115,132): CHECK range as explicit validation filter.
  *
  * All are pure Column expressions — they stay inside whole-stage codegen and
  * cost nothing extra at 100 TB (no UDF, no serialization boundary). Coerce
  * ops are written to be safe under either value of `spark.sql.ansi.enabled`.
  */
object CleaningOps {

  /** Numeric coerce: long on (optionally signed) integer strings, null
    * otherwise — `pd.to_numeric(errors='coerce')` semantics for integer id
    * columns (decimals are not ids and stay null), matching TRY_CAST(..
    * AS BIGINT) on the oracle side across the full Long range. ANSI-safe:
    * the cast only runs on guarded input; 19-digit values are string-
    * compared against Long.MaxValue so an overflowing literal never
    * reaches the cast. (Sole divergence: the exact value -2^63 coerces to
    * null; TRY_CAST accepts it.) */
  def coerceLong(c: Column): Column = {
    val s = trim(c.cast("string"))
    val body = regexp_replace(s, "^[+-]", "")
    val inRange = length(body) < 19 || body <= lit("9223372036854775807")
    when(s.rlike("^[+-]?[0-9]{1,19}$") && inRange, s.cast("long"))
  }

  /** P6: strip a leading letter prefix (e.g. "C"/"P") and coerce to long. */
  def cleanId(c: Column, prefix: String): Column =
    coerceLong(regexp_replace(c.cast("string"), "^" + prefix, ""))

  /** P7: timestamp parse with coerce -> null (pd.to_datetime errors='coerce'). */
  def coerceTimestamp(c: Column): Column = try_to_timestamp(c)

  /** P12: CHECK (x BETWEEN lo AND hi) as a validation predicate. */
  def checkRange(c: Column, lo: Int, hi: Int): Column = c.between(lo, hi)

  /** NVARCHAR(n) width cap as a validation predicate — the declared
    * column widths the reference leaves to the database to enforce
    * (`Nombre NVARCHAR(100)` / `Email NVARCHAR(150)`,
    * `Base de Datos Relacional copy.sql:49-50,55`), enforced
    * engine-side instead of letting the load transaction blow up on an
    * oversized row. T-SQL CHECK semantics: a NULL value PASSES the
    * constraint (only the NOT NULL clause rejects nulls), hence the
    * coalesce-to-true. Character count, not bytes — both engines
    * compare code points. */
  def lengthCap(c: Column, n: Int): Column =
    coalesce(length(c.cast("string")) <= n, lit(true))

  /** Split a frame into (valid, quarantined) on a CHECK predicate — the
    * engine-side upgrade over the reference's "let the DB reject the row". */
  def validate(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.filter(pred), df.filter(!pred or pred.isNull))

  /** P10 (main.py:126): placeholder display name "Cliente_<id>". */
  def placeholderName(id: Column): Column =
    concat(lit("Cliente_"), id.cast("string"))

  /** P10 (main.py:129): duplicate-email rewrite "cliente_<id>@placeholder.com". */
  def placeholderEmail(id: Column): Column =
    concat(lit("cliente_"), id.cast("string"), lit("@placeholder.com"))

  /** P10 (main.py:126): synthesized-client email "cliente_<id>@mail.com" —
    * distinct from the dup-rewrite form above; the reference uses both. */
  def placeholderMailEmail(id: Column): Column =
    concat(lit("cliente_"), id.cast("string"), lit("@mail.com"))
}
