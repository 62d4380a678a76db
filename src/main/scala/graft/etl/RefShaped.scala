package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reference-shaped sources derived deterministically from the harness
  * tables, so the FULL OpinionPipeline dataflow (main.py:88-169) can be
  * oracle-checked by the driver: the same derivation is written once as
  * Spark expressions (this file) and once as DuckDB CTEs (`OracleCtes`),
  * and every q7x oracle is `CTEs + SELECT from a pipeline output`.
  *
  * The derivation deliberately exercises every branch of the pipeline:
  *  - clients drops custkeys divisible by 7 -> placeholder synthesis;
  *  - emails collide on custkey % 800 -> duplicate-email rewrite;
  *  - comment ids divisible by 11 are garbage -> coerce-to-null drop;
  *  - survey scores span 0..6 -> CHECK range filter;
  *  - Fuente values are social networks, TipoFuente values are load
  *    channels -> the two dimensions can never be conflated silently.
  */
object RefShaped {

  final case class Sources(clients: DataFrame, products: DataFrame,
                           fuenteDatos: DataFrame, comments: DataFrame,
                           surveys: DataFrame, reviews: DataFrame)

  def sources(s: SparkSession, dir: String): Sources = {
    val customer = Tables.load(s, dir, "customer")
    val part = Tables.load(s, dir, "part")
    val orders = Tables.load(s, dir, "orders")
    val region = Tables.load(s, dir, "region")

    val clients = customer.filter(col("c_custkey") % 7 =!= 0).select(
      col("c_custkey").as("IdCliente"),
      col("c_name").as("Nombre"),
      concat(lit("u"), (col("c_custkey") % 800).cast("string"), lit("@mail.com")).as("Email"))

    val products = part.select(
      col("p_partkey").as("IdProducto"),
      col("p_name").as("Nombre"),
      col("p_brand").as("Categoría"))

    val fuenteDatos = region.select(
      when(col("r_regionkey") === 0, "Archivo").when(col("r_regionkey") === 1, "Web")
        .when(col("r_regionkey") === 2, "API").when(col("r_regionkey") === 3, "BaseDatos")
        .otherwise("Manual").as("TipoFuente"),
      concat(lit("2024-0"), (col("r_regionkey") + 1).cast("string"), lit("-15")).as("FechaCarga"))

    val comments = orders.filter(col("o_orderkey") % 3 === 0).select(
      concat(lit("CM"), col("o_orderkey").cast("string")).as("IdComment"),
      when(col("o_orderkey") % 11 === 0, lit("X"))
        .otherwise(concat(lit("C"), col("o_custkey").cast("string"))).as("IdCliente"),
      concat(lit("P"), (col("o_orderkey") % 200 + 1).cast("string")).as("IdProducto"),
      when(col("o_orderkey") % 4 === 0, "Instagram").when(col("o_orderkey") % 4 === 1, "Twitter")
        .when(col("o_orderkey") % 4 === 2, "Facebook").otherwise("TikTok").as("Fuente"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("Fecha"),
      concat(lit("op "), col("o_orderpriority"), lit(" st "), col("o_orderstatus")).as("comentario"))

    val surveys = orders.filter(col("o_orderkey") % 3 === 1).select(
      col("o_orderkey").as("IdOpinion"),
      col("o_custkey").as("IdCliente"),
      (col("o_orderkey") % 150 + 1).as("IdProducto"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("Fecha"),
      concat(lit("op "), col("o_orderpriority"), lit(" st "), col("o_orderstatus")).as("Comentario"),
      col("o_orderpriority").as("Clasificacion"),
      (col("o_orderkey") % 7).as("PuntajeSatisfaccion"))

    val reviews = orders.filter(col("o_orderkey") % 3 === 2).select(
      concat(lit("R"), col("o_orderkey").cast("string")).as("IdReview"),
      concat(lit("C"), col("o_custkey").cast("string")).as("IdCliente"),
      concat(lit("P"), (col("o_orderkey") % 100 + 1).cast("string")).as("IdProducto"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("Fecha"),
      concat(lit("op "), col("o_orderpriority"), lit(" st "), col("o_orderstatus")).as("Comentario"),
      (col("o_orderkey") % 5 + 1).as("Rating"))

    Sources(clients, products, fuenteDatos, comments, surveys, reviews)
  }

  /** The full pipeline over the derived sources (each q7x selects one
    * output; the DAG is lazy so only that output's branch executes). */
  def out(s: SparkSession, dir: String): OpinionPipeline.Out = {
    val src = sources(s, dir)
    OpinionPipeline.transform(s, src.clients, src.products, src.fuenteDatos,
      src.comments, src.surveys, src.reviews)
  }

  /** DuckDB mirror of `sources` + the pipeline dataflow, shared by every
    * q7x oracle. Inner joins against the dimensions are equivalent to the
    * pipeline's left-join + NOT-NULL drop because dimension names are
    * unique by construction. */
  val OracleCtes: String =
    """WITH clients AS (
      |  SELECT c_custkey AS IdCliente, c_name AS Nombre,
      |         'u' || CAST(c_custkey % 800 AS VARCHAR) || '@mail.com' AS Email
      |  FROM customer WHERE c_custkey % 7 <> 0),
      |products AS (
      |  SELECT p_partkey AS IdProducto, p_name AS Nombre, p_brand AS Categoria FROM part),
      |fuente_datos AS (
      |  SELECT CASE r_regionkey WHEN 0 THEN 'Archivo' WHEN 1 THEN 'Web' WHEN 2 THEN 'API'
      |              WHEN 3 THEN 'BaseDatos' ELSE 'Manual' END AS TipoFuente,
      |         '2024-0' || CAST(r_regionkey + 1 AS VARCHAR) || '-15' AS FechaCarga
      |  FROM region),
      |social_comments AS (
      |  SELECT 'CM' || CAST(o_orderkey AS VARCHAR) AS IdComment,
      |         CASE WHEN o_orderkey % 11 = 0 THEN 'X'
      |              ELSE 'C' || CAST(o_custkey AS VARCHAR) END AS IdCliente,
      |         'P' || CAST(o_orderkey % 200 + 1 AS VARCHAR) AS IdProducto,
      |         CASE o_orderkey % 4 WHEN 0 THEN 'Instagram' WHEN 1 THEN 'Twitter'
      |              WHEN 2 THEN 'Facebook' ELSE 'TikTok' END AS Fuente,
      |         strftime(o_orderdate, '%Y-%m-%d') AS Fecha,
      |         'op ' || o_orderpriority || ' st ' || o_orderstatus AS comentario
      |  FROM orders WHERE o_orderkey % 3 = 0),
      |surveys AS (
      |  SELECT o_orderkey AS IdOpinion, o_custkey AS IdCliente,
      |         o_orderkey % 150 + 1 AS IdProducto,
      |         strftime(o_orderdate, '%Y-%m-%d') AS Fecha, 'op ' || o_orderpriority || ' st ' || o_orderstatus AS Comentario,
      |         o_orderpriority AS Clasificacion, o_orderkey % 7 AS PuntajeSatisfaccion
      |  FROM orders WHERE o_orderkey % 3 = 1),
      |web_reviews AS (
      |  SELECT 'R' || CAST(o_orderkey AS VARCHAR) AS IdReview,
      |         'C' || CAST(o_custkey AS VARCHAR) AS IdCliente,
      |         'P' || CAST(o_orderkey % 100 + 1 AS VARCHAR) AS IdProducto,
      |         strftime(o_orderdate, '%Y-%m-%d') AS Fecha, 'op ' || o_orderpriority || ' st ' || o_orderstatus AS Comentario,
      |         o_orderkey % 5 + 1 AS Rating
      |  FROM orders WHERE o_orderkey % 3 = 2),
      |categorias AS (
      |  SELECT CAST(row_number() OVER (ORDER BY Nombre) AS BIGINT) AS IdCategoria, Nombre
      |  FROM (SELECT DISTINCT trim(Categoria) AS Nombre FROM products WHERE Categoria IS NOT NULL)),
      |clasificaciones AS (
      |  SELECT CAST(row_number() OVER (ORDER BY Nombre) AS BIGINT) AS IdClasificacion, Nombre
      |  FROM (SELECT DISTINCT trim(Clasificacion) AS Nombre FROM surveys WHERE Clasificacion IS NOT NULL)),
      |fuentes AS (
      |  SELECT CAST(row_number() OVER (ORDER BY Nombre) AS BIGINT) AS IdFuente, Nombre
      |  FROM (SELECT DISTINCT trim(Fuente) AS Nombre FROM social_comments WHERE Fuente IS NOT NULL)),
      |cargas AS (
      |  SELECT CAST(row_number() OVER (ORDER BY Nombre) AS BIGINT) AS IdCarga, Nombre, FechaCarga
      |  FROM (SELECT TipoFuente AS Nombre, TRY_CAST(FechaCarga AS TIMESTAMP) AS FechaCarga
      |        FROM fuente_datos WHERE TipoFuente IS NOT NULL)
      |  WHERE FechaCarga IS NOT NULL),
      |required AS (
      |  SELECT DISTINCT IdCliente FROM (
      |    SELECT TRY_CAST(regexp_replace(IdCliente, '^C', '') AS BIGINT) AS IdCliente FROM social_comments
      |    UNION ALL
      |    SELECT TRY_CAST(CAST(IdCliente AS VARCHAR) AS BIGINT) FROM surveys
      |    UNION ALL
      |    SELECT TRY_CAST(regexp_replace(IdCliente, '^C', '') AS BIGINT) FROM web_reviews)
      |  WHERE IdCliente IS NOT NULL),
      |clientes_all AS (
      |  SELECT IdCliente, Nombre, Email FROM clients
      |  UNION ALL
      |  SELECT IdCliente, 'Cliente_' || CAST(IdCliente AS VARCHAR) AS Nombre,
      |         'cliente_' || CAST(IdCliente AS VARCHAR) || '@mail.com' AS Email
      |  FROM required WHERE IdCliente NOT IN (SELECT IdCliente FROM clients)),
      |clientes_rw AS (
      |  SELECT IdCliente, Nombre,
      |         CASE WHEN count(*) OVER (PARTITION BY Email) > 1
      |              THEN 'cliente_' || CAST(IdCliente AS VARCHAR) || '@placeholder.com'
      |              ELSE Email END AS Email
      |  FROM clientes_all),
      |clientes AS (
      |  -- DDL width caps (NVARCHAR Nombre 100 / Email 150, sql:49-50),
      |  -- applied AFTER the dup-email rewrite exactly like the engine;
      |  -- NULL passes (CHECK semantics)
      |  SELECT IdCliente, Nombre, Email FROM clientes_rw
      |  WHERE (Nombre IS NULL OR length(Nombre) <= 100)
      |    AND (Email IS NULL OR length(Email) <= 150)),
      |productos AS (
      |  SELECT p.IdProducto, p.Nombre, c.IdCategoria
      |  FROM (SELECT TRY_CAST(CAST(IdProducto AS VARCHAR) AS BIGINT) AS IdProducto, Nombre, Categoria
      |        FROM products WHERE IdProducto IS NOT NULL) p
      |  LEFT JOIN categorias c ON trim(p.Categoria) = c.Nombre),
      |comentarios AS (
      |  SELECT IdComment, IdCliente, IdProducto, f.IdFuente,
      |         CAST(TRY_CAST(sc.Fecha AS TIMESTAMP) AS DATE) AS Fecha,
      |         comentario AS Comentario
      |  FROM (SELECT IdComment,
      |               TRY_CAST(regexp_replace(IdCliente, '^C', '') AS BIGINT) AS IdCliente,
      |               TRY_CAST(regexp_replace(IdProducto, '^P', '') AS BIGINT) AS IdProducto,
      |               Fuente, Fecha, comentario
      |        FROM social_comments) sc
      |  JOIN fuentes f ON sc.Fuente = f.Nombre
      |  WHERE IdCliente IS NOT NULL AND IdProducto IS NOT NULL
      |    AND IdCliente IN (SELECT IdCliente FROM clientes)),
      |encuestas AS (
      |  SELECT IdOpinion, IdCliente, IdProducto,
      |         (SELECT IdCarga FROM cargas WHERE Nombre = 'Archivo') AS IdCarga,
      |         CAST(TRY_CAST(s.Fecha AS TIMESTAMP) AS DATE) AS Fecha,
      |         Comentario, c.IdClasificacion, PuntajeSatisfaccion
      |  FROM (SELECT IdOpinion, TRY_CAST(CAST(IdCliente AS VARCHAR) AS BIGINT) AS IdCliente,
      |               TRY_CAST(CAST(IdProducto AS VARCHAR) AS BIGINT) AS IdProducto,
      |               Fecha, Comentario, Clasificacion, PuntajeSatisfaccion
      |        FROM surveys) s
      |  JOIN clasificaciones c ON s.Clasificacion = c.Nombre
      |  WHERE IdCliente IS NOT NULL AND IdProducto IS NOT NULL
      |    AND IdCliente IN (SELECT IdCliente FROM clientes)
      |    AND (SELECT IdCarga FROM cargas WHERE Nombre = 'Archivo') IS NOT NULL
      |    AND PuntajeSatisfaccion BETWEEN 1 AND 5),
      |webreviews AS (
      |  SELECT IdReview, IdCliente, IdProducto,
      |         (SELECT IdCarga FROM cargas WHERE Nombre = 'Web') AS IdCarga,
      |         CAST(TRY_CAST(wr.Fecha AS TIMESTAMP) AS DATE) AS Fecha,
      |         Comentario, Rating
      |  FROM (SELECT IdReview,
      |               TRY_CAST(regexp_replace(IdCliente, '^C', '') AS BIGINT) AS IdCliente,
      |               TRY_CAST(regexp_replace(IdProducto, '^P', '') AS BIGINT) AS IdProducto,
      |               Fecha, Comentario, Rating
      |        FROM web_reviews) wr
      |  WHERE IdCliente IS NOT NULL AND IdProducto IS NOT NULL
      |    AND IdCliente IN (SELECT IdCliente FROM clientes)
      |    AND (SELECT IdCarga FROM cargas WHERE Nombre = 'Web') IS NOT NULL
      |    AND Rating BETWEEN 1 AND 5)
      |""".stripMargin
}
