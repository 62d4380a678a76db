package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: the full engine surface is also reachable as ANSI SQL
  * through Catalyst — register the star schema as temp views and run any
  * query. This is the "switch from the reference" path for SQL users: the
  * same statements DuckDB/SQL Server users write run unchanged on Spark.
  */
object Engine {

  /** Register every harness table as a temp view named like the table. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.All.foreach { name =>
      Tables.load(spark, dir, name).createOrReplaceTempView(name)
    }

  /** Run SQL against the registered star schema. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(query)
  }
}
