package graft.sources

import java.util.Properties

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.IncrementalLoad

/** JDBC parity surface for the reference's actual I/O (ODBC/SQL Server):
  * key-column scans (main.py:49,65), dimension scans (main.py:106-112) and
  * conditional appends (main.py:54,69) against a live RDBMS, as thin
  * `spark.read/write.jdbc` variants of the parquet-native S2–S4 operators.
  *
  * Scale notes (100 TB posture):
  *  - Reads accept a `partitionColumn`/bounds spec so a big table scan
  *    fans out over numPartitions parallel JDBC cursors instead of one.
  *  - `readKeys` selects ONLY the key columns — Spark's JDBC relation
  *    pushes the projection into the generated SELECT, so the DB ships
  *    keys, not rows.
  *  - `appendNew` stages the fresh rows to parquet BEFORE the JDBC
  *    append: the anti-join reads the target table, and JDBC writes
  *    commit per partition, so a task retry re-running the anti-join
  *    against a half-appended table would silently shrink the batch.
  *    Staging pins the row set; the JDBC write then reads only parquet.
  *    (Exactly-once still requires a transactional target or an upsert
  *    key — same semantics as the reference's to_sql append.)
  */
object JdbcSources {

  /** Optional parallel-scan spec: `column` must be integral/date-like and
    * indexed; bounds need not be exact (rows outside still return). */
  final case class PartitionSpec(column: String, lower: Long, upper: Long,
                                 numPartitions: Int)

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** S3/dim scan: whole table (broadcast-sized dims) or partitioned scan. */
  def readTable(spark: SparkSession, url: String, table: String,
                partition: Option[PartitionSpec] = None,
                options: Map[String, String] = Map.empty): DataFrame =
    partition match {
      case Some(ps) =>
        spark.read.jdbc(url, table, ps.column, ps.lower, ps.upper,
          ps.numPartitions, props(options))
      case None => spark.read.jdbc(url, table, props(options))
    }

  /** S2 key scan: only the key columns cross the wire (projection is
    * pushed into the JDBC SELECT). */
  def readKeys(spark: SparkSession, url: String, table: String,
               key: Seq[String], partition: Option[PartitionSpec] = None,
               options: Map[String, String] = Map.empty): DataFrame =
    readTable(spark, url, table, partition, options)
      .select(key.map(org.apache.spark.sql.functions.col): _*)

  /** T1 against a live RDBMS — the reference's actual transaction
    * semantics (one DB transaction spanning all fact loads,
    * main.py:173-195): anti-join each table's incoming rows, bulk-stage
    * them into per-call STAGING TABLES via parallel JDBC writes (the
    * heavy, non-transactional part), then move staging -> target for ALL
    * tables inside ONE driver-side transaction. A failure on any table
    * rolls back every insert; targets are never half-published. Targets
    * are created from their staging shape on first load. Returns rows
    * appended per table. */
  def transactionalAppendAll(spark: SparkSession, url: String,
                             tables: Map[String, (DataFrame, Seq[String])],
                             options: Map[String, String] = Map.empty): Map[String, Long] = {
    require(tables.nonEmpty, "transactionalAppendAll: no tables")
    val tag = math.abs(System.nanoTime() % 1000000000L)
    // stage phase: distributed writes, one staging table per target. On a
    // mid-stage failure, drop the staging tables already written — they
    // must not leak into the target schema.
    val stagedSoFar = scala.collection.mutable.ListBuffer.empty[String]
    val staged =
      try tables.map { case (table, (incoming, key)) =>
        val exists =
          try { spark.read.jdbc(url, table, props(options)).schema; true }
          catch { case _: Exception => false }
        val fresh =
          if (exists)
            graft.etl.IncrementalLoad.newRowsOnly(incoming,
              readKeys(spark, url, table, key, options = options), key)
          else incoming
        val stagingTable = s"${table}_stg_$tag"
        fresh.write.mode("overwrite").jdbc(url, stagingTable, props(options))
        stagedSoFar += stagingTable
        (table, stagingTable, fresh.columns.toSeq, exists)
      } catch {
        case e: Throwable =>
          dropTables(url, options, stagedSoFar.toSeq)
          throw e
      }
    // publish phase: ONE transaction over a single driver connection
    val conn = java.sql.DriverManager.getConnection(url, props(options))
    try {
      conn.setAutoCommit(false)
      val counts = staged.map { case (table, stagingTable, cols, exists) =>
        val st = conn.createStatement()
        try {
          if (!exists)
            st.executeUpdate(
              s"CREATE TABLE $table AS SELECT * FROM $stagingTable WITH NO DATA")
          // Spark's JDBC writer quotes (case-preserves) column names —
          // quote them here too or Derby would uppercase the identifiers
          val colList = cols.map(c => "\"" + c + "\"").mkString(", ")
          val n = st.executeUpdate(
            s"INSERT INTO $table ($colList) SELECT $colList FROM $stagingTable")
          table -> n.toLong
        } finally st.close()
      }
      conn.commit()
      counts.toMap
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Exception => () }
        throw e
    } finally {
      try {
        conn.setAutoCommit(true)
        staged.foreach { case (_, stagingTable, _, _) =>
          val st = conn.createStatement()
          try st.executeUpdate(s"DROP TABLE $stagingTable")
          catch { case _: Exception => () } finally st.close()
        }
      } finally conn.close()
    }
  }

  private def dropTables(url: String, options: Map[String, String],
                         names: Seq[String]): Unit = {
    if (names.nonEmpty) {
      val c = java.sql.DriverManager.getConnection(url, props(options))
      try names.foreach { n =>
        val st = c.createStatement()
        try st.executeUpdate(s"DROP TABLE $n")
        catch { case _: Exception => () } finally st.close()
      } finally c.close()
    }
  }

  /** S4/J2: idempotent conditional append — anti-join `incoming` against
    * the target's current keys, stage the remainder to parquet, append the
    * staged rows. Re-running with the same input appends 0 rows. Returns
    * the number of rows appended. Creates the table on first load. */
  def appendNew(spark: SparkSession, incoming: DataFrame, url: String,
                table: String, key: Seq[String],
                options: Map[String, String] = Map.empty,
                stagingDir: Option[String] = None): Long = {
    val exists =
      try { spark.read.jdbc(url, table, props(options)).schema; true }
      catch { case _: Exception => false }
    val fresh =
      if (exists)
        IncrementalLoad.newRowsOnly(incoming,
          readKeys(spark, url, table, key, options = options), key)
      else incoming
    val stageRoot = stagingDir.getOrElse(
      spark.conf.get("spark.sql.warehouse.dir"))
    val stage = new HPath(stageRoot, s".jdbc-append-staging-${System.nanoTime()}")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      fresh.write.mode("overwrite").parquet(stage.toString)
      val staged = spark.read.parquet(stage.toString)
      val n = staged.count()
      if (n > 0) staged.write.mode("append").jdbc(url, table, props(options))
      n
    } finally fs.delete(stage, true)
  }
}
