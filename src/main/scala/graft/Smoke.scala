package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: mirrors the driver's t1 check (entry rows>0) and
  * optionally shows/explains one named query.
  *
  * Usage: runMain graft.Smoke [queryName [sfDir]]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Tables.tune(SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case None =>
        val df = SparkEntry.entry(spark)
        df.show(20, truncate = false)
        println("ENTRY_ROWS=" + df.count())
      case Some(name) =>
        val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
        val df = SparkEntry.queries(name)(spark, dir)
        df.explain("formatted")
        df.show(20, truncate = false)
        println("ROWS=" + df.count())
    }
    spark.stop()
  }
}
