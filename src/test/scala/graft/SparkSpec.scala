package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session: one per suite (lazy), tuned like Verify/Bench. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Tables.tune(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        { val w = java.nio.file.Files.createTempDirectory("graft-warehouse")
          w.toFile.deleteOnExit(); w.toString })
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.etl.IncrementalLoad.deleteRecursively(p)))
    p.toString
  }
}
