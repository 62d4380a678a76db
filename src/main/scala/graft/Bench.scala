package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen once on the smallest SF so measured times are
    // query cost, not first-call class-loading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // dev loop: SPARK_GRAFT_ONLY=q245_...,q269_... times a subset
    val only: String => Boolean = sys.env.get("SPARK_GRAFT_ONLY")
      .map(s => s.split(",").toSet: String => Boolean).getOrElse(_ => true)
    val results = SparkEntry.queries.toSeq.filter(kv => only(kv._1))
      .sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune every computed
      // column (a fingerprint query would never hash anything). The noop
      // writer evaluates all output columns at full width.
      val err: Option[String] =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          Some(JsonUtil.escape(
            (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage)).take(200)))
        }
      // A crashing query must not masquerade as a fast success: its time
      // slot records -1 and the error string rides along in "errors".
      (name, if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","n_errors":${results.count(_._3.nonEmpty)},"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Self-report to a file too: terminal capture truncates the one-line
    // JSON once it spans a few hundred queries, so the full record lives
    // at target/bench.json after every run.
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
