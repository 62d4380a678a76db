package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * The line is SELF-ADJUDICATING against BASELINE.md's two SLA bases:
  * it carries `q01_sec` (the scan-layer host-state probe — dividing
  * any cross-round per-query ratio by the rounds' q01 ratio removes
  * host noise, the tools/bench_diff.py normalization) and
  * `frozen49_total` (the summed seconds of the round-1 query subset,
  * SLA: ≤ 2 × 149.5 s), so a driver-captured tail can be judged
  * without cross-referencing a separate full local run. */
object Bench {

  /** The 49 queries of BENCH_r01.json — the FROZEN subset BASELINE.md's
    * first SLA basis sums (coverage growth must not dilute the
    * comparison set). */
  private val Frozen49: Set[String] = Set(
    "q01_agg", "q02_filter_project", "q03_lookup_join", "q04_semi_join",
    "q05_anti_join", "q06_distinct_extract", "q07_dedup_keep_first",
    "q08_union_universe", "q09_except_placeholders", "q10_dup_flag_rewrite",
    "q11_surrogate_keys", "q12_clean_id_coerce", "q13_date_coerce",
    "q14_check_range", "q15_partition_year", "q16_topk", "q17_running_total",
    "q18_grouped_topn", "q19_rollup", "q20_percentiles", "q21_asof_join",
    "q22_salted_join", "q23_profile", "q24_approx_agg",
    "q25_scalar_subquery", "q26_string_funcs", "q27_cube",
    "q28_datetime_funcs", "q29_conditional_agg", "q30_dedup_exact",
    "q31_dedup_minhash", "q32_dedup_simhash", "q33_ngram_jaccard",
    "q34_embed_neardup", "q35_sim_bruteforce", "q36_sim_lsh",
    "q37_dedup_resolve", "q38_sim_ivf", "q39_dedup_corpus",
    "q40_text_stats", "q41_langid", "q42_token_count", "q43_fingerprint",
    "q50_events_hourly", "q51_sessionize", "q60_media_meta",
    "q61_media_features", "q62_frame_sample", "q99_sql_engine")
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
    val q01Sec = results.collectFirst { case ("q01_agg", v, None) => v }
      .getOrElse(-1.0)
    val frozen = results.collect {
      case (k, v, None) if Frozen49.contains(k) => v }
    val frozenTotal = if (frozen.isEmpty) -1.0 else frozen.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","q01_sec":$q01Sec,"frozen49_total":$frozenTotal,"frozen49_n":${frozen.length},"n_errors":${results.count(_._3.nonEmpty)},"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
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
