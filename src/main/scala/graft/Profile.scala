package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Dev profiling main: stage-by-stage timings of the minhash pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.tune(SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    time("scan")(docs.count())
    val shingled = docs.select(col("doc_id").as("id"),
      TextAnalysis.shingles(col("text"), 3).as("sh"))
    time("shingle")(shingled.count())
    time("shingle+explode")(shingled.select(col("id"), explode(col("sh")).as("s")).count())
    val exploded = shingled.select(col("id"), explode(col("sh")).as("s"))
    val k = 32
    val sigCols = (0 until k).map(seed => min(xxhash64(lit(seed), col("s"))).as(s"m$seed"))
    val sigs = exploded.groupBy(col("id")).agg(sigCols.head, sigCols.tail: _*)
    time("signatures")(sigs.count())
    val banded = sigs.select(col("id"),
      posexplode(array((0 until 16).map { b =>
        xxhash64((b * 2 until (b + 1) * 2).map(i => col(s"m$i")): _*)
      }: _*)).as(Seq("band", "bh")))
    time("banded")(banded.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bh"))
    val capped = banded.withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") <= 1000).drop("__bn")
    time("capped")(capped.count())
    val aSide = capped.select(col("band"), col("bh"), col("id").as("id_a"))
    val bSide = capped.select(col("band"), col("bh"), col("id").as("id_b"))
    val cand = aSide.join(bSide, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates")(cand.count())
    time("full_minhash")(graft.operators.Dedup
      .minhashPairs(docs, "text", "doc_id", bands = 16, rowsPerBand = 2,
        threshold = 0.35).count())
    spark.stop()
  }
}
