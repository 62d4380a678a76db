package graft

import org.apache.spark.sql.functions._

import graft.expressions.{KmvDistinctAgg, SignatureExprs}
import graft.operators.CorpusOverlap

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("kmv sketch is partition- and merge-order independent") {
    def sketch(parts: Int) =
      CorpusOverlap.shingleSketches(docs.repartition(parts), "text", "source",
          n = 3, k = 64)
        .orderBy("grp").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(sketch(1).toSeq == sketch(7).toSeq)
  }

  test("sketch holds at most k elements, sorted ascending, distinct") {
    val sk = CorpusOverlap.shingleSketches(docs, "text", "source", n = 3, k = 32)
      .collect().map(_.getSeq[Long](1))
    assert(sk.nonEmpty)
    sk.foreach { s =>
      assert(s.size <= 32)
      assert(s == s.sorted)
      assert(s.distinct.size == s.size)
    }
  }

  test("estimate equals exact when the union fits in the sketch") {
    // two tiny synthetic sources whose shingle sets fit well under k
    val tiny = Seq(
      ("a", "one two three four five"),
      ("a", "two three four five six"),
      ("b", "one two three seven eight"),
      ("b", "nine ten eleven twelve thirteen")
    ).toDF("source", "text")
    val rep = CorpusOverlap.overlapReport(tiny, "text", "source", n = 3, k = 64)
      .collect()
    assert(rep.length == 1)
    val r = rep.head
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
    assert(r.getAs[Long]("n_inter") > 0)
  }

  test("scalar LONG input works too (non-array path)") {
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 2L), ("g2", 1L))
      .toDF("g", "h")
    val sk = df.groupBy($"g")
      .agg(KmvDistinctAgg.kmvDistinctSketch($"h", 8).as("sk"))
      .orderBy("g").collect()
    assert(sk(0).getSeq[Long](1).size == 2) // distinct folded
    assert(sk(1).getSeq[Long](1).size == 1)
  }

  test("estimator tracks exact jaccard within the k-rank error band") {
    // k=256 -> rank stderr ~1/sqrt(256) ~= 6pp; assert a loose 3-sigma band
    val rep = CorpusOverlap.overlapReport(docs, "text", "source", n = 3, k = 256)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val err = math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_jaccard"))
      assert(err < 0.19, s"pair ${r.get(0)}-${r.get(1)} err $err")
    }
  }

  test("scan-side hash set matches the signature tokenization contract") {
    val hs = docs.limit(5)
      .select(SignatureExprs.shingleHashSet($"text", 3).as("hs"))
      .collect().map(_.getSeq[Long](0))
    hs.foreach { s => assert(s.nonEmpty && s.distinct.size == s.size) }
  }
}
