package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Property tests for the one-pass signature expressions against
  * independent reference implementations: the expressions are the dedup
  * suite's core, so a window off-by-one or hash drift must fail loudly
  * here, not show up as silently-degraded LSH recall. */
class SignatureExprsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def forAllGen[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // reference FNV-1a 64 over the ' '-joined shingle, and splitmix mix —
  // deliberately re-implemented here rather than imported
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.foreach(c => h = (h ^ c) * 0x100000001b3L)
    h
  }
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def shingleSet(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq
    if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSeq
    else Seq(toks.mkString(" "))
  }

  private val textGen: Gen[String] = for {
    nWords <- Gen.choose(0, 30)
    words <- Gen.listOfN(nWords, Gen.oneOf(
      Gen.alphaStr.map(_.take(8)), Gen.const(""), Gen.const("UPPER"),
      Gen.numStr.map(_.take(4))))
  } yield words.mkString(" ")

  test("MinHashSigExpr matches the brute-force shingle-set minhash") {
    val texts = collection.mutable.ArrayBuffer[String]()
    forAllGen(textGen)(texts += _)
    val k = 12
    val seeds = Array.tabulate(k)(i => mix(0x5DEECE66DL + i.toLong))
    val df = texts.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        graft.expressions.SignatureExprs.minhashSig($"text", 3, k).as("sig"))
      .as[(Long, Array[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val hashes = shingleSet(t, 3).map(fnv) // multiset is fine for min
      val expected = seeds.map(sd => hashes.map(h => mix(h ^ sd)).min)
      assert(got(i.toLong).sameElements(expected), s"doc $i: '$t'")
    }
  }

  test("SimHashExpr matches the brute-force distinct-feature bit vote") {
    val texts = collection.mutable.ArrayBuffer[String]()
    forAllGen(textGen)(texts += _)
    val df = texts.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        graft.expressions.SignatureExprs.simhash($"text", 2).as("sh"))
      .as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val feats = shingleSet(t, 2).map(fnv).distinct
      val expected = (0 until 64).foldLeft(0L) { (acc, bit) =>
        val vote = feats.map(h => if (((h >>> bit) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) acc | (1L << bit) else acc
      }
      assert(got(i.toLong) == expected, s"doc $i: '$t'")
    }
  }

  test("signature shingle windows agree with ShingleExpr tokenization") {
    // the signatures hash the same windows ShingleExpr materializes —
    // same lowercase, same split, same short-text fallback
    val texts = collection.mutable.ArrayBuffer[String]()
    forAllGen(textGen)(texts += _)
    val df = texts.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fromExpr = df.select($"id", TextAnalysis.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(fromExpr(i.toLong).toSet == shingleSet(t, 3).toSet, s"doc $i: '$t'")
    }
  }

  test("TopGramStatsExpr matches brute-force bigram occurrence counting") {
    val texts = collection.mutable.ArrayBuffer[String]()
    forAllGen(textGen)(texts += _)
    texts += "a b a b a b a b" // forced repetition
    val df = texts.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id",
        graft.expressions.ShingleExpr.topGramStats($"text", 2).as("st"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq
      val grams = if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
                  else Seq(toks.mkString(" "))
      val counts = grams.groupBy(identity).map(_._2.size)
      assert(got(i.toLong) == Seq(grams.size.toLong, counts.max.toLong), s"doc $i: '$t'")
    }
  }

  test("q47 repetition plan is shuffle-free (no Exchange)") {
    val df = SparkEntry.queries("q47_repetition")(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in q47 plan:\n$plan")
  }

  test("Misra-Gries sketch: guaranteed superset; exact operator == plain groupBy") {
    // skewed long keys: key 0 holds ~40%, keys 1-4 ~8% each, tail uniform
    val rows = (0 until 5000).map { i =>
      if (i % 5 < 2) 0L else if (i % 25 < 10) (1L + i % 4) else 100L + i % 400
    }
    // multiple partitions force the mergeable-summaries merge path
    val df = rows.toDF("k").repartition(7)
    val k = 49 // guarantee: every key with share > 1/50 = 2% survives
    val cands = df.agg(graft.expressions.MisraGriesAgg.misraGries($"k", k).as("c"))
      .select(explode($"c").as("s")).select($"s.key".as[Long]).collect().toSet
    val exactCounts = rows.groupBy(identity).view.mapValues(_.size).toMap
    val mustHave = exactCounts.filter(_._2 > rows.size / 50.0).keySet
    assert(mustHave.subsetOf(cands), s"missing: ${mustHave -- cands}")
    assert(cands.size <= k)

    // the two-pass operator returns exactly the plain groupBy/HAVING rows
    val got = operators.HeavyHitters.exact(df, "k", minShare = 0.05, k = k)
      .as[(Long, Long)].collect().toMap
    val want = exactCounts.filter(_._2 >= math.ceil(0.05 * rows.size))
      .map { case (kk, c) => kk -> c.toLong }
    assert(got == want)
    // string keys exercise the UTF8String serialize path
    val sdf = rows.map(r => "u" + (r % 7)).toDF("k").repartition(5)
    val sGot = operators.HeavyHitters.exact(sdf, "k", minShare = 0.05, k = 49)
    assert(sGot.count() == 7, "all 7 string keys above 5%")
  }

  test("CosinesExpr agrees with the HOF cosine and handles zero vectors") {
    val rows = Seq(Array(1f, 0f, 2f, -1f), Array(0f, 0f, 0f, 0f), Array(-3f, 1f, 0f, 5f))
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(-1f, 0.5f, 0f, 2f))).toDF("id", "v")
    val got = vecs.select($"id",
        graft.expressions.CosinesExpr.cosines($"v", rows).as("c"))
      .as[(Long, Array[Double])].collect().toMap
    val viaHof = rows.zipWithIndex.map { case (r, ri) =>
      val rCol = array(r.map(x => lit(x.toDouble)): _*)
      vecs.select($"id", operators.Similarity.cosine($"v", rCol).as("c"))
        .as[(Long, Double)].collect().toMap.map { case (k, v) => (k, ri) -> v }
    }.reduce(_ ++ _)
    got.foreach { case (id, arr) =>
      arr.zipWithIndex.foreach { case (c, ri) =>
        assert(math.abs(c - viaHof((id, ri))) < 1e-12, s"id=$id row=$ri")
      }
    }
    assert(got(2L).forall(_ == 0.0), "zero vector -> cosine 0 by convention")
  }
}
