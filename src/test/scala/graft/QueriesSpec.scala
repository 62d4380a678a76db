package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.CleaningOps

/** Harness-contract specs: every declared query runs non-empty on the smoke
  * SF, oracle keys refer to real queries, and coerce ops never throw
  * (property-based via ScalaCheck generators, fixed seed). */
class QueriesSpec extends SparkSpec {

  /** Minimal deterministic forAll (the scalatest-scalacheck bridge artifact
    * is not on the offline classpath). */
  private def forAllGen[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  import spark.implicits._

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf()).count()
      if (n == 0) Some(name) else None
    }
    // LSH pair queries may legitimately find no near-dups in a 600-doc
    // smoke sample; everything else must be non-empty.
    val allowEmpty = Set("q31_dedup_minhash", "q32_dedup_simhash",
      "q33_ngram_jaccard", "q34_embed_neardup")
    assert((empties.toSet -- allowEmpty).isEmpty,
      s"unexpectedly empty: ${empties.toSet -- allowEmpty}")
  }

  test("property: coerceLong never throws, accepts digits, rejects garbage") {
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.choose(0L, Long.MaxValue / 100).map(_.toString),
      Gen.alphaStr, Gen.asciiPrintableStr)
    val samples = scala.collection.mutable.ListBuffer.empty[String]
    forAllGen(gen, 200)(samples += _)
    val rows = samples.toSeq.toDF("x")
      .select($"x", CleaningOps.coerceLong($"x").as("r")).collect()
    rows.foreach { row =>
      val t = row.getString(0).trim
      val expected: Any =
        if (t.matches("^[+-]?[0-9]{1,18}$")) t.toLong else null
      assert(row.get(1) == expected, s"input='${row.getString(0)}'")
    }
  }

  test("property: cleanId strips one prefix letter then coerces") {
    import spark.implicits._
    val ids = scala.collection.mutable.ListBuffer.empty[Long]
    forAllGen(Gen.choose(0L, 999999999L), 100)(ids += _)
    val rows = ids.toSeq.map(n => (n, s"C$n")).toDF("n", "x")
      .select($"n", CleaningOps.cleanId($"x", "C").as("r")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0)))
  }
}
