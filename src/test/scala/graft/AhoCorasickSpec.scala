package graft

import org.apache.spark.sql.functions._

import graft.expressions.{AcAutomaton, MultiMatchExpr}

/** Aho–Corasick blocklist expression: classic failure-link cases, order
  * contract, codegen path, and equivalence with per-phrase regexp counts
  * on the real corpus slice. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  test("classic he/she/his/hers automaton finds overlapping matches in order") {
    val ac = new AcAutomaton(Array("he", "she", "his", "hers"))
    // "ushers": "she" ends at 4, "he" ends at 4 (suffix via failure
    // link), "hers" ends at 6 — order is (end position, phrase index).
    val got = ac.findAll("ushers").array.map(_.toString).toSeq
    assert(got == Seq("he", "she", "hers"))
    assert(ac.findAll("his hero").array.map(_.toString).toSeq ==
      Seq("his", "he"))
    assert(ac.findAll("nothing here").array.map(_.toString).toSeq ==
      Seq("he"))
    assert(ac.findAll("").array.isEmpty)
  }

  test("non-ASCII characters reset to root, never crash or match") {
    val ac = new AcAutomaton(Array("ab"))
    assert(ac.findAll("aéb ab").array.length == 1)
    assert(ac.findAll("世界").array.isEmpty)
  }

  test("multi_match column agrees with per-phrase substring counts on the corpus") {
    val phrases = Seq("batch part", "fast spark", "hash value", "key agg")
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val got = docs.select($"doc_id",
        MultiMatchExpr.multiMatch(lower($"text"), phrases).as("m"))
      .select($"doc_id", size($"m").as("n"))
      .as[(Long, Int)].collect().toMap
    // reference: one regexp count per phrase (non-overlapping — equal
    // because two-distinct-word phrases have no self-border)
    val want = docs.select($"doc_id",
        phrases.map(p => size(split($"text", java.util.regex.Pattern.quote(p), -1)) - 1)
          .reduce(_ + _).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got == want)
    assert(got.values.sum > 0, "blocklist must actually hit this corpus")
  }

  test("null text yields null, not a crash") {
    val df = Seq((1L, Option("key agg here")), (2L, None: Option[String]))
      .toDF("id", "text")
    val r = df.select($"id",
        MultiMatchExpr.multiMatch($"text", Seq("key agg")).as("m"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(r == Map(1L -> false, 2L -> true))
  }
}
