package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-10 text-quality operators on crafted fixtures: Flesch
  * readability, mixed-script homoglyph screen. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("flesch: easy prose scores high, dense polysyllabic prose scores low") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran. we go now."),
      (2L, "organizational restructuring necessitates comprehensive reevaluation immediately"))
      .toDF("id", "text")
    val f = TextAnalysis.fleschStats(col("text"))
    val r = docs.select(col("id"), f.nWords.as("w"), f.nSentences.as("s"),
      f.nSyllables.as("y"), (f.flesch6 / 1e6).as("score"), f.band)
      .as[(Long, Long, Long, Long, Double, String)].collect()
      .map(t => t._1 -> t).toMap
    val (_, w1, s1, _, sc1, b1) = r(1L)
    assert(w1 == 9L && s1 == 3L, "9 words, 3 sentence runs")
    assert(sc1 > 90 && b1 == "very_easy", s"monosyllables read easy, got $sc1")
    val (_, _, s2, y2, sc2, b2) = r(2L)
    assert(s2 == 1L, "no terminator: sentence count floors at 1")
    assert(y2 >= 20L, "polysyllabic words pile up vowel groups")
    assert(sc2 < 0 && b2 == "very_difficult", s"dense prose reads hard, got $sc2")
  }

  test("mixed-script: confusable substitution is flagged, pure scripts are not") {
    val docs = Seq(
      (1L, "pay with раypal now"), // 'раypal' mixes Cyrillic ра + Latin ypal
      (2L, "plain ascii text only"),
      (3L, "чисто русский текст")) // pure Cyrillic: no MIXED tokens
      .toDF("id", "text")
    val ms = TextAnalysis.mixedScriptStats(col("text"))
    val r = docs.select(col("id"), ms.nTokens, ms.nCyrillic, ms.nMixed, ms.spoof)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    assert(r(1L) == (4L, 1L, 1L, true))
    assert(r(2L) == (4L, 0L, 0L, false))
    assert(r(3L) == (3L, 3L, 0L, false), "pure Cyrillic is not a spoof")
  }
}
