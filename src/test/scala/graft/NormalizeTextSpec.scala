package graft

import graft.expressions.NormalizeTextExpr

/** Unicode escapes throughout: decomposed vs precomposed forms are
  * byte-distinct on purpose and must survive editors/formatters. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private val Dec = "café"   // e + COMBINING ACUTE (5 chars)
  private val Pre = "café"    // precomposed é (4 chars)

  private def norm(s: String, mode: String): String =
    Seq(Tuple1(s)).toDF("t").repartition(2)
      .select(NormalizeTextExpr.normalize($"t", mode).as("n"))
      .as[String].head()

  test("nfc composes combining marks; idempotent; ascii fast-path") {
    assert(Dec != Pre && Dec.length == 5 && Pre.length == 4)
    assert(norm(Dec, "nfc") == Pre)
    assert(norm(Pre, "nfc") == Pre)
    assert(norm("plain ascii", "nfc") == "plain ascii")
  }

  test("nfkc folds compatibility variants nfc leaves alone") {
    assert(norm("ﬁle", "nfkc") == "file")      // fi ligature
    assert(norm("１２", "nfkc") == "12")    // full-width digits
    assert(norm("ﬁle", "nfc") == "ﬁle", "nfc must NOT fold ligatures")
  }

  test("strip_accents removes marks from both decomposed and precomposed forms") {
    assert(norm(Dec, "strip_accents") == "cafe")
    assert(norm(Pre, "strip_accents") == "cafe")
    assert(norm("nñ ü ç", "strip_accents") == "nn u c")
    assert(norm("no accents here", "strip_accents") == "no accents here")
  }

  test("normalization makes visually-identical strings dedup-equal") {
    // the motivating case: same rendered text, different bytes -> exact
    // dedup misses it until normalized
    val df = Seq((1L, s"$Dec life"), (2L, s"$Pre life"))
      .toDF("id", "text")
    assert(df.select($"text").distinct().count() == 2)
    assert(df.select(NormalizeTextExpr.normalize($"text", "nfc").as("t"))
      .distinct().count() == 1)
  }

  test("invalid mode is rejected") {
    intercept[IllegalArgumentException] {
      NormalizeTextExpr.normalize($"t", "nfd-ish")
    }
  }
}
