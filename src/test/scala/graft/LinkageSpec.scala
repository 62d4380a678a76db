package graft

import org.apache.spark.sql.functions._

import graft.expressions.LinkageKernels
import graft.operators.Linkage

/** Record-linkage operators: Jaro–Winkler kernel values, Luhn, global
  * rank, sorted-neighborhood pairing, Fellegi–Sunter decisions. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("jaro-winkler matches the canonical literature values") {
    def jw(a: String, b: String) = LinkageKernels.jaroWinkler(a, b)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("A", "A") == 1.0)
    assert(jw("AB", "BA") == 0.0, "window 0: adjacent transposition of 2 chars never matches")
    assert(jw("", "ABC") == 0.0 && jw("", "") == 0.0, "empty-side convention matches DuckDB")
    // boost applies only above jaro 0.7: common prefix 'ab' but jaro 2/3
    assert(math.abs(jw("ab", "az") - 2.0 / 3.0) < 1e-12)
  }

  test("jaro-winkler codegen path evaluates identically to the kernel") {
    val df = Seq(("MARTHA", "MARHTA"), ("crate", "trace"), ("PREFIX", "PREXIFZZZ"))
      .toDF("a", "b")
    val got = df.select(LinkageKernels.jaroWinklerCol(col("a"), col("b")).as("jw"))
      .as[Double].collect()
    val want = Array(0.9611111111111111, 0.7333333333333334, 0.8833333333333334)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("luhn validates real checksums and rejects near-misses") {
    assert(LinkageKernels.luhnValid("4539578763621486"))
    assert(!LinkageKernels.luhnValid("4539578763621487"), "off-by-one digit fails")
    assert(!LinkageKernels.luhnValid("453957876362148a"), "non-digit fails")
    assert(!LinkageKernels.luhnValid("49927398716"),
      "11 digits: valid sum but below the PAN length floor")
    assert(LinkageKernels.luhnValid("499273987168"), "12 digits, valid sum")
  }

  test("globalRank assigns dense 1..n ranks in key order across partitions") {
    val df = (1 to 97).map(i => (i.toLong, f"k${(i * 37) % 100}%03d")).toDF("id", "k")
      .repartition(7)
    val r = Linkage.globalRank(df, Seq("k"), "id").select("k", "id", "rank")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(r.map(_._3).toSeq == (1L to 97L), "dense, no gaps, no dupes")
    val resorted = r.sortBy(t => (t._1, t._2))
    assert(r.toSeq == resorted.toSeq, "rank order IS (key, id) order")
  }

  test("sorted neighborhood pairs each record with its next w sort neighbors") {
    val df = Seq((1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "alpha"))
      .toDF("id", "name")
    val r = Linkage.sortedNeighborhood(df, "name", "id", w = 2, threshold = 0.0)
      .select("id_a", "id_b", "rank_gap").as[(Long, Long, Long)].collect().toSet
    // sort order: (alpha,1) (alpha,4) (alphb,2) (beta,3)
    assert(r == Set((1L, 4L, 1L), (1L, 2L, 2L), (4L, 2L, 1L), (4L, 3L, 2L),
      (2L, 3L, 1L)))
  }

  test("fellegi-sunter: all-agree pairs link, all-disagree pairs non-link") {
    import Linkage.FsField
    val df = Seq(
      (1L, 0L, "A", 10L), (2L, 0L, "A", 10L), // agree on both fields
      (3L, 1L, "A", 10L), (4L, 1L, "B", 20L)) // disagree on both
      .toDF("id", "blk", "seg", "balk")
    val fields = Seq(FsField("seg", col("seg"), 0.9, 0.2),
      FsField("balk", col("balk"), 0.8, 0.1))
    val r = Linkage.fellegiSunter(df, "id", col("blk"), fields,
      lower = -4.0, upper = 4.0)
      .select("block", "decision", "n_pairs").as[(Long, String, Long)]
      .collect().toSet
    // agree: 2.169925 + 3 = 5.169925 >= 4 -> link
    // disagree: -3 - 2.169925 = -5.169925 <= -4 -> non_link
    assert(r == Set((0L, "link", 1L), (1L, "non_link", 1L)))
  }

  test("fellegi-sunter weight literals are the 6dp log2 likelihood ratios") {
    import Linkage.FsField
    val f = FsField("seg", col("x"), 0.9, 0.2)
    assert(f.agreeW6 == 2169925L && f.disagreeW6 == -3000000L)
    val g = FsField("neg", col("x"), 0.95, 0.5)
    assert(g.agreeW6 == 925999L && g.disagreeW6 == -3321928L)
  }

  test("blocked pairs: degenerate block trips the fail-loud guard") {
    val df = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val e = intercept[Exception] {
      Linkage.blockedJaroPairs(df, "name", "id", lit("same"), 0.0,
        maxBlock = 10).count()
    }
    assert(e.getMessage.contains("maxBlock") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBlock")))
  }
}
