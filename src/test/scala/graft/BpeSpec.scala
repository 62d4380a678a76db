package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE train + encode, cross-checked against an independent reference
  * reimplementation (different data structures and traversal) so a shared
  * bug cannot self-confirm. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (test-only, deliberately different) ----

  private val Eow = "</w>"

  private def refApply(syms: List[String], m: (String, String)): List[String] =
    syms match {
      case a :: b :: rest if (a, b) == m => (a + b) :: refApply(rest, m)
      case a :: rest                     => a :: refApply(rest, m)
      case Nil                           => Nil
    }

  private def refTrain(words: Map[String, Long], n: Int): List[(String, String)] = {
    var tbl: List[(List[String], Long)] =
      words.toList.map { case (w, c) => (w.map(_.toString).toList :+ Eow) -> c }
    var merges = List.empty[(String, String)]
    var go = true
    while (merges.length < n && go) {
      val pairs = tbl.flatMap { case (syms, c) =>
        syms.sliding(2).collect { case List(a, b) => ((a, b), c) }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      if (pairs.isEmpty) go = false
      else {
        val best = pairs.toList.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges :+= best
        tbl = tbl.map { case (syms, c) => refApply(syms, best) -> c }
      }
    }
    merges
  }

  private def refEncode(w: String, merges: List[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = w.map(_.toString).toList :+ Eow
    var go = true
    while (go) {
      val present = syms.sliding(2).collect {
        case List(a, b) if rank.contains((a, b)) => (a, b)
      }.toList
      if (present.isEmpty) go = false
      else syms = refApply(syms, present.minBy(rank))
    }
    syms
  }

  private def encodeOne(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t").repartition(2)
      .select(Bpe.encode($"t", merges).as("tk"))
      .as[Seq[String]].head()

  // Sennrich et al.'s toy corpus shape
  private val Toy = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training matches the independent reference on the toy corpus") {
    val got = Bpe.trainFromCounts(Toy.toSeq.sortBy(_._1), 10)
    val want = refTrain(Toy, 10)
    assert(got == want)
    // (e,s) has count 9 (newest 6 + widest 3), tied with (s,t) and
    // (t,</w>) — the lexicographic tie-break picks (e,s) first
    assert(got.head == ("e", "s"))
    assert(got.length == 10)
  }

  test("encode matches the reference, including out-of-vocabulary words") {
    val merges = Bpe.trainFromCounts(Toy.toSeq, 8)
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wide", "xyzzy")) {
      assert(encodeOne(w, merges) == refEncode(w, merges.toList), s"word: $w")
    }
    // multi-word text = concatenation of per-word encodings
    assert(encodeOne("low lowest!", merges) ==
      refEncode("low", merges.toList) ++ refEncode("lowest", merges.toList))
  }

  test("empty merge table yields chars + end marker; punctuation splits words") {
    assert(encodeOne("ab, c", Nil) == Seq("a", "b", Eow, "c", Eow))
    assert(encodeOne("...", Nil) == Seq.empty)
  }

  test("fixed single merge obeys the non-overlapping replace counting law") {
    val m = Seq(("t", "h"))
    for (s <- Seq("the theory thth", "ttth hth", "no pair here", "h t th")) {
      val canon = s // already canonical
      val alnum = canon.count(_ != ' ')
      val words = canon.split(" ").count(_.nonEmpty)
      val th = (canon.length - canon.replace("th", "").length) / 2
      assert(encodeOne(s, m).length == alnum + words - th, s"text: $s")
    }
  }

  test("roundtrip: decode(encode(text)) == canonical text") {
    val merges = Bpe.trainFromCounts(Toy.toSeq, 8)
    val df = Seq("Lower, NEWEST... low!", "  punct   only --- ", "wid3st 42")
      .toDF("t")
    val bad = df.select(
        (Bpe.decode(Bpe.encode($"t", merges)) === Bpe.canonicalText($"t")).as("ok"))
      .filter(!$"ok").count()
    assert(bad == 0L)
  }

  test("distributed training is layout-invariant and uses the frequency head") {
    val docs = (0 until 200).map(i => s"alpha beta gamma delta row$i").toDF("text")
    val a = Bpe.trainMerges(docs, "text", nMerges = 12, maxWords = 64)
    val b = Bpe.trainMerges(docs.repartition(7), "text", nMerges = 12, maxWords = 64)
    assert(a == b)
    assert(a.length == 12)
  }
}
