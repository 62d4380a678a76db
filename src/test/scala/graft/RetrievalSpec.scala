package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusMix, Retrieval}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fusion: overlap beats a single strong list; integer scores exact") {
    // doc 10 is rank 3 in BOTH lists; doc 1 is rank 1 lexically only.
    // 1e9/(60+3)*2 = 31_746_030 > 1e9/(60+1) + 0 = 16_393_442.
    val lex = Seq((1L, 1L), (2L, 2L), (10L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((5L, 1L), (6L, 2L), (10L, 3L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head == ((10L, 2L * (1000000000L / 63L), 2L, 1L)))
    assert(out.map(_._1).toSeq == Seq(10L, 1L, 5L, 2L, 6L),
      "singles order by their own rank, ties broken by doc id")
    assert(out.forall(r => r._2 == r._2 / 1L && r._3 >= 1L))
  }

  test("rrf fusion: equal reciprocal sums tie-break by doc id") {
    val a = Seq((7L, 1L), (9L, 2L)).toDF("doc_id", "rank")
    val b = Seq((9L, 1L), (7L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 2)
      .select("doc_id", "rank").as[(Long, Long)].collect().toSeq
    assert(out == Seq((7L, 1L), (9L, 2L)))
  }

  test("hard negatives: near-dups excluded, lexically-close docs outrank unrelated") {
    import graft.operators.{Dedup, Retrieval}
    val docs = Seq(
      (1L, "spark shuffle join agg window table scan filter sort merge"),
      (2L, "spark shuffle join agg window table scan filter sort group"), // near-dup of 1
      (3L, "spark shuffle join hash bucket cache disk memory cpu net"),   // hard negative
      (4L, "apples oranges pears grapes lemons plums melons figs dates kiwi")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      bands = 16, rowsPerBand = 2, threshold = 0.35)
    assert(pairs.filter($"id_a" === 1L && $"id_b" === 2L).count() == 1L,
      "fixture: 1-2 must be a near-dup pair")
    val out = Retrieval.hardNegatives(docs, "text", "doc_id",
        $"doc_id" === 1L, pairs, k = 3)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(!out.exists(_._2 == 2L), "near-dup must not be mined as a negative")
    assert(out.head._2 == 3L, "lexically-closest non-dup ranks first")
    val score = out.map(r => r._2 -> r._3).toMap
    assert(!score.contains(4L) || score(3L) > score(4L),
      "shared-term doc outranks the unrelated one")
  }

  test("training order: bijective positions, shard-local ranks, row-order invariance") {
    val docs = (0L until 64L).map(i => (i, s"document body number $i"))
      .toDF("doc_id", "text")
    val ord = CorpusMix.shardedTrainingOrder(docs, "text", "doc_id", nShards = 4)
    val rows = ord.select("doc_id", "shard", "pos", "global_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 64)
    assert(rows.forall { case (_, sh, p, g) => g == p * 4 + sh && sh >= 0 && sh < 4 })
    // global_pos is injective and per-shard positions are dense from 0
    assert(rows.map(_._4).distinct.length == 64)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length.toLong))
    }
    // content-determinism: a different input row order yields the same map
    val shuffled = CorpusMix.shardedTrainingOrder(
      docs.orderBy(rand(7)), "text", "doc_id", nShards = 4)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(shuffled == rows.map(r => r._1 -> r._4).toMap)
  }
}
