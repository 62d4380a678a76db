package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Intervals, Profiler, SequencePack, Validate}

/** Property tests for the round-4 operator family: invariants that must
  * hold on ARBITRARY inputs, not just the crafted spec fixtures. */
class Round4PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def forAllGen[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("checksum: order-independence and range invariants on random rows") {
    val rows = Gen.listOfN(30, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    } yield (g, v))
    forAllGen(rows, n = 15) { data =>
      val df = data.toDF("g", "v")
      val shuffled = scala.util.Random.shuffle(data).toDF("g", "v")
      def cs(d: org.apache.spark.sql.DataFrame) =
        Validate.checksum(d, Seq(Validate.enc.long(col("v"))), Seq("g"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val a = cs(df)
      assert(a == cs(shuffled), "row order must not change the checksum")
      assert(a.forall { case (_, _, c) => c >= 0 && c < Validate.P },
        "checksum is a residue mod P")
    }
  }

  test("interval coverage: covered <= span, merged islands disjoint") {
    val ivs = Gen.listOfN(25, for {
      k <- Gen.choose(1L, 3L)
      s <- Gen.choose(0L, 1000L)
      len <- Gen.choose(1L, 200L)
    } yield (k, s, s + len))
    forAllGen(ivs, n = 15) { data =>
      val df = data.toDF("k", "s", "e")
      val cov = Intervals.coverage(df, "k", col("s"), col("e")).collect()
      cov.foreach { r =>
        assert(r.getLong(3) <= r.getLong(4), "covered_us <= span_us")
        assert(r.getLong(2) <= r.getLong(1), "n_merged <= n_raw")
      }
      val merged = Intervals.merge(df, "k", col("s"), col("e"))
        .orderBy("k", "start_us").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      merged.sliding(2).foreach {
        case Array((k1, _, e1), (k2, s2, _)) if k1 == k2 =>
          assert(s2 > e1, "consecutive islands must not touch or overlap")
        case _ =>
      }
      // union length computed independently from the raw intervals
      val byKey = data.groupBy(_._1)
      byKey.foreach { case (k, rows) =>
        val points = rows.flatMap { case (_, s, e) => s until e }.toSet.size
        val got = cov.find(_.getLong(0) == k).get.getLong(3)
        assert(got == points.toLong, s"key $k union length")
      }
    }
  }

  test("chunking: stride==window partitions losslessly; every token covered") {
    val docs = Gen.listOfN(5, for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "d1"))
    } yield toks.mkString(" "))
    forAllGen(docs, n = 15) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // non-overlapping chunks reassemble to the original text
      val whole = SequencePack.chunkSliding(df, "text", "doc_id", 7, 7)
        .groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_idx"),
          col("chunk_text").as("c")))), x => x.getField("c")), " ").as("re"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(whole(i.toLong) == t, "stride==window reassembles the doc")
      }
      // overlapping chunks: token budget matches the closed form
      val counts = SequencePack.chunkSliding(df, "text", "doc_id", 7, 4)
        .groupBy("doc_id").agg(count(lit(1)).as("nc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val n = t.split(" ").length
        val expect = if (n <= 7) 1L else math.ceil((n - 7) / 4.0).toLong + 1
        assert(counts(i.toLong) == expect, s"chunk count for n=$n")
      }
    }
  }

  test("exact quantiles agree with a sorted-array reference on random data") {
    val values = Gen.listOfN(50, Gen.choose(-1000L, 1000L))
    forAllGen(values, n = 15) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val ps = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p90", 9L, 10L),
        ("p100", 1L, 1L))
      val got = Profiler.exactQuantiles(df, "g", "v", ps)
        .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
      val sorted = vs.sorted
      ps.foreach { case (lbl, num, den) =>
        val rank = ((num * vs.length + den - 1) / den).toInt // ceil
        assert(got(lbl) == sorted(rank - 1), s"$lbl mismatch")
      }
    }
  }

  test("debounce: surviving events of a key are separated by > gap") {
    val ev = Gen.listOfN(40, for {
      u <- Gen.choose(1L, 3L)
      off <- Gen.choose(0L, 100000L)
    } yield (u, off))
    forAllGen(ev, n = 15) { data =>
      val df = data.zipWithIndex.map { case ((u, off), i) =>
        (u, new java.sql.Timestamp(1700000000000L + off * 1000L), i.toLong)
      }.toDF("user_id", "ts", "event_id")
      val kept = operators.Resample.debounce(df, Seq("user_id"), "ts",
          "event_id", gapSeconds = 300L)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // NOTE lag-based semantics: a kept event is > gap after the
      // previous RAW event, which is >= the previous KEPT event's time,
      // so consecutive KEPT events are also separated by > gap... only
      // when no dropped event sits between them. The guaranteed
      // invariant is against the previous raw event:
      val all = df.select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byUser = all.groupBy(_._1).map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3))
      }
      kept.foreach { case (u, us, id) =>
        val seq = byUser(u)
        val idx = seq.indexWhere(_._3 == id)
        if (idx > 0)
          assert(us - seq(idx - 1)._2 > 300L * 1000000L,
            "kept event must clear the gap vs its raw predecessor")
      }
      // first event of every key always survives
      byUser.foreach { case (u, rows) =>
        assert(kept.exists(_._3 == rows.head._3), s"first event of $u kept")
      }
    }
  }
}
