package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeDataCapture

/** CDC apply / merge / SCD2 on crafted change logs. */
class ChangeDataCaptureSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, op, value)
  private val changes = Seq(
    (1L, 1L, "I", "a"), (1L, 3L, "U", "c"), (1L, 2L, "U", "b"), // latest = c
    (2L, 1L, "I", "x"), (2L, 2L, "D", "x"),                      // deleted
    (3L, 5L, "D", "y"), (3L, 6L, "I", "z"),                      // re-inserted after delete
    (4L, 9L, "I", "w")                                           // plain insert
  ).toDF("key", "seq", "op", "value")

  test("applyChangeLog keeps latest change per key, drops deleted keys") {
    val snap = ChangeDataCapture.applyChangeLog(changes, Seq("key"), Seq("seq"), "op")
      .select("key", "seq", "value").as[(Long, Long, String)].collect().toSet
    assert(snap == Set((1L, 3L, "c"), (3L, 6L, "z"), (4L, 9L, "w")))
  }

  test("mergeUpsert passes untouched target rows through, applies the rest") {
    val target = Seq((1L, 0L, "old"), (5L, 0L, "keep")).toDF("key", "seq", "value")
    val merged = ChangeDataCapture.mergeUpsert(target, changes, Seq("key"), Seq("seq"), "op")
      .select("key", "seq", "value").as[(Long, Long, String)].collect().toSet
    // key 1 updated, key 5 untouched, keys 3/4 inserted, key 2 never appears
    assert(merged == Set((1L, 3L, "c"), (5L, 0L, "keep"), (3L, 6L, "z"), (4L, 9L, "w")))
  }

  test("mergeUpsert deletes target keys whose latest op is a delete") {
    val target = Seq((2L, 0L, "doomed")).toDF("key", "seq", "value")
    val merged = ChangeDataCapture.mergeUpsert(target, changes, Seq("key"), Seq("seq"), "op")
    assert(merged.filter($"key" === 2L).isEmpty)
  }

  test("scd2 collapses runs, half-open validity, is_current on the open run") {
    val events = Seq(
      (1L, 10L, "A"), (1L, 20L, "A"), (1L, 30L, "B"), (1L, 40L, "A"),
      (2L, 10L, "Z")
    ).toDF("key", "ts", "v")
    val hist = ChangeDataCapture.scd2(events, Seq("key"), "ts", Seq("v"))
      .select("key", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(hist == Set(
      (1L, "A", 10L, Some(30L), false),  // 20 collapsed into the first run
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),        // value returning re-opens a run
      (2L, "Z", 10L, None, true)))
  }

  test("scd2 over multiple tracked columns splits runs on any change") {
    val events = Seq(
      (1L, 1L, "A", 10), (1L, 2L, "A", 20), (1L, 3L, "A", 20)
    ).toDF("key", "ts", "v", "w")
    val hist = ChangeDataCapture.scd2(events, Seq("key"), "ts", Seq("v", "w"))
    assert(hist.count() == 2) // (A,10) then (A,20); third event collapses
  }
}
