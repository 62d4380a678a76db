package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("pseudonymize preserves join structure and destroys raw ids") {
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val right = Seq((1L, "x"), (1L, "y"), (3L, "z")).toDF("id", "w")
    val rawJoin = left.join(right, "id").count()
    val lt = Privacy.pseudonymize(left, Seq("id"), "s1")
    val rt = Privacy.pseudonymize(right, Seq("id"), "s1")
    assert(lt.join(rt, "id").count() == rawJoin)
    // tokens are 64 hex chars, never the raw value
    assert(lt.select($"id").as[String].collect().forall(t =>
      t.length == 64 && !Seq("1", "2", "3").contains(t)))
    // a different salt yields incompatible tokens (no accidental linkage)
    val rt2 = Privacy.pseudonymize(right, Seq("id"), "s2")
    assert(lt.join(rt2, "id").count() == 0)
  }

  test("k-anonymity audit flags small and non-diverse groups") {
    val df = Seq(
      // group (A,1): 3 rows, 3 distinct sensitive -> k fails at k=4
      ("A", 1, 10), ("A", 1, 20), ("A", 1, 30),
      // group (B,2): 4 rows, 1 distinct sensitive -> l fails at l=2
      ("B", 2, 5), ("B", 2, 5), ("B", 2, 5), ("B", 2, 5)
    ).toDF("seg", "nat", "bal")
    val audit = Privacy.kAnonymityAudit(df, Seq("seg", "nat"), "bal", k = 4, l = 2)
      .orderBy("seg").collect()
    assert(audit.length == 2)
    val a = audit(0); val b = audit(1)
    assert(a.getAs[Long]("group_n") == 3 && !a.getAs[Boolean]("k_anon_ok")
      && a.getAs[Boolean]("l_div_ok"))
    assert(b.getAs[Long]("group_n") == 4 && b.getAs[Boolean]("k_anon_ok")
      && !b.getAs[Boolean]("l_div_ok"))
  }
}
