package graft

import org.apache.spark.sql.functions._

/** Round-11 fixes on crafted fixtures: engine-exact Kaplan–Meier (no
  * transcendentals anywhere in the plan), Adamic–Adar hub-degree cap,
  * user-level right-censored lifetimes. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kaplan-meier: zero transcendental calls in the analyzed plan") {
    val lt = Seq((1L, 1L, true), (2L, 2L, false), (3L, 3L, true))
      .toDF("subject", "duration_days", "observed")
    val plan = graft.operators.Survival.kaplanMeier(lt)
      .queryExecution.analyzed.toString.toLowerCase
    // libm-dependent ops would reintroduce the q252 portability flake
    assert(!"""\b(log|ln|exp|log10|log2|pow|power)\(""".r
      .findFirstIn(plan).isDefined,
      s"transcendental found in plan:\n$plan")
  }

  test("kaplan-meier: whole-risk-set death pins survival to exactly 0") {
    val lt = Seq((1L, 1L, true), (2L, 2L, true), (3L, 2L, true))
      .toDF("subject", "duration_days", "observed")
    val r = graft.operators.Survival.kaplanMeier(lt)
      .select("t_days", "survival").as[(Long, Double)].collect().toMap
    assert(r(1L) == (1000000L * 2 / 3).toDouble / 1e6, "S(1) = floor grid 2/3")
    assert(r(2L) == 0.0, "n_risk = d zeroes the product, exactly")
  }

  test("user lifetimes: last-week actives are censored, early quitters observed") {
    val ts = (d: Int, h: Int) =>
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val ev = Seq(
      ("a", ts(1, 9)), ("a", ts(3, 9)),   // last day 3, end 20 -> observed
      ("b", ts(2, 9)), ("b", ts(18, 9)),  // last day 18, gap 2 < 7 -> censored
      ("c", ts(20, 9))                    // defines obs end; gap 0 -> censored
    ).toDF("user_id", "ts")
    val r = graft.operators.Survival.lifetimes(ev, "user_id", "ts",
      censorDays = 7)
      .select("subject", "duration_days", "observed")
      .as[(String, Long, Boolean)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(r("a") == (2L, true))
    assert(r("b") == (16L, false))
    assert(r("c") == (0L, false))
  }

  test("adamic-adar: hub cap drops hub-centered wedges, keeps the rest exact") {
    // path 1-2-3 (center 2, deg 2) + hub 9 over 4..7 (deg 4)
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 4L), (9L, 5L), (9L, 6L), (9L, 7L))
      .toDF("u", "v")
    val capped = graft.operators.Graphs.adamicAdar(edges, "u", "v",
      maxCenterDegree = 3L)
      .select("id_a", "id_b", "aa", "dropped_centers")
      .as[(Long, Long, Double, Long)].collect()
    assert(capped.forall(_._4 == 1L), "the deg-4 hub is counted as dropped")
    val pairs = capped.map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.keySet == Set((1L, 3L)), "hub-mediated pairs are gone")
    assert(math.abs(pairs((1L, 3L)) - 1.0 / math.log(2.0)) < 1e-6,
      "non-hub wedge score unchanged by the cap")
    val uncapped = graft.operators.Graphs.adamicAdar(edges, "u", "v")
      .select("dropped_centers").as[Long].collect()
    assert(uncapped.forall(_ == 0L), "default cap fires on nothing here")
  }
}
