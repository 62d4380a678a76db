package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table checksums for cross-system data validation —
  * "did the migration/replication/rewrite preserve every row?" answered
  * with one number per table (or per partition group), computable by ANY
  * engine from the same formula.
  *
  * Design constraints, in order:
  *  - ORDER-INDEPENDENT: the combiner over rows is addition mod P, so the
  *    checksum is invariant to row order, partitioning, and parallelism.
  *  - ENGINE-PORTABLE: the row mix is a polynomial hash over caller-chosen
  *    integer encodings using only +, *, % on BIGINTs — expressible
  *    verbatim in any ANSI SQL dialect (the DuckDB oracle runs the exact
  *    same arithmetic). No engine-specific hash function in the portable
  *    path.
  *  - OVERFLOW-SAFE BY CONSTRUCTION: P = 2^31 - 1 (Mersenne prime), the
  *    fold multiplier is 1,000,003; the intermediate `acc*M + code` is
  *    < 2^51 + 2^31, far inside Int64. The cross-row SUM is carried in
  *    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so row counts beyond 2^32
  *    (the 100 TB regime) cannot wrap a 64-bit accumulator.
  *
  * Collision bound: P ≈ 2.1e9, so two different groups collide with
  * probability ~n²/2P for n differing rows — a validation check, not a
  * cryptographic commitment; use two runs with different multipliers if
  * that matters.
  *
  * Scale: one map-side-combined aggregation — the shuffle carries one
  * partial (DECIMAL, BIGINT) pair per group per task. Grouping by the
  * partition column turns this into per-partition fingerprints, the shape
  * incremental replication checks want (compare only mismatched groups).
  */
object Validate {

  val P: Long = 2147483647L // 2^31 - 1
  val M: Long = 1000003L

  /** Non-negative residue mod P of an arbitrary BIGINT column. */
  private def norm(c: Column): Column = ((c % P) + P) % P

  /** Portable integer encodings. Each maps a column to a BIGINT code;
    * nulls become a fixed sentinel (P - 1) so "null" and "0" differ. */
  object enc {
    private def orNull(c: Column): Column = coalesce(norm(c), lit(P - 1))
    /** Any integral column. */
    def long(c: Column): Column = orNull(c.cast("long"))
    /** DATE -> days since epoch (exact, engine-portable). */
    def date(c: Column): Column = orNull(datediff(c, to_date(lit("1970-01-01"))).cast("long"))
    /** Money-like DOUBLE -> cents on the half-up grid (floor(x*100 + 0.5)
      * — pure IEEE ops, one tie rule on every engine). */
    def moneyCents(c: Column): Column =
      orNull(floor(c.cast("double") * 100d + 0.5d).cast("long"))
    /** Bounded-scale DOUBLE -> 1e-6 grid. */
    def micros(c: Column): Column =
      orNull(floor(c.cast("double") * 1e6 + 0.5d).cast("long"))
    /** Strings via xxhash64 — Spark-to-Spark validation ONLY (no portable
      * ANSI equivalent; excluded from the DuckDB-oracled surface). */
    def stringSparkOnly(c: Column): Column = orNull(xxhash64(c))
  }

  /** Row mix: ((seed*M + c1) % P ... *M + cn) % P — same nesting any
    * engine can write down. */
  def rowMix(codes: Seq[Column], seed: Long = 17L): Column =
    codes.foldLeft(lit(seed)) { (acc, c) => (acc * M + c) % P }

  /** Snapshot diff: row-level drift accounting between two versions of a
    * keyed table — the "what changed between yesterday's load and
    * today's" report, and the follow-up tool when [[checksum]] says two
    * replicas disagree (checksum finds THAT they differ in one number;
    * diff says WHERE).
    *
    * `fingerprint` is any deterministic BIGINT encoding of the compared
    * payload (compose the [[enc]] encoders via [[rowMix]] for multi-column
    * payloads). Output is one row: (n_added, n_removed, n_changed,
    * n_unchanged).
    *
    * Scale: ONE full-outer shuffle join on the key, carrying only
    * (key, fingerprint) — never payload columns — then a single-row
    * aggregate. Bucket both snapshots by the key and the join is
    * shuffle-free. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           fingerprint: Column): DataFrame = {
    val a = oldDf.select(keys.map(col) :+ fingerprint.as("__fa"): _*)
    val b = newDf.select(keys.map(col) :+ fingerprint.as("__fb"): _*)
    a.join(b, keys, "full_outer")
      .agg(
        sum(when(col("__fa").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__fb").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__fa").isNotNull && col("__fb").isNotNull &&
          col("__fa") =!= col("__fb"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("__fa") === col("__fb"), 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** Referential-integrity audit across a set of FK relations: per
    * relation, child-side volume, orphaned children (FK values with no
    * parent — the integrity VIOLATION), unreferenced parents (no
    * violation, but dead weight worth knowing), and parent coverage.
    * NULL FKs are not violations (SQL semantics); they're simply absent
    * from the referenced-key set.
    *
    * Scale: each relation costs two anti/semi joins keyed on the FK —
    * Catalyst plans broadcast joins for dim-sized parents; the per-
    * relation outputs are 1-row frames unioned into the report. */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations.map { case (name, child, childKey, parent, parentKey) =>
      val ck = child.select(col(childKey).as("k")).filter(col("k").isNotNull)
      val pk = parent.select(col(parentKey).as("k"))
      val nChild = ck.agg(count(lit(1)).as("n_child"))
      val nViol = ck.join(pk, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val nParent = pk.agg(count(lit(1)).as("n_parents"))
      val nRef = pk.join(ck, Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_referenced"))
      nChild.crossJoin(nViol).crossJoin(nParent).crossJoin(nRef)
        .select(lit(name).as("relation"), col("n_child"), col("n_violations"),
          col("n_parents"),
          (col("n_parents") - col("n_referenced")).as("n_unreferenced"),
          (floor(col("n_referenced").cast("double") / col("n_parents").cast("double")
            * lit(1e6) + lit(0.5d)) / lit(1e6)).as("coverage"))
    }.reduce(_ unionByName _)

  /** Per-partition checksum comparison between two snapshots: the
    * replication-monitoring workflow in one frame — compute [[checksum]]
    * per group on both sides, full-outer join on the group, flag
    * mismatches. Feed the mismatched groups to [[diff]] for row-level
    * drill-down; at 100 TB this is how validation stays cheap: one
    * number per partition, rows only for partitions that disagree. */
  def checksumCompare(oldDf: DataFrame, newDf: DataFrame, codes: DataFrame => Seq[Column],
                      groupCols: Seq[String]): DataFrame = {
    val a = checksum(oldDf, codes(oldDf), groupCols)
      .withColumnRenamed("n_rows", "n_a").withColumnRenamed("checksum", "checksum_a")
    val b = checksum(newDf, codes(newDf), groupCols)
      .withColumnRenamed("n_rows", "n_b").withColumnRenamed("checksum", "checksum_b")
    a.join(b, groupCols, "full_outer")
      .withColumn("match",
        col("n_a") === col("n_b") && col("checksum_a") === col("checksum_b"))
      .na.fill(false, Seq("match"))
  }

  /** Per-group (n_rows, checksum). Empty `groupCols` = one global row. */
  def checksum(df: DataFrame, codes: Seq[Column],
               groupCols: Seq[String] = Nil): DataFrame = {
    val mixed = df.withColumn("__mix", rowMix(codes))
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      (sum(col("__mix").cast("decimal(38,0)")) % P).cast("long").as("checksum"))
    if (groupCols.isEmpty) mixed.agg(aggs.head, aggs.tail: _*)
    else mixed.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Declarative data-quality expectation suite: every check is a
    * boolean Column over the row; a NULL verdict counts as a violation
    * (unknown is not a pass). ALL checks ride ONE aggregation pass —
    * one scan however many expectations — then unpivot to one row per
    * check. The Great-Expectations-style front door unifying the
    * point checks scattered across CleaningOps CHECKs (q14) and the
    * FK audit (q138). */
  def expectationSuite(df: DataFrame,
                       checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, c) =>
        sum(when(coalesce(c, lit(false)), 0L).otherwise(1L)).as(s"__v_$name") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (name, _) =>
      wide.select(lit(name).as("check"), col("__n").as("n_rows"),
        col(s"__v_$name").as("n_violations"))
    }.reduce(_ unionByName _)
    stacked.withColumn("pass", col("n_violations") === 0L)
  }

  /** Functional-dependency discovery (profiling): for each candidate
    * `lhs -> rhs`, does every lhs value map to exactly one rhs? Reports
    * how badly it fails — violating lhs groups and the row mass inside
    * them — because "almost-FDs" are the interesting ones (a 99.9% FD
    * with 12 violating keys is a data-quality bug; a 60% one is just
    * not a dependency). Complements fkAudit (q138): that checks
    * referential integrity ACROSS tables, this checks determinism
    * WITHIN one.
    *
    * One exact `countDistinct` aggregation per candidate, each shuffled
    * on its own lhs; output is one row per candidate. */
  def fdDiscovery(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need candidate column pairs")
    candidates.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("__k"))
        .agg(countDistinct(col(rhs)).as("__nd"), count(lit(1)).as("__n"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__nd") > 1L, 1L).otherwise(0L)).as("n_violating_groups"),
          sum(when(col("__nd") > 1L, col("__n")).otherwise(0L)).as("n_violating_rows"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_groups"),
          col("n_violating_groups"), col("n_violating_rows"),
          (col("n_violating_groups") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Benford first-digit expectations `log10(1 + 1/d)` on the 6dp
    * grid, computed ONCE driver-side — the single source of truth the
    * oracle inlines as literals, so no engine ever evaluates log10. */
  private[graft] val BenfordP6: Seq[Long] = (1 to 9).map(d =>
    math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong)

  /** Benford's-law first-digit audit — the classic fabricated-numbers
    * / broken-ETL screen: naturally occurring multi-magnitude amounts
    * follow `P(d) = log10(1+1/d)`; uniform or hand-entered values
    * don't. The first significant digit comes from the INTEGER cents
    * STRING (`substr(cast(v as string), 1, 1)`) — scale-invariant and
    * free of any log10/floor boundary on either engine; expected
    * shares are driver-side 6dp literals.
    *
    * Output: one row per digit 1–9 (zero-count digits kept via a
    * 9-row literal grid) with observed/expected shares and the 6dp
    * deviation, plus the suite-level MAD (mean absolute deviation —
    * Nigrini's conformity statistic, ≤ 0.006 "close conformity" for
    * the first digit) and chi² riding on every row from a 1-row
    * broadcast.
    *
    * Scale: one map-side-combined 9-group aggregation; everything
    * after is constant-sized. */
  def benfordAudit(df: DataFrame, valueCents: Column): DataFrame = {
    val digits = df.select(substring(valueCents.cast("long").cast("string"),
        1, 1).cast("long").as("digit"))
      .filter(col("digit") >= 1L)
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(1, 10).toDF("digit")
      .withColumn("p6", BenfordP6.zipWithIndex.foldLeft(lit(0L)) {
        case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p))
          .otherwise(acc) })
    val full = grid.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val tot = full.agg(sum(col("n")).as("nt"))
    val per = full.join(broadcast(tot))
      .withColumn("obs6", expr("(n * 1000000L) div nt"))
      .withColumn("dev6", abs(col("obs6") - col("p6")))
      // chi² term: exact-integer numerator difference squared in
      // double (values fit exactly), one division, 6dp-floored PER
      // DIGIT so the suite total is an ORDER-FREE integer sum (a
      // 9-term double sum would be at the mercy of addition order)
      .withColumn("__chi6", floor(
        (col("n") * lit(1000000L) - col("nt") * col("p6")).cast("double")
          * (col("n") * lit(1000000L) - col("nt") * col("p6")).cast("double")
          / ((col("nt") * col("p6")).cast("double") * lit(1e6))
          * lit(1e6) + lit(0.5d)).cast("long"))
    val summary = per.agg(
      expr("sum(dev6) div 9").as("mad6"),
      sum(col("__chi6")).as("chi2_6"))
    per.join(broadcast(summary))
      .select(col("digit"), col("n"),
        (col("obs6").cast("double") / 1e6).as("observed"),
        (col("p6").cast("double") / 1e6).as("expected"),
        (col("dev6").cast("double") / 1e6).as("deviation"),
        (col("mad6").cast("double") / 1e6).as("mad"),
        (col("chi2_6").cast("double") / 1e6).as("chi2"))
  }
}
