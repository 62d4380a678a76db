package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.debug.codegenString
import org.apache.spark.sql.functions._

import graft.expressions.{CosinesExpr, ShingleExpr, SignatureExprs}

/** The custom expressions must participate in whole-stage codegen — no
  * `CodegenFallback` (row boxing + virtual eval) on the dedup/ANN hot path.
  * Asserts (a) the generated Java contains the direct ExprKernels static
  * calls and none of the fallback's `.eval(` dispatch for our expressions,
  * and (b) generated and interpreted paths agree bit-for-bit. */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  // repartition blocks ConvertToLocalRelation from folding the projection
  // driver-side — the select must run inside a WholeStageCodegen stage
  private def docs: DataFrame =
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "pack my box with five dozen liquor jugs"),
        (3L, "a b"),
        (4L, ""))
      .toDF("id", "text").repartition(2)

  private def vecs: DataFrame =
    Seq((1L, Array(0.6f, 0.8f, 0.0f)), (2L, Array(-1.0f, 0.0f, 0.0f)),
        (3L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("id", "emb").repartition(2)

  private val planes: Seq[Array[Float]] =
    Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f), Array(0.5f, -0.5f, 0.7f))

  private def sigQuery: DataFrame = docs.select(
    $"id",
    SignatureExprs.minhashSig($"text", 3, 8).as("mh"),
    SignatureExprs.simhash($"text", 3).as("sh"),
    SignatureExprs.shingleHashSet($"text", 2).as("shs"),
    graft.expressions.NormalizeTextExpr.normalize($"text", "nfkc").as("nt"),
    graft.operators.Bpe.encode($"text", Seq(("t", "h"), ("th", "e"))).as("bp"),
    ShingleExpr.shingles($"text", 2).as("sg"),
    ShingleExpr.shinglesAll($"text", 2).as("sga"),
    ShingleExpr.topGramStats($"text", 2).as("tg"),
    graft.etl.DataLayout.zorder($"id", length($"text")).as("z"))

  private def cosQuery: DataFrame = {
    val cos = CosinesExpr.cosines($"emb", planes)
    vecs.select(
      $"id",
      cos.as("cs"),
      CosinesExpr.signBits(cos).as("bits"),
      CosinesExpr.argMax(cos).as("am"),
      CosinesExpr.topKIndices(cos, 2).as("tk"),
      graft.expressions.PairMathExprs.cosinePair($"emb", $"emb").as("cp"),
      graft.expressions.PairMathExprs.dotPair($"emb", $"emb").as("dp"))
  }

  test("generated code calls ExprKernels directly (no CodegenFallback)") {
    // AQE defers codegen-stage insertion to execution time; disable it so
    // executedPlan carries the WholeStageCodegen subtrees to inspect
    val (sigCode, cosCode) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try (codegenString(sigQuery.queryExecution.executedPlan),
           codegenString(cosQuery.queryExecution.executedPlan))
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert(sigCode.contains("ExprKernels.minhashSig"))
    assert(sigCode.contains("ExprKernels.simhash"))
    assert(sigCode.contains("ExprKernels.shingleFnvSet"))
    assert(sigCode.contains("ExprKernels.normalizeText"))
    assert(sigCode.contains("ExprKernels.bpeEncode"))
    assert(sigCode.contains("ExprKernels.shingles"))
    assert(sigCode.contains("ExprKernels.topGramStats"))
    assert(sigCode.contains("ExprKernels.zorder2"))
    assert(cosCode.contains("ExprKernels.cosines"))
    assert(cosCode.contains("ExprKernels.signBits"))
    assert(cosCode.contains("ExprKernels.argMax"))
    assert(cosCode.contains("ExprKernels.topKIndices"))
    assert(cosCode.contains("ExprKernels.cosinePair"))
    assert(cosCode.contains("ExprKernels.dotPair"))
    // CodegenFallback emits `((Expression) references[i]).eval(` — absent now
    Seq(sigCode, cosCode).foreach { code =>
      assert(!code.contains(").eval("), "fallback eval dispatch in generated code")
    }
  }

  private def withInterpreted[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("bloom might_contain: codegen'd probe, no false negatives") {
    import graft.expressions.BloomExprs
    val items = (0L until 2000L).map(i => s"gram-$i")
    val bloom = items.toDF("g").stat.bloomFilter("g", 2000L, 0.01)
    val probe = (items ++ (10000L until 12000L).map(i => s"absent-$i"))
      .toDF("g").repartition(3)
      .select($"g", BloomExprs.mightContain($"g", bloom).as("hit"))
    // the probe must run inside whole-stage codegen (reference-object
    // filter, no fallback eval); AQE defers WSCG insertion, so disable it
    // for the plan inspection like the other codegen asserts
    val gen = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try codegenString(probe.queryExecution.executedPlan)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert(gen.contains("mightContainBinary"), "expected the direct bloom probe call")
    val byHit = probe.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // soundness: every inserted item MUST hit (bloom theorem)
    items.foreach(g => assert(byHit(g), s"false negative on $g"))
    // fp sanity: absent items hit at ~fpp, not wholesale
    val fps = (10000L until 12000L).count(i => byHit(s"absent-$i"))
    assert(fps < 100, s"fp rate implausibly high: $fps/2000")
  }

  test("generated and interpreted paths agree") {
    val gen1 = sigQuery.collect().map(_.toString).sorted
    val gen2 = cosQuery.collect().map(_.toString).sorted
    val (int1, int2) = withInterpreted {
      (sigQuery.collect().map(_.toString).sorted,
       cosQuery.collect().map(_.toString).sorted)
    }
    assert(gen1.sameElements(int1))
    assert(gen2.sameElements(int2))
  }

  test("null inputs stay null through the generated path") {
    val withNulls = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select($"id",
        SignatureExprs.minhashSig($"text", 2, 4).as("mh"),
        SignatureExprs.simhash($"text", 2).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2))))
      .toMap
    assert(withNulls(1L) == ((false, false)))
    assert(withNulls(2L) == ((true, true)))
  }
}
