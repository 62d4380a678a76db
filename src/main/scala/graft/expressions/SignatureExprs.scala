package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** One-pass shingle hashing shared by the signature expressions: iterate
  * the word n-gram windows of the lowercased, space-split text and hash
  * each window's characters (FNV-1a 64, ' '-joined) WITHOUT materializing
  * shingle strings. Tokenization matches ShingleExpr exactly.
  */
private[expressions] object ShingleHashing {

  /** splitmix64 finalizer (public-domain mixing constants). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Calls `f` once per n-gram window (duplicates included — min/vote
    * aggregations are multiset-safe). */
  /** Generated-code input adapter: UTF8String children call `.toString()`
    * directly; anything else goes through `String.valueOf` (works for
    * primitives under Janino, which has no autoboxing). */
  def stringOf(c: String, childIsString: Boolean): String =
    if (childIsString) s"$c.toString()" else s"String.valueOf($c)"

  def foreachShingleHash(raw: String, n: Int)(f: Long => Unit): Unit = {
    val toks = raw.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val last = toks.length - n
    if (last >= 0) {
      var i = 0
      while (i <= last) {
        var h = FnvOffset
        var j = 0
        while (j < n) {
          if (j > 0) h = (h ^ ' ') * FnvPrime
          val t = toks(i + j)
          var c = 0
          while (c < t.length) { h = (h ^ t.charAt(c)) * FnvPrime; c += 1 }
          j += 1
        }
        f(h)
        i += 1
      }
    } else {
      // fewer than n tokens: one shingle of all tokens joined (ShingleExpr
      // semantics)
      var h = FnvOffset
      var j = 0
      while (j < toks.length) {
        if (j > 0) h = (h ^ ' ') * FnvPrime
        val t = toks(j)
        var c = 0
        while (c < t.length) { h = (h ^ t.charAt(c)) * FnvPrime; c += 1 }
        j += 1
      }
      f(h)
    }
  }
}

/** k MinHash values of a document's word n-gram shingle set, computed in
  * ONE pass per row — no explode, no k-column aggregate, no shuffle. Each
  * shingle contributes k candidate values `mix(h ^ seed_i)` (the standard
  * one-hash + k-mix construction); the row's signature is the per-seed
  * minimum. Replaces the former explode + grouped-min pipeline whose
  * (id, k longs) aggregate was the dedup suite's dominant cost under
  * memory pressure. Codegen emits a static call into [[ExprKernels]] — no
  * row boxing, no virtual eval, inside whole-stage codegen. */
case class MinHashSigExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, "shingle size and signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => ShingleHashing.mix(0x5DEECE66DL + i.toLong))

  override def nullSafeEval(input: Any): Any =
    ExprKernels.minhashSig(input.toString, n, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.minhashSig($in, $n, $seedsRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash of a document's word n-gram shingle set in one pass per
  * row: per-bit vote over the DISTINCT shingle hashes, sign packed to a
  * long. Replaces the former explode + 64-column conditional-sum
  * aggregate (one shuffle of 64 longs per doc, the single slowest query
  * of round 1's driver bench). Codegen emits a static [[ExprKernels]] call. */
case class SimHashExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.simhash(input.toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.simhash($in, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

/** DISTINCT FNV-1a-64 hashes of a document's word n-gram shingles, one
  * pass per row — the set-valued scan-side input of sketch aggregates
  * ([[KmvDistinctAgg]]). Hashes (not strings) leave the scan, so the
  * downstream aggregation state is 8 bytes per element regardless of
  * shingle length. */
case class ShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ExprKernels.shingleFnvSet(input.toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.shingleFnvSet($in, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSetExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash_set"
}

object SignatureExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def minhashSig(c: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), n, k))

  def simhash(c: Column, n: Int): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(c), n))

  def shingleHashSet(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSetExpr(ColumnBridge.expression(c), n))
}
