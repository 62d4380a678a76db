package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Learned-merge-table byte-pair-encoding tokenization of a text column —
  * the token-budget accounting step of a training-data pipeline, as ONE
  * codegen'd scan-side expression (public algorithm: Sennrich, Haddow &
  * Birch, ACL'16 subword units).
  *
  * Words are lowercased alphanumeric runs (the repo's shared tokenization
  * convention); each word becomes its character symbols plus a terminal
  * `</w>` marker, then learned merges apply in rank order (lowest-rank
  * adjacent pair first, all leftmost-non-overlapping occurrences per
  * round) until no merge applies. The merge table rides into generated
  * code as a reference object; per-word results are memoized in a
  * bounded table-local cache because corpus word frequency follows Zipf —
  * the hot few thousand words hit the cache, the long tail computes.
  *
  * Scale: per-row, zero shuffle, no state beyond the (vocab-sized) merge
  * table — the 100 TB path tokenizes at scan speed. Training the table is
  * [[graft.operators.Bpe.trainMerges]] (distributed word counts, driver
  * greedy over the bounded word-frequency head).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // one table per expression instance: rank lookup + bounded word memo
  @transient private lazy val table = new BpeTable(merges.toArray)

  override def nullSafeEval(input: Any): Any =
    ExprKernels.bpeEncode(input.toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      val tRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = graft.expressions.ExprKernels.bpeEncode($in, $tRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncodeExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def encode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(c), merges))
}

/** Merge ranks + a bounded per-table word-result memo. Serializable so the
  * reference object ships inside generated-code references. */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // ' ' never occurs in symbols (words are [a-z0-9] runs + marker)
      m.putIfAbsent(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Rank of pair (a,b), or Int.MaxValue when the pair never merges. */
  def rank(a: String, b: String): Int = {
    val r = ranks.get(a + " " + b)
    if (r == null) Int.MaxValue else r.intValue()
  }

  def pair(rank: Int): (String, String) = merges(rank)

  /** Zipf-friendly memo: concurrent (executor threads share the table in
    * one JVM), capped so an adversarial all-unique corpus cannot grow it
    * unboundedly — past the cap the long tail just recomputes. */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 1 << 16

  def cached(word: String): Array[String] = memo.get(word)
  def cache(word: String, toks: Array[String]): Unit =
    if (memo.size < MemoCap) memo.put(word, toks)
}
