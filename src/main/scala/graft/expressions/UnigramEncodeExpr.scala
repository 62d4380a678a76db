package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-shape) tokenization of a text column with
  * a trained (piece → 9dp log-prob) vocabulary
  * ([[graft.operators.UnigramLm.emTrain]]) — Viterbi best segmentation
  * per word as ONE codegen'd scan-side expression, the
  * [[BpeEncodeExpr]] contract for the other tokenizer family.
  *
  * Words are lowercased alphanumeric runs (the shared tokenization
  * convention); each word becomes its highest-scoring piece sequence
  * under exact integer 9dp sums (ties: the longest final piece,
  * applied recursively — deterministic on any engine), followed by the
  * `</w>` marker token so [[graft.operators.Bpe.decode]] inverts both
  * tokenizers identically. A character absent from the vocabulary
  * (impossible for corpora the model was trained on — single chars are
  * never pruned — but possible on foreign text) is emitted as itself:
  * UNK-as-self keeps encoding total rather than failing mid-scan.
  *
  * Scale: per-row, zero shuffle, vocab-sized reference object,
  * Zipf-friendly bounded word memo — 100 TB tokenizes at scan speed. */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val table = new UnigramTable(vocab.toArray)

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeExpr.encodeText(input.toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      val tRef = ctx.addReferenceObj("uniTable", table,
        classOf[UnigramTable].getName)
      s"${ev.value} = graft.expressions.UnigramEncodeExpr.encodeText(" +
        s"$in, $tRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "unigram_encode"
}

object UnigramEncodeExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def encode(c: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramEncodeExpr(ColumnBridge.expression(c), vocab))

  /** Split into lowercased alphanumeric runs, Viterbi-encode each,
    * marker token after every word (the bpeEncode loop shape). */
  def encodeText(raw: String, table: UnigramTable): ArrayData = {
    val text = raw.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val word = new java.lang.StringBuilder
    var i = 0
    while (i <= text.length) {
      val alnum = i < text.length && {
        val ch = text.charAt(i)
        (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')
      }
      if (alnum) word.append(text.charAt(i))
      else if (word.length > 0) {
        val toks = table.encodeWord(word.toString)
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
        out += UTF8String.fromString(ExprKernels.BpeEow)
        word.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Piece log-prob lookup + bounded word memo (the BpeTable shape). */
final class UnigramTable(val vocab: Array[(String, Long)]) extends Serializable {

  @transient private lazy val lp: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (p, v) => m.putIfAbsent(p, java.lang.Long.valueOf(v)) }
    m
  }

  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max

  /** Score of an unknown single char: below every real piece but far
    * above the unreachable sentinel, so UNK-as-self only fires when no
    * vocabulary segmentation covers a character. */
  private val UnkLp = -100000000000L // -100 on the 9dp grid

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 1 << 16

  /** Exact-integer Viterbi: dp(i) = best score for the first i chars;
    * ties prefer the SMALLER split point (longest final piece). */
  def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val n = w.length
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (dp(j) != Long.MinValue) {
          val piece = w.substring(j, i)
          val v = lp.get(piece)
          val score =
            if (v != null) dp(j) + v.longValue()
            else if (i - j == 1) dp(j) + UnkLp
            else Long.MinValue
          if (score != Long.MinValue && score > bestS) { bestS = score; bestJ = j }
        }
        j += 1
      }
      dp(i) = bestS; back(i) = bestJ
      i += 1
    }
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { pieces += w.substring(back(k), k); k = back(k) }
    val arr = pieces.reverseIterator.toArray
    if (memo.size < MemoCap) memo.put(w, arr)
    arr
  }
}
