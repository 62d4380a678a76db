package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring search as ONE codegen'd scan-side expression —
  * the blocklist/badwords gate of a C4-style cleaning pipeline (public
  * algorithm: Aho & Corasick, CACM 1975).
  *
  * The composed alternative — one `contains`/`regexp_count` per phrase —
  * scans the text once PER PHRASE: a thousand-entry blocklist turns a
  * 100 TB scan into a 100 PB character walk. The Aho–Corasick automaton
  * finds every occurrence of every phrase in ONE pass per document,
  * independent of blocklist size: goto/fail transitions over a dense
  * ASCII-indexed table, output links collecting all phrases ending at
  * each position.
  *
  * The compiled automaton rides into generated code as a reference
  * object (the [[BpeEncodeExpr]] table pattern): built once per
  * executor from the serialized phrase array, shared by every row the
  * task processes. Per-row, zero shuffle, zero state — the blocklist
  * gate runs at scan speed.
  *
  * Returns ALL matches ordered by (end position, phrase index) —
  * substring semantics, overlapping occurrences of DIFFERENT phrases
  * each reported, so downstream can count, dedup, or span-locate. For a
  * phrase with no self-border (no proper prefix equal to a suffix —
  * every two-distinct-word phrase qualifies), occurrences cannot
  * self-overlap, so the per-phrase count equals the non-overlapping
  * count an oracle's left-to-right `regexp_extract_all` computes.
  */
case class MultiMatchExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(p => p.nonEmpty && p.forall(_ < 128)),
    "phrases must be non-empty ASCII (the dense-goto alphabet)")
  require(phrases.distinct == phrases, "phrases must be distinct")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val automaton = new AcAutomaton(phrases.toArray)

  override def nullSafeEval(input: Any): Any =
    automaton.findAll(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      val aRef = ctx.addReferenceObj("acAutomaton", automaton,
        classOf[AcAutomaton].getName)
      s"${ev.value} = $aRef.findAll($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiMatchExpr =
    copy(child = newChild)

  override def prettyName: String = "multi_match"
}

object MultiMatchExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** All blocklist matches in `c`, ordered (end position, phrase index). */
  def multiMatch(c: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(MultiMatchExpr(ColumnBridge.expression(c), phrases))
}

/** Compiled Aho–Corasick automaton. Serializable via the phrase array
  * alone; the dense goto/fail/output tables rebuild lazily per JVM (the
  * [[BpeTable]] convention for generated-code reference objects). */
final class AcAutomaton(val phrases: Array[String]) extends Serializable {

  /** goto dense over 7-bit ASCII; -1 = no edge. Row 0 is the root. */
  @transient private lazy val (gotoTab, failTab, outTab):
      (Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    val goto = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
    val out = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    // trie
    var pi = 0
    while (pi < phrases.length) {
      val p = phrases(pi)
      var s = 0
      var i = 0
      while (i < p.length) {
        val ch = p.charAt(i).toInt
        if (goto(s)(ch) == -1) {
          goto(s)(ch) = goto.length
          goto += Array.fill(128)(-1)
          out += Array.empty[Int]
        }
        s = goto(s)(ch)
        i += 1
      }
      out(s) = out(s) :+ pi
      pi += 1
    }
    // BFS failure links; root's missing edges become self-loops so the
    // scan never backtracks (the classic goto-completion form).
    val fail = Array.fill(goto.length)(0)
    val queue = new java.util.ArrayDeque[Integer]()
    var ch = 0
    while (ch < 128) {
      val s = goto(0)(ch)
      if (s == -1) goto(0)(ch) = 0 else queue.add(s)
      ch += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      // output union along the failure chain, sorted by phrase index so
      // per-position reporting is deterministic
      out(s) = (out(s) ++ out(fail(s))).sorted.distinct
      ch = 0
      while (ch < 128) {
        val nxt = goto(s)(ch)
        if (nxt == -1) goto(s)(ch) = goto(fail(s))(ch)
        else { fail(nxt) = goto(fail(s))(ch); queue.add(nxt) }
        ch += 1
      }
    }
    (goto.toArray, fail, out.toArray)
  }

  /** Every match as the phrase string, ordered (end position, phrase
    * index). Characters outside 7-bit ASCII reset to the root (they
    * can't appear inside any phrase). */
  def findAll(text: String): GenericArrayData = {
    val acc = new java.util.ArrayList[Any]()
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toInt
      s = if (c < 128) gotoTab(s)(c) else 0
      val hits = outTab(s)
      var j = 0
      while (j < hits.length) {
        acc.add(UTF8String.fromString(phrases(hits(j)))); j += 1
      }
      i += 1
    }
    new GenericArrayData(acc.toArray)
  }
}
