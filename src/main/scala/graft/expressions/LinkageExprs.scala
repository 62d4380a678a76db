package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Record-linkage string kernels as codegen'd scalar expressions.
  *
  * Spark ships `levenshtein` but no Jaro–Winkler, the de-facto standard
  * name-matching similarity (tolerant of transpositions and rewarding
  * shared prefixes — exactly the typo shapes survey/CRM name fields
  * produce; reference analog: the fuzzy duplicate-name handling around
  * main.py:120-131). Semantics match DuckDB's `jaro_winkler_similarity`
  * (itself the classic Winkler variant) so the oracle can replay the
  * scores directly:
  *
  *  - match window `max(max(|a|,|b|)/2 - 1, 0)`;
  *  - `t` = half the out-of-order matched positions;
  *  - `jaro = (m/|a| + m/|b| + (m-t)/m) / 3`;
  *  - prefix boost `jw = jaro + l*0.1*(1-jaro)` only when `jaro > 0.7`,
  *    `l` = common prefix capped at 4;
  *  - either side empty -> 0.0 (DuckDB convention, including ''/'').
  *
  * Per-pair O(|a|*window) with two small boolean scratch arrays — scan
  * side, zero shuffle, whole-stage-codegen friendly.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    LinkageKernels.jaroWinkler(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ShingleHashing.stringOf(a, left.dataType == StringType)
      val sb = ShingleHashing.stringOf(b, right.dataType == StringType)
      s"${ev.value} = graft.expressions.LinkageKernels.jaroWinkler($sa, $sb);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

/** Luhn mod-10 checksum over the digits of a candidate string — the
  * validity gate that separates real card/account numbers from random
  * digit runs in PII scans (a 16-digit string passes by chance only 10%
  * of the time). Non-digit characters anywhere -> false; length outside
  * [12, 19] -> false (ISO/IEC 7812 PAN lengths). */
case class LuhnValidExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    LinkageKernels.luhnValid(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.LinkageKernels.luhnValid($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnValidExpr =
    copy(child = newChild)

  override def prettyName: String = "luhn_valid"
}

object LinkageKernels {

  /** DuckDB-parity Jaro–Winkler (see [[JaroWinklerExpr]]). Operates on
    * UTF-16 code units, which coincides with codepoints for the BMP text
    * these pipelines match on. */
  def jaroWinkler(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aFlag = new Array[Boolean](la)
    val bFlag = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bFlag(j) && b.charAt(j) == a.charAt(i)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // out-of-order matched positions, walked in parallel over both flags
    var mismatch = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aFlag(i)) {
        while (!bFlag(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) mismatch += 1
        j += 1
      }
      i += 1
    }
    val t = mismatch / 2.0
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(la, lb))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def luhnValid(s: String): Boolean = {
    val n = s.length
    if (n < 12 || n > 19) return false
    var sum = 0
    var pos = 0 // 0 = rightmost digit
    var i = n - 1
    while (i >= 0) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return false
      var d = c - '0'
      if (pos % 2 == 1) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      pos += 1
      i -= 1
    }
    sum % 10 == 0
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def jaroWinklerCol(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def luhnValidCol(c: Column): Column =
    ColumnBridge.column(LuhnValidExpr(ColumnBridge.expression(c)))
}
