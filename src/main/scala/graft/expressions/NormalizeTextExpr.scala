package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a codegen'd scalar expression — the
  * multilingual-corpus cleaning step Spark has no builtin for. Three
  * modes over `java.text.Normalizer` (a public JDK API, no deps):
  *
  *  - `nfc`: canonical composition — the storage/dedup canonical form
  *    (visually identical strings with different combining-mark byte
  *    sequences hash apart until normalized; exact dedup and shingle
  *    hashing both silently miss duplicates on unnormalized text).
  *  - `nfkc`: compatibility composition — folds width/ligature/font
  *    variants (ﬁ -> fi, full-width digits -> ASCII), the usual form
  *    before tokenization.
  *  - `strip_accents`: NFD, drop combining marks (Unicode category Mn),
  *    recompose NFC — the aggressive fold used by search/matching
  *    pipelines (matches DuckDB's `strip_accents` on combining-mark
  *    accents, which is what the q176 oracle replays).
  *
  * Per-row, scan-side, zero shuffle; the JDK Normalizer fast-paths
  * already-normalized (e.g. pure-ASCII) input to a verification scan, so
  * the common case costs one pass, no allocation.
  */
case class NormalizeTextExpr(child: Expression, mode: String)
    extends UnaryExpression {

  require(NormalizeTextExpr.Modes.contains(mode),
    s"mode must be one of ${NormalizeTextExpr.Modes.mkString("/")}, got $mode")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  private val modeId = NormalizeTextExpr.Modes.indexOf(mode)

  override def nullSafeEval(input: Any): Any =
    ExprKernels.normalizeText(input.toString, modeId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ShingleHashing.stringOf(c, child.dataType == StringType)
      s"${ev.value} = graft.expressions.ExprKernels.normalizeText($in, $modeId);"
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)

  override def prettyName: String = s"normalize_$mode"
}

object NormalizeTextExpr {
  val Modes: Seq[String] = Seq("nfc", "nfkc", "strip_accents")

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def normalize(c: Column, mode: String): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(c), mode))
}
