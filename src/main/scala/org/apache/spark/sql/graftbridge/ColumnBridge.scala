package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (columnNodeSupport.scala); extension libraries reach it by declaring a
  * bridge inside the org.apache.spark.sql package — the same technique used
  * by public Spark connector/extension projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Necessary numeric bounds on column `name` implied by `pred`'s
    * CONJUNCTS, as raw (lo, hi) doubles (None = unbounded on that
    * side; (None, None) = nothing extractable). Lives here because a
    * Column's UNRESOLVED ColumnNode tree — the only structured form a
    * predicate has before any plan exists — is `private[sql]`
    * (columnNodes.scala); the Expression conversion wraps the whole
    * tree in one opaque ColumnNodeExpression, hiding its structure.
    * Sound for file skipping: pred ⇒ each conjunct, so every matching
    * row satisfies each extracted bound. Handled: >=, >, <=, <, =,
    * <=>, IN over a bare/CAST reference to `name` and numeric
    * literals, either operand order, combined through AND; anything
    * else (OR, NOT, UDFs, non-numeric literals, NaN) contributes
    * nothing — never unsound, just no narrowing. The caller
    * (ManifestTable.impliedRange) owns the long-cast widening. */
  def impliedNumericBounds(pred: Column, name: String)
      : (Option[Double], Option[Double]) = {
    import org.apache.spark.sql.internal.{Cast => NCast, ColumnNode,
      Literal => NLiteral, UnresolvedAttribute => NAttr,
      UnresolvedFunction => NFn}
    def nameOf(n: ColumnNode): Option[String] = n match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case cst: NCast => nameOf(cst.child)
      case _ => None
    }
    def isCol(n: ColumnNode): Boolean = nameOf(n).contains(name)
    def litNum(n: ColumnNode): Option[Double] = n match {
      case l: NLiteral => l.value match {
        case i: java.lang.Integer => Some(i.toDouble)
        case v: java.lang.Long => Some(v.toDouble)
        case s: java.lang.Short => Some(s.toDouble)
        case b: java.lang.Byte => Some(b.toDouble)
        case f: java.lang.Float if !f.isNaN => Some(f.toDouble)
        case d: java.lang.Double if !d.isNaN => Some(d.doubleValue())
        case d: java.math.BigDecimal => Some(d.doubleValue())
        case d: BigDecimal => Some(d.toDouble)
        case _ => None
      }
      case _ => None
    }
    def cmp(op: String, a: ColumnNode, b: ColumnNode)
        : (Option[Double], Option[Double]) = op match {
      case ">=" | ">" =>
        if (isCol(a)) (litNum(b), None)
        else if (isCol(b)) (None, litNum(a))
        else (None, None)
      case "<=" | "<" =>
        if (isCol(a)) (None, litNum(b))
        else if (isCol(b)) (litNum(a), None)
        else (None, None)
      case "=" | "==" | "<=>" =>
        if (isCol(a)) (litNum(b), litNum(b))
        else if (isCol(b)) (litNum(a), litNum(a))
        else (None, None)
      case _ => (None, None)
    }
    def walk(n: ColumnNode): (Option[Double], Option[Double]) = n match {
      case f: NFn => (f.functionName, f.arguments) match {
        case ("and", scala.collection.Seq(l, r)) =>
          val (ll, lh) = walk(l); val (rl, rh) = walk(r)
          ((ll.toSeq ++ rl.toSeq)
             .reduceOption((a: Double, b: Double) => math.max(a, b)),
           (lh.toSeq ++ rh.toSeq)
             .reduceOption((a: Double, b: Double) => math.min(a, b)))
        case ("in", args) if args.length >= 2 && isCol(args.head) =>
          val vs = args.tail.map(litNum(_))
          if (vs.forall(_.isDefined)) {
            val ds = vs.flatten
            (Some(ds.min), Some(ds.max))
          } else (None, None)
        case (op, scala.collection.Seq(a, b)) => cmp(op, a, b)
        case _ => (None, None)
      }
      case _ => (None, None)
    }
    walk(c0node(pred))
  }

  /** Necessary EQUALITY probe set on column `name` implied by `pred`'s
    * conjuncts: the literal values of a `name = lit` / `name <=> lit` /
    * `name IN (lits)` conjunct (either operand order). Sound the same
    * way [[impliedNumericBounds]] is — pred ⇒ the conjunct, so every
    * matching row's value is IN the returned set; when several
    * conjuncts each bound the column, the SMALLEST set is returned
    * (all are necessary). None when no conjunct pins the column, or a
    * candidate set contains a non-literal member. */
  def impliedEqualitySet(pred: Column, name: String): Option[Seq[Any]] = {
    import org.apache.spark.sql.internal.{Cast => NCast, ColumnNode,
      Literal => NLiteral, UnresolvedAttribute => NAttr,
      UnresolvedFunction => NFn}
    def nameOf(n: ColumnNode): Option[String] = n match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case cst: NCast => nameOf(cst.child)
      case _ => None
    }
    def isCol(n: ColumnNode): Boolean = nameOf(n).contains(name)
    def litOf(n: ColumnNode): Option[Any] = n match {
      case l: NLiteral => Option(l.value) // a NULL literal pins nothing
      case _ => None
    }
    def walk(n: ColumnNode): Option[Seq[Any]] = n match {
      case f: NFn => (f.functionName, f.arguments) match {
        case ("and", scala.collection.Seq(l, r)) =>
          (walk(l), walk(r)) match {
            case (Some(a), Some(b)) => Some(if (a.length <= b.length) a else b)
            case (a, b) => a.orElse(b)
          }
        case ("=" | "==" | "<=>", scala.collection.Seq(a, b)) =>
          if (isCol(a)) litOf(b).map(Seq(_))
          else if (isCol(b)) litOf(a).map(Seq(_))
          else None
        case ("in", args) if args.length >= 2 && isCol(args.head) =>
          val vs = args.tail.map(litOf(_))
          if (vs.forall(_.isDefined)) Some(vs.flatten.toSeq) else None
        case _ => None
      }
      case _ => None
    }
    walk(c0node(pred))
  }

  private def c0node(c: Column): org.apache.spark.sql.internal.ColumnNode =
    c.node

  /** Dataset from a (resolved) logical plan — `Dataset.ofRows` is
    * `private[sql]` in Spark 4; custom whole-operator nodes
    * (graft.plans.TopKPerKeyNode) need this one constructor. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
