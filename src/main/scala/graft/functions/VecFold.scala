package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Whole-stage-codegen'd left-to-right folds over two `array<double>`
  * columns — the vector-math hot path of every similarity lane.
  *
  * These replace `aggregate(zip_with(a, b, f), 0.0, (acc, x) => acc + x)`
  * chains, which Catalyst evaluates as interpreted higher-order lambdas
  * with a materialized intermediate zip array (~16 µs/pair measured on the
  * q156 pair stage — 25 s for 1.4 M candidate pairs at sf0.1). The codegen
  * loop below is the SAME IEEE chain in the SAME order (acc starts at 0.0,
  * `acc += f(a(i), b(i))` strictly left-to-right), so every oracle that
  * replays the fold as DuckDB `list_reduce` keeps matching bit-for-bit —
  * this is a PLAN change, never an ANSWER change (SimilaritySpec pins
  * codegen == HOF on both folds).
  *
  * Null semantics replicate the HOF chain exactly: null array → null;
  * unequal lengths → the `zip_with` null padding poisons the sum → null;
  * null element → null product/difference → null sum.
  */
abstract class VecFold extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  // nullable even over non-null inputs: length mismatch / null elements
  override def nullable: Boolean = true

  /** scalar step f(x, y) — must match [[stepJava]] bit-for-bit */
  protected def step(x: Double, y: Double): Double
  /** Java source for the step over element vars `x`/`y` */
  protected def stepJava(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n1 = xs.numElements(); val n2 = ys.numElements()
    val n = math.max(n1, n2)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (i >= n1 || i >= n2 || xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += step(xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $n = Math.max($n1, $n2);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i >= $n1 || $i >= $n2 ||
         |      $a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    $acc = 0.0;
         |    break;
         |  }
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $acc += ${stepJava(x, y)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ a(i)·b(i) — dot product; `graft_dot(a, a)` is the squared l2 norm. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepJava(x: String, y: String): String = s"$x * $y"
  override def prettyName: String = "graft_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (a(i) − b(i))² — squared euclidean distance (k-means / PQ argmin). */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override protected def step(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def stepJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override def prettyName: String = "graft_sqdist"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}
