package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert curve index of a quantized (x, y) cell — the classic
  * xy2d bit loop (Hilbert 1891; the iterative rotate-and-flip form is
  * public knowledge, e.g. the Wikipedia "Hilbert curve" reference
  * implementation). Layout alternative to the Morton/z-order key
  * ([[graft.operators.Layout.interleaveBitsN]]): consecutive Hilbert
  * indexes are ALWAYS 4-adjacent grid cells (no Morton "seam jumps"
  * across quadrant boundaries), so equal-size key ranges cover tighter
  * hyper-rectangles — better file min/max bounds for the same file
  * count. Cost: the key needs a per-bit rotate loop (this codegen'd
  * expression) instead of z-order's pure shift/or chain.
  *
  * Inputs must be already-quantized non-negative longs < 2^bits (the
  * [[graft.operators.Layout]] quantizer's contract). Pure integer
  * arithmetic — bit-replayable by any engine, including the unrolled
  * per-level SQL chain the oracle uses.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert2d"

  override def nullSafeEval(xa: Any, ya: Any): Any = {
    var x = xa.asInstanceOf[Long]
    var y = ya.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $xv;
         |long $y = $yv;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}
