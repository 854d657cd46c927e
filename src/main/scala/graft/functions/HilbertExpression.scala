package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve layout key — the space-filling curve with strictly
  * better locality than the Morton interleave
  * ([[ZOrderExpression]]): consecutive Hilbert keys are ALWAYS
  * adjacent cells (the z-curve jumps across the plane at every power
  * -of-two boundary), so range-partitioned files cut along the key
  * bound tighter (x, y) boxes and 2-d box predicates skip more files
  * at the same file count — the reason Delta/Iceberg grew HILBERT
  * clustering next to z-order.
  *
  * Contract: the LOW 16 bits of each input are mapped through the
  * standard d-from-(x, y) transform (16 quadrant-rotation rounds;
  * the iterative form of the curve's recursive definition) into a
  * 32-bit non-negative long. Callers pre-scale dimensions into
  * [0, 2^16); higher bits are masked off. `doGenCode` inlines the
  * round loop into the whole-stage span — a layout key runs once per
  * row of the table being rewritten.
  *
  * Cross-engine: the DuckDB oracle unrolls the same 16 rounds from
  * the same generator (integer arithmetic only — bit-identical by
  * construction).
  */
object HilbertExpression {

  final val Bits = 16
  final val N = 1L << Bits
  final val Mask: Long = N - 1

  /** Reference transform: d of (x, y) on the 2^16 × 2^16 curve. */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & Mask
    var y = yIn & Mask
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = N - 1 - x; y = N - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  case class HilbertKey(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def nullSafeEval(x: Any, y: Any): Any =
      xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xIn, yIn) => {
        val x = ctx.freshName("hx")
        val y = ctx.freshName("hy")
        val d = ctx.freshName("hd")
        val s = ctx.freshName("hs")
        val rx = ctx.freshName("hrx")
        val ry = ctx.freshName("hry")
        val t = ctx.freshName("ht")
        s"""long $x = $xIn & ${Mask}L;
           |long $y = $yIn & ${Mask}L;
           |long $d = 0L;
           |for (long $s = ${N >> 1}L; $s > 0L; $s >>= 1) {
           |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
           |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
           |  $d += $s * $s * ((3L * $rx) ^ $ry);
           |  if ($ry == 0L) {
           |    if ($rx == 1L) { $x = ${N - 1}L - $x; $y = ${N - 1}L - $y; }
           |    long $t = $x; $x = $y; $y = $t;
           |  }
           |}
           |${ev.value} = $d;""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  def hilbertKey(x: Column, y: Column): Column =
    GraftColumnBridge.column(
      HilbertKey(GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))
}
