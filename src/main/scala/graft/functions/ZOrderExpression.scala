package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (z-order) interleaving of two dimension keys — the
  * space-filling-curve layout key that makes ONE sort order serve
  * range predicates on BOTH dimensions: rows close in (x, y) are
  * close in zkey, so range-partitioned, min/max-stamped files stay
  * narrow in every interleaved dimension and a 2-d box predicate
  * skips most files, where a single-column sort bounds only its own
  * column.
  *
  * Contract: the LOW 31 bits of each input are interleaved (x at even
  * positions, y at odd) into a 62-bit non-negative long. Callers
  * pre-scale dimensions into [0, 2^31); higher bits are masked off.
  * The bit-spread uses the standard 2-D shift-and-mask magic
  * constants — five shifts per dimension, branch-free, inlined by
  * `doGenCode` into the whole-stage span (a layout key is evaluated
  * once per row of the entire table being rewritten, the hottest
  * possible path).
  */
object ZOrderExpression {

  final val Mask31 = 0x7FFFFFFFL

  /** Spread the low 31 bits of v to even bit positions. */
  @inline def spread31(v: Long): Long = {
    var x = v & Mask31
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long =
    spread31(x) | (spread31(y) << 1)

  case class ZOrderKey(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def nullSafeEval(x: Any, y: Any): Any =
      interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        def spread(v: String, t: String): String =
          s"""long $t = $v & 0x7FFFFFFFL;
             |$t = ($t | ($t << 16)) & 0x0000FFFF0000FFFFL;
             |$t = ($t | ($t << 8)) & 0x00FF00FF00FF00FFL;
             |$t = ($t | ($t << 4)) & 0x0F0F0F0F0F0F0F0FL;
             |$t = ($t | ($t << 2)) & 0x3333333333333333L;
             |$t = ($t | ($t << 1)) & 0x5555555555555555L;""".stripMargin
        val sx = ctx.freshName("zx")
        val sy = ctx.freshName("zy")
        s"""${spread(x, sx)}
           |${spread(y, sy)}
           |${ev.value} = $sx | ($sy << 1);""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  def zOrderKey(x: Column, y: Column): Column =
    GraftColumnBridge.column(
      ZOrderKey(GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))

  /** d-dimensional Morton interleave, MSB-first across dimensions —
    * the SAME bit-packing order as
    * [[HilbertExpression.axesToHilbert]], so the two d-dimensional
    * layout keys differ only by the Hilbert rotation (the property
    * LayoutSpec's skipping comparisons isolate). For d = 2 at 31 bits
    * this is [[interleave]] with the dimension roles swapped
    * (spec-pinned). Static so the expression, the spec model, and
    * interpreted eval share one implementation.
    */
  def interleaveN(xIn: Array[Long], bits: Int): Long = {
    val n = xIn.length
    val mask = (1L << bits) - 1
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        d = (d << 1) | (((xIn(i) & mask) >> b) & 1L)
        i += 1
      }
      b -= 1
    }
    d
  }

  /** Variadic d-dimensional Morton key (2 ≤ d ≤ 4) — the z-order
    * sibling of [[HilbertExpression.HilbertKeyN]], kept because at
    * high dimension-count-to-file-count ratios the simpler curve's
    * write cost is lower and the skipping gap narrows (measured in
    * LayoutSpec).
    */
  case class ZOrderKeyN(coords: Seq[Expression], bits: Int)
      extends Expression with ImplicitCastInputTypes {
    require(coords.size >= 2 && coords.size <= 4,
      s"zOrderKeyN supports 2..4 dimensions, got ${coords.size}")
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
      interleaveN(arr, bits)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val evals = coords.map(_.genCode(ctx))
      val arr = ctx.freshName("zxs")
      val childCode = evals.map(_.code.toString).mkString("\n")
      val anyNull = evals.map(e => s"(${e.isNull})").mkString(" || ")
      ev.copy(code = code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          long[] $arr = new long[]{${evals.map(_.value).mkString(", ")}};
          ${ev.value} =
            graft.functions.ZOrderExpression.interleaveN($arr, $bits);
        }""")
    }
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(coords = newChildren)
  }

  def zOrderKeyN(bits: Int)(coords: Column*): Column =
    GraftColumnBridge.column(
      ZOrderKeyN(coords.map(GraftColumnBridge.expression), bits))
}
