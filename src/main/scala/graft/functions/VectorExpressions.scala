package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for float-vector math.
  *
  * Semantics contract (shared with the generated DuckDB oracle SQL
  * and the declarative `aggregate(zip_with(...))` form they replace):
  * every float is widened to double exactly, and the sum folds
  * STRICTLY left-to-right — `((0 + t1) + t2) + ...` — so results are
  * bit-identical across engines and partitionings. The tight loop is
  * ~50× faster than the interpreted higher-order-function chain on
  * the all-pairs similarity workloads.
  *
  * All three expressions implement `doGenCode` (the loop inlines into
  * the generated Java), so they stay INSIDE whole-stage codegen spans
  * instead of forcing a CodegenFallback row materialization in the
  * middle of every similarity kernel.
  */
object VectorExpressions {

  private def dotSeq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Sequential dot product of two float vectors, in double. */
  case class FloatDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = ${ev.value}_acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Sequential L2 norm of a float vector, in double. */
  case class FloatL2Norm(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < a.numElements()) {
        val x = a.getFloat(i).toDouble
        acc += x * x
        i += 1
      }
      math.sqrt(acc)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        s"""
           |double ${ev.value}_acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  ${ev.value}_acc += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim i): a fixed integer hash mapped to [-0.5, 0.5). Seedless and
    * exactly representable in double (k/2^16 - 1/2), so the DuckDB
    * oracle reproduces it from its decimal literal bit-for-bit.
    */
  def planeComponent(p: Int, i: Int): Double = {
    val h = (p * 73856093L ^ i * 19349663L) & 0xffffL
    h.toDouble / 65536.0 - 0.5
  }

  /** Sign-bit LSH bucket over `nPlanes` deterministic hyperplanes:
    * bit p is set iff the (strictly left-to-right, double-precision)
    * projection onto plane p is >= 0. One pass over the vector per
    * plane in a tight loop — the literal expression tree it replaces
    * was interpreted per-row and sat in the inner loop of every
    * LSH-blocked similarity join.
    */
  case class HyperplaneBucket(child: Expression, nPlanes: Int, dim: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType

    @transient private lazy val planes: Array[Array[Double]] =
      Array.tabulate(nPlanes, dim)((p, i) => planeComponent(p, i))

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(dim, a.numElements())
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val comp = planes(p)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += a.getFloat(i).toDouble * comp(i)
          i += 1
        }
        if (acc >= 0) bucket |= 1L << p
        p += 1
      }
      bucket
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val comp = ctx.freshName("comp")
        s"""
           |int $n = java.lang.Math.min($dim, $a.numElements());
           |long ${ev.value}_b = 0L;
           |for (int $p = 0; $p < $nPlanes; $p++) {
           |  double[] $comp = $planesRef[$p];
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += (double) $a.getFloat($i) * $comp[$i];
           |  }
           |  if ($acc >= 0) ${ev.value}_b |= 1L << $p;
           |}
           |${ev.value} = ${ev.value}_b;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def floatDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def floatNorm(a: Column): Column =
    GraftColumnBridge.column(FloatL2Norm(GraftColumnBridge.expression(a)))

  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column =
    GraftColumnBridge.column(HyperplaneBucket(
      GraftColumnBridge.expression(v), nPlanes, dim))

  /** DuckDB SQL replicating [[HyperplaneBucket]] for `vec` (a 1-based
    * FLOAT[] reference like `a.v`): the same strictly left-to-right
    * double chain per plane, sign bits summed into a BIGINT. Double
    * literals round-trip exactly (k/2^16 - 1/2 is a dyadic rational).
    */
  def bucketSql(vec: String, nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      val proj = (0 until dim)
        .map(i => s"CAST($vec[${i + 1}] AS DOUBLE)*(${planeComponent(p, i)})")
        .mkString(" + ")
      s"(CASE WHEN ($proj) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")
}
