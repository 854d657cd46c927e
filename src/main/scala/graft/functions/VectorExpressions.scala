package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
      extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  /** Sequential L2 norm of a float vector, in double. */
  case class FloatL2Norm(child: Expression)
      extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
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
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  def floatDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def floatNorm(a: Column): Column =
    GraftColumnBridge.column(FloatL2Norm(GraftColumnBridge.expression(a)))
}
