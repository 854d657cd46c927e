package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's custom Catalyst expressions, so SQL-first
  * users get the same operators as the DataFrame API:
  *
  *   SELECT graft_word_shingles(tokens), graft_float_dot(a, b) ...
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for new sessions:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)`, or
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`;
  *  - [[GraftFunctions.register]] to add them to an existing session.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_shingles" ->
      ((es: Seq[Expression]) => ShingleExpressions.DistinctWordShingles(es.head)),
    "graft_shingle_hashes" ->
      ((es: Seq[Expression]) => ShingleExpressions.DistinctShingleHashes(es.head)),
    "graft_float_dot" ->
      ((es: Seq[Expression]) => VectorExpressions.FloatDotProduct(es(0), es(1))),
    "graft_float_norm" ->
      ((es: Seq[Expression]) => VectorExpressions.FloatL2Norm(es.head)))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    for ((name, builder) <- all)
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    for ((name, builder) <- GraftFunctions.all)
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
}
