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

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n, s"$name expects $n argument(s), got ${es.length}")
      f(es)
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_shingles" -> arity("graft_word_shingles", 1)(
      es => ShingleExpressions.DistinctWordShingles(es.head)),
    "graft_shingle_hashes" -> arity("graft_shingle_hashes", 1)(
      es => ShingleExpressions.DistinctShingleHashes(es.head)),
    "graft_float_dot" -> arity("graft_float_dot", 2)(
      es => VectorExpressions.FloatDotProduct(es(0), es(1))),
    "graft_float_norm" -> arity("graft_float_norm", 1)(
      es => VectorExpressions.FloatL2Norm(es.head)),
    // window length and nibble must be foldable literals — they fix
    // the expression's shape, like the DataFrame API's Int/Char params
    "graft_content_anchors" -> arity("graft_content_anchors", 3)(es => {
      def lit(e: Expression, what: String): Any = {
        require(e.foldable, s"graft_content_anchors: $what must be a literal")
        e.eval()
      }
      val k = lit(es(1), "window length").asInstanceOf[Number].intValue()
      val nib = lit(es(2), "nibble").toString
      require(nib.length == 1, "graft_content_anchors: nibble is one hex char")
      ShingleExpressions.ContentAnchors(es.head, k, nib.charAt(0))
    }))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    for ((name, builder) <- all)
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `spark.sql.extensions`-compatible injector: the graft SQL
  * functions plus the [[graft.plans.PrefixScanRewrite]] optimizer
  * rule (global `row_number() OVER (ORDER BY …)` → range-partitioned
  * prefix scan instead of a single-task sort).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    for ((name, builder) <- GraftFunctions.all)
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    ext.injectOptimizerRule(_ => graft.plans.PrefixScanRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.PrefixBarrierStrategy)
  }
}
