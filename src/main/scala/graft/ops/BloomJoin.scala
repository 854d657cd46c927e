package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join for the regime where the build side is
  * too large to broadcast as rows but its BLOOM FILTER is not: a
  * billion 8-byte keys won't broadcast, yet a few-tens-of-MB bit array
  * summarizing them will. The probe side is filtered by the broadcast
  * bloom BEFORE the shuffle, so the exchange moves only probable
  * matches (plus the false-positive margin) instead of the whole probe
  * table; an exact semi join over the survivors restores exactness, so
  * the result is bit-identical to a plain semi join.
  *
  * Built from the same Catalyst pieces Spark's own
  * InjectRuntimeFilter uses (`BloomFilterAggregate` /
  * `BloomFilterMightContain` over xxhash64 keys): the filter is
  * constructed DISTRIBUTED — partial sketches merged by the
  * aggregate, never a driver-side collect of keys — and lands on the
  * probe side as a 1-row broadcast. The explicit operator exists
  * because the built-in injection only fires on selective join shapes
  * the optimizer can prove; a pipeline author often knows the
  * selectivity the optimizer can't.
  */
object BloomJoin {

  /** Rows of `probe` whose `probeKey` appears in `build`'s `buildKey`
    * — semantics of `probe SEMI JOIN build`, cost of shuffling only
    * bloom survivors.
    *
    * @param expectedItems sizing hint for the filter (overestimating
    *   wastes bits; underestimating raises the false-positive rate and
    *   with it the shuffle volume — never correctness).
    */
  /** The probe rows the broadcast bloom lets through — true matches
    * plus the false-positive margin. The building block of
    * [[bloomSemiJoin]], exposed so the margin itself can be MEASURED
    * (q_bloom_fpr prices the structure the way q_ann_recall prices
    * LSH).
    */
  def bloomPrefilter(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val buildHash = new XxHash64(Seq(GraftColumnBridge.expression(col(buildKey))))
    val agg = new BloomFilterAggregate(buildHash, expectedItems)
      .toAggregateExpression()
    val bloom = build.select(GraftColumnBridge.column(agg).as("graft_bloom"))
    // might_contain requires its bloom input to be constant-foldable
    // or a scalar subquery; the subquery runs once, its binary result
    // is substituted into the probe-side predicate (the same shape
    // InjectRuntimeFilter emits)
    val probeHash = new XxHash64(Seq(GraftColumnBridge.expression(col(probeKey))))
    val mightContain = GraftColumnBridge.column(
      BloomFilterMightContain(
        ScalarSubquery(bloom.queryExecution.analyzed), probeHash))
    probe.filter(mightContain)
  }

  def bloomSemiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val prefiltered =
      bloomPrefilter(probe, build, probeKey, buildKey, expectedItems)
    // exact verify: false positives out, result ≡ plain semi join.
    // Qualified references: with probeKey == buildKey (the common
    // case) unqualified col() would be ambiguous against the join.
    val buildKeys = build.select(col(buildKey)).distinct()
    prefiltered.join(
      buildKeys,
      prefiltered(probeKey) === buildKeys(buildKey), "left_semi")
  }
}
