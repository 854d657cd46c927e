package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Not a correctness spec: measures the PrefixScanRewrite trade on a
  * 30M-row global row_number so the numbers quoted in PLANS.md are
  * reproducible. Both plans are warmed (codegen/JIT) and timed as
  * 3-run minima in the same JVM.
  */
class PrefixRewriteBench extends AnyFunSuite {

  private val N = 30000000L
  private val Q = "SELECT k, row_number() OVER (ORDER BY k) AS rn FROM big"

  private def session(withRule: Boolean): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(PrefixScanRewrite.MinBytesKey, "0") // force-on for the A/B
      .config("spark.ui.enabled", "false")
    val s = (if (withRule) b.withExtensions(new graft.functions.GraftExtensions)
      else b).getOrCreate()
    s.range(N).selectExpr("id", "hash(id) AS k").createOrReplaceTempView("big")
    s
  }

  private def time(s: SparkSession): Double = {
    val t0 = System.nanoTime()
    s.sql(Q).selectExpr("max(cast(rn AS bigint) + cast(k AS bigint))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  test("30M-row global row_number: rewrite vs single-task window") {
    val plain = {
      val s = session(withRule = false)
      time(s) // warm codegen
      (1 to 3).map(_ => time(s)).min
    }
    val (rewritten, fired) = {
      val s = session(withRule = true)
      val p = s.sql(Q).queryExecution.optimizedPlan.toString
      time(s)
      ((1 to 3).map(_ => time(s)).min, p.contains("__pfx_pid"))
    }
    assert(fired, "rule did not fire in the extension session")
    info(f"rewritten: $rewritten%.2f s, single-task window: $plain%.2f s")
    // parity bound, not a win bound: at local scale the single task
    // still fits one core's memory bandwidth, while the rewrite pays
    // two extra full exchanges — its value is that the plan SURVIVES
    // sizes where one task cannot. Guard against the rewrite being
    // catastrophically slower.
    assert(rewritten < plain * 3.0,
      f"rewrite pathological: $rewritten%.2f vs $plain%.2f")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }
}
