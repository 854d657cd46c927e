package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The round-5 review found the bench regression guard had never
  * compared against anything: driver artifacts wrap the sweep in an
  * escaped `"tail"` string, which the old inline regex cannot match.
  * These tests pin the fixed parser against a VERBATIM driver artifact
  * from the repo root, plus the baseline-selection rules from the r5
  * advice (numeric round ordering, self-comparison exclusion).
  */
class BenchGuardSpec extends AnyFunSuite with Matchers {

  // the exact byte shape the driver writes: escaped quotes inside a
  // "tail" string field
  private val driverShaped =
    """{"n":5,"rc":0,"tail":"...\"q_topk\":0.35,\"q_union\":1.2,""" +
      """\"q_zorder\":0.133939204},\"sf\":\"x\"}\n[success]"}"""

  test("parseQueryTimes reads the escaped driver-artifact tail") {
    val qs = BenchGuard.parseQueryTimes(driverShaped)
    qs shouldBe Map("q_topk" -> 0.35, "q_union" -> 1.2, "q_zorder" -> 0.133939204)
  }

  test("parseQueryTimes reads the raw bench_out line too") {
    val raw = """{"metric":"total","value":9.9,"queries":{"q_a":1.5,"q_b":-1.0}}"""
    BenchGuard.parseQueryTimes(raw) shouldBe Map("q_a" -> 1.5, "q_b" -> -1.0)
  }

  test("a verbatim committed driver artifact parses to a non-empty baseline") {
    // BENCH_r05.json is a committed driver artifact; this is the exact
    // input the guard failed on for two rounds.
    val p = Paths.get("BENCH_r05.json")
    assert(Files.exists(p), "committed driver artifact BENCH_r05.json missing from repo root")
    val base = BenchGuard.parseQueryTimes(Files.readString(p))
    // the driver truncates the FRONT of the stdout tail, so only the
    // later part of the sweep survives; 66 of 124 queries in r5's
    // artifact. Partial baseline coverage is inherent to the artifact —
    // the guard's job is that what IS there gets compared.
    base.size should be > 50
    base should contain key "q_quantiles_exact"
    base("q_quantiles_exact") should be > 0.0
  }

  test("a planted 2x slowdown against a real driver artifact is flagged") {
    val base = BenchGuard.parseQueryTimes(Files.readString(Paths.get("BENCH_r05.json")))
    val current = base.toSeq.map { case (k, v) => k -> (if (k == "q_topk") v * 2.0 else v) }
    val regs = BenchGuard.regressions(base, current)
    regs.keySet shouldBe Set("q_topk")
    // unchanged timings are not flagged
    BenchGuard.regressions(base, base.toSeq) shouldBe empty
  }

  test("regressions skips failed (-1) and new queries") {
    val base = Map("q_a" -> 1.0, "q_fail" -> -1.0)
    val cur = Seq("q_a" -> -1.0, "q_fail" -> 5.0, "q_new" -> 9.0)
    BenchGuard.regressions(base, cur) shouldBe empty
  }

  test("baseline pick orders rounds numerically, not lexicographically") {
    val files = Seq("BENCH_r2.json", "BENCH_r10.json", "BENCH_r9.json", "notes.txt")
    val bodies = Map(
      "BENCH_r2.json" -> """{"q_a":1.0}""",
      "BENCH_r9.json" -> """{"q_a":2.0}""",
      "BENCH_r10.json" -> """{"q_a":3.0}""")
    val picked = BenchGuard.pickBaseline(files, bodies(_), Map.empty)
    picked.map(_._1) shouldBe Some("BENCH_r10.json")
  }

  test("baseline pick skips the current round's own copied-back artifact") {
    val self = Map("q_a" -> 3.0)
    val files = Seq("BENCH_r9.json", "BENCH_r10.json")
    val bodies = Map(
      "BENCH_r9.json" -> """{"q_a":2.0}""",
      "BENCH_r10.json" -> """{"q_a":3.0}""") // == self → not a baseline
    val picked = BenchGuard.pickBaseline(files, bodies(_), self)
    picked.map(_._1) shouldBe Some("BENCH_r9.json")
  }

  test("baseline pick skips artifacts that parse to zero queries") {
    val files = Seq("BENCH_r9.json", "BENCH_r10.json")
    val bodies = Map(
      "BENCH_r9.json" -> """{"q_a":2.0}""",
      "BENCH_r10.json" -> """{"oops": true}""")
    val picked = BenchGuard.pickBaseline(files, bodies(_), Map.empty)
    picked.map(_._1) shouldBe Some("BENCH_r9.json")
  }

  test("adjudicate re-measures every flag; only still-slow ones are confirmed") {
    // a sweep flagged two queries at ~6x; isolated, one is pure
    // sweep-order noise (1.1 vs base 1.0) and one is really slow
    val flagged = Map(
      "q_noise" -> (1.0, 6.2),
      "q_real" -> (1.0, 6.0),
      "q_broken" -> (1.0, 5.0))
    val remeasured = collection.mutable.Buffer[String]()
    val adj = BenchGuard.adjudicate(flagged, {
      case n @ "q_noise" => remeasured += n; 1.1
      case n @ "q_real" => remeasured += n; 5.9
      case n => remeasured += n; throw new RuntimeException("boom")
    })
    remeasured.toSet shouldBe flagged.keySet // every flag re-measured
    adj("q_noise") shouldBe ((1.0, 6.2, 1.1))
    adj("q_real") shouldBe ((1.0, 6.0, 5.9))
    adj("q_broken") shouldBe ((1.0, 5.0, -1.0)) // failure recorded, not dropped
    val confirmed = BenchGuard.confirmedRegressions(adj)
    // noise cleared by its isolated number; the real regression and
    // the unverifiable one stay confirmed
    confirmed.keySet shouldBe Set("q_real", "q_broken")
  }
}
