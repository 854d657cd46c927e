package graft

/** Regression-guard plumbing for [[Bench]], factored out so a spec can
  * exercise it against verbatim driver artifacts.
  *
  * The driver's per-round `BENCH_r{N}.json` does NOT store the sweep as
  * JSON: it wraps the tail of the sbt stdout in an *escaped* string
  * field (`"tail": "...\"q_topk\":0.35,..."`). A regex that expects
  * bare `"q_x":1.2` bytes therefore matches nothing on those files —
  * which is exactly the silent failure the round-5 review found: the
  * guard had compared against an empty baseline since it was added.
  * [[parseQueryTimes]] unescapes first and accepts both shapes.
  */
object BenchGuard {
  private val entry = """"(q_\w+)"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)""".r
  private val roundPat = """BENCH_r(\d+)\.json""".r

  /** Per-query seconds from any artifact shape: the raw one-line
    * `bench_out.json`, or a driver wrapper whose `"tail"` string holds
    * the same line JSON-escaped. Later duplicates win (the tail can
    * contain both the live progress prints and the final JSON line).
    */
  def parseQueryTimes(txt: String): Map[String, Double] = {
    val unescaped = txt.replace("\\\"", "\"")
    entry.findAllMatchIn(unescaped)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
  }

  /** Round number parsed from a `BENCH_r*.json` file name; numeric, so
    * r100 sorts after r11 (lexicographic sort breaks past the current
    * zero-padding).
    */
  def roundOf(fileName: String): Option[Int] =
    roundPat.findFirstMatchIn(fileName).map(_.group(1).toInt)

  /** Pick the baseline among candidate artifact names: the highest
    * round whose parsed sweep is non-empty and is NOT byte-identical to
    * `selfQueries` (the parse of the bench's own previous output file).
    * The driver copies the current round's artifact into cwd after the
    * bench runs, so on any re-run the newest artifact embeds this
    * process's own prior numbers — comparing against it reports zero
    * regressions unconditionally; step back to the previous round
    * instead.
    */
  def pickBaseline(
      fileNames: Seq[String],
      read: String => String,
      selfQueries: Map[String, Double]): Option[(String, Map[String, Double])] =
    fileNames.flatMap(f => roundOf(f).map(r => (r, f))).sortBy(-_._1)
      .iterator
      .map { case (_, f) => f -> parseQueryTimes(read(f)) }
      .find { case (_, qs) => qs.nonEmpty && (selfQueries.isEmpty || qs != selfQueries) }

  /** Queries that got more than `factor` slower vs the baseline.
    * Failed runs (-1 on either side) and queries new this round are
    * skipped.
    */
  def regressions(
      base: Map[String, Double],
      current: Seq[(String, Double)],
      factor: Double = 1.5): Map[String, (Double, Double)] =
    current.flatMap { case (name, t) =>
      base.get(name) match {
        case Some(b) if b > 0 && t > 0 && t > b * factor => Some(name -> (b, t))
        case _ => None
      }
    }.toMap

  /** Self-adjudication of the flagged set: every query tripping the
    * sweep guard is re-measured in isolation (fresh timing loop, more
    * runs, same process) BEFORE the artifact is written, so the
    * artifact itself separates sweep-order noise from real
    * regressions — four rounds running (r4/r6/r7/r8), every
    * driver-flagged "regression" re-measured clean, and each one cost
    * a manual re-litigation because the artifact only carried the
    * noisy number. Returns (baseline, sweepTime, isolatedTime); a
    * re-measure that throws records -1 (inspect stderr), never drops
    * the flag.
    */
  def adjudicate(
      flagged: Map[String, (Double, Double)],
      remeasure: String => Double): Map[String, (Double, Double, Double)] =
    flagged.map { case (name, (b, t)) =>
      val iso = try remeasure(name) catch { case _: Throwable => -1.0 }
      name -> (b, t, iso)
    }

  /** The flags whose ISOLATED number still trips the factor — the
    * real regressions. A failed re-measure (-1) stays confirmed: an
    * unverifiable flag must not silently pass.
    */
  def confirmedRegressions(
      adjudicated: Map[String, (Double, Double, Double)],
      factor: Double = 1.5): Map[String, (Double, Double, Double)] =
    adjudicated.filter { case (_, (b, _, iso)) =>
      iso < 0 || (b > 0 && iso > b * factor)
    }
}
