package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survival analysis over event logs: the Kaplan-Meier estimator of
  * "how long until a subject converts", with right-censoring for
  * subjects the observation window ends on before they convert.
  * Plain conversion-lag percentiles (`q_conversion_lag`) silently
  * condition on conversion having happened; KM is the
  * censoring-honest version every retention/latency dashboard
  * actually needs (a cohort whose slow converters are still pending
  * biases naive lag quantiles optimistic).
  *
  * Scale shape: the only data-sized stages are the two filtered
  * per-subject aggregations (both shuffle on the subject key; AQE
  * reuses the exchange) and a 1-row observation-horizon broadcast.
  * The life-table frame has one row per distinct duration — bounded
  * by the CALENDAR span in days, not the corpus — so the step math
  * (at-risk prefix counts and the ordered survival product) runs in
  * the one-row collected domain: a ≤ |days| array, O(T²) fold work,
  * constants at any corpus size. The survival column is a strict
  * left-to-right sequential product, so a mirrored fold is
  * bit-identical cross-engine without any dyadic tricks.
  */
object Survival {

  /** Kaplan-Meier life table.
    *
    * Per subject: birth = earliest ts with `isBirth`; death =
    * earliest ts ≥ birth with `isDeath`; subjects that never die are
    * censored at the frame's max event DATE. Durations are calendar
    * days.
    *
    * @return one row per distinct duration `t` with `d` deaths, `c`
    *         censored, `n` at risk just before `t`, and `surv` the
    *         KM estimate Π_{s ≤ t} (1 − d_s/n_s).
    */
  def kaplanMeier(
      events: DataFrame,
      ts: Column,
      subject: Column,
      isBirth: Column,
      isDeath: Column): DataFrame = {
    val e = events.select(subject.as("s"), ts.as("ts"),
      isBirth.as("is_b"), isDeath.as("is_d"))
    val horizon = e.agg(max(to_date(col("ts"))).as("h"))
    val births = e.filter(col("is_b")).groupBy("s").agg(min("ts").as("b"))
    val deaths = e.filter(col("is_d")).select(col("s"), col("ts"))
      .join(births, "s")
      .filter(col("ts") >= col("b"))
      .groupBy("s").agg(min("ts").as("dt"))
    val cohort = births.join(deaths, Seq("s"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("dt").isNotNull,
          datediff(to_date(col("dt")), to_date(col("b"))))
          .otherwise(datediff(col("h"), to_date(col("b"))))
          .cast("long").as("t"),
        col("dt").isNotNull.cast("long").as("obs"))
    val lifeTable = cohort.groupBy("t").agg(
      sum("obs").as("d"), sum(lit(1L) - col("obs")).as("c"))
    lifeTable
      .agg(collect_list(struct(col("t"), col("d"), col("c"))).as("steps0"),
        sum(col("d") + col("c")).as("ntot"))
      .select(array_sort(col("steps0")).as("steps"), col("ntot"))
      .select(expr(
        """transform(steps, (s, i) -> named_struct(
             't', s.t, 'd', s.d, 'c', s.c,
             'n', ntot - aggregate(slice(steps, 1, i), CAST(0 AS BIGINT),
                    (a, x) -> a + x.d + x.c)))""").as("w"))
      .select(expr(
        """transform(w, (s, i) -> named_struct(
             't', s.t, 'd', s.d, 'c', s.c, 'n', s.n,
             'surv', aggregate(slice(w, 1, i + 1), CAST(1 AS DOUBLE),
               (a, x) -> a * (CAST(1 AS DOUBLE)
                 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)))))""")
        .as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.t").as("t"), col("r.d").as("d"), col("r.c").as("c"),
        col("r.n").as("n"), col("r.surv").as("surv"))
  }

  /** Restricted mean survival time over a [[kaplanMeier]] life
    * table: the area under the survival step function up to the last
    * observed time — "average days survived (capped at the study
    * horizon)", the single-number summary that stays meaningful when
    * the median is never reached (surv never crosses 0.5). Folds the
    * calendar-bounded table LEFT-TO-RIGHT: each step contributes
    * (t_k − t_{k−1})·S(t_{k−1}) with S = 1 before the first event —
    * the same ordered-fold discipline as the KM product itself, so
    * the area hash-matches the oracle's windowed twin.
    *
    * @return 1 row: (n, rmst_days)
    */
  def restrictedMeanSurvival(km: DataFrame): DataFrame =
    km.agg(
      max(col("n")).as("n"),
      sort_array(collect_list(struct(col("t"), col("surv")))).as("r"))
      .select(col("n"), expr(
        """aggregate(sequence(1, size(r)), CAST(0 AS DOUBLE), (a, i) ->
             a + CAST(element_at(r, i).t
                   - IF(i = 1, CAST(0 AS BIGINT),
                        element_at(r, i - 1).t) AS DOUBLE)
               * IF(i = 1, CAST(1 AS DOUBLE),
                    element_at(r, i - 1).surv))""").as("rmst_days"))
}
