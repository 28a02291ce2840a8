package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Query-performance analytics over the [[RunHistory]] dataset — the
  * reference's trend/baseline/alert surface (reference:
  * src/monitoring/performance_monitor.py:418 compare_with_baseline,
  * :561 get_performance_trends, :631 dashboard alerts) re-expressed as
  * ENGINE QUERIES over the appendable history instead of bookkeeping
  * SQL against a metrics DB. (The reference's psutil host telemetry —
  * CPU%/memory% — is host-monitoring scope; Spark's metrics system
  * owns that. What the data plane owns is the per-query record:
  * duration, rows, plan hash, failure.)
  *
  * Scale shape: every function is a hash aggregation keyed by query
  * (map-side combinable) over a run_id-partitioned parquet dataset;
  * single-run slices prune to one partition, and the per-query
  * aggregate frames that join are ≤ |distinct queries| rows —
  * broadcast territory by construction.
  */
object Trends {

  /** Daily per-query trend — ref :561 get_performance_trends's
    * GROUP BY DATE shape: (query, date, n_runs, avg_ms, max_ms,
    * n_failed).
    */
  def queryTrends(history: DataFrame): DataFrame =
    history.groupBy(col("query"), to_date(col("recorded_at")).as("date"))
      .agg(
        count(lit(1)).as("n_runs"),
        round(avg(col("duration_ms")), 1).as("avg_ms"),
        max(col("duration_ms")).as("max_ms"),
        sum(when(col("failed"), 1L).otherwise(0L)).as("n_failed"))

  /** Per-query duration delta between two runs — ref :418
    * compare_with_baseline's change columns: (query, current_ms,
    * baseline_ms, change_ms, change_pct). Full outer join, so a query
    * present in only one run still surfaces (nulls on the other side).
    */
  def compareWithBaseline(history: DataFrame, runId: String,
                          baselineRunId: String): DataFrame = {
    def side(id: String, tag: String) =
      history.filter(col("run_id") === id) // partition-pruned read
        .groupBy("query")
        .agg(round(avg(col("duration_ms")), 1).as(s"${tag}_ms"))
    side(runId, "current")
      .join(side(baselineRunId, "baseline"), Seq("query"), "full_outer")
      .withColumn("change_ms", col("current_ms") - col("baseline_ms"))
      .withColumn("change_pct",
        when(col("baseline_ms") =!= 0.0,
          round((col("current_ms") - col("baseline_ms")) * 100.0 /
            col("baseline_ms"), 1)))
  }

  /** Queries in `runId` slower than `factor` × their trailing average
    * over PRIOR runs (run ids other than `runId`; the history is
    * append-only, so at evaluation time those are the past). Requires
    * `minPriorRuns` distinct prior runs per query — one slow first run
    * is a cold start, not a regression. `plan_changed` flags whether
    * the plan fingerprint differs from the latest prior run's — the
    * r8-r10 bench lesson as a query: a regression WITH a plan change
    * is a plan defect, one without is load/noise.
    */
  def regressions(history: DataFrame, runId: String,
                  factor: Double = 1.5, minPriorRuns: Int = 3): DataFrame = {
    // plan comparison only over rows that HAVE a hash (failed actions
    // record none — a null must not mask or flap the verdict), newest
    // hash wins deterministically via max_by on the record time
    def newestPlan = max_by(col("plan_hash"),
      when(col("plan_hash").isNotNull, col("recorded_at"))).as("__plan")
    val current = history.filter(col("run_id") === runId)
      .groupBy("query").agg(
        round(avg(col("duration_ms")), 1).as("current_ms"),
        newestPlan)
      .withColumnRenamed("__plan", "current_plan")
    val prior = history.filter(col("run_id") =!= runId)
      .groupBy("query").agg(
        round(avg(col("duration_ms")), 1).as("prior_avg_ms"),
        countDistinct(col("run_id")).as("n_prior_runs"),
        newestPlan)
      .withColumnRenamed("__plan", "prior_plan")
    current.join(prior, Seq("query"))
      .filter(col("n_prior_runs") >= minPriorRuns &&
        col("current_ms") > col("prior_avg_ms") * factor)
      .withColumn("slowdown",
        round(col("current_ms") / col("prior_avg_ms"), 2))
      .withColumn("plan_changed",
        coalesce(col("current_plan") =!= col("prior_plan"), lit(false)))
      .select("query", "current_ms", "prior_avg_ms", "slowdown",
        "n_prior_runs", "plan_changed")
  }

  /** Metric-telemetry alerts (r16 — the recall-decay loop-closer):
    * judge `runId`'s value per metric over a
    * [[RunHistory.appendMetrics]]-shaped frame (run_id, metric, value)
    * against (a) an absolute floor and (b) the trailing average of all
    * PRIOR runs. Per-round recall@k registers as telemetry
    * (q_sim_ivf_recall / q_sim_lsh_recall / q_sim_auto_recall), but
    * until this check nothing ALERTED when recall decayed round over
    * round — an ANN surface can rot quietly while every correctness
    * gate stays green. One row per firing rule:
    * (metric, current_value, prior_avg, n_prior_runs, floor_value,
    * alert_type ∈ below_floor | decaying) — both rows when both fire.
    * `decaying` needs `minPriorRuns` distinct prior runs (one noisy
    * first round is a cold start, not decay — the [[regressions]]
    * discipline). Two bounded hash aggregations joined at
    * ≤ |metrics| rows.
    */
  def metricAlerts(metrics: DataFrame, runId: String,
                   floors: Map[String, Double] = Map.empty,
                   dropPct: Double = 0.10, minPriorRuns: Int = 3): DataFrame = {
    require(dropPct >= 0.0 && dropPct < 1.0, "dropPct must be in [0, 1)")
    val cur = metrics.filter(col("run_id") === runId)
      .groupBy("metric").agg(round(avg(col("value")), 6).as("current_value"))
    val prior = metrics.filter(col("run_id") =!= runId)
      .groupBy("metric").agg(
        round(avg(col("value")), 6).as("prior_avg"),
        countDistinct(col("run_id")).as("n_prior_runs"))
    val floorCol: Column = floors.foldLeft(lit(null).cast("double")) {
      case (acc, (m, f)) => when(col("metric") === m, lit(f)).otherwise(acc)
    }
    val joined = cur.join(prior, Seq("metric"), "left_outer")
      .withColumn("floor_value", floorCol)
    val below = joined
      .filter(col("floor_value").isNotNull &&
        col("current_value") < col("floor_value"))
      .withColumn("alert_type", lit("below_floor"))
    val decaying = joined
      .filter(col("n_prior_runs") >= minPriorRuns &&
        col("current_value") < col("prior_avg") * (1.0 - dropPct))
      .withColumn("alert_type", lit("decaying"))
    below.unionByName(decaying)
      .select("metric", "current_value", "prior_avg", "n_prior_runs",
        "floor_value", "alert_type")
  }

  /** SLA breaches — ref :631's dashboard alerts, driven by per-query
    * thresholds instead of host CPU lines: every history row over its
    * query's SLA (or `defaultSlaMs` when unlisted), plus every failed
    * row, tagged with a severity. Output: (run_id, query, duration_ms,
    * sla_ms, alert_type).
    */
  def slaBreaches(history: DataFrame, slaMs: Map[String, Long],
                  defaultSlaMs: Long): DataFrame = {
    val sla: Column = slaMs.foldLeft(lit(defaultSlaMs)) {
      case (acc, (q, ms)) => when(col("query") === q, lit(ms)).otherwise(acc)
    }
    history
      .withColumn("sla_ms", sla)
      .withColumn("alert_type",
        when(col("failed"), lit("failure"))
          .when(col("duration_ms") > col("sla_ms"), lit("sla_breach")))
      .filter(col("alert_type").isNotNull)
      .select("run_id", "query", "duration_ms", "sla_ms", "alert_type")
  }

  /** One SLA definition — ref sla_monitor.py:70 SLA_DEFINITIONS rows:
    * a kind, the history label it applies to, a threshold and a
    * comparison operator (`lt` | `gt` | `eq` | `between`; `between`
    * reads `threshold`..`threshold2`). Kinds:
    *  - `execution_time` (ref :80): actual = the run's total
    *    duration_ms for the label
    *  - `data_freshness` (ref :104): actual = hours between the
    *    label's last recorded_at and `asOf` (data age) — attached to
    *    the label's LATEST run only (one check per label: freshness is
    *    the "is it fresh NOW" question; re-judging every historical
    *    run against today's clock would flood the breach feed with
    *    runs that were perfectly fresh when they executed)
    *  - `row_count` (ref :156): actual = the run's total rows for
    *    the label
    *  - `success_rate` (ref tests/unit_tests.py:409
    *    check_success_rate_sla): actual = fraction of the label's
    *    runs with no failed action — like freshness, a label-level
    *    statement attached to the latest run only
    */
  final case class SlaRule(slaType: String, query: String,
                           threshold: Double, operator: String = "lt",
                           threshold2: Double = Double.NaN) {
    require(Seq("execution_time", "data_freshness", "row_count", "success_rate")
      .contains(slaType), s"unknown sla_type '$slaType'")
    require(Seq("lt", "gt", "eq", "between").contains(operator),
      s"unknown operator '$operator'")
    require(operator != "between" || !threshold2.isNaN,
      "between needs threshold2")
  }

  /** Every (run, rule) compliance check — ref :21 check_sla_compliance's
    * per-kind result rows, as ONE engine query: the history aggregates
    * once per (run_id, query) (hash agg, map-side combinable), the
    * rule list broadcast-joins on the label, and actual / status /
    * deviation derive per the reference's determine_compliance_status
    * (:195) and calculate_deviation (:181). `asOf` is an explicit
    * timestamp so freshness checks are deterministic and replayable —
    * wall-clock never enters the plan.
    * Output: (run_id, query, sla_type, actual, threshold, operator,
    * status, deviation).
    */
  def slaChecks(history: DataFrame, rules: Seq[SlaRule],
                asOf: java.sql.Timestamp): DataFrame = {
    require(rules.nonEmpty, "slaChecks needs at least one rule")
    val spark = history.sparkSession
    import spark.implicits._
    val wq = org.apache.spark.sql.expressions.Window.partitionBy(col("query"))
    val per = history.groupBy("run_id", "query").agg(
      sum(col("duration_ms")).cast("double").as("__total_ms"),
      sum(col("rows")).cast("double").as("__total_rows"),
      max(col("recorded_at")).as("__last_at"),
      max(when(col("failed"), 1L).otherwise(0L)).as("__run_failed"))
      // label-level stats, for the one-check-per-label kinds
      // (freshness, success rate) — windows over the grouped frame
      // (≤ runs × labels rows), not data.
      // run_id tiebreak: two runs sharing the label's max timestamp
      // must not BOTH emit the label-level checks
      .withColumn("__label_last_run",
        max(struct(col("__last_at"), col("run_id"))).over(wq)
          .getField("run_id"))
      .withColumn("__label_success_rate",
        avg(lit(1.0) - col("__run_failed")).over(wq))
    val ruleDf = rules.map(r => (r.slaType, r.query, r.threshold,
      r.operator, if (r.threshold2.isNaN) null
      else java.lang.Double.valueOf(r.threshold2)))
      .toDF("sla_type", "query", "threshold", "operator", "__threshold2")
    val actual =
      when(col("sla_type") === "execution_time", col("__total_ms"))
        .when(col("sla_type") === "data_freshness",
          (lit(asOf).cast("double") - col("__last_at").cast("double")) / 3600.0)
        .when(col("sla_type") === "row_count", col("__total_rows"))
        .when(col("sla_type") === "success_rate", col("__label_success_rate"))
    val met =
      when(col("operator") === "lt", col("actual") < col("threshold"))
        .when(col("operator") === "gt", col("actual") > col("threshold"))
        .when(col("operator") === "eq", col("actual") === col("threshold"))
        .otherwise(col("actual").between(col("threshold"), col("__threshold2")))
    val deviation =
      when(col("operator").isin("lt", "gt"),
        when(col("threshold") =!= 0.0,
          abs(col("actual") - col("threshold")) / col("threshold") * 100.0)
          .otherwise(0.0))
        .when(col("operator") === "between",
          when(col("actual") < col("threshold"),
            (col("threshold") - col("actual")) / col("threshold") * 100.0)
            .when(col("actual") > col("__threshold2"),
              (col("actual") - col("__threshold2")) / col("__threshold2") * 100.0)
            .otherwise(0.0))
        .otherwise(0.0)
    per.join(broadcast(ruleDf), Seq("query"))
      // label-level kinds: one check per label, on the run that owns
      // the label's latest data
      .filter(!col("sla_type").isin("data_freshness", "success_rate") ||
        col("run_id") === col("__label_last_run"))
      .withColumn("actual", actual)
      .withColumn("status",
        when(col("actual").isNull, lit("unknown"))
          .when(met, lit("met")).otherwise(lit("violated")))
      .withColumn("deviation",
        when(col("status") === "unknown", lit(null).cast("double"))
          .otherwise(round(deviation, 1)))
      .select("run_id", "query", "sla_type", "actual", "threshold",
        "operator", "status", "deviation")
  }

  /** Quality-score SLA check — ref sla_monitor.py:131
    * check_quality_score_sla + tests/unit_tests.py:425: the score is
    * the passed-rule percentage of a [[graft.quality.DQ.check]]
    * report (the same figure [[graft.quality.DQ.gateFromResults]]
    * gates on), judged against `threshold` with `operator` (default
    * `gt`, the reference's). Emits ONE check row in [[slaChecks]]'
    * shape, so quality checks union into the same breach feed /
    * [[overallCompliance]] roll-up.
    */
  def qualityScoreCheck(report: DataFrame, runId: String, query: String,
                        threshold: Double,
                        operator: String = "gt"): DataFrame = {
    require(Seq("lt", "gt", "eq").contains(operator),
      s"unknown operator '$operator'")
    report.agg(
      (sum(when(col("passed"), 1.0).otherwise(0.0)) * 100.0 / count(lit(1)))
        .as("actual"))
      .select(
        lit(runId).as("run_id"), lit(query).as("query"),
        lit("quality_score").as("sla_type"), col("actual"),
        lit(threshold).as("threshold"), lit(operator).as("operator"))
      .withColumn("status",
        when(col("actual").isNull, lit("unknown"))
          .when(operator match {
            case "lt" => col("actual") < col("threshold")
            case "gt" => col("actual") > col("threshold")
            case _ => col("actual") === col("threshold")
          }, lit("met")).otherwise(lit("violated")))
      .withColumn("deviation",
        when(col("status") === "unknown", lit(null).cast("double"))
          .when(lit(operator) === "eq" || col("threshold") === 0.0, lit(0.0))
          .otherwise(round(
            abs(col("actual") - col("threshold")) / col("threshold") * 100.0, 1)))
  }

  /** Overall compliance roll-up — ref tests/unit_tests.py:439
    * calculate_overall_compliance: (total_checks, compliant_checks,
    * overall_compliant = every check met). One row over any
    * [[slaChecks]]-shaped frame (unknowns count as non-compliant —
    * a check that could not run is not a met check).
    */
  def overallCompliance(checks: DataFrame): DataFrame =
    checks.agg(
      count(lit(1)).as("total_checks"),
      // coalesce: sum over zero rows is NULL, which would make the
      // boolean NULL on an empty frame (contract: vacuously true)
      coalesce(sum(when(col("status") === "met", 1L).otherwise(0L)), lit(0L))
        .as("compliant_checks"))
      .withColumn("overall_compliant",
        col("total_checks") === col("compliant_checks"))

  /** The violated subset of [[slaChecks]] — the multi-kind face of
    * [[slaBreaches]] (which stays the per-row duration/failure alert
    * feed; this one covers freshness and row-count too).
    */
  def slaBreaches(history: DataFrame, rules: Seq[SlaRule],
                  asOf: java.sql.Timestamp): DataFrame =
    slaChecks(history, rules, asOf).filter(col("status") === "violated")

  /** Compliance % over a trailing window — ref :236
    * calculate_sla_compliance_rate: met checks / all checks over the
    * label's runs recorded in the last `days` before `asOf`, × 100.
    * One row: (query, n_checks, n_met, compliance_pct); zero checks →
    * 0.0 like the reference.
    *
    * Semantics note: the reference aggregates STORED check rows (each
    * evaluated at its own checked_at); this recomputes from the
    * history. Per-run kinds (execution_time, row_count) recompute
    * identically; freshness contributes ONE check — the window's
    * latest run against `asOf` (see [[slaChecks]]). Callers who want
    * the reference's per-run stored freshness persist [[slaChecks]]
    * rows at run time (they are a frame — append them next to the
    * history) and aggregate those instead.
    */
  def complianceRate(history: DataFrame, rules: Seq[SlaRule], query: String,
                     days: Int, asOf: java.sql.Timestamp): DataFrame = {
    val cutoff = new java.sql.Timestamp(
      asOf.getTime - days.toLong * 24 * 3600 * 1000)
    val mine = rules.filter(_.query == query)
    val checks =
      if (mine.isEmpty) // no SLA defined for the label → zero checks,
        // 0.0 rate, like the reference's empty-definitions path
        slaChecks(history.limit(0), rules, asOf)
      else slaChecks(
        // bounded on BOTH sides: a historical asOf must not see runs
        // recorded after it (the rate is a point-in-time statement)
        history.filter(col("query") === query &&
          col("recorded_at") >= lit(cutoff) && col("recorded_at") <= lit(asOf)),
        mine, asOf)
    checks
      .agg(
        count(lit(1)).as("n_checks"),
        sum(when(col("status") === "met", 1L).otherwise(0L)).as("n_met"))
      .select(
        lit(query).as("query"), col("n_checks"), col("n_met"),
        coalesce(round(col("n_met") * 100.0 / col("n_checks"), 1), lit(0.0))
          .as("compliance_pct"))
  }

  /** Predictive SLA warning — ref :298 predictive_sla_warning: if the
    * recent (7-day) compliance rate has dropped below 90% of the
    * overall (30-day) rate, emit a warning row (query, recent_pct,
    * overall_pct); empty frame otherwise. Both rates ride one
    * [[slaChecks]] shape each — the "prediction" is the reference's
    * trailing-trend heuristic, not a model.
    */
  def predictiveWarning(history: DataFrame, rules: Seq[SlaRule],
                        query: String, asOf: java.sql.Timestamp,
                        recentDays: Int = 7, overallDays: Int = 30): DataFrame = {
    val recent = complianceRate(history, rules, query, recentDays, asOf)
      .select(col("query"), col("compliance_pct").as("recent_pct"))
    val overall = complianceRate(history, rules, query, overallDays, asOf)
      .select(col("query"), col("compliance_pct").as("overall_pct"))
    recent.join(overall, Seq("query"))
      .filter(col("recent_pct") < col("overall_pct") * 0.9)
      .withColumn("warning", lit("Compliance rate dropping"))
  }

  /** Bottleneck ranking for one run — ref performance_monitor.py's
    * identify_bottlenecks, as a query: each query's share of the
    * run's total wall time, largest first. The window total rides the
    * same grouped frame (≤ |queries| rows), so no wide exchange.
    */
  def bottlenecks(history: DataFrame, runId: String, topN: Int = 10): DataFrame = {
    val per = history.filter(col("run_id") === runId)
      .groupBy("query").agg(sum(col("duration_ms")).as("total_ms"))
    // run total as an all-rows window over the GROUPED frame (≤
    // |queries| rows) — stays lazy, one scan; an unknown run id just
    // yields an empty frame
    per.withColumn("pct_of_run",
        round(col("total_ms") * 100.0 /
          sum(col("total_ms")).over(allRows), 1))
      .orderBy(col("total_ms").desc, col("query"))
      .limit(topN)
  }

  // whole-frame window; only ever applied to per-query grouped frames
  // (≤ |distinct queries| rows), so the single partition is bounded
  private def allRows: org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)

  /** One-frame run dashboard — ref get_dashboard_data: per query the
    * latest run's duration and rows, its share of the run, its
    * trailing average over prior runs, and the alert state (failure /
    * SLA breach / none). Everything joins at ≤ |queries| rows —
    * broadcast territory.
    */
  def dashboard(history: DataFrame, runId: String,
                slaMs: Map[String, Long] = Map.empty,
                defaultSlaMs: Long = Long.MaxValue): DataFrame = {
    val cur = history.filter(col("run_id") === runId)
      .groupBy("query").agg(
        round(avg(col("duration_ms")), 1).as("duration_ms"),
        sum(col("duration_ms")).as("__total_ms"),
        sum(col("rows")).as("rows"),
        max(when(col("failed"), lit(true)).otherwise(lit(false))).as("failed"))
    val prior = history.filter(col("run_id") =!= runId)
      .groupBy("query")
      .agg(round(avg(col("duration_ms")), 1).as("prior_avg_ms"))
    val sla: Column = slaMs.foldLeft(lit(defaultSlaMs)) {
      case (acc, (q, ms)) => when(col("query") === q, lit(ms)).otherwise(acc)
    }
    cur.join(prior, Seq("query"), "left_outer")
      // pct over SUMMED durations — the same attribution definition as
      // [[bottlenecks]] (avg-based shares would contradict it when a
      // query has several actions per run); window total keeps the
      // frame lazy, see [[allRows]]
      .withColumn("pct_of_run", round(col("__total_ms") * 100.0 /
        sum(col("__total_ms")).over(allRows), 1))
      .withColumn("sla_ms", sla)
      .withColumn("alert",
        when(col("failed"), lit("failure"))
          .when(col("duration_ms") > col("sla_ms"), lit("sla_breach"))
          .otherwise(lit("ok")))
      .select("query", "duration_ms", "rows", "pct_of_run",
        "prior_avg_ms", "alert")
      .orderBy(col("duration_ms").desc, col("query"))
  }
}
