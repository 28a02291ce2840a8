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
