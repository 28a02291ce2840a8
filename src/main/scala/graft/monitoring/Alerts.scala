package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deterministic core of the reference's AlertManager
  * (reference: src/monitoring/alert_manager.py) as engine queries: the
  * reference formats messages, routes channels by severity,
  * rate-limits repeats and escalates unacknowledged alerts, then
  * DELIVERS via SMTP/Slack/PagerDuty clients. Delivery transports are
  * control-plane (out of scope); everything upstream of delivery is a
  * pure derivation from breach/report frames — so here the alert FEED
  * is a DataFrame any delivery worker can drain, and the
  * flood-control/escalation policies are queries over it instead of
  * driver-side dict bookkeeping.
  *
  * Scale shape: every builder is a row-local projection of a frame
  * that is already small (breach/report rows, not data rows);
  * rateLimit is one window function keyed by alert_type — the only
  * shuffle, on a feed-sized frame.
  */
object Alerts {

  /** The routing table — ref :283 _get_channels_for_severity. ONE
    * definition: [[channelsFor]] (driver-side API) and the
    * `channels` column stamped on every feed both fold over it.
    */
  private val routingTable: Seq[(String, Seq[String])] = Seq(
    "CRITICAL" -> Seq("pagerduty", "email", "slack"),
    "HIGH" -> Seq("email", "slack"),
    "MEDIUM" -> Seq("slack"),
    "LOW" -> Seq("dashboard")) // INFO and unknown: log-only

  private val routingMap = routingTable.toMap

  /** Severity → delivery channels. */
  def channelsFor(severity: String): Seq[String] =
    routingMap.getOrElse(severity.toUpperCase, Seq.empty)

  private val channelRouting: Column =
    routingTable.foldRight(array().cast("array<string>")) {
      case ((sev, chans), acc) =>
        when(upper(col("severity")) === sev, array(chans.map(lit): _*))
          .otherwise(acc)
    }

  /** Alert feed from [[Trends.slaChecks]]' violated rows — ref
    * sla_monitor.py:255 trigger_sla_violation_alert (severity: HIGH
    * when deviation > 50 else MEDIUM) + alert_manager.py:297
    * format_sla_violation_alert's message fields. Output: (alert_type,
    * severity, message, channels, query, run_id).
    */
  def fromSlaChecks(checks: DataFrame): DataFrame =
    checks.filter(col("status") === "violated")
      .withColumn("alert_type", lit("sla_violation"))
      .withColumn("severity",
        when(col("deviation") > 50.0, lit("HIGH")).otherwise(lit("MEDIUM")))
      .withColumn("message", concat(
        lit("SLA Violation: pipeline="), col("query"),
        lit(" type="), col("sla_type"),
        lit(" actual="), col("actual").cast("string"),
        lit(" threshold="), col("threshold").cast("string"),
        lit(" deviation="), col("deviation").cast("string"), lit("%")))
      .withColumn("channels", channelRouting)
      .select("alert_type", "severity", "message", "channels", "query", "run_id")

  /** Alert feed from a [[graft.quality.DQ.check]] report — ref :309
    * format_dq_failure_alert: one alert per FAILED rule, severity by
    * violation share (matching the SLA convention: >50% of rows in
    * violation is HIGH).
    */
  def fromDqReport(report: DataFrame, runId: String): DataFrame =
    report.filter(!col("passed"))
      .withColumn("alert_type", lit("dq_failure"))
      .withColumn("severity",
        when(col("violations") * 100.0 > col("total") * 50.0, lit("HIGH"))
          .otherwise(lit("MEDIUM")))
      .withColumn("message", concat(
        lit("Data Quality Failure: run="), lit(runId),
        lit(" rule="), col("rule_id"),
        lit(" column="), col("colname"),
        lit(" violations="), col("violations").cast("string"),
        lit("/"), col("total").cast("string")))
      .withColumn("channels", channelRouting)
      .select(col("alert_type"), col("severity"), col("message"),
        col("channels"), col("rule_id"), lit(runId).as("run_id"))

  /** Alert feed from [[RunHistory]] failures — ref :318
    * format_pipeline_failure_alert. Failures are HIGH (the
    * reference's pipeline-failure path always pages a human).
    */
  def fromRunFailures(history: DataFrame): DataFrame =
    history.filter(col("failed"))
      .withColumn("alert_type", lit("pipeline_failure"))
      .withColumn("severity", lit("HIGH"))
      .withColumn("message", concat(
        lit("Pipeline Failure: pipeline="), col("query"),
        lit(" run="), col("run_id")))
      .withColumn("channels", channelRouting)
      .select("alert_type", "severity", "message", "channels", "query",
        "run_id", "recorded_at")

  /** Flood control — ref :216 check_rate_limit (max `maxPerWindow`
    * alerts of a type per `windowSec`). The reference mutates a
    * driver-side dict per send; as a query the SAME policy is a
    * tumbling-window rank per alert_type: the first `maxPerWindow`
    * alerts (by time, id-tiebroken) in each window keep
    * `rate_limited = false`, the rest are marked suppressed — exact
    * within a window boundary, deterministic under replay (the
    * reference's sliding check depends on arrival order; a tumbling
    * approximation is the batch-replayable form, stated here).
    */
  def rateLimit(alerts: DataFrame, tsCol: String,
                windowSec: Int = 300, maxPerWindow: Int = 5): DataFrame = {
    require(windowSec > 0 && maxPerWindow > 0, "positive window and limit")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("alert_type"), window(col(tsCol), s"$windowSec seconds"))
      .orderBy(col(tsCol).asc, col("message").asc)
    alerts.withColumn("rate_limited", row_number().over(w) > maxPerWindow)
  }

  /** Escalation pass — ref :250 escalate_alert: HIGH/CRITICAL alerts
    * with no acknowledgement in `acks` and older than `afterMinutes`
    * at `asOf` come back as `<type>_escalation` copies one ladder
    * level up, re-routed. The level derives from the ROW (an input
    * without an `escalation_level` column is level 0, so fresh alerts
    * escalate to 1; feeding a sweep's output back yields 2, 3, …) —
    * no caller-side bookkeeping, and a mixed frame of fresh alerts and
    * prior escalations levels correctly per row. Acknowledging the
    * ORIGINAL alert stops the whole ladder: the ack join strips the
    * `_escalation` suffix, so `acks` always holds BASE
    * (alert_type, run_id) pairs — ALERT_LOG acknowledged=TRUE rows as
    * a frame.
    */
  def escalate(alerts: DataFrame, acks: DataFrame,
               asOf: java.sql.Timestamp, tsCol: String,
               afterMinutes: Int = 30): DataFrame = {
    val cutoff = new java.sql.Timestamp(asOf.getTime - afterMinutes * 60000L)
    val withLevel =
      if (alerts.columns.contains("escalation_level")) alerts
      else alerts.withColumn("escalation_level", lit(0))
    withLevel
      .filter(upper(col("severity")).isin("HIGH", "CRITICAL") &&
        col(tsCol) <= lit(cutoff))
      .withColumn("__base_type",
        regexp_replace(col("alert_type"), "_escalation$", ""))
      .join(broadcast(acks.select(col("alert_type").as("__base_type"),
        col("run_id")).withColumn("__acked", lit(true))),
        Seq("__base_type", "run_id"), "left_outer")
      .filter(col("__acked").isNull)
      .withColumn("alert_type", concat(col("__base_type"), lit("_escalation")))
      .withColumn("escalation_level",
        coalesce(col("escalation_level"), lit(0)) + 1)
      // escalation never DOWNGRADES: a CRITICAL alert keeps CRITICAL
      // (and its pagerduty routing); everything else steps up to HIGH
      .withColumn("severity",
        when(upper(col("severity")) === "CRITICAL", lit("CRITICAL"))
          .otherwise(lit("HIGH")))
      .withColumn("message",
        when(col("message").startsWith("ESCALATION: "), col("message"))
          .otherwise(concat(lit("ESCALATION: "), col("message"))))
      .withColumn("channels", channelRouting)
      .drop("__acked", "__base_type")
  }
}
