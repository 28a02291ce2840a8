package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audit-trail analytics — the reference's `AuditLogger` query surface
  * (ref src/monitoring/audit_logger.py:183 get_audit_trail, :230
  * generate_audit_report, :256 get_config_change_history, :271
  * get_user_activity, :286 archive_old_logs, :303
  * get_data_access_summary, :322 get_security_incidents) re-expressed
  * as engine queries over an append-only parquet dataset instead of
  * SQL against an AUDIT_TRAIL table.
  *
  * Row shape mirrors the reference's table (audit_logger.py:20
  * log_event insert columns): (audit_id, run_id, event_type, action,
  * action_timestamp, user_id, action_details JSON, ip_address,
  * session_id) plus the data-access columns (data_source,
  * access_type) the summary groups on.
  *
  * Scale shape: trail/report/summary are filter + hash-aggregate
  * passes — the date filters and event_type equality land in parquet
  * PushedFilters, the aggregations are map-side combinable, and the
  * top-N trail slice is a TakeOrderedAndProject (per-partition heaps,
  * never a global sort). The history dataset is day-partitionable via
  * [[Audit.append]]'s `partitionByDay` for partition-pruned period
  * reads at 100 TB of audit volume.
  */
object Audit {

  /** Filter set of get_audit_trail (audit_logger.py:183) — every
    * field optional; absent = no constraint.
    */
  final case class TrailFilter(
      eventType: Option[String] = None,
      userId: Option[String] = None,
      runId: Option[String] = None,
      start: Option[String] = None, // inclusive timestamp literal
      end: Option[String] = None,   // inclusive (ref uses <=)
      ipAddress: Option[String] = None,
      limit: Int = 100,
      offset: Int = 0)

  private def cond(f: TrailFilter): Column = {
    val clauses = Seq(
      f.eventType.map(col("event_type") === _),
      f.userId.map(col("user_id") === _),
      f.runId.map(col("run_id") === _),
      f.start.map(s => col("action_timestamp") >= to_timestamp(lit(s))),
      f.end.map(e => col("action_timestamp") <= to_timestamp(lit(e))),
      f.ipAddress.map(col("ip_address") === _)).flatten
    clauses.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Filtered trail, newest first — ref :183. The reference orders by
    * timestamp alone; ties are broken by audit_id so the page is
    * deterministic (same rows on re-run, a contract the reference's
    * LIMIT/OFFSET over equal timestamps cannot give). offset+limit
    * rows cross the final exchange — callers paging deep should
    * filter by time range instead (the reference has the same
    * pathology in SQL OFFSET).
    */
  def trail(audit: DataFrame, f: TrailFilter = TrailFilter()): DataFrame = {
    val page = audit.filter(cond(f))
      .orderBy(col("action_timestamp").desc, col("audit_id").desc)
      .limit(f.offset + f.limit)
    val drop = if (f.offset == 0) page else {
      // no OFFSET in the DataFrame API: rank the bounded page (≤
      // offset+limit rows, single small partition by construction)
      import org.apache.spark.sql.expressions.Window
      page.withColumn("__rn", row_number().over(Window.orderBy(
          col("action_timestamp").desc, col("audit_id").desc)))
        .filter(col("__rn") > f.offset).drop("__rn")
    }
    drop.select("audit_id", "run_id", "event_type", "action",
      "action_timestamp", "user_id", "action_details", "ip_address",
      "session_id")
  }

  /** Period report — ref :230 generate_audit_report: per-event-type
    * counts over [start, end], optionally restricted to `eventTypes`.
    * One hash aggregation; the period filter prunes partitions/row
    * groups.
    */
  def report(audit: DataFrame, start: String, end: String,
             eventTypes: Seq[String] = Nil): DataFrame = {
    val period = audit
      .filter(col("action_timestamp") >= to_timestamp(lit(start)) &&
        col("action_timestamp") <= to_timestamp(lit(end)))
    val scoped =
      if (eventTypes.isEmpty) period
      else period.filter(col("event_type").isin(eventTypes: _*))
    scoped.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("action_timestamp")).as("first_at"),
        max(col("action_timestamp")).as("last_at"))
  }

  /** Config-change history for one (table, record) — ref :256: JSON
    * field equality on action_details, newest first.
    */
  def configChangeHistory(audit: DataFrame, tableName: String,
                          recordId: String): DataFrame =
    audit.filter(col("event_type") === "config_change" &&
        get_json_object(col("action_details"), "$.table_name") === tableName &&
        get_json_object(col("action_details"), "$.record_id") === recordId)
      .orderBy(col("action_timestamp").desc, col("audit_id").desc)
      .select("audit_id", "action_timestamp", "user_id", "action_details")

  /** One user's actions over a period — ref :271. Unpaged (the
    * reference returns the full window), so no limit rides the sort —
    * a single user's slice is bounded by construction.
    */
  def userActivity(audit: DataFrame, userId: String, start: String,
                   end: String): DataFrame =
    audit.filter(cond(TrailFilter(userId = Some(userId),
        start = Some(start), end = Some(end))))
      .orderBy(col("action_timestamp").desc, col("audit_id").desc)
      .select("audit_id", "event_type", "action", "action_timestamp",
        "action_details", "ip_address", "session_id")

  /** Data-access rollup — ref :303 get_data_access_summary: GROUP BY
    * data_source, access_type with the JSON row_count summed.
    */
  def dataAccessSummary(audit: DataFrame, start: String,
                        end: String): DataFrame =
    audit.filter(col("event_type") === "data_access" &&
        col("action_timestamp") >= to_timestamp(lit(start)) &&
        col("action_timestamp") <= to_timestamp(lit(end)))
      .groupBy("data_source", "access_type")
      .agg(
        count(lit(1)).as("access_count"),
        sum(get_json_object(col("action_details"), "$.row_count")
          .cast("bigint")).as("total_rows"))

  /** Failed security events over a period — ref :322: the JSON
    * success flag parsed as boolean, false only (null ≠ incident,
    * matching the reference's `::boolean = false`).
    */
  def securityIncidents(audit: DataFrame, start: String,
                        end: String): DataFrame =
    audit.filter(col("event_type") === "security_event" &&
        get_json_object(col("action_details"), "$.success")
          .cast("boolean") === false &&
        col("action_timestamp") >= to_timestamp(lit(start)) &&
        col("action_timestamp") <= to_timestamp(lit(end)))
      .orderBy(col("action_timestamp").desc, col("audit_id").desc)
      .select("audit_id", "action_timestamp", "user_id", "action",
        "action_details", "ip_address")

  /** Retention split — ref :286 archive_old_logs, made real: rows
    * older than the cutoff (exclusive, matching the reference's `<`)
    * split off for the archive sink, the remainder kept. One shared
    * scan, two complementary pushed filters; writing/deleting is the
    * caller's choice of sink (e.g. [[RunHistory]]-style append +
    * [[graft.sources.ObjectStore.deleteObjects]] for the swept days).
    */
  def archiveSplit(audit: DataFrame,
                   cutoff: String): (DataFrame, DataFrame) = {
    // an unparseable cutoff would make the predicate NULL for EVERY
    // row — the sweep would run green while archiving nothing.
    // Validate with the SAME parser the predicate uses (a stricter
    // java.sql check would reject ISO-8601 forms Spark accepts)
    val parsed = audit.sparkSession.range(1)
      .select(to_timestamp(lit(cutoff))).head()
    require(!parsed.isNullAt(0), s"unparseable cutoff timestamp: '$cutoff'")
    // a null timestamp makes the predicate NULL, which a bare pair of
    // filters would drop from BOTH sides — undateable rows must stay
    // in the kept set (never silently deleted by a retention sweep)
    val old = coalesce(
      col("action_timestamp") < to_timestamp(lit(cutoff)), lit(false))
    (audit.filter(!old), audit.filter(old))
  }


  /** Append audit rows day-partitioned (action_date=YYYY-MM-DD), so
    * period queries prune to the covered days.
    */
  def append(audit: DataFrame, dir: String): Unit =
    audit.withColumn("action_date",
        date_format(col("action_timestamp"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("action_date").parquet(dir)

  /** The whole audit dataset (every day partition). */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("action_date")
}
