package graft.monitoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable run history, Spark-style: the reference's
  * `PerformanceMonitor` + audit tables (reference:
  * src/monitoring/performance_monitor.py, src/utils/audit) insert one
  * row per pipeline run into a metrics DB; here the history is an
  * APPEND-ONLY PARQUET DATASET partitioned by `run_id` — each run
  * appends its own partition (pruned on per-run reads), and the whole
  * dataset is queryable with the engine itself (trend queries, SLA
  * checks, plan-hash drift detection across runs).
  *
  * Row shape: (run_id, query, duration_ms, rows, plan_hash, failed,
  * recorded_at). `plan_hash` is the bench artifact's normalized plan
  * fingerprint, so "did this query's plan change between runs" is a
  * grouBy(query) over the history — the reference's regression check
  * (performance_monitor.py `detect_performance_regression`) expressed
  * as a query instead of bookkeeping code.
  */
object RunHistory {

  final case class Entry(query: String, durationMs: Long,
                         rows: Option[Long] = None,
                         planHash: Option[String] = None,
                         failed: Boolean = false)

  /** Append one run's entries under `dir/run_id=<id>`. Plain append —
    * a run id reused across calls accumulates (multiple actions per
    * run); use a fresh run id per run for replace-free history.
    * `recordedAt` defaults to the wall clock; pass it explicitly when
    * backfilling or replaying history (and in specs — deterministic
    * freshness/compliance-window queries need a planted clock).
    */
  def append(spark: SparkSession, dir: String, runId: String,
             entries: Seq[Entry],
             recordedAt: Option[java.sql.Timestamp] = None): Unit = {
    require(entries.nonEmpty, "no entries to record")
    import spark.implicits._
    entries.toDF()
      .select(
        lit(runId).as("run_id"),
        col("query"),
        col("durationMs").as("duration_ms"),
        col("rows"),
        col("planHash").as("plan_hash"),
        col("failed"),
        recordedAt.fold(current_timestamp())(ts => lit(ts)).as("recorded_at"))
      .coalesce(1) // a handful of bookkeeping rows — one file per call
      .write.mode("append").partitionBy("run_id").parquet(dir)
  }

  /** One entry per recorded action of a [[Metrics.Recorder]] snapshot
    * (action name as the query label).
    */
  def fromActions(actions: Seq[Metrics.ActionMetric]): Seq[Entry] =
    actions.map(a => Entry(a.funcName, a.durationMs, a.outputRows,
      a.planHash, a.failed))

  /** One entry from a [[graft.pipeline.Pipeline.RunStats]] audit:
    * rows = the pipeline's output count.
    */
  def fromRunStats(query: String, stats: graft.pipeline.Pipeline.RunStats,
                   durationMs: Long, planHash: Option[String] = None): Entry =
    Entry(query, durationMs, Some(stats.rowsOut), planHash)

  /** The whole history (every run's partition). */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Append one run's metric telemetry — the durable side channel for
    * figures that are neither durations nor row counts (per-round
    * recall@k of the ANN surfaces, sample rates, compression ratios).
    * Row shape: (run_id, metric, value, recorded_at); same append-only
    * run_id-partitioned parquet discipline as the run history, so
    * [[graft.monitoring.Trends.metricAlerts]] reads it with per-run
    * partition pruning.
    */
  def appendMetrics(spark: SparkSession, dir: String, runId: String,
                    values: Map[String, Double],
                    recordedAt: Option[java.sql.Timestamp] = None): Unit = {
    require(values.nonEmpty, "no metrics to record")
    import spark.implicits._
    values.toSeq.toDF("metric", "value")
      .select(
        lit(runId).as("run_id"), col("metric"), col("value"),
        recordedAt.fold(current_timestamp())(ts => lit(ts)).as("recorded_at"))
      .coalesce(1)
      .write.mode("append").partitionBy("run_id").parquet(dir)
  }

  /** The whole metric-telemetry dataset (every run's partition). */
  def loadMetrics(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Catalog entry for the history dataset, so pipelines and SQL can
    * reference it like any other registered table.
    */
  def catalogSpec(name: String, dir: String): graft.Catalog.DatasetSpec =
    graft.Catalog.DatasetSpec(name = name, format = "parquet", path = dir,
      schemaDdl = None, options = Map.empty)
}
