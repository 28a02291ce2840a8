package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable watermark ledger — the reference's WATERMARKS table
  * (reference: src/utils/incremental_load_manager.py:103
  * get_last_watermark, :141 update_watermark, :468 reset_watermark,
  * :889 _get_watermark_history_db) re-expressed as an APPEND-ONLY
  * PARQUET DATASET instead of a mutable DB row per key.
  *
  * The reference upserts one row per (pipeline, source, column) and
  * DELETEs on reset; an object-store-native ledger can't cheaply
  * update in place, so every call APPENDS an event row
  * (`op = update | reset`) and the current watermark is derived on
  * read: the latest `update` event strictly NEWER than the latest
  * `reset` tombstone. That keeps full history for free (the
  * reference's history query and gap detection read it), makes
  * replays idempotent (re-appending an already-recorded event cannot
  * change the derived value), and needs no locking — each append is
  * one new uniquely-named file.
  *
  * Layout: `dir/pipeline_id=…/source_id=…/…` — partition pruning
  * turns every lookup into a scan of ONE key's bookkeeping rows
  * (dozens of tiny rows, not data). Values are stored as
  * (string, type-tag) pairs and decoded back to the native type so
  * the stored watermark can drive [[Incremental.afterWatermark]]'s
  * pushed-down range filter directly.
  *
  * Scale note: this dataset holds ORCHESTRATION STATE (a few rows per
  * pipeline run), never data — driver-side collect of one key's
  * events is bounded by run count, and `compact` folds a long ledger
  * back to one file per key when it grows.
  */
object WatermarkStore {

  /** The reference's Watermark dataclass (:42), value decoded to its
    * native type.
    */
  final case class Watermark(pipelineId: String, sourceId: String,
                             column: String, value: Any,
                             strategy: String,
                             updateTime: java.sql.Timestamp)

  private val schemaDdl =
    "pipeline_id STRING, source_id STRING, watermark_column STRING, " +
      "watermark_value STRING, value_type STRING, strategy STRING, " +
      "op STRING, update_time TIMESTAMP"

  /** Encode a watermark value as (string, type tag). Loud on types the
    * ledger can't round-trip — a silently stringified value would
    * change [[Incremental.afterWatermark]]'s comparison semantics.
    */
  private[incremental] def encode(value: Any): (String, String) = value match {
    case null => throw new IllegalArgumentException("watermark value must not be null")
    case v: java.sql.Timestamp => (v.toString, "timestamp")
    case v: java.sql.Date      => (v.toString, "date")
    case v: Int                => (v.toString, "long")
    case v: Long               => (v.toString, "long")
    case v: Float              => (v.toString, "double")
    case v: Double             => (v.toString, "double")
    case v: String             => (v, "string")
    case other => throw new IllegalArgumentException(
      s"unsupported watermark value type: ${other.getClass.getName} " +
        "(timestamp, date, long, double and string round-trip)")
  }

  private[incremental] def decode(value: String, valueType: String): Any =
    valueType match {
      case "timestamp" => java.sql.Timestamp.valueOf(value)
      case "date"      => java.sql.Date.valueOf(value)
      case "long"      => value.toLong
      case "double"    => value.toDouble
      case "string"    => value
      case other => throw new IllegalArgumentException(
        s"corrupt watermark ledger: unknown value_type '$other'")
    }

  private def append(spark: SparkSession, dir: String, pipelineId: String,
                     sourceId: String, column: String, value: Option[Any],
                     strategy: String, op: String,
                     at: Option[java.sql.Timestamp]): Unit = {
    import spark.implicits._
    val (v, vt) = value.map(encode).getOrElse((null: String, null: String))
    Seq((pipelineId, sourceId, column, v, vt, strategy, op))
      .toDF("pipeline_id", "source_id", "watermark_column",
        "watermark_value", "value_type", "strategy", "op")
      .withColumn("update_time",
        at.fold(current_timestamp())(ts => lit(ts)))
      .coalesce(1) // one bookkeeping row — one tiny file per event
      .write.mode("append").partitionBy("pipeline_id", "source_id")
      .parquet(dir)
  }

  /** Record a new watermark — ref :141 update_watermark. `at` defaults
    * to the wall clock; pass it explicitly when backfilling or in
    * specs (derived state must be replayable with a planted clock).
    */
  def update(spark: SparkSession, dir: String, pipelineId: String,
             sourceId: String, column: String, value: Any,
             strategy: String = "timestamp",
             at: Option[java.sql.Timestamp] = None): Unit =
    append(spark, dir, pipelineId, sourceId, column, Some(value),
      strategy, "update", at)

  /** Reset for reprocessing — ref :468: after this, [[last]] returns
    * None (until a newer update lands). An append-only tombstone, so
    * the pre-reset history survives for audit.
    */
  def reset(spark: SparkSession, dir: String, pipelineId: String,
            sourceId: String, column: Option[String] = None,
            at: Option[java.sql.Timestamp] = None): Unit =
    append(spark, dir, pipelineId, sourceId, column.getOrElse(""),
      None, "", "reset", at)

  /** Every event for one (pipeline, source) key, newest first —
    * partition-pruned scan. `column` narrows like the reference's
    * optional watermark_column param.
    */
  def events(spark: SparkSession, dir: String, pipelineId: String,
             sourceId: String, column: Option[String] = None): DataFrame = {
    // a ledger that has never been written to is an EMPTY ledger, not
    // an error (first run of a fresh pipeline asks before any update)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all =
      if (fs.exists(path)) spark.read.schema(schemaDdl).parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    val keyed = all.filter(col("pipeline_id") === pipelineId &&
      col("source_id") === sourceId)
    // a column-scoped read also honors UNSCOPED resets (reference
    // parity: reset without a column clears every column's watermark)
    column.fold(keyed)(c =>
      keyed.filter(col("watermark_column") === c ||
        (col("op") === "reset" && col("watermark_column") === "")))
  }

  /** Same-instant tie-break key: the VALUE in its native ordering
    * (numeric types compared numerically — a lexical string compare
    * would rank "9" above "10"; timestamp/date strings already sort
    * lexically = chronologically and fall through to the raw column).
    */
  private def typedValueKey =
    when(col("value_type").isin("long", "double"),
      col("watermark_value").cast("double"))

  /** The current watermark — ref :103 get_last_watermark: the newest
    * `update` event strictly after the newest `reset` tombstone (ties
    * between events at the same instant break on the larger value in
    * its NATIVE ordering, so replayed appends stay deterministic).
    * None when the ledger is empty, the key unknown, or a reset is
    * the newest word.
    */
  def last(spark: SparkSession, dir: String, pipelineId: String,
           sourceId: String, column: Option[String] = None): Option[Watermark] = {
    val ev = events(spark, dir, pipelineId, sourceId, column)
    val resetAt = ev.filter(col("op") === "reset")
      .agg(max(col("update_time"))).head().getTimestamp(0)
    val updates = ev.filter(col("op") === "update")
    val live = Option(resetAt).fold(updates)(t =>
      updates.filter(col("update_time") > lit(t)))
    live.orderBy(col("update_time").desc, typedValueKey.desc_nulls_last,
        col("watermark_value").desc)
      .limit(1).collect().headOption.map { r =>
        Watermark(pipelineId, sourceId,
          r.getAs[String]("watermark_column"),
          decode(r.getAs[String]("watermark_value"),
            r.getAs[String]("value_type")),
          r.getAs[String]("strategy"),
          r.getAs[java.sql.Timestamp]("update_time"))
      }
  }

  /** Watermark history, newest first — ref :889 (`LIMIT 100`). A
    * DataFrame, so gap detection and trend queries run on the engine.
    */
  def history(spark: SparkSession, dir: String, pipelineId: String,
              sourceId: String, column: String,
              limit: Int = 100): DataFrame =
    events(spark, dir, pipelineId, sourceId, Some(column))
      .filter(col("op") === "update")
      .orderBy(col("update_time").desc, typedValueKey.desc_nulls_last,
        col("watermark_value").desc)
      .limit(limit)
      .select("watermark_column", "watermark_value", "value_type",
        "strategy", "update_time")

  /** Advance the ledger from a just-extracted batch: records
    * max(column) as the new watermark, or leaves the ledger untouched
    * when the batch is empty (an empty extraction must NOT regress or
    * re-assert the watermark — the reference only calls
    * update_watermark with data in hand). Returns the recorded value.
    */
  def advanceFrom(spark: SparkSession, dir: String, pipelineId: String,
                  sourceId: String, column: String, batch: DataFrame,
                  strategy: String = "timestamp",
                  at: Option[java.sql.Timestamp] = None): Option[Any] = {
    val hi = Option(batch.agg(max(col(column))).head().get(0))
    hi.foreach(v => update(spark, dir, pipelineId, sourceId, column, v,
      strategy, at))
    hi
  }

  /** Fold a long ledger back to one file per key (same derived state,
    * fewer files) — run occasionally from housekeeping, like
    * FileSink.compactPartitions. The fold materializes to a sibling
    * tmp tree first and swaps via delete+rename, so a crash never
    * loses events; a reader racing the swap window can observe a
    * briefly-missing ledger (= empty), so run it while the pipeline
    * is quiet.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    // materialize the fold into a sibling tmp tree FIRST, then swap —
    // the source files are only deleted after their replacement exists
    val tmp = dir.stripSuffix("/") + ".__compact_tmp"
    spark.read.schema(schemaDdl).parquet(dir)
      .coalesce(1).write.mode("overwrite")
      .partitionBy("pipeline_id", "source_id").parquet(tmp)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
