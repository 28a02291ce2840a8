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
  * reference's history query and gap detection read it) and makes
  * replays idempotent (re-appending an already-recorded event cannot
  * change the derived value).
  *
  * Concurrency contract (no locking, by construction):
  *  - APPENDS stage each event into a private hidden directory and
  *    rename ONE uniquely-named file into the key's leaf — concurrent
  *    appenders (even from separate Spark applications) never share a
  *    staging dir, and an event becomes visible atomically or not at
  *    all.
  *  - COMPACT is merge-then-RETIRE, never swap: each leaf's files
  *    merge into one new combined file that is published BEFORE
  *    anything else happens; the merged originals are only recorded
  *    in a hidden retirement manifest and physically deleted by the
  *    NEXT compact, a full cycle later. So a reader at any instant
  *    sees every event at least once (possibly twice — duplicate
  *    event rows cannot change the derived state, which is why
  *    [[events]] collapses exact duplicates on read), and no file a
  *    reader's in-flight listing can still reference is ever deleted
  *    under it (by reap time the combined replacement has been
  *    visible since the previous compact; [[events]] additionally
  *    reads with ignoreMissingFiles so even a pathological
  *    minutes-long reader degrades to the combined copy, not an
  *    error). A delete+rename swap, by contrast, has a window where
  *    the whole key is missing and a resumed load would treat itself
  *    as a first load. Concurrent appends survive (only pinned merged
  *    lists are ever reaped); concurrent compacts are safe but
  *    wasteful (both combined copies survive as collapsing duplicates
  *    until a later cycle).
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

  /** Physical file columns; pipeline_id/source_id live in the
    * directory layout and come back through partition discovery.
    */
  private val eventSchemaDdl =
    "watermark_column STRING, watermark_value STRING, value_type STRING, " +
      "strategy STRING, op STRING, update_time TIMESTAMP, event_id STRING"

  private val schemaDdl =
    "pipeline_id STRING, source_id STRING, " + eventSchemaDdl

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

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The hive-layout leaf for one (pipeline, source) key, partition
    * values escaped exactly the way Spark's own partitioned writer
    * escapes them — ledgers written by earlier partitionBy appends
    * read back through the same paths.
    */
  private def leafPath(dir: String, pipelineId: String,
                       sourceId: String): org.apache.hadoop.fs.Path = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    new org.apache.hadoop.fs.Path(dir,
      s"pipeline_id=${escapePathName(pipelineId)}/" +
        s"source_id=${escapePathName(sourceId)}")
  }

  private def append(spark: SparkSession, dir: String, pipelineId: String,
                     sourceId: String, column: String, value: Option[Any],
                     strategy: String, op: String,
                     at: Option[java.sql.Timestamp]): Unit = {
    import spark.implicits._
    val (v, vt) = value.map(encode).getOrElse((null: String, null: String))
    // the stamp doubles as the event's identity: [[events]] collapses
    // duplicates on it, so the SAME physical event seen through two
    // files (compact overlap, crash-copied debris) reads once, while
    // two distinct appends that happen to carry identical payloads
    // (two retried runs of different jobs) each keep their history row
    val stamp = java.util.UUID.randomUUID().toString
    val event = Seq((column, v, vt, strategy, op, stamp))
      .toDF("watermark_column", "watermark_value", "value_type",
        "strategy", "op", "event_id")
      .withColumn("update_time",
        at.fold(current_timestamp())(ts => lit(ts)))
      .select(col("watermark_column"), col("watermark_value"),
        col("value_type"), col("strategy"), col("op"),
        col("update_time"), col("event_id"))
    // one bookkeeping row: stage into a PRIVATE hidden dir, then move
    // the single data file into the leaf under a unique name — no
    // shared _temporary staging between concurrent appenders, and the
    // event appears atomically (one rename) or not at all
    val staging = new org.apache.hadoop.fs.Path(dir, s".__wm_append_$stamp")
    val fs = fsOf(spark, staging)
    event.coalesce(1).write.parquet(staging.toString)
    try {
      val part = fs.listStatus(staging)
        .find(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .getOrElse(throw new java.io.IOException(
          s"staged watermark event produced no data file under $staging"))
      val leaf = leafPath(dir, pipelineId, sourceId)
      fs.mkdirs(leaf)
      val target = new org.apache.hadoop.fs.Path(leaf, s"event-$stamp.parquet")
      if (!fs.rename(part.getPath, target))
        throw new java.io.IOException(s"could not publish watermark event: $target")
    } finally fs.delete(staging, true)
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
      if (fs.exists(path)) spark.read.schema(schemaDdl)
        // a reader overlapping a compact's reap phase may hold a
        // listing with a retired original: skip it — its events are in
        // the combined file published a full compact-cycle earlier
        .option("ignoreMissingFiles", "true").parquet(dir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    // duplicate collapse on EVENT IDENTITY: a reader overlapping a
    // compact can see one event through both its original and combined
    // file — same event_id, reads once. Two distinct appends with
    // identical payloads keep both history rows (the reference inserts
    // one row per update call). Rows from pre-event_id ledgers carry a
    // null id and keep the legacy whole-row collapse.
    val scoped = all.filter(col("pipeline_id") === pipelineId &&
      col("source_id") === sourceId)
    val keyed = scoped.filter(col("event_id").isNotNull)
      .dropDuplicates("event_id")
      .unionByName(scoped.filter(col("event_id").isNull).dropDuplicates())
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

  /** Fold a long ledger back toward one file per key (same derived
    * state, fewer files) — run occasionally from housekeeping, like
    * FileSink.compactPartitions. Two phases, so a racing reader's
    * in-flight file listing is never invalidated:
    *
    *  1. REAP: physically delete originals that the PREVIOUS compact
    *     merged (recorded in hidden retirement manifests). Their
    *     combined replacement has been visible since that compact, so
    *     no current listing can reference them without it.
    *  2. FOLD: per leaf with more than one visible file, merge the
    *     pinned file list into one new uniquely-named combined file,
    *     publish it, and write a manifest retiring the merged
    *     originals — WITHOUT deleting them (readers mid-query still
    *     hold them in their listings; until the next compact they are
    *     exact duplicates, which [[events]] collapses).
    *
    * A crash at any point leaves at worst duplicate rows or an
    * unreaped manifest — both healed by the next run. An event
    * appended mid-fold is neither merged nor retired; it survives
    * alongside the combined file.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    val retiredDir = new org.apache.hadoop.fs.Path(root, ".__wm_retired")

    // ---- phase 1: reap the previous compact's retired originals ----
    if (fs.exists(retiredDir)) fs.listStatus(retiredDir).foreach { m =>
      if (m.isFile) {
        val in = fs.open(m.getPath)
        val listed = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        // relative paths: the manifest survives a ledger-tree move
        listed.filter(_.nonEmpty).foreach(rel =>
          fs.delete(new org.apache.hadoop.fs.Path(root, rel), false))
        fs.delete(m.getPath, false)
      }
    }

    // ---- phase 2: fold each leaf and retire what was merged --------
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap {
        case st if st.isDirectory =>
          val n = st.getPath.getName
          if (n.startsWith(".") || n.startsWith("_")) Nil
          else leaves(st.getPath)
        case st if st.isFile &&
          !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_") => Seq(p)
        case _ => Nil
      }.distinct
    val rootUri = fs.makeQualified(root).toUri
    leaves(root).foreach { leaf =>
      val originals = fs.listStatus(leaf).toSeq.filter(st => st.isFile &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      if (originals.size > 1) {
        val stamp = java.util.UUID.randomUUID().toString
        val staging = new org.apache.hadoop.fs.Path(leaf, s".__wm_compact_$stamp")
        spark.read.schema(eventSchemaDdl)
          .parquet(originals.map(_.getPath.toString): _*)
          .coalesce(1).write.parquet(staging.toString)
        try {
          val part = fs.listStatus(staging)
            .find(st => st.isFile && st.getPath.getName.startsWith("part-"))
            .getOrElse(throw new java.io.IOException(
              s"compact produced no data file under $staging"))
          val combined =
            new org.apache.hadoop.fs.Path(leaf, s"compact-$stamp.parquet")
          if (!fs.rename(part.getPath, combined))
            throw new java.io.IOException(s"could not publish $combined")
          // combined file is visible from here on; retire (don't
          // delete) the merged originals for the next run's reap
          val rels = originals.map(st => rootUri.relativize(
            fs.makeQualified(st.getPath).toUri).getPath)
          val out = fs.create(
            new org.apache.hadoop.fs.Path(retiredDir, s"$stamp.list"), false)
          try out.write(rels.mkString("\n").getBytes("UTF-8"))
          finally out.close()
        } finally fs.delete(staging, true)
      }
    }
  }
}
