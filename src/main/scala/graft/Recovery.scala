package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Failure recovery, Spark-style: the reference's `ErrorRecovery`
  * (reference: src/utils/error_recovery.py) tracks checkpoints in a
  * bookkeeping DB so a rerun can resume mid-pipeline. On Spark the
  * equivalent guarantee is simpler and stronger: every stage output is
  * written new-state-then-atomic-swap, so a rerun of ANY stage is
  * idempotent — there is no partial state to resume from, only
  * complete versions. (Streaming jobs get the same property from
  * checkpointed offsets + these idempotent sinks — see
  * [[graft.streaming.Streams]].)
  */
object Recovery {

  /** Write `df` to `path` atomically: materialize to a staging dir,
    * retire the old target to `path__old`, promote staging, drop the
    * retiree. A complete state always exists on disk: a crash before
    * promotion leaves the old target in place (at `path` or, in the
    * one-rename window, at `path__old`); [[restoreIfTorn]] heals that
    * window on the next run. (A bare delete-then-rename would lose the
    * target entirely if the writer died between the two calls.)
    */
  def idempotentWrite(df: DataFrame, path: String, format: String = "parquet"): Unit = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(tmp, true)
    df.write.format(format).mode("overwrite").save(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"could not retire old state: $target -> $old")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll back so a complete state stays readable
      throw new java.io.IOException(s"atomic swap failed: $tmp -> $target")
    }
    fs.delete(old, true)
  }

  /** Heal the one-rename crash window of [[idempotentWrite]]: target
    * missing but a retired `__old` (or a COMPLETE staging dir, marked
    * by its _SUCCESS commit file) still present. Prefers the staged
    * new state — it only reaches that window after a fully committed
    * write. No-op when the target exists.
    */
  def restoreIfTorn(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(target)) {
      val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
      val old = new org.apache.hadoop.fs.Path(path + "__old")
      val staged = new org.apache.hadoop.fs.Path(path + "__staging/_SUCCESS")
      if (fs.exists(staged)) { fs.rename(tmp, target); fs.delete(old, true) }
      else if (fs.exists(old)) fs.rename(old, target)
    }
  }

  /** Quarantine the failed side of a [[graft.quality.DQ.split]] —
    * ref error_recovery.py:345-376 quarantine_bad_records: persist the
    * bad rows with their failure reason and run id for later analysis
    * and reprocessing. Each run writes its own subdirectory
    * (`dir/run_id=<id>`), so the quarantine area is an append-only
    * dataset partitioned by run — and the per-run write itself is an
    * [[idempotentWrite]], so a retried run replaces its own slice
    * atomically instead of double-appending (the reference gets the
    * same property from its uuid quarantine_id per call).
    */
  def quarantine(quarantined: DataFrame, dir: String, runId: String): String = {
    require(runId.nonEmpty && !runId.contains("/"),
      s"runId must be a non-empty path segment, got '$runId'")
    val path = s"$dir/run_id=$runId"
    idempotentWrite(
      quarantined.withColumn("quarantined_at", org.apache.spark.sql.functions
        .current_timestamp()),
      path)
    path
  }

  /** Read quarantined rows back and push them through the rules again —
    * ref error_recovery.py:376 reprocess_quarantined_records. Rows that
    * now pass (after an upstream fix: reference-table refresh, rule
    * relaxation, source correction) come back on the clean side; rows
    * that still violate return to quarantine. `runId = None` reprocesses
    * the whole quarantine area, otherwise one run's slice.
    * Output: (clean-with-original-schema, still-bad-with-failed_rules);
    * the bookkeeping columns (`failed_rules`, `quarantined_at`,
    * `run_id`) are dropped before re-evaluation so the rules see the
    * original row shape.
    */
  def reprocess(spark: SparkSession, dir: String,
                rules: Seq[graft.quality.DQ.Rule],
                runId: Option[String] = None): (DataFrame, DataFrame) = {
    val paths = runId match {
      case Some(id) =>
        val p = s"$dir/run_id=$id"
        restoreIfTorn(spark, p)
        Seq(p)
      case None =>
        // whole-area read: a crashed quarantine write can leave
        // run_id=X__old / __staging siblings that partition discovery
        // would treat as (duplicate-carrying) bogus partition values —
        // heal each torn run slice, then read ONLY the real slices
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val root = new org.apache.hadoop.fs.Path(dir)
        val children =
          if (fs.exists(root)) fs.listStatus(root).toSeq.map(_.getPath.toString)
          else Seq.empty
        children
          .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("run_id="))
          .map(_.stripSuffix("__old").stripSuffix("__staging"))
          .distinct.sorted
          .map { p => restoreIfTorn(spark, p); p }
          // an INCOMPLETE staging dir (crash mid-write, no _SUCCESS)
          // heals to nothing — there was never a complete slice to
          // recover; skip it rather than fail the whole-area read
          .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    }
    require(paths.nonEmpty, s"no quarantine slices under $dir")
    val raw = spark.read.option("basePath", dir).parquet(paths: _*)
      .drop("failed_rules", "quarantined_at", "run_id")
    graft.quality.DQ.split(raw, rules)
  }

  /** Run a stage only when its output doesn't exist yet (resume-safe
    * rerun of a multi-stage pipeline: completed stages are skipped,
    * the failed stage recomputes from its inputs). Heals a torn swap
    * from a previous crashed run before deciding.
    */
  def runStage(spark: SparkSession, path: String, format: String = "parquet")
              (stage: => DataFrame): DataFrame = {
    restoreIfTorn(spark, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      idempotentWrite(stage, path, format)
    spark.read.format(format).load(path)
  }
}
