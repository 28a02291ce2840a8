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
    val target = new org.apache.hadoop.fs.Path(path)
    atomicSwap(df, target, plainSiblings(target), format)
  }

  /** Heal the one-rename crash window of [[idempotentWrite]]: target
    * missing but a retired `__old` (or a COMPLETE staging dir, marked
    * by its _SUCCESS commit file) still present. Prefers the staged
    * new state — it only reaches that window after a fully committed
    * write. No-op when the target exists.
    */
  def restoreIfTorn(spark: SparkSession, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    healTorn(spark, target, plainSiblings(target))
  }

  // ---- the ONE swap/heal core both naming schemes share -----------

  private def fsOf(spark: SparkSession,
                   p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    // the PATH's filesystem, never the default one: an s3a:// dataset
    // on an hdfs-default cluster must not resolve against HDFS
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def atomicSwap(df: DataFrame, target: org.apache.hadoop.fs.Path,
                         siblings: (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path),
                         format: String,
                         options: Map[String, String] = Map.empty): Unit = {
    val spark = df.sparkSession
    val fs = fsOf(spark, target)
    val (tmp, old) = siblings
    fs.delete(tmp, true)
    df.write.format(format).options(options).mode("overwrite").save(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"could not retire old state: $target -> $old")
    if (!fs.rename(tmp, target)) {
      // roll back so a complete state stays readable; a failed
      // rollback must surface too — the retiree is the only copy left
      if (fs.exists(old) && !fs.rename(old, target))
        throw new java.io.IOException(
          s"atomic swap failed AND rollback failed: state is at $old, not $target")
      throw new java.io.IOException(s"atomic swap failed: $tmp -> $target")
    }
    fs.delete(old, true)
  }

  private def healTorn(spark: SparkSession, target: org.apache.hadoop.fs.Path,
                       siblings: (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)): Unit = {
    val fs = fsOf(spark, target)
    if (!fs.exists(target)) {
      val (tmp, old) = siblings
      val staged = new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
      if (fs.exists(staged)) {
        // only drop the retiree once the promote actually landed — on
        // a failed rename the old copy may be the last complete state
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(s"heal failed: $tmp -> $target")
        fs.delete(old, true)
      } else if (fs.exists(old) && !fs.rename(old, target))
        throw new java.io.IOException(s"heal failed: $old -> $target")
    }
  }

  private def plainSiblings(target: org.apache.hadoop.fs.Path)
      : (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path) = (
    new org.apache.hadoop.fs.Path(target.toString + "__staging"),
    new org.apache.hadoop.fs.Path(target.toString + "__old"))

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
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = fsOf(spark, root)
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
    val target = new org.apache.hadoop.fs.Path(path)
    if (!fsOf(spark, target).exists(target))
      idempotentWrite(stage, path, format)
    spark.read.format(format).load(path)
  }

  /** [[idempotentWrite]] with DOT-PREFIXED staging/retire names
    * (`parent/.name__staging`, `parent/.name__old`). Spark's file
    * listing and partition discovery skip dot/underscore paths, so
    * the transient directories are INVISIBLE to concurrent readers —
    * required when `path` is a leaf of a hive tree (a plain
    * `name__staging` sibling would surface as a bogus partition
    * value and double-count rows mid-swap). Same one-rename crash
    * window as [[idempotentWrite]]; callers heal with
    * [[restoreHiddenIfTorn]] before reading/sweeping the dataset.
    */
  def idempotentWriteHidden(df: DataFrame, path: String,
                            format: String = "parquet",
                            options: Map[String, String] = Map.empty): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    atomicSwap(df, target, hiddenSiblings(target), format, options)
  }

  /** Heal the crash window of [[idempotentWriteHidden]] (same policy
    * as [[restoreIfTorn]]: prefer a COMPLETE hidden staging dir, else
    * the hidden retiree). No-op when the target exists.
    */
  def restoreHiddenIfTorn(spark: SparkSession, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    healTorn(spark, target, hiddenSiblings(target))
  }

  private def hiddenSiblings(target: org.apache.hadoop.fs.Path)
      : (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path) = (
    new org.apache.hadoop.fs.Path(target.getParent, s".${target.getName}__staging"),
    new org.apache.hadoop.fs.Path(target.getParent, s".${target.getName}__old"))

  /** Parse a hidden swap-sibling name back to its target — the ONE
    * place [[hiddenSiblings]]' naming is reversed (used by the
    * compaction sweep to discover torn leaves). None if `name` is not
    * a hidden swap dir.
    */
  private[graft] def hiddenSwapTarget(p: org.apache.hadoop.fs.Path)
      : Option[org.apache.hadoop.fs.Path] = {
    val n = p.getName
    // strip exactly ONE suffix: a target whose own name ends in __old
    // (".k=legacy__old__staging") must not collapse twice
    if (n.startsWith(".") && n.endsWith("__staging"))
      Some(new org.apache.hadoop.fs.Path(p.getParent,
        n.stripPrefix(".").stripSuffix("__staging")))
    else if (n.startsWith(".") && n.endsWith("__old"))
      Some(new org.apache.hadoop.fs.Path(p.getParent,
        n.stripPrefix(".").stripSuffix("__old")))
    else None
  }

  // ---- retry / classification (ref error_recovery.py:157-257) -----

  /** Error taxonomy — ref :184 classify_error's four buckets. */
  sealed trait ErrorType
  case object Transient extends ErrorType
  case object Configuration extends ErrorType
  case object DataError extends ErrorType
  case object SystemError extends ErrorType
  case object Unknown extends ErrorType

  private val transientPatterns = Seq(
    "timeout", "connection lost", "connection reset", "connection refused",
    "lock timeout", "deadlock", "temporary failure", "service unavailable",
    "network", "socket", "http 5", "502", "503", "504")
  private val configPatterns = Seq(
    "invalid config", "missing credential", "permission denied",
    "access denied", "authentication failed", "unauthorized", "invalid key",
    "config error", "no such file", "file not found", "directory not found",
    "credentials provided")
  private val dataPatterns = Seq(
    "constraint violation", "foreign key", "unique constraint",
    "check constraint", "invalid format", "type mismatch", "value error",
    "data error", "parsing error", "validation error", "schema mismatch")
  private val systemPatterns = Seq(
    "out of memory", "disk full", "no space left", "database down",
    "server error", "internal error", "system error", "memory error",
    "ioerror", "oserror", "broken pipe")

  /** Classify by message/type substrings — ref :184-227 (same pattern
    * lists, same precedence: transient > config > data > system).
    */
  def classifyError(e: Throwable): ErrorType = {
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    val typ = e.getClass.getSimpleName.toLowerCase
    def hits(ps: Seq[String]) = ps.exists(p => msg.contains(p) || typ.contains(p))
    if (hits(transientPatterns)) Transient
    else if (hits(configPatterns)) Configuration
    else if (hits(dataPatterns)) DataError
    else if (hits(systemPatterns)) SystemError
    else Unknown
  }

  /** Retry policy — ref :229 should_retry: config/data never retry
    * (the rerun cannot heal them), system errors once, transient and
    * unknown always (within the attempt budget).
    */
  def shouldRetry(t: ErrorType, attempt: Int): Boolean = t match {
    case Configuration | DataError => false
    case SystemError => attempt < 1
    case Transient | Unknown => true
  }

  /** Backoff schedule — ref :242 calculate_backoff_delay: fixed or
    * exponential, capped. (The reference's jitter strategy draws from
    * `random`; a deterministic engine takes jitter from the caller if
    * wanted — the cap and growth are the load-shedding substance.)
    */
  def backoffDelayMs(attempt: Int, factor: Double = 2.0,
                     initialMs: Long = 1000L, maxMs: Long = 60000L,
                     exponential: Boolean = true): Long = {
    val d = if (exponential) initialMs * math.pow(factor, attempt) else initialMs.toDouble
    math.min(maxMs.toDouble, d).toLong
  }

  /** ref :157 execute_with_retry with the classification-aware policy
    * wired in: a non-retryable class rethrows immediately, retryable
    * ones back off and try again up to `maxRetries`.
    */
  def withRetry[T](maxRetries: Int = 3, backoffFactor: Double = 2.0,
                   initialDelayMs: Long = 1000L, maxDelayMs: Long = 60000L,
                   sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          val cls = classifyError(e)
          if (attempt >= maxRetries || !shouldRetry(cls, attempt)) throw e
          sleep(backoffDelayMs(attempt, backoffFactor, initialDelayMs, maxDelayMs))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** ref :498 implement_fallback_strategy: try the primary, on any
    * failure try the fallback; if BOTH fail, the primary's error is
    * the one rethrown (the fallback's failure is secondary context).
    */
  def withFallback[T](primary: => T)(fallback: => T): T =
    try primary
    catch {
      case scala.util.control.NonFatal(pe) =>
        try fallback
        catch { case scala.util.control.NonFatal(fe) =>
          pe.addSuppressed(fe); throw pe }
    }
}
