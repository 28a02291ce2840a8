package graft.pipeline

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Catalog
import graft.quality.{Anomaly, DQ}

/** One-document metadata-driven job — the reference's complete
  * configuration bundle executed end-to-end (ref
  * config_loader.py:22 `load_complete_configuration` assembles
  * pipeline + connections + sources + transformations + dq profile +
  * anomaly config from the metadata DB; orchestrator_manager then
  * runs them in order). Here the bundle is ONE JSON document and the
  * run is one call:
  *
  * {{{
  * {
  *   "datasets": [ {"name":…, "format":…, "path":…, "schema":…}, … ],
  *   "pipeline": {"primary": …, "steps": [ … ]},
  *   "quality":  {"rules": [ … ], "min_score": 90.0,    // optional gate
  *                "quarantine_dir": …, "run_id": …},     // optional row routing
  *   "anomaly":  {"method": …, "column": …, …},          // optional screen
  *   "sink":     {"format": "parquet", "path": …}        // optional write
  * }
  * }}}
  *
  * Each section parses through its existing front-end
  * ([[graft.Catalog.parseJson]], [[PipelineJson.parse]],
  * [[graft.quality.DQ.rulesFromJson]],
  * [[graft.quality.Anomaly.fromJson]]), so a section's dialect is
  * defined in exactly one place; this runner only sequences them:
  * register datasets → compose the transform plan → evaluate the DQ
  * gate on the OUTPUT (one fused agg; throws below min_score) →
  * anomaly screen as a side output → optional idempotent sink write.
  * Unknown top-level keys are a config error, not silently ignored.
  */
object Job {

  final case class Spec(datasets: Seq[Catalog.DatasetSpec],
                        pipeline: Pipeline.Spec,
                        dqRules: Seq[DQ.Rule],
                        minScore: Option[Double],
                        quarantine: Option[(String, String)], // dir, run id
                        anomalyJson: Option[String],
                        // format, path, mode (None = the document omitted
                        // "mode"; batch resolves it to "overwrite", streaming
                        // requires atomic-or-absent — the distinction matters)
                        sink: Option[(String, String, Option[String])],
                        incremental: Option[IncrementalSpec] = None,
                        // r20: the streaming crawl-ingest loop as config —
                        // a Screen-shaped section (same dialect/knobs as the
                        // batch `screen` step) that [[runStream]] dispatches
                        // through Streams.ingestScreenStreamBatchAware:
                        // screen each micro-batch against the history,
                        // APPEND survivors' signatures (which the batch
                        // screen step deliberately never does). Streaming
                        // only; [[run]] rejects it loudly.
                        ingest: Option[Pipeline.Screen] = None)

  /** The `incremental` section: resume the named dataset "from last
    * watermark" out of a durable [[graft.incremental.WatermarkStore]]
    * ledger — the reference's get_last_watermark → extract →
    * update_watermark loop (incremental_load_manager.py:103/:141)
    * with the state in the ledger instead of the caller's hands.
    */
  final case class IncrementalSpec(storeDir: String, pipelineId: String,
                                   sourceId: String, column: String,
                                   strategy: String)

  final case class Result(output: DataFrame,
                          dqReport: Option[DataFrame],
                          anomalies: Option[DataFrame])

  private val mapper = new ObjectMapper()
  private val knownKeys =
    Set("datasets", "pipeline", "quality", "anomaly", "sink", "incremental",
      "ingest")

  def parse(json: String): Spec = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "job config must be a JSON object")
    val unknown = root.properties().asScala.map(_.getKey).filterNot(knownKeys)
    require(unknown.isEmpty,
      s"job config has unknown top-level keys: ${unknown.mkString(", ")} " +
        s"(known: ${knownKeys.toSeq.sorted.mkString(", ")})")
    require(root.hasNonNull("datasets"), "job config needs \"datasets\"")
    require(root.hasNonNull("pipeline"), "job config needs \"pipeline\"")

    val datasets = Catalog.parseJson(json) // reads the "datasets" array
    val pipeline = PipelineJson.parse(mapper.writeValueAsString(root.get("pipeline")))

    val (rules, minScore, quarantine) = Option(root.get("quality")) match {
      case None => (Seq.empty[DQ.Rule], None, None)
      case Some(q) =>
        require(q.hasNonNull("rules"), "\"quality\" needs a \"rules\" array")
        // rulesFromJson reads the {"rules": [...]} shape — hand it the
        // quality object itself so the dialect stays defined there
        val r = DQ.rulesFromJson(mapper.writeValueAsString(q))
        val ms = Option(q.get("min_score")).map { n =>
          // Jackson's asDouble coerces junk to 0.0, which would
          // silently DISABLE the gate — a typo must fail loudly
          require(n.isNumber, "\"min_score\" must be a number")
          n.asDouble()
        }
        val quar = Option(q.get("quarantine_dir")).map { d =>
          require(d.isTextual, "\"quarantine_dir\" must be a string")
          // run_id must be EXPLICIT: quarantine slices are written
          // idempotently per run id, so a shared default would make
          // every later run silently REPLACE the previous run's
          // quarantined evidence before anyone reprocessed it
          require(q.hasNonNull("run_id") && q.get("run_id").isTextual,
            "\"quarantine_dir\" requires an explicit string \"run_id\" " +
              "(a reused id overwrites that run's quarantine slice)")
          (d.asText(), q.get("run_id").asText())
        }
        // the quarantine split needs per-row rules — reject the combo
        // at parse time, not deep in DQ.split mid-run
        quar.foreach { _ =>
          val aggOnly = r.filterNot(_.rowLevel).map(_.id)
          require(aggOnly.isEmpty, "quarantine_dir requires row-level " +
            s"rules only; aggregate-level: ${aggOnly.mkString(", ")}")
        }
        (r, ms, quar)
    }
    val anomaly = Option(root.get("anomaly")).map(mapper.writeValueAsString)
    val sink = Option(root.get("sink")).map { s =>
      def str(f: String, dflt: Option[String] = None): String =
        Option(s.get(f)).map(_.asText()).orElse(dflt).getOrElse(
          throw new IllegalArgumentException(s"\"sink\" needs \"$f\""))
      (str("format", Some("parquet")), str("path"),
        Option(s.get("mode")).map(_.asText()))
    }
    val incremental = Option(root.get("incremental")).map { n =>
      def str(f: String, dflt: Option[String] = None): String =
        Option(n.get(f)).filter(_.isTextual).map(_.asText()).orElse(dflt)
          .getOrElse(throw new IllegalArgumentException(
            s"\"incremental\" needs a string \"$f\""))
      val spec = IncrementalSpec(str("watermark_store"), str("pipeline_id"),
        str("source_id"), str("column"), str("strategy", Some("timestamp")))
      require(datasets.exists(_.name == spec.sourceId),
        s"incremental.source_id '${spec.sourceId}' is not a declared dataset")
      spec
    }
    val ingest = Option(root.get("ingest")).map { n =>
      require(n.isObject, "\"ingest\" must be an object (family, history, " +
        "id, column + per-family knobs — the screen-step dialect)")
      PipelineJson.parseScreenNode(n, what = "ingest")
    }
    Spec(datasets, pipeline, rules, minScore, quarantine, anomaly, sink,
      incremental, ingest)
  }

  /** Execute a parsed job. The pipeline's named sources are the
    * registered datasets (loaded through [[Catalog.load]], schema
    * pinned + validated when declared).
    */
  // streaming guard — file streams only; batch additionally accepts
  // jdbc connector datasets through loadBatchDataset
  private def requireFileDatasets(spec: Spec): Unit =
    spec.datasets.foreach(d => require(Catalog.connector(d).isEmpty,
      s"dataset '${d.name}': connector formats configure their reader " +
        "via Catalog.register; streaming jobs expect file datasets"))

  /** Batch dataset loader: file formats through [[Catalog.load]]
    * (schema pinned + validated), `jdbc` through its configured reader
    * — the warehouse-CDC face of the `incremental` section (ref
    * incremental_load_manager.py:118: source configs are database
    * tables). NoSQL readers need external systems a batch run can't
    * pre-flight, so they stay register-only.
    */
  private def loadBatchDataset(spark: SparkSession,
                               d: Catalog.DatasetSpec): DataFrame =
    Catalog.connector(d) match {
      case None             => Catalog.load(spark, d)
      case Some(Left(jdbc)) => jdbc.reader(spark).load()
      case Some(Right(_))   => throw new IllegalArgumentException(
        s"dataset '${d.name}': NoSQL connector datasets configure their " +
          "reader via Catalog.register; Job batch runs accept file and " +
          "jdbc datasets")
    }

  def run(spark: SparkSession, spec: Spec): Result = {
    require(spec.ingest.isEmpty,
      "batch job does not support the \"ingest\" section: ingest APPENDS " +
        "survivors' signatures to the history under the streaming " +
        "checkpoint's batch-id replay contract, which a batch run does not " +
        "have — use runStream, or the PURE \"screen\" pipeline step for a " +
        "batch-side screen with no history append")
    val loaded = spec.datasets.map { d =>
      d.name -> loadBatchDataset(spark, d)
    }.toMap
    // incremental resume: the named dataset is cut to rows past the
    // LEDGER's watermark (first run = no watermark = full extract) —
    // afterWatermark's pushed-down range filter, driven by stored
    // state instead of caller state. On a jdbc dataset the filter
    // lands in the database's WHERE clause (only the delta crosses
    // the wire), and the delta batch is PINNED with persist: unlike a
    // file scan, whose listing Spark pins at plan time, a live table
    // re-queried later could include rows that committed mid-run —
    // the advance aggregate below must see exactly the rows the
    // pipeline consumed (the reference holds the batch in memory for
    // the same reason). A delta batch is bounded by change volume,
    // not corpus size, so caching it is the scale-safe choice.
    val sources = spec.incremental.fold(loaded) { inc =>
      val wm = graft.incremental.WatermarkStore.last(spark, inc.storeDir,
        inc.pipelineId, inc.sourceId, Some(inc.column))
      val cut = wm.fold(loaded(inc.sourceId))(w =>
        graft.incremental.Incremental.afterWatermark(
          loaded(inc.sourceId), inc.column, w.value))
      val isJdbc = spec.datasets.find(_.name == inc.sourceId)
        .exists(d => Catalog.connector(d).exists(_.isLeft))
      val pinned = if (!isJdbc) cut else { val p = cut.persist(); p.count(); p }
      loaded + (inc.sourceId -> pinned)
    }
    require(sources.contains(spec.pipeline.primary),
      s"pipeline primary '${spec.pipeline.primary}' is not a declared dataset")
    // the output frame is consumed by up to three downstream actions
    // (the DQ gate's fused agg, the quarantine/anomaly split, the
    // sink/caller) — persistIfSmall caches it at gate SFs so they do
    // not each re-run the whole pipeline; no-op past the small-frame
    // budget (nothing corpus-sized cached at 100 TB, consumers
    // re-derive map-side as before).
    // Consumer count is STATIC in the spec: with no dq rules,
    // quarantine, anomaly section or sink, the only consumer is the
    // caller — a cache there pays materialization for zero reuse
    // (r20 verdict: q_job_screen, the one touched path that regressed
    // in the driver bench, is exactly this single-consumer shape), so
    // the cache engages only when a second consumer exists.
    val pipelineOut = Pipeline.run(spark, sources, spec.pipeline)
    val multiConsumer = spec.dqRules.nonEmpty || spec.quarantine.isDefined ||
      spec.anomalyJson.isDefined || spec.sink.isDefined
    val out =
      if (multiConsumer) graft.GraftSession.persistIfSmall(pipelineOut)
      else pipelineOut

    // DQ gate on the OUTPUT frame (the reference's dq profile runs
    // post-transform). ONE fused-agg action evaluates the rules; the
    // gate decides from those collected results (no second pass) and
    // the same report frame is returned for the caller
    val dqReport = if (spec.dqRules.isEmpty) None else {
      val report = DQ.check(out, spec.dqRules)
      spec.minScore.foreach(ms => DQ.gateFromResults(report.collect(), ms))
      Some(report)
    }
    // quarantine mode: failing rows route to the per-run quarantine
    // slice and the job CONTINUES with the clean side (the
    // ErrorRecovery workflow, error_recovery.py:345, in config) —
    // orthogonal to min_score, which judges the WHOLE output first
    val result = spec.quarantine match {
      case None => out
      case Some((dir, runId)) =>
        val (clean, bad) = DQ.split(out, spec.dqRules)
        graft.Recovery.quarantine(bad, dir, runId)
        clean
    }
    val anomalies = spec.anomalyJson.map(a => Anomaly.fromJson(result, a))
    spec.sink.foreach { case (format, path, modeOpt) =>
      val mode = modeOpt.getOrElse("overwrite")
      if (mode == "atomic") graft.Recovery.idempotentWrite(result, path, format)
      else graft.sources.FileSink.write(result, format, path, mode)
    }
    // the ledger advances LAST, only on a fully successful run (gate
    // passed, sink written): a failed run never moves the watermark,
    // so its data re-extracts on the retry — and an EMPTY batch leaves
    // the ledger untouched (advanceFrom's contract). This re-evaluates
    // max(column) over the extraction frame — safe because the frame
    // is pinned: a file frame's LISTING was pinned when Catalog.load
    // built it (Spark's InMemoryFileIndex lists once at plan time;
    // files landing mid-run are invisible to THIS run and belong to
    // the next), and a jdbc delta batch was persisted above (rows
    // committing mid-run are invisible the same way), and cheap
    // because the aggregate prunes to the one watermark column with
    // the range filter still pushed — not a second pass over the
    // pipeline's working set
    spec.incremental.foreach { inc =>
      graft.incremental.WatermarkStore.advanceFrom(spark, inc.storeDir,
        inc.pipelineId, inc.sourceId, inc.column,
        sources(inc.sourceId), inc.strategy)
      // release the pinned jdbc delta batch (no-op for file frames)
      sources(inc.sourceId).unpersist(blocking = false)
    }
    Result(result, dqReport, anomalies)
  }

  def runJson(spark: SparkSession, json: String): Result =
    run(spark, parse(json))

  /** The SAME one-document job driven by a STREAMING primary: new
    * files under the primary dataset's path become micro-batches, and
    * each batch runs through the identical sections — the batch
    * [[Pipeline.run]] with the static datasets joined in
    * (stream-static join), the quarantine split, and the sink — so
    * config written for the batch job replays unchanged as a stream. Exactly-once on BOTH outputs:
    * clean rows land as `batch_id=N` atomic-swap slices under the
    * sink path, quarantined rows under
    * `<quarantine_dir>/run_id=<id>/batch_id=N` — a checkpoint replay
    * REPLACES its own slices instead of double-appending. Read the
    * accumulated output back with [[streamedOutput]].
    *
    * Supported steps are the row-local + stream-static-join subset
    * (filter/select/rename/convert/join/sql_expr …): exactly the ones
    * for which per-micro-batch execution equals the batch job on the
    * replayed union. Aggregation/window/sql steps are rejected loudly
    * — per-batch aggregates would silently DIFFER from the batch
    * result; stream aggregation belongs to
    * [[graft.streaming.Streams.windowedAgg]] and friends. The
    * `anomaly` section is batch-scoped (its baselines need the whole
    * frame) and likewise rejected — as is `min_score`: the gate's
    * percentage thresholds and aggregate score are not
    * batching-invariant (each micro-batch could pass while the union
    * fails, or vice versa, with earlier batches' output already
    * committed), so gate [[streamedOutput]] with
    * [[graft.quality.DQ.check]] + gateFromResults instead. The sink's
    * `mode` must be `"atomic"` or absent: this runner always writes
    * `batch_id=N` atomic-swap slices, so an explicit `append`/
    * `overwrite` mode would replay with silently different semantics.
    *
    * With an `ingest` section (r20 — the last reference surface that
    * was library-only: the crawl screen+append loop as a stored
    * document), each micro-batch additionally runs the declared
    * ingest-screen family between the quarantine split and the sink:
    * the (transformed, clean) rows screen against the signature
    * history at `history`, survivors land in the sink slice, and the
    * survivors' SIGNATURES append as this batch's history slice —
    * [[graft.streaming.Streams.ingestScreenStreamBatchAware]]'s
    * replay-exclusion/atomic-append contract, with the family + knobs
    * resolved through the SAME dispatch as the batch `screen` step
    * ([[Pipeline.screenFns]]), so a document's knobs mean the same
    * thing on both paths and match the hand-written wrappers
    * (spec-pinned parity). The section's `id`/`column` must exist on
    * the TRANSFORMED rows (the steps run first). Quarantined rows
    * never reach the history — a failing row was not ingested. The
    * semantic family loads the quantizer once at stream start and is
    * version-checked by construction (the r19 handshake); `history`
    * is bound to ONE checkpoint lineage exactly like the wrappers.
    */
  def runStream(spark: SparkSession, spec: Spec, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val (sinkFormat, sinkPath, sinkMode) = spec.sink.getOrElse(
      throw new IllegalArgumentException(
        "streaming job needs a \"sink\" (clean rows land there as batch_id slices)"))
    sinkMode.filterNot(_ == "atomic").foreach(m =>
      throw new IllegalArgumentException(
        s"""streaming job writes batch_id=N atomic-swap slices; sink mode "$m" """ +
          "would replay with different semantics — use \"atomic\" or omit \"mode\""))
    require(spec.anomalyJson.isEmpty,
      "streaming job does not support the \"anomaly\" section (its baselines " +
        "are whole-frame); run Anomaly.fromJson over the accumulated sink instead")
    require(spec.minScore.isEmpty,
      "streaming job does not support \"min_score\": the gate judges the WHOLE " +
        "output and is not batching-invariant per micro-batch (earlier batches " +
        "are already committed when a later batch fails) — gate streamedOutput " +
        "with DQ.check + DQ.gateFromResults instead")
    require(spec.incremental.isEmpty,
      "streaming job does not support the \"incremental\" section: the file " +
        "stream's checkpoint IS the resume state (new files become " +
        "micro-batches); the watermark ledger belongs to batch runs")
    val unsupported = spec.pipeline.steps.collect {
      case _: Pipeline.Aggregate => "aggregate"
      case _: Pipeline.Pivot => "pivot"
      case _: Pipeline.Rank => "rank"
      case _: Pipeline.Lag => "lag"
      case _: Pipeline.RunningTotal => "running_total"
      case _: Pipeline.Rolling => "rolling"
      case _: Pipeline.SqlTransform => "sqltransform"
      // the batch screen step is PURE (no history append, no replay
      // exclusion); running it per micro-batch would silently skip the
      // ingest contract — the streaming screens own that machinery
      case _: Pipeline.Screen => "screen"
    }
    require(unsupported.isEmpty,
      "streaming job supports row-local and stream-static-join steps only " +
        s"(got: ${unsupported.distinct.mkString(", ")}) — per-micro-batch " +
        "aggregation/window results differ from the batch job; use " +
        "Streams.windowedAgg/sessionWindowAgg for stream aggregation, and " +
        "Streams.*ScreenStream for streaming ingest screens (they own the " +
        "history-append + replay-exclusion contract the batch screen step " +
        "deliberately lacks)")
    val primarySpec = spec.datasets.find(_.name == spec.pipeline.primary)
      .getOrElse(throw new IllegalArgumentException(
        s"pipeline primary '${spec.pipeline.primary}' is not a declared dataset"))
    requireFileDatasets(spec)
    val statics = spec.datasets.filterNot(_.name == spec.pipeline.primary)
      .map(d => d.name -> Catalog.load(spark, d)).toMap
    // schema pin for the stream: the SAME Catalog.load path as batch
    // (declared DDL validated against the files), so batch and stream
    // cannot drift on the primary's shape
    val schema = Catalog.load(spark, primarySpec).schema
    val stream = graft.streaming.Streams.fileStream(spark,
      primarySpec.format, primarySpec.path, schema, primarySpec.options)
    spec.ingest match {
      case None =>
        stream.writeStream
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                           batchId: Long) =>
            val out = Pipeline.run(spark,
              statics + (spec.pipeline.primary -> batch.toDF()), spec.pipeline)
            val result = spec.quarantine match {
              case None => out
              case Some((dir, runId)) =>
                val (clean, bad) = DQ.split(out, spec.dqRules)
                graft.Recovery.idempotentWrite(bad,
                  s"$dir/run_id=$runId/batch_id=$batchId")
                clean
            }
            graft.Recovery.idempotentWrite(result,
              s"$sinkPath/batch_id=$batchId", sinkFormat)
            ()
          }
          .start()
      case Some(scr) =>
        // the ingest loop: the (row-local + stream-static-join) steps
        // compose directly ON the stream — every supported step is
        // batching-invariant, so per-micro-batch rows are exactly the
        // batch pipeline's rows — then the generic screen core owns
        // the per-batch machinery: history read EXCLUDING this batch
        // id (replay safety), quarantine split, screen, survivor
        // signatures appended via the atomic swap, survivors to the
        // sink slice. Family + knobs resolve through the SAME dispatch
        // as the batch screen step; the semantic quantizer (and its
        // handshake version) loads ONCE here, at stream start.
        val transformed = Pipeline.run(spark,
          statics + (spec.pipeline.primary -> stream), spec.pipeline)
        val (signatures, screen) = Pipeline.screenFns(spark, scr)
        graft.streaming.Streams.ingestScreenStreamBatchAware(
          transformed, scr.historyRoot, checkpointDir)(signatures)(
          (batch, history, batchId) => {
            // quarantine BEFORE the screen: a row that fails quality
            // was never ingested, so it must not enter the history
            val cleaned = spec.quarantine match {
              case None => batch
              case Some((dir, runId)) =>
                val (clean, bad) = DQ.split(batch, spec.dqRules)
                graft.Recovery.idempotentWrite(bad,
                  s"$dir/run_id=$runId/batch_id=$batchId")
                clean
            }
            screen(cleaned, history)
          })(
          (survivors, batchId) => {
            graft.Recovery.idempotentWrite(survivors,
              s"$sinkPath/batch_id=$batchId", sinkFormat)
            ()
          })
    }
  }

  def runStreamJson(spark: SparkSession, json: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    runStream(spark, parse(json), checkpointDir)

  /** Everything a streaming job has emitted so far (healed
    * `batch_id=N` slices under the sink path).
    */
  def streamedOutput(spark: SparkSession, sinkPath: String): DataFrame =
    graft.streaming.Streams.batchSlices(spark, sinkPath, "stream-sink")

  /** [[run]] with the monitoring loop closed: a
    * [[graft.monitoring.Metrics.Recorder]] captures every action the
    * job fires (gate agg, sink write, anomaly count …) and the
    * captured metrics land in the [[graft.monitoring.RunHistory]]
    * dataset under `runId` — so a scheduled job feeds the same
    * trend/regression/SLA queries ([[graft.monitoring.Trends]]) as
    * the reference's performance monitor, with zero bookkeeping in
    * the job itself. The recorder is detached even when the job
    * throws; a gate failure still records its actions (failed runs
    * are what the SLA queries exist for).
    */
  def runWithHistory(spark: SparkSession, json: String, historyDir: String,
                     runId: String): Result = {
    val recorder = graft.monitoring.Metrics.attach(spark)
    val started = System.nanoTime()
    var jobError: Throwable = null
    try run(spark, parse(json))
    catch { case e: Throwable => jobError = e; throw e }
    finally {
      // the bookkeeping below must never REPLACE the job's own
      // failure: a history-write error on a failed run attaches as
      // suppressed context instead of masking the cause
      try {
        val wallMs = (System.nanoTime() - started) / 1000000L
        // QueryExecutionListener delivery is asynchronous: give the
        // bus a bounded quiesce window (stop when the snapshot stops
        // growing). Per-action capture is best-effort; the top-level
        // "job" entry below is recorded unconditionally either way.
        try {
          val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
          var last = -1
          var cur = recorder.snapshot().size
          while (cur != last && System.nanoTime() < deadline) {
            last = cur; Thread.sleep(100); cur = recorder.snapshot().size
          }
          // an interrupted quiesce must STILL detach the listener —
          // a leaked recorder grows its snapshot for the session's life
        } finally spark.listenerManager.unregister(recorder)
        val entries = graft.monitoring.RunHistory.Entry(
          "job", wallMs, failed = jobError != null) +:
          graft.monitoring.RunHistory.fromActions(recorder.snapshot())
        graft.monitoring.RunHistory.append(spark, historyDir, runId, entries)
      } catch {
        // InterruptedException is not NonFatal but must not mask the
        // job's own failure either — suppress it too (restoring the
        // interrupt flag); truly fatal errors still propagate
        case he@(scala.util.control.NonFatal(_) | _: InterruptedException) =>
          if (he.isInstanceOf[InterruptedException])
            Thread.currentThread().interrupt()
          if (jobError != null) jobError.addSuppressed(he) else throw he
      }
    }
  }
}
