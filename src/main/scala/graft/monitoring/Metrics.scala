package graft.monitoring

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Execution metrics, Spark-style: the reference's
  * `PerformanceMonitor` (reference: src/monitoring/
  * performance_monitor.py) samples wall-clock around engine calls and
  * writes rows to a metrics DB; on Spark the engine already measures
  * itself — a [[QueryExecutionListener]] receives every completed
  * action with its duration and the executed plan's own metrics
  * (rows, bytes, spill), so monitoring is observation, not
  * instrumentation.
  */
object Metrics {

  final case class ActionMetric(funcName: String, durationMs: Long,
                                outputRows: Option[Long], failed: Boolean,
                                planHash: Option[String] = None)

  /** Listener accumulating one record per completed action. */
  final class Recorder extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[ActionMetric]()

    private def outputRows(qe: QueryExecution): Option[Long] =
      qe.executedPlan.metrics.get("numOutputRows").map(_.value)

    // normalized fingerprint (exprIds/stage ids/paths/lambda identities
    // stripped), the same form the bench artifact records — so a
    // run-history row and a bench row for the same query are
    // comparable. sparkPlan, not executedPlan: the listener fires
    // post-action, when executedPlan is AQE's FINAL plan with
    // run-varying runtime choices; the static plan is the one that is
    // stable across runs of an unchanged query (r20 — the r19 media
    // plan-hash drift was exactly this)
    private def planHash(qe: QueryExecution): Option[String] =
      try Some(graft.Bench.planFingerprint(qe.sparkPlan.toString))
      catch { case scala.util.control.NonFatal(_) => None }

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      buf.add(ActionMetric(funcName, durationNs / 1000000L, outputRows(qe),
        failed = false, planHash(qe))); ()
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = {
      buf.add(ActionMetric(funcName, 0L, None, failed = true)); ()
    }

    def snapshot(): Seq[ActionMetric] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()
  }

  /** Attach a recorder to the session; returns it for inspection.
    * (Pair with `spark.listenerManager.unregister` when done.)
    */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }
}
