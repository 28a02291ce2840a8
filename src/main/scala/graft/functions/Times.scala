package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Timestamp-type-agnostic time arithmetic.
  *
  * Event-time operators compare integer microseconds (exact, engine-
  * independent), but `unix_micros` and `withWatermark` require a
  * session-zoned TIMESTAMP and reject TIMESTAMP_NTZ outright. Input
  * frames can carry either type depending on how the parquet was
  * written (zoned vs naive micros) and which reader conf loaded it, so
  * every event-time operator routes through these helpers instead of
  * calling `unix_micros` on the raw column. With the engine's session
  * timezone pinned UTC, the NTZ→TIMESTAMP cast is value-preserving.
  */
object Times {

  /** Epoch microseconds of a timestamp column of EITHER type. The cast
    * is a no-op for an already-zoned column (Catalyst elides identity
    * casts), so this costs nothing in the common case and stays inside
    * whole-stage codegen either way.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Rewrite `tsCol` to session-zoned TIMESTAMP if (and only if) it is
    * NTZ — for operators that need the typed column itself, not its
    * micros: `withWatermark`, `window`, `session_window`.
    */
  def ensureTimestamp(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _                => df
    }
}
