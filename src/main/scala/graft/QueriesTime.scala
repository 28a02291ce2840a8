package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops
import graft.functions.Det

/** Semi-structured + time-semantics query pack: JSON extraction,
  * gap-based sessionization, calendar-range rolling windows.
  */
object QueriesTime {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // JSON field extraction from the events.props payload column
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", Ops.jsonField(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    }),

    // 30-minute-gap sessionization per user
    "q_sessionize" -> ((s, dir) => {
      val sess = Ops.sessionize(t(s, dir, "events"), Seq("user_id"), "ts",
        Seq(col("ts").asc, col("event_id").asc), gapSeconds = 1800)
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"), Det.sumAt(col("value"), 6).as("sum_val"))
    }),

    // 7-CALENDAR-DAY rolling revenue (value-range frame, not row frame)
    "q_rolling_time" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
      Ops.rollingRange(daily, Seq.empty, col("day_num"), 6, "rev", "sum", "rev_7d")
        .select(col("day"), col("rev").cast("double").as("revenue"),
          col("rev_7d").cast("double").as("rev_7d"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q_sessionize" ->
      s"""WITH x AS (
         |  SELECT user_id, event_id, value, ts,
         |    CASE WHEN LAG(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT user_id, value,
         |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM x)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |${Det.sqlSumAt("value", 6)} AS sum_val
         |FROM s GROUP BY user_id, session_id""".stripMargin,

    "q_rolling_time" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day_num
        |  FROM lineitem GROUP BY 1, 3)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue,
        |CAST(SUM(rev) OVER (ORDER BY day_num
        |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
        |FROM daily""".stripMargin
  )
}
