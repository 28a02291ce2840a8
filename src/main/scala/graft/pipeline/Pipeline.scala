package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators.Ops

/** Config-driven pipeline runner: the Spark-native re-expression of the
  * reference's `TransformEngine.execute_transformations` dispatch
  * (reference: src/transform/transform_engine.py:49-118).
  *
  * A pipeline is a declared list of [[Step]]s over named sources. Steps
  * only COMPOSE a logical plan — nothing executes until the caller
  * writes/collects, so Catalyst optimizes across step boundaries
  * (filters declared late still reach the scan; join order and
  * broadcast strategy stay Catalyst's call). The reference's
  * engine-selector (pandas/polars/dask) has no analog: Spark IS the
  * engine and AQE does the cost-based picking at runtime.
  */
object Pipeline {

  sealed trait Step
  /** ref transform_engine.py filter step */
  final case class Filter(column: String, op: String, value: Any) extends Step
  final case class FilterAll(conditions: Seq[(String, String, Any)]) extends Step
  final case class DateRange(column: String, start: String, end: String) extends Step
  /** ref map step (column rename) */
  final case class Rename(mapping: Map[String, String]) extends Step
  final case class Drop(columns: Seq[String]) extends Step
  final case class Select(columns: Seq[String]) extends Step
  /** ref typeconversion step */
  final case class Convert(typeMapping: Map[String, String]) extends Step
  /** ref join step: joins the named source into the current frame */
  final case class Join(rightSource: String, on: Seq[String],
                        how: String = "inner", broadcastRight: Boolean = false) extends Step
  /** ref aggregate step: (inputCol, fn, alias) */
  final case class Aggregate(groupBy: Seq[String], aggs: Seq[(String, String, String)]) extends Step
  final case class Pivot(index: Seq[String], pivotCol: String,
                         pivotValues: Seq[String], valueCol: String, fn: String) extends Step
  /** ref window step */
  final case class Rank(partitionBy: Seq[String], orderBy: Seq[String],
                        dense: Boolean = false, alias: String = "rank") extends Step
  final case class Lag(column: String, partitionBy: Seq[String], orderBy: Seq[String],
                       offset: Int = 1, alias: String = "") extends Step
  final case class RunningTotal(column: String, partitionBy: Seq[String],
                                orderBy: Seq[String], alias: String = "") extends Step
  final case class Rolling(partitionBy: Seq[String], orderBy: Seq[String], column: String,
                           window: Int, fn: String, alias: String) extends Step
  /** ref customudf slot — a native Column expression (codegen'd) */
  final case class WithColumn(name: String, expr: Column) extends Step
  /** ref sqltransform: current frame registered as `__pipe`, sources by name */
  final case class SqlTransform(sql: String) extends Step

  /** A declared pipeline: the primary input plus the step list. */
  final case class Spec(primary: String, steps: Seq[Step])

  /** Compose the pipeline's DataFrame plan from named sources. */
  def run(spark: SparkSession, sources: Map[String, DataFrame], spec: Spec): DataFrame = {
    import org.apache.spark.sql.functions.col
    spec.steps.foldLeft(sources(spec.primary)) { (df, step) =>
      step match {
        case Filter(c, op, v)       => Ops.filterBy(df, c, op, v)
        case FilterAll(cs)          => Ops.filterAll(df, cs)
        case DateRange(c, a, b)     => Ops.filterDateRange(df, c, a, b)
        case Rename(m)              => Ops.renameColumns(df, m)
        case Drop(cs)               => Ops.dropColumns(df, cs)
        case Select(cs)             => Ops.selectOrder(df, cs)
        case Convert(m)             => Ops.convertTypes(df, m)
        case Join(r, on, how, bc)   => Ops.join(df, sources(r), on, how, bc)
        case Aggregate(g, aggs)     => Ops.groupAgg(df, g, aggs)
        case Pivot(i, pc, pv, v, f) =>
          Ops.pivot(df, i, pc, pv, aggColumn(v, f))
        case Rank(p, o, d, a)       => Ops.rankWithin(df, p, o.map(orderCol), d, a)
        case Lag(c, p, o, off, a)   => Ops.lagLead(df, c, p, o.map(orderCol), off, a)
        case RunningTotal(c, p, o, a) => Ops.runningTotal(df, c, p, o.map(orderCol), a)
        case Rolling(p, o, c, w, f, a) => Ops.rolling(df, p, o.map(orderCol), c, w, f, a)
        case WithColumn(n, e)       => df.withColumn(n, e)
        case SqlTransform(sql)      =>
          df.createOrReplaceTempView("__pipe")
          sources.foreach { case (n, d) => d.createOrReplaceTempView(n) }
          spark.sql(sql)
      }
    }
  }

  private def aggColumn(c: String, f: String): Column = {
    import org.apache.spark.sql.functions._
    f.toLowerCase match {
      case "sum"          => sum(col(c))
      case "sum_money"    => graft.functions.Det.sumMoney(col(c))
      case "mean" | "avg" => avg(col(c))
      case "count"        => count(col(c))
      case "min"          => min(col(c))
      case "max"          => max(col(c))
      case other          => throw new IllegalArgumentException(s"Unsupported agg: $other")
    }
  }

  /** "colname desc" / "colname" order spec → Column. */
  private def orderCol(spec: String): Column = {
    import org.apache.spark.sql.functions.col
    val parts = spec.trim.split("\\s+")
    if (parts.length > 1 && parts(1).equalsIgnoreCase("desc")) col(parts(0)).desc
    else col(parts(0)).asc
  }

  /** Audit counts — ref transform_engine.py log_transformation. Runs
    * the plan ONCE for the output count; input counts come from the
    * (cheap, metadata-served) source counts. Use only where the audit
    * is worth an action.
    */
  final case class RunStats(rowsIn: Map[String, Long], rowsOut: Long)
  def runWithStats(spark: SparkSession, sources: Map[String, DataFrame],
                   spec: Spec): (DataFrame, RunStats) = {
    val out = run(spark, sources, spec)
    (out, RunStats(sources.map { case (n, d) => n -> d.count() }, out.count()))
  }
}
