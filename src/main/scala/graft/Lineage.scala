package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation

/** Data lineage from the analyzed LogicalPlan: the Spark-native
  * re-expression of the reference's `DataLineageTracker`
  * (reference: src/utils/data_lineage_tracker.py:92-397).
  *
  * The reference asks pipeline authors to self-report source→target
  * and column derivations into tracking tables; on Spark the analyzed
  * plan IS the lineage — sources, referenced columns, and output
  * derivations are all in the tree, so tracking is derived, never
  * hand-maintained (and therefore never stale).
  */
object Lineage {

  final case class Info(sources: Seq[String], outputColumns: Seq[String],
                        sourceColumns: Map[String, Seq[String]])

  /** Extract lineage for a frame: every file/table source feeding it,
    * the frame's output columns, and per-source which of its columns
    * the plan actually references (column-level lineage at the
    * source boundary — what a scan-side audit needs).
    */
  def fromPlan(df: DataFrame): Info = {
    val plan = df.queryExecution.analyzed
    val leaves = plan.collectLeaves()

    // every attribute referenced by any expression anywhere in the plan
    val referenced = plan.collect { case p => p.expressions }
      .flatten.flatMap(_.references.toSeq).map(_.exprId).toSet

    val perLeaf = leaves.map { leaf =>
      val name = leafName(leaf)
      val used = leaf.output.filter(a => referenced.contains(a.exprId)).map(_.name)
      // a leaf none of whose columns are referenced still contributes
      // rows (e.g. SELECT literal FROM t) — report its presence
      name -> used.toSeq
    }

    Info(
      sources = perLeaf.map(_._1).distinct.toSeq,
      outputColumns = df.schema.fieldNames.toSeq,
      sourceColumns = perLeaf.groupBy(_._1)
        .map { case (n, xs) => n -> xs.flatMap(_._2).distinct.toSeq })
  }

  private def leafName(leaf: LogicalPlan): String = leaf match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.unquotedString).getOrElse(lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.mkString(",")
        case other => other.toString
      })
    case h: HiveTableRelation => h.tableMeta.identifier.unquotedString
    case other => other.nodeName
  }
}
