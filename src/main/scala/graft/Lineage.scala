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

  /** Column-level derivation lineage: each output column → the set of
    * "source.column" leaves it is computed FROM (transitively through
    * aliases, aggregates, windows and generators — the reference's
    * hand-reported `column_derivations` table, derived from the tree
    * instead). Union branches merge positionally; a column of
    * literals maps to the empty set.
    */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Union}

    def walk(p: LogicalPlan): Map[ExprId, Set[String]] = p match {
      case leaf: LeafNode =>
        val n = leafName(leaf)
        leaf.output.map(a => a.exprId -> Set(s"$n.${a.name}")).toMap
      case u: Union =>
        val childMaps = u.children.map(walk)
        val merged = u.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> u.children.zip(childMaps).map { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[String])
          }.reduce(_ ++ _)
        }.toMap
        childMaps.fold(Map.empty)(_ ++ _) ++ merged
      case node =>
        val below = node.children.map(walk).fold(Map.empty)(_ ++ _)
        def deps(refs: Iterable[Attribute]): Set[String] =
          refs.flatMap(r => below.getOrElse(r.exprId, Set.empty[String])).toSet
        // any Alias anywhere in this node's expressions mints a new
        // exprId whose provenance is its references' provenance
        val minted = node.expressions.flatMap(_.collect {
          case a: Alias => a.exprId -> deps(a.references.toSeq)
        }).toMap
        // generators (explode & co.) mint output attrs without aliases
        val generated = node match {
          case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
            g.generatorOutput.map(a => a.exprId -> deps(g.generator.references.toSeq)).toMap
          case _ => Map.empty[ExprId, Set[String]]
        }
        below ++ minted ++ generated
    }

    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** Upstream dependencies of one output column — ref
    * data_lineage_tracker.py get_upstream_dependencies /
    * get_column_lineage: the source columns it derives from.
    */
  def upstream(df: DataFrame, outputCol: String): Set[String] =
    columnLineage(df).getOrElse(outputCol,
      throw new IllegalArgumentException(
        s"'$outputCol' is not an output column of this frame"))

  /** Impact analysis — ref analyze_impact / get_downstream_dependencies
    * inverted from the same tree: which OUTPUT columns would a change
    * to `sourceCol` (a "source.column" leaf, or a bare column name
    * matching any leaf) touch.
    */
  def impact(df: DataFrame, sourceCol: String): Set[String] =
    columnLineage(df).collect {
      case (out, srcs) if srcs.contains(sourceCol) ||
        srcs.exists(_.endsWith("." + sourceCol)) => out
    }.toSet

  /** Column-level lineage as an EDGE-LIST DataFrame — ref
    * data_lineage_tracker.py:295 generate_lineage_graph's edges,
    * derived from [[columnLineage]] instead of self-reported
    * LINEAGE_STEPS rows: one row per (source table, source column) →
    * (target, output column) derivation. A frame, so governance
    * exports are catalog-able datasets like anything else (write it,
    * register it, query it — "what feeds column X" is a filter).
    * Output: (source, source_column, target, target_column), sorted
    * for determinism. Plan metadata, bounded by #outputs × #sources —
    * driver-side by design. The split point is the LAST '.' of the
    * "source.column" leaf (source names may contain dots — file
    * paths; column names with dots are not supported here).
    */
  def edges(df: DataFrame, target: String = "output"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = columnLineage(df).toSeq.flatMap { case (out, srcs) =>
      srcs.toSeq.map { s =>
        val i = s.lastIndexOf('.')
        (s.substring(0, i), s.substring(i + 1), target, out)
      }
    }.sorted
    rows.toDF("source", "source_column", "target", "target_column")
  }

  /** Governance-ready lineage graph document — ref
    * data_lineage_tracker.py:530 export_lineage_for_governance: the
    * node/edge structure serialized for a data catalog. Formats:
    *  - `json`: the reference's `data_catalog_v1` shape
    *    (pipeline_id, nodes, edges)
    *  - `alation`: wrapped under `dataflow`
    *  - `collibra`: nodes as `assets`, edges as `relations`
    * Nodes are the distinct source tables (type `source`) plus the
    * target (type `target`); edges are [[edges]]'s rows. Everything
    * sorted, no wall-clock — the same plan exports the same document.
    */
  def graphDoc(df: DataFrame, pipelineId: String,
               format: String = "json", target: String = "output"): String = {
    val edgeRows = edges(df, target).collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val sources = edgeRows.map(_._1).distinct.sorted
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val nodes =
      sources.map(s =>
        s"""{"id": ${js(s)}, "label": ${js(s)}, "type": "source"}""") :+
        s"""{"id": ${js(target)}, "label": ${js(target)}, "type": "target"}"""
    val edgesJson = edgeRows.map { case (s, sc, t, tc) =>
      s"""{"from": ${js(s)}, "from_column": ${js(sc)}, """ +
        s""""to": ${js(t)}, "to_column": ${js(tc)}}"""
    }
    val nodesArr = nodes.mkString("[", ", ", "]")
    val edgesArr = edgesJson.mkString("[", ", ", "]")
    format match {
      case "json" =>
        s"""{"pipeline_id": ${js(pipelineId)}, "format": "data_catalog_v1", """ +
          s""""nodes": $nodesArr, "edges": $edgesArr}"""
      case "alation" =>
        s"""{"dataflow": {"id": ${js(pipelineId)}, """ +
          s""""name": ${js(s"ETL Pipeline $pipelineId")}, """ +
          s""""nodes": $nodesArr, "edges": $edgesArr}}"""
      case "collibra" =>
        s"""{"assets": $nodesArr, "relations": $edgesArr}"""
      case other =>
        throw new IllegalArgumentException(
          s"unsupported export format: $other (json|alation|collibra)")
    }
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
