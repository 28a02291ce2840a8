package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, substring}

import graft.operators.Ops
import graft.pipeline.Pipeline
import graft.sources.{FileSink, FileSource}

/** Pipeline-runner + connector query pack: q_pipeline (config-declared
  * step list → plan, ref transform_engine.py:49-118) and file-format
  * roundtrips through FileSink/FileSource (ref file_connector.py).
  */
object QueriesPipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_pipeline" -> ((s, dir) => {
      val sources = Map(
        "lineitem" -> t(s, dir, "lineitem"),
        "orders" -> Ops.renameColumns(t(s, dir, "orders"), Map("o_orderkey" -> "l_orderkey")))
      Pipeline.run(s, sources, Pipeline.Spec("lineitem", Seq(
        Pipeline.DateRange("l_shipdate", "1995-01-01", "1995-12-31"),
        Pipeline.Join("orders", Seq("l_orderkey"), "inner", broadcastRight = true),
        Pipeline.Aggregate(Seq("o_orderpriority"), Seq(
          ("l_quantity", "sum_money", "sum_qty"),
          ("l_orderkey", "count", "n"))))))
    }),

    // JSON-config pipeline exercising the sql_expr step (the reference's
    // custom-UDF slot, ref transform_engine.py:262, expressed as a
    // declarative codegen'd expression instead of compiled code strings)
    "q_pipeline_expr" -> ((s, dir) => {
      val json =
        """{"primary": "lineitem", "steps": [
          |  {"type": "filter", "column": "l_quantity", "op": ">", "value": 30},
          |  {"type": "sql_expr", "name": "net",
          |   "expr": "CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))"},
          |  {"type": "aggregate", "groupBy": ["l_returnflag"],
          |   "aggs": [{"col": "net", "fn": "sum", "as": "sum_net"},
          |            {"col": "net", "fn": "count", "as": "n"}]},
          |  {"type": "sql_expr", "name": "sum_net", "expr": "CAST(sum_net AS DOUBLE)"}
          |]}""".stripMargin
      Pipeline.run(s, Map("lineitem" -> t(s, dir, "lineitem")),
        graft.pipeline.PipelineJson.parse(json))
    }),

    // metadata-driven end-to-end: a catalog config document names the
    // datasets (schema pinned + validated on load), a SQL transform
    // runs over the registered views — config in, optimized plan out
    "q_catalog" -> ((s, dir) => {
      val json =
        s"""{"datasets": [
           |  {"name": "cat_orders", "format": "parquet",
           |   "path": "$dir/orders.parquet",
           |   "schema": "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"},
           |  {"name": "cat_customer", "format": "parquet",
           |   "path": "$dir/customer.parquet"}
           |]}""".stripMargin
      Catalog.registerJson(s, json)
      Ops.sqlTransform(s,
        """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
          |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM cat_orders JOIN cat_customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)
    }),

    // versioned schema migration applied to the data frame — ref
    // schema_manager.py:224 apply_migration (rename + derived column +
    // type tighten + drop, one narrow projection)
    "q_schema_migrate" -> ((s, dir) => {
      import graft.Schemas._
      applyMigration(
        t(s, dir, "orders").select(
          "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
        Migration("v2", "analytics-facing orders layout", Seq(
          RenameColumn("o_totalprice", "price"),
          AddColumn("priority_code", substring(col("o_orderpriority"), 1, 1)),
          CastColumn("o_custkey", org.apache.spark.sql.types.StringType),
          DropColumn("o_orderpriority"))))
    }),

    // csv write → read roundtrip (schema pinned, no inference scan)
    "q_src_csv" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_csv_nation"
      FileSink.write(n, "csv", path, options = Map("header" -> "true"))
      FileSource.read(s, "csv", path, Some(n.schema), Map("header" -> "true"))
    }),

    // json write → read roundtrip
    "q_src_json" -> ((s, dir) => {
      val r = t(s, dir, "region")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_json_region"
      FileSink.write(r, "json", path)
      FileSource.read(s, "json", path, Some(r.schema))
    }),

    // xlsx write → read roundtrip through the bundled native Excel
    // part-writer/parser — closes ref file_connector.py:109's Excel
    // branch without the external spark-excel jar (zero egress)
    "q_src_excel" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_xlsx_nation"
      FileSink.write(n, "excel", path)
      FileSource.read(s, "excel", path, Some(n.schema))
    }),

    // MULTI-SHEET xlsx roundtrip — ref file_connector.py:118's
    // sheet_name branch: two tables into one workbook, read back by
    // sheet name (incl. a timestamp column through the date-serial
    // style path)
    "q_src_excel_sheets" -> ((s, dir) => {
      val o = t(s, dir, "orders").limit(200)
      val r = t(s, dir, "region")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_xlsx_multi_q"
      val file = s"$path/book.xlsx"
      new java.io.File(path).mkdirs()
      graft.sources.Excel.writeSheets(Seq("orders" -> o, "region" -> r), file)
      graft.sources.Excel.read(s, path, Some(r.schema), sheet = Some("region"))
    }),

    // xml write → read roundtrip (Spark 4 native XML datasource;
    // closes ref file_connector.py:109's XML branch)
    "q_src_xml" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_xml_supplier"
      FileSink.write(sup, "xml", path)
      FileSource.read(s, "xml", path, Some(sup.schema))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q_catalog" ->
      """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderstatus""".stripMargin,

    "q_pipeline" ->
      """SELECT o_orderpriority,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |COUNT(l_orderkey) AS n
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <= TIMESTAMP '1995-12-31 00:00:00'
        |GROUP BY o_orderpriority""".stripMargin,

    "q_pipeline_expr" ->
      """SELECT l_returnflag,
        |CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_net,
        |COUNT(*) AS n
        |FROM lineitem WHERE l_quantity > 30
        |GROUP BY l_returnflag""".stripMargin,

    "q_schema_migrate" ->
      """SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS o_custkey, o_orderstatus,
        |o_totalprice AS price, substring(o_orderpriority, 1, 1) AS priority_code
        |FROM orders""".stripMargin,

    "q_src_csv" -> "SELECT * FROM nation",
    "q_src_excel" -> "SELECT * FROM nation",
    "q_src_excel_sheets" -> "SELECT * FROM region",
    "q_src_json" -> "SELECT * FROM region",
    "q_src_xml" -> "SELECT * FROM supplier"
  )
}
