package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Metadata-driven dataset catalog — the reference wires its
  * connectors from metadata-DB rows (source configs consumed by the
  * src/connectors modules and dispatched by the orchestrator); graft's
  * equivalent is a declarative registry parsed from the same kind of
  * config document:
  *
  * {{{
  * {"datasets": [
  *   {"name": "orders", "format": "parquet", "path": "/data/orders",
  *    "schema": "o_orderkey BIGINT, o_totalprice DOUBLE"},
  *   {"name": "rates", "format": "csv", "path": "/data/rates.csv",
  *    "options": {"header": "true"}}
  * ]}
  * }}}
  *
  * `register` loads each dataset through [[sources.FileSource]]
  * (declared schema pins types and skips the inference scan — the
  * 100 TB requirement) and exposes it as a temp view, so catalog-named
  * datasets compose with [[pipeline.PipelineJson]] pipelines and
  * `Ops.sqlTransform` SQL: config in, optimized plan out, no code.
  * A declared `schema` is also VALIDATED against the loaded frame
  * (extra columns tolerated, missing/mistyped fail fast) — the
  * reference's schema_manager gate at the same place in the flow.
  */
object Catalog {

  final case class DatasetSpec(name: String, format: String, path: String,
                               options: Map[String, String] = Map.empty,
                               schemaDdl: Option[String] = None)

  private val mapper = new ObjectMapper()

  def parseJson(json: String): Seq[DatasetSpec] = {
    val root = mapper.readTree(json)
    val datasets = Option(root.get("datasets")).getOrElse(
      throw new IllegalArgumentException(
        "catalog config needs a top-level \"datasets\" array"))
    datasets.elements().asScala.map { d =>
      def opt(f: String): Option[JsonNode] = Option(d.get(f))
      def str(f: String): String = opt(f).map(_.asText()).getOrElse(
        throw new IllegalArgumentException(
          s"catalog dataset entry is missing required field \"$f\": $d"))
      DatasetSpec(
        str("name"),
        str("format"),
        str("path"),
        opt("options").map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
        opt("schema").map(_.asText()))
    }.toSeq
  }

  def schemaOf(spec: DatasetSpec): Option[StructType] =
    spec.schemaDdl.map(StructType.fromDDL)

  /** Formats that carry their own schema (readable from metadata, no
    * data scan) — only these can be VALIDATED against a declaration;
    * for csv/json/xml the declaration IS the schema (applied, not
    * checked: there is nothing intrinsic to check against without an
    * inference scan).
    */
  private def selfDescribing(format: String): Boolean =
    Set("parquet", "orc", "avro").contains(format.toLowerCase)

  /** Load one dataset. A declared schema on a self-describing format
    * is checked against the file's intrinsic schema FIRST (footer
    * metadata only — reading with the pinned schema would just echo
    * the declaration back, and a mismatch would otherwise surface as a
    * mid-job read error at first action). The data is then read with
    * the declared schema pinned.
    */
  def load(spark: SparkSession, spec: DatasetSpec): DataFrame = {
    val schema = schemaOf(spec)
    schema.filter(_ => selfDescribing(spec.format)).foreach { s =>
      val observed = sources.FileSource
        .read(spark, spec.format, spec.path, None, spec.options)
      val v = Schemas.validate(observed, s)
      require(v.passed,
        s"catalog dataset '${spec.name}' failed schema validation: " +
          s"missing=${v.missing.mkString(",")} mismatched=${v.typeMismatches.mkString(",")}")
    }
    sources.FileSource.read(spark, spec.format, spec.path, schema, spec.options)
  }

  /** Connector-backed catalog entries (format "jdbc" or a NoSQL kind)
    * resolve to the same config builders the connector layer exposes:
    * `path` carries the connection URI, `options` the rest. Returns
    * None for file formats. Testable without a live system — the
    * builder IS the configuration.
    */
  def connector(spec: DatasetSpec): Option[Either[sources.JdbcSource, sources.NoSqlSource]] = {
    def noSchema(): Unit = require(spec.schemaDdl.isEmpty,
      s"catalog dataset '${spec.name}': schema declarations apply to file " +
        "formats; connector sources derive their schema from the external system")
    spec.format.toLowerCase match {
      case "jdbc" =>
        noSchema()
        val o = spec.options
        val typedKeys = Set("dbtable", "user", "password", "partitionColumn",
          "lowerBound", "upperBound", "numPartitions", "fetchsize", "fetchSize")
        // a partition column without real bounds silently collapses the
        // read to ONE partition in Spark's JDBCRelation — fail fast
        o.get("partitionColumn").foreach { _ =>
          require(o.contains("lowerBound") && o.contains("upperBound") &&
            o("lowerBound").toLong < o("upperBound").toLong,
            s"catalog jdbc dataset '${spec.name}' sets partitionColumn but no " +
              "usable lowerBound/upperBound — the parallel read would silently " +
              "collapse to one partition")
        }
        Some(Left(sources.JdbcSource(
          url = spec.path,
          table = o.getOrElse("dbtable", throw new IllegalArgumentException(
            s"catalog jdbc dataset '${spec.name}' needs options.dbtable")),
          user = o.getOrElse("user", ""),
          password = o.getOrElse("password", ""),
          partitionColumn = o.get("partitionColumn"),
          lowerBound = o.getOrElse("lowerBound", "0").toLong,
          upperBound = o.getOrElse("upperBound", "0").toLong,
          numPartitions = o.getOrElse("numPartitions", "1").toInt,
          fetchSize = o.getOrElse("fetchsize",
            o.getOrElse("fetchSize", "10000")).toInt,
          // everything else (driver, sslmode, queryTimeout, ...) passes
          // through to the reader instead of being silently discarded
          extra = o -- typedKeys)))
      case k @ ("mongodb" | "cassandra" | "dynamodb") =>
        noSchema()
        Some(Right(sources.NoSqlSource(k,
          uri = spec.path,
          database = spec.options.getOrElse("database", ""),
          collection = spec.options.getOrElse("collection", ""),
          region = spec.options.getOrElse("region", ""))))
      case _ => None
    }
  }

  /** Register every catalog dataset as a temp view named `spec.name`.
    * Connector-backed entries `.load()` through their configured
    * readers — that step needs the driver jars on the classpath (the
    * [[sources.JdbcSource]] contract); file entries load immediately.
    */
  def register(spark: SparkSession, specs: Seq[DatasetSpec]): Unit =
    specs.foreach { spec =>
      val df = connector(spec) match {
        case Some(Left(jdbc))   => jdbc.reader(spark).load()
        case Some(Right(nosql)) => nosql.reader(spark).load()
        case None               => load(spark, spec)
      }
      df.createOrReplaceTempView(spec.name)
    }

  def registerJson(spark: SparkSession, json: String): Unit =
    register(spark, parseJson(json))
}
