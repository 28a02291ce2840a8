package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON front-end for [[Pipeline]] — the reference's pipelines arrive
  * as config documents (`transform_config` dicts with a `steps` list,
  * ref src/transform/transform_engine.py:49-66); this parses the same
  * shape into [[Pipeline.Spec]]:
  *
  * {{{
  * {"primary": "lineitem", "steps": [
  *   {"type": "filter", "column": "l_quantity", "op": ">", "value": 45},
  *   {"type": "join", "right": "orders", "on": ["l_orderkey"], "how": "inner", "broadcast": true},
  *   {"type": "aggregate", "groupBy": ["o_orderpriority"],
  *    "aggs": [{"col": "l_quantity", "fn": "sum_money", "as": "qty"}]}
  * ]}
  * }}}
  *
  * Only declarative steps are expressible in JSON (no arbitrary
  * Column expressions or SQL injection-prone strings beyond
  * `sqltransform`, mirroring the reference's surface).
  */
object PipelineJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): Pipeline.Spec = {
    val root = mapper.readTree(json)
    val steps = root.get("steps").elements().asScala.map(parseStep).toSeq
    Pipeline.Spec(root.get("primary").asText(), steps)
  }

  private def strings(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private def anyValue(n: JsonNode): Any =
    if (n.isNumber) n.asDouble() else if (n.isBoolean) n.asBoolean() else n.asText()

  private def parseStep(s: JsonNode): Pipeline.Step = {
    def str(f: String): String = s.get(f).asText()
    def opt(f: String): Option[JsonNode] = Option(s.get(f))
    str("type").toLowerCase match {
      case "filter" =>
        Pipeline.Filter(str("column"), str("op"), anyValue(s.get("value")))
      case "daterange" =>
        Pipeline.DateRange(str("column"), str("start"), str("end"))
      case "rename" | "map" =>
        Pipeline.Rename(s.get("mapping").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
      case "drop" =>
        Pipeline.Drop(strings(s.get("columns")))
      case "select" =>
        Pipeline.Select(strings(s.get("columns")))
      case "typeconversion" | "convert" =>
        Pipeline.Convert(s.get("typeMapping").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
      case "join" =>
        Pipeline.Join(str("right"), strings(s.get("on")),
          opt("how").map(_.asText()).getOrElse("inner"),
          opt("broadcast").exists(_.asBoolean()))
      case "aggregate" =>
        Pipeline.Aggregate(strings(s.get("groupBy")),
          s.get("aggs").elements().asScala.map(a =>
            (a.get("col").asText(), a.get("fn").asText(), a.get("as").asText())).toSeq)
      case "sqltransform" =>
        Pipeline.SqlTransform(str("sql"))
      case "sql_expr" | "withcolumn" =>
        // ref transform_engine.py:262 execute_custom_udf: the reference
        // compiles a Python code string per row; the Spark answer is a
        // declarative SQL expression -> native codegen'd Column
        Pipeline.WithColumn(str("name"),
          org.apache.spark.sql.functions.expr(str("expr")))
      case "screen" =>
        // r19: the ingest-screen family as a declared step — family,
        // history root, id + content columns; knobs optional per family
        // (threshold for minhash/semantic, max_hamming for
        // simhash/image/audio, index + nprobe for semantic)
        parseScreenNode(s, what = "screen")
      case other =>
        throw new IllegalArgumentException(s"Unsupported step type: $other")
    }
  }

  /** Parse a screen-shaped config object into [[Pipeline.Screen]] —
    * ONE dialect for the batch `screen` step and the streaming
    * `ingest` section ([[Job]]), so the same knobs mean the same
    * thing on both paths. `what` labels error messages with the
    * section being parsed.
    */
  private[pipeline] def parseScreenNode(s: JsonNode, what: String): Pipeline.Screen = {
    def str(f: String): String = Option(s.get(f))
      .filter(n => n.isTextual)
      .map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        s"""$what needs a string "$f""""))
    def opt(f: String): Option[JsonNode] = Option(s.get(f))
    val family = str("family").toLowerCase
    val known = Set("exact", "minhash", "simhash", "image", "audio",
      "semantic")
    require(known(family),
      s"$what family '$family' unknown (${known.toSeq.sorted.mkString(" | ")})")
    val index = opt("index").map(_.asText())
    require(family != "semantic" || index.isDefined,
      s"$what family 'semantic' needs \"index\" (the persisted quantizer dir)")
    def num(f: String): Option[JsonNode] = opt(f).map { n =>
      require(n.isNumber, s"$what \"$f\" must be a number"); n
    }
    Pipeline.Screen(family, str("history"), str("id"), str("column"),
      num("threshold").map(_.asDouble()),
      num("max_hamming").map(_.asInt()), index,
      num("nprobe").map(_.asInt()).getOrElse(1),
      // signature-shape knobs — must match how the history was
      // built (declared, so a stored document carries them)
      num("ngram_n").map(_.asInt()),
      num("num_hashes").map(_.asInt()),
      num("bands").map(_.asInt()),
      opt("algo").map(_.asText()))
  }
}
