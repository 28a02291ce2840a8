package graft.quality

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

/** Shared validation for the JSON config dialects
  * ([[DQ.rulesFromJson]], [[Anomaly.fromJson]]) — one definition of
  * "a non-empty array of strings", so every config front-end rejects
  * the same malformed shapes with the same loud message (a scalar
  * iterates as empty, a non-text element coerces to "" via Jackson's
  * asText — both used to slip past ad-hoc checks and die later with
  * an opaque downstream error).
  */
private[quality] object JsonCfg {
  /** Value lists (allowed_values): scalars are fine — asText renders
    * numbers/booleans faithfully, and configs legitimately write
    * `[1, 2, 3]`. Containers and nulls silently coerce to garbage.
    */
  def stringArray(node: JsonNode, field: String, ctx: String): Seq[String] =
    array(node, field, ctx) { (e, i) =>
      require(e.isValueNode && !e.isNull,
        s"$ctx: '$field'[$i] must be a scalar, got $e")
    }

  /** Identifier lists (column names): only strings are legitimate — a
    * numeric "column" is a config typo that would otherwise die later
    * as an unresolved-column analysis error.
    */
  def identifierArray(node: JsonNode, field: String, ctx: String): Seq[String] =
    array(node, field, ctx) { (e, i) =>
      require(e.isTextual,
        s"$ctx: '$field'[$i] must be a column-name string, got $e")
    }

  private def array(node: JsonNode, field: String, ctx: String)
                   (check: (JsonNode, Int) => Unit): Seq[String] = {
    require(node.has(field) && node.get(field).isArray &&
      node.get(field).size() > 0,
      s"$ctx: '$field' must be a non-empty array")
    node.get(field).elements().asScala.zipWithIndex.map { case (e, i) =>
      check(e, i); e.asText()
    }.toSeq
  }
}
