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
  def stringArray(node: JsonNode, field: String, ctx: String): Seq[String] = {
    require(node.has(field) && node.get(field).isArray &&
      node.get(field).size() > 0,
      s"$ctx: '$field' must be a non-empty array")
    node.get(field).elements().asScala.zipWithIndex.map { case (e, i) =>
      // scalars are fine (asText renders numbers/booleans faithfully —
      // configs legitimately write [1, 2, 3]); containers and nulls
      // are the shapes that silently coerce to garbage
      require(e.isValueNode && !e.isNull,
        s"$ctx: '$field'[$i] must be a scalar, got $e")
      e.asText()
    }.toSeq
  }
}
