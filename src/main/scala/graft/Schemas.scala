package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StructField, StructType}

/** Schema validation & evolution diff: the Spark-native re-expression
  * of the reference's `SchemaManager.validate_schema`
  * (reference: src/utils/schema_manager.py:301-349, 557-600).
  * Pure metadata — no data scan, safe to run on any size table.
  */
object Schemas {

  final case class Mismatch(column: String, expected: String, actual: String)
  final case class Validation(missing: Seq[String], extra: Seq[String],
                              typeMismatches: Seq[Mismatch], passed: Boolean)

  /** Validate a frame against an expected schema. `strict` also fails
    * on extra columns (the reference's table-structure check flags
    * both missing and unexpected).
    */
  def validate(df: DataFrame, expected: StructType, strict: Boolean = false): Validation = {
    val actual = df.schema.fields.map(f => f.name -> f).toMap
    val expectedNames = expected.fields.map(_.name).toSet
    val missing = expected.fields.map(_.name).filterNot(actual.contains).toSeq
    val extra = df.schema.fields.map(_.name).filterNot(expectedNames.contains).toSeq
    val mismatches = expected.fields.toSeq.flatMap { ef =>
      actual.get(ef.name).collect {
        case af if af.dataType != ef.dataType =>
          Mismatch(ef.name, ef.dataType.simpleString, af.dataType.simpleString)
      }
    }
    val passed = missing.isEmpty && mismatches.isEmpty && (!strict || extra.isEmpty)
    Validation(missing, extra, mismatches, passed)
  }

  final case class Diff(added: Seq[StructField], removed: Seq[StructField],
                        changed: Seq[Mismatch])

  /** Evolution diff between two schema versions (old → new). */
  def diff(from: StructType, to: StructType): Diff = {
    val f = from.fields.map(x => x.name -> x).toMap
    val t = to.fields.map(x => x.name -> x).toMap
    Diff(
      added = to.fields.filterNot(x => f.contains(x.name)).toSeq,
      removed = from.fields.filterNot(x => t.contains(x.name)).toSeq,
      changed = from.fields.toSeq.flatMap(of => t.get(of.name).collect {
        case nf if nf.dataType != of.dataType =>
          Mismatch(of.name, of.dataType.simpleString, nf.dataType.simpleString)
      }))
  }

  /** Can a reader expecting `expected` consume data written as
    * `actual` without loss? (additive columns ok, type changes not)
    */
  def compatible(expected: StructType, actual: StructType): Boolean = {
    val v = diff(expected, actual)
    v.removed.isEmpty && v.changed.isEmpty
  }
}
