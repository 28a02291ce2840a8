package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Deterministic `dim`-float feature vector from a binary blob — the
  * codegen'd stand-in for a real media encoder (this container ships
  * no codecs; see [[graft.multimodal.Media]]). Math is the rolling
  * 31-multiplier byte hash fanned out through `dim` xor-mixed lanes,
  * identical to the previous RDD stub, but as a native expression the
  * multimodal pipeline stays inside whole-stage codegen end-to-end —
  * no RDD scan node, no Row boxing, and column pruning/pushdown still
  * reach the source scan. A real encoder would NOT fit an expression
  * (per-partition model/codec init, batched inference) — that
  * swap-in is a `mapInPandas`/`mapPartitions` stage; everything
  * upstream and downstream of it keeps this plan shape.
  */
case class MediaFeaturesF(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_media_features needs a binary arg, got ${child.dataType.simpleString}")
    else if (dim < 1 || dim > 4096)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_media_features dim must be in [1, 4096], got $dim")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    val feats = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val hd = h ^ (2654435761L * (d + 1))
      feats(d) = ((hd % 1000L).toFloat) / 1000.0f
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(feats)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val hd = ctx.freshName("hd")
      val feats = ctx.freshName("feats")
      s"""
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $a.length; $i++) { $h = 31L * $h + $a[$i]; }
         |float[] $feats = new float[$dim];
         |for (int $d = 0; $d < $dim; $d++) {
         |  long $hd = $h ^ (2654435761L * ($d + 1));
         |  $feats[$d] = ((float) ($hd % 1000L)) / 1000.0f;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($feats);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MediaFeaturesF =
    copy(child = newChild)

  override def prettyName: String = "graft_media_features"
}
