package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** One-pass vector second-moment aggregation for PCA: accumulates
  * `[n, Σx_i (d), Σx_p·x_q for p ≤ q (d(d+1)/2)]` over an
  * `array<float>` column in a single map-side-combinable buffer —
  * the covariance of a 100 TB embedding table costs exactly one scan
  * and a ~17 KB (d=64) buffer per partition, merged on the driver.
  *
  * The imperative buffer is the point: the declarative alternatives
  * either explode n·d(d+1)/2 product rows through a hash aggregate or
  * plan thousands of separate agg expressions; this is a tight
  * primitive loop per row (same reasoning as [[DotProductF]]'s
  * codegen loop, applied to the aggregation side).
  *
  * Buffer layout once sized: [0]=n, [1..d]=sums, then the upper
  * triangle row-major. An empty buffer means "no rows yet" (the
  * vector width is learned from the first row; mixed widths fail
  * loudly). Null vectors are skipped, matching SQL aggregate null
  * semantics.
  */
case class VecMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_moments needs array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def sizeFor(d: Int): Int = 1 + d + d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](sizeFor(d)) else buf
    require(b.length == sizeFor(d),
      s"graft_vec_moments: vector width $d differs from the first row's")
    b(0) += 1.0
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      // a null ELEMENT would read as 0.0 and silently bias the
      // moments — malformed vectors fail loudly like width mismatches
      require(!arr.isNullAt(i),
        s"graft_vec_moments: null element at index $i")
      x(i) = arr.getFloat(i).toDouble
      b(1 + i) += x(i)
      i += 1
    }
    var k = 1 + d
    var p = 0
    while (p < d) {
      val xp = x(p)
      var q = p
      while (q < d) { b(k) += xp * x(q); k += 1; q += 1 }
      p += 1
    }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        "graft_vec_moments: merging buffers of different vector widths")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(b: Array[Double]): Any =
    if (b.isEmpty) null else new GenericArrayData(b)

  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.length)
    bb.putInt(b.length)
    var i = 0
    while (i < b.length) { bb.putDouble(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMomentsAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_vec_moments"
}
