package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque binary
  * columns with typed metadata, batched feature extraction, and frame
  * sampling. (Beyond the reference repo — required by the engine brief
  * for LLM data pipelines.)
  *
  * The Spark-side plumbing here — schema, batch shape, partition-wise
  * processing, deterministic outputs — is real and tested. The actual
  * byte decoding is STUBBED (`fakeDecode`): this container ships no
  * image/audio codecs, so the stub derives deterministic pseudo
  * metadata/features from the bytes themselves. Swapping in a real
  * decoder (javacv, a JNI codec, or a Python worker via a Pandas UDF
  * on PySpark) only replaces the function body — every plan shape
  * stays identical.
  */
object Media {

  /** Typed metadata carried alongside every media blob. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a media metadata struct to a binary column.
    * STUB decode: dimensions/duration derive deterministically from
    * byte length + first bytes (a real decoder parses the container
    * header here — same signature, same plan).
    */
  def withMetadata(df: DataFrame, binCol: String, mime: String,
                   metaCol: String = "media_meta"): DataFrame = {
    val bytes = col(binCol)
    val n = length(bytes).cast("long")
    val isImage = lit(mime).startsWith("image")
    df.withColumn(metaCol, struct(
      lit(mime).as("mime"),
      when(isImage, (pmod(n, lit(1024L)) + 1L).cast("int")).otherwise(lit(null).cast("int")).as("width"),
      when(isImage, (pmod(n, lit(768L)) + 1L).cast("int")).otherwise(lit(null).cast("int")).as("height"),
      when(!isImage, n * 8L).otherwise(lit(null).cast("long")).as("duration_ms"),
      n.as("n_bytes")))
  }

  /** Batched feature extraction over partitions: the mapPartitions
    * shape a real encoder needs (amortize model/codec init once per
    * partition, process rows in order, emit fixed-width vectors).
    * STUB features: `dim` deterministic floats from a rolling hash of
    * the bytes — replace the inner loop with the real encoder call.
    */
  def extractFeatures(df: DataFrame, binCol: String, idCol: String,
                      dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = df.select(col(idCol), col(binCol)).rdd.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in real impl)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val feats = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
        var d = 0
        while (d < dim) {
          val hd = h ^ (2654435761L * (d + 1))
          feats(d) = ((hd % 1000L).toFloat) / 1000.0f
          d += 1
        }
        Row(id, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plan for video blobs: emit `n` evenly spaced
    * frame offsets per row (a real impl decodes those frames; the
    * explode shape — one row per sampled frame — is the real part).
    */
  def sampleFrames(df: DataFrame, metaCol: String, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset_ms",
        (col("frame_idx") * col(s"$metaCol.duration_ms") / lit(n)).cast("long"))
}
