package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up of an existing test-data directory: replicate
  * every table `factor`× with disjoint key spaces, preserving
  * referential integrity and distribution shape — the input for
  * order-of-magnitude scale gates (run the bench at 10× and check the
  * scaling exponent) and for load-testing a deployment before real
  * data lands at the next magnitude.
  *
  * Mechanics per replica r (0 keeps the original rows bit-identical):
  *  - every entity key (custkey, orderkey, doc_id, user_id, …) shifts
  *    by `r * KeyStride`, with the SAME shift applied to the foreign
  *    keys that reference it — joins stay valid, fan-outs unchanged
  *  - tiny dimensions (region, nation) are NOT multiplied — their
  *    foreign keys stay in range, mirroring how real growth behaves
  *    (10× the facts, same country list)
  *  - `documents.text` is re-worded for r > 0 (every 3rd token gets a
  *    replica suffix), so shingle/minhash/simhash signatures DIVERGE
  *    across replicas: near-dup candidate structure scales linearly
  *    like genuinely new text, instead of every doc becoming a
  *    10-clique of replica near-copies (which would quadratically
  *    inflate candidate pairs — a data artifact, not a plan cost)
  *  - `embeddings.embedding` gets deterministic per-(vector, dim,
  *    replica) sinusoidal noise of ~data magnitude, so replicas are
  *    genuinely distinct points — kNN/LSH bucket occupancy scales
  *    linearly instead of stacking 10 coincident points per bucket
  * Everything is an expression of (original row, replica index):
  * deterministic, partitioning-invariant, no driver data.
  */
object ScaleUp {

  /** Larger than any key in the source tables; replica r's keys live in
    * [r*stride, r*stride + maxKey). */
  val KeyStride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, dstDir, factor)
    spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, dstDir: String,
          factor: Int): Unit = {
    require(factor >= 1, "factor >= 1")
    // key columns to shift, per table (same stride everywhere keeps
    // every FK aligned with its dimension)
    val keyCols: Map[String, Seq[String]] = Map(
      "region" -> Nil, "nation" -> Nil, // small dims: copy, don't multiply
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    keyCols.foreach { case (name, keys) =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val out =
        if (keys.isEmpty) src // dims copy through unchanged
        else {
          // replica key ranges [r·stride, r·stride + maxKey) must not
          // overlap — scaling a source whose keys exceed the stride
          // (a bigger SF, or re-scaling ScaleUp output) would silently
          // produce duplicate "unique" keys and cross-replica FK hits
          val maxKeyExpr =
            if (keys.size == 1) max(col(keys.head).cast("long"))
            else greatest(keys.map(k => max(col(k).cast("long"))): _*)
          // null max = empty (or all-null-key) table: nothing to
          // overlap, copy through the replication unchecked
          val maxKey = Option(src.agg(maxKeyExpr).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          require(maxKey < KeyStride,
            s"$name: max key $maxKey >= KeyStride $KeyStride — replica " +
              "key ranges would overlap (source already scaled, or too large)")
          val shifted = keys.foldLeft(replicate(src, factor)) { (df, k) =>
            df.withColumn(k, col(k) + col("__r") * KeyStride)
          }
          val reshaped = name match {
            case "documents" => perturbText(shifted)
            case "embeddings" => perturbEmbedding(shifted)
            case _ => shifted
          }
          reshaped.drop("__r")
        }
      // Size output files from the SCALED volume, not the source's
      // partition count: an explode-based replication keeps the source
      // partitioning (typically ONE file at gate SFs), and a
      // single-file/single-row-group table forces every downstream
      // CPU-dense scan stage onto one core — the gate then measures
      // file layout, not the operator. One file per replica (capped at
      // 32) gives scans split parallelism a real cluster layout would
      // have anyway.
      val parts = math.min(32, math.max(out.rdd.getNumPartitions, factor))
      out.repartition(parts)
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
  }

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__r", explode(lit((0L until factor.toLong).toArray)))

  /** Re-word replica text: every 3rd token carries a replica suffix,
    * so every shingle window of length ≥ 3 differs from the original
    * (and from every other replica) while length/word statistics stay
    * comparable. `n_chars` re-derives from the new text.
    */
  private def perturbText(df: DataFrame): DataFrame =
    df.withColumn("text",
      when(col("__r") === 0L, col("text")).otherwise(
        array_join(
          transform(split(col("text"), " "),
            (w, j) => when(j % 3 === 0, concat(w, lit("~r"), col("__r")))
              .otherwise(w)),
          " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Deterministic ~O(data-scale) sinusoidal noise per (vector, dim,
    * replica): replicas become genuinely distinct points with the same
    * global distribution envelope.
    */
  private def perturbEmbedding(df: DataFrame): DataFrame =
    df.withColumn("embedding",
      when(col("__r") === 0L, col("embedding")).otherwise(
        transform(col("embedding"),
          (x, j) => (x + lit(0.3) * sin((col("vec_id") * 131 + j * 17 +
            col("__r") * 7919).cast("double"))).cast("float"))))
}
