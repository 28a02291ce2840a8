package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - NOTHING here is O(n²). Candidate pairs always come from a
  *    groupable key — content hash, LSH band bucket, SimHash band, or
  *    an explicit blocking column — so shuffle volume is
  *    O(n × bands), and the quadratic blow-up is confined to within
  *    buckets (bounded by design: band width controls bucket size).
  *  - Signatures (minhash / simhash / shingles) are pure higher-order
  *    Column expressions computed map-side in one pass, no UDFs.
  */
object Dedup {

  // ---- exact ---------------------------------------------------------

  /** Exact-duplicate groups by content hash — one shuffle on the hash.
    * Output: (content_hash, n_dups, keep_id) with min-id survivor.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** Exact dedup: keep the minimum-id row of every content group. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---- shingling -----------------------------------------------------

  /** Distinct character k-shingles of a text column (HOF, map-side). */
  def charShingles(c: Column, k: Int = 8): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), length(c) - lit(k - 1))),
      i => c.substr(i, lit(k))))

  /** Distinct word n-grams (tokens joined by single spaces). */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val toks = split(trim(c), "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(lit(1), size(toks) - lit(n - 1))),
      i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Jaccard similarity of two (distinct-element) arrays (0 for two
    * empty sets — also dodges ANSI-mode division by zero).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - inter
    when(union =!= 0.0, inter / union).otherwise(lit(0.0))
  }

  // ---- n-gram Jaccard with explicit blocking -------------------------

  /** All pairs within a blocking key whose shingle-set Jaccard meets
    * the threshold. Blocking bounds the pair blow-up (the classic
    * "never all-pairs" rule); for unblocked corpora use
    * [[minhashLsh]], which discovers its own blocks.
    * Output: (id_a, id_b, jacc).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 1,
                        threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol), col(blockCol), wordShingles(col(textCol), n).as("__sh"))
    val a = sh.select(col(blockCol), col(idCol).as("id_a"), col("__sh").as("__sha"))
    val b = sh.select(col(blockCol), col(idCol).as("id_b"), col("__sh").as("__shb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum xxhash64 over the shingle set. One map-side pass.
    */
  def minhashSignature(shingles: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)

  /** Banded LSH candidate generation + exact Jaccard verification.
    * numHashes = bands × rowsPerBand; docs agreeing on ALL rows of any
    * band land in the same bucket and become candidates. Shuffle is
    * O(docs × bands); verification joins shingle sets back by id for
    * the (small) candidate set only.
    * Output: (id_a, id_b, jacc) with jacc >= threshold.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 8, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sh = df.select(col(idCol), charShingles(col(textCol), shingleK).as("__sh"))
    val sig = sh.withColumn("__sig", minhashSignature(col("__sh"), numHashes))
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("b"), hash(slice(col("__sig"), j * r + 1, r)).as("h"))
    }
    val exploded = sig.select(col(idCol), explode(array(bandStructs: _*)).as("__band"))
      .select(col(idCol), col("__band.b").as("__b"), col("__band.h").as("__h"))
    val cand = exploded.as("x").join(exploded.as("y"),
        col("x.__b") === col("y.__b") && col("x.__h") === col("y.__h") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .withColumn("jacc", jaccard(col("__sha"), col("__shb")))
      .filter(col("jacc") >= threshold)
      .select("id_a", "id_b", "jacc")
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash over the whitespace token multiset: bit b is set
    * when the sum of ±1 votes (tokens whose xxhash64 has bit b set
    * vote +1) is positive. Pure HOF expression, one map-side pass.
    */
  def simhash(c: Column): Column = {
    val toks = split(trim(lower(c)), "\\s+")
    // hash each token once; each bit then folds over the hash array
    val hashes = transform(toks, t => xxhash64(t))
    val bitVals = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitVals.reduce(_ + _)
  }

  /** SimHash near-dup pairs: candidates share one of four 16-bit
    * bands (any pair within hamming distance 3 of each other must
    * agree on at least one band; wider distances need more/rotated
    * bands), verified by exact hamming distance <= maxHamming.
    * Output: (id_a, id_b, hamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val sigs = df.select(col(idCol), simhash(col(textCol)).as("__sig"))
    val bandStructs = (0 until 4).map { j =>
      struct(lit(j).as("b"),
        shiftrightunsigned(col("__sig"), j * 16).bitwiseAND(lit(0xFFFFL)).as("h"))
    }
    val exploded = sigs.select(col(idCol), col("__sig"),
        explode(array(bandStructs: _*)).as("__band"))
      .select(col(idCol), col("__sig"), col("__band.b").as("__b"), col("__band.h").as("__h"))
    exploded.as("x").join(exploded.as("y"),
        col("x.__b") === col("y.__b") && col("x.__h") === col("y.__h") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        bit_count(col("x.__sig").bitwiseXOR(col("y.__sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding near-dup --------------------------------------------

  /** Embedding-cosine near-duplicate pairs within a blocking key
    * (source, shard, LSH bucket, ...). Output: (id_a, id_b, sim).
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double = 0.9): DataFrame = {
    val v = df.select(col(idCol), col(blockCol), col(vecCol))
    val a = v.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = v.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", Similarity.cosine(col("__va"), col("__vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Unblocked embedding near-dup at scale: block by deterministic
    * hyperplane bucket first (recall < 1, measured in specs).
    */
  def embeddingNearDupLsh(df: DataFrame, idCol: String, vecCol: String,
                          planes: Int = 8, threshold: Double = 0.9): DataFrame = {
    val bucketed = df.withColumn("__bucket",
      Similarity.hyperplaneBucket(col(vecCol), planes))
    embeddingNearDup(bucketed, idCol, vecCol, "__bucket", threshold)
  }
}
