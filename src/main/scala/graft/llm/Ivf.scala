package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour: partition the
  * corpus into `nlist` cells around k-means centroids; a query scans
  * only its `nprobe` nearest cells. The scale path when hyperplane LSH
  * buckets are too coarse: cells adapt to the data distribution.
  *
  * Fully deterministic and DataFrame-native:
  *  - seeding picks the `nlist` vectors with the lowest xxhash64(id)
  *    (hash-spread, no RNG);
  *  - Lloyd iterations assign via broadcast centroid join + window
  *    argmax and re-average per (cell, dimension) through explode +
  *    hash agg — no driver-side collect at any step;
  *  - the index (corpus + cell id) is a plain DataFrame: persist it
  *    once, probe it per query batch.
  */
object Ivf {

  /** Assign each row the id of its most-similar centroid (by cosine,
    * deterministic tie-break on centroid id). The argmax is a map-side
    * combinable `max_by` hash aggregation — no shuffle-and-sort of the
    * corpus x centroids product (the previous per-id window form
    * shuffled nlist rows per corpus row; centroid ids are unique, so
    * max_by over (sim, -cid) is tie-free and deterministic).
    */
  /** Assign every row to its most-cosine-similar centroid from an
    * EXPLICIT centroid frame (ties → lowest centroid id) — the public
    * single-step form of the Lloyd assignment [[buildIndex]] iterates:
    * fixed reference centroids make the geometry fully deterministic
    * arithmetic, so downstream aggregates are oracle-checkable (unlike
    * the learned-centroid index, which is rows-only by construction).
    * Appends `__cid`; broadcast nlist-way pairing, no shuffle of `df`
    * beyond the per-id argmax aggregation.
    */
  def assignToCentroids(df: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, centIdCol: String,
                        centVecCol: String): DataFrame =
    assign(df, idCol, vecCol, centroids.select(
      col(centIdCol).as("__cid"), col(centVecCol).as("__cvec")))

  private def assign(df: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    // norms are per-row/per-centroid: fold each side once BEFORE the
    // nlist-way pairing instead of three array folds per pair (same
    // value, same op order — assignments stay bit-identical)
    val payload = struct(df.columns.map(col) :+ col("__cid"): _*)
    val cents = centroids.withColumn("__nc", Similarity.norm(col("__cvec")))
    val denom = col("__nv") * col("__nc")
    df.withColumn("__nv", Similarity.norm(col(vecCol)))
      .crossJoin(broadcast(cents))
      .withColumn("__csim",
        when(denom =!= 0.0, round(Similarity.dot(col(vecCol), col("__cvec")) / denom, 6)))
      .groupBy(col(idCol))
      .agg(max_by(payload, struct(col("__csim"), -col("__cid"))).as("__p"))
      .select(col("__p.*"))
  }

  /** Recompute each cell's centroid as the per-dimension mean. */
  private def recenter(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("__cid"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("__cid"), col("__pos"))
      .agg(avg(col("__v").cast("double")).as("__m"))
      .groupBy(col("__cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__m")))),
        x => x.getField("__m").cast("float")).as("__cvec"))

  /** Cell count for a corpus of `n` vectors: ceil(sqrt(n)), floored at
    * `minList`. The sqrt rule is the standard IVF operating point
    * (FAISS guidance is c·sqrt(n) cells): build-time assignment costs
    * O(n · nlist) and per-query probing costs O(nprobe · n / nlist),
    * so sqrt balances the two — a FIXED nlist instead sends per-query
    * probe cost linear in the corpus (cells grow without bound), the
    * same fixed-bucket hazard [[Similarity.planesFor]] documents for
    * hyperplane LSH.
    */
  def nlistFor(n: Long, minList: Int = 16): Int = {
    require(minList >= 1, "minList >= 1")
    math.max(minList, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toInt)
  }

  /** [[buildIndexSampled]] with `nlist` sized from the corpus (one
    * count() scan) — cell occupancy ~sqrt(n) AND sample-bounded Lloyd
    * training, the scale-stable operating point on both axes.
    */
  def buildIndexAuto(corpus: DataFrame, idCol: String, vecCol: String,
                     iters: Int = 2, minList: Int = 16,
                     trainPerCell: Int = 64): DataFrame = {
    val n = corpus.count()
    buildIndexSampled(corpus, idCol, vecCol, nlistFor(n, minList), iters,
      trainPerCell, knownCount = Some(n))
  }

  /** Lloyd centroid training over `train`: hash-spread seeds, `iters`
    * assign→recenter rounds. Returns the final CACHED nlist-row
    * centroid frame (materialized; callers release via clearCache /
    * GraftSession.releaseAll when the consuming plan is done).
    * Each iteration's centroid frame is nlist rows — caching it cuts
    * the otherwise-nested lineage (iteration i re-embedding every
    * pass before it, so the train set would be re-scanned a quadratic
    * number of times by the final plan) down to one scan per Lloyd
    * iteration. Frame i is materialized (count) before frame i-1 is
    * released, so at most two centroid frames are ever live.
    */
  private def lloyd(train: DataFrame, idCol: String, vecCol: String,
                    nlist: Int, iters: Int): DataFrame = {
    // orderBy + limit plans as a distributed TakeOrderedAndProject (per-partition
    // top-nlist, then merge) — never a full single-partition sort of the corpus.
    // The unpartitioned row_number after it only ever sees nlist rows.
    val seeds = train
      .withColumn("__h", xxhash64(col(idCol)))
      .select(col("__h"), col(idCol), col(vecCol))
      .orderBy(col("__h"), col(idCol))
      .limit(nlist)
      .withColumn("__rn", row_number().over(Window.orderBy(col("__h"), col(idCol))))
      .select(col("__rn").as("__cid"), col(vecCol).as("__cvec"))
    (1 to iters).foldLeft(seeds.cache()) { (cent, _) =>
      val next = recenter(assign(train, idCol, vecCol, cent), vecCol).cache()
      next.count()
      cent.unpersist(blocking = false)
      next
    }
  }

  /** Build the index: (corpus columns ++ __cid cell id). Lloyd
    * training runs over the FULL corpus — exact but O(iters·n·nlist)
    * centroid pairings; prefer [[buildIndexSampled]]/[[buildIndexAuto]]
    * when the corpus is large.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nlist: Int = 16, iters: Int = 2): DataFrame =
    assign(corpus, idCol, vecCol, lloyd(corpus, idCol, vecCol, nlist, iters))

  /** Build the index with centroids TRAINED on a bounded deterministic
    * sample — the standard IVF practice (FAISS trains on a few tens of
    * vectors per cell, then assigns the full corpus once). Lloyd cost
    * drops from `iters` full-corpus scans (O(iters·n·nlist) centroid
    * pairings — with the sqrt rule that is O(iters·n^1.5)) to
    * O(iters·trainPerCell·nlist²) over the sample, which under the
    * sqrt rule is LINEAR in n; the corpus is paired with centroids
    * exactly once, in the single final assignment pass.
    *
    * The sample is an xxhash64 threshold on the id column —
    * deterministic, partition-invariant, no RNG, map-side (the filter
    * rides the corpus scan). Corpora at or under the train target
    * (nlist·trainPerCell) train on every row, so small-corpus results
    * equal [[buildIndex]] exactly.
    */
  def buildIndexSampled(corpus: DataFrame, idCol: String, vecCol: String,
                        nlist: Int, iters: Int = 2, trainPerCell: Int = 64,
                        knownCount: Option[Long] = None): DataFrame = {
    require(trainPerCell >= 1, "trainPerCell >= 1")
    val n = knownCount.getOrElse(corpus.count())
    val target = nlist.toLong * trainPerCell
    if (n <= target)
      return assign(corpus, idCol, vecCol, lloyd(corpus, idCol, vecCol, nlist, iters))
    // keep-threshold on a 2^20 hash ring; ceil so the expected sample
    // never rounds below the target. The nlist lowest-hash seeds are
    // inside any threshold that admits >= nlist rows only if the SAME
    // hash orders both — seeds hash xxhash64(id) too, so the sampled
    // seeds are a deterministic function of the sample alone.
    val ring = 1L << 20
    val keep = math.min(ring, (ring * target + n - 1) / n)
    val train = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(ring)) < lit(keep))
      .select(col(idCol), col(vecCol))
      .cache()
    // materialize (Lloyd scans it iters+1 times) and guard the tail
    // risk of a hash sample landing under nlist rows — centroid
    // training needs at least one vector per prospective cell
    if (train.count() < nlist) {
      train.unpersist(blocking = false)
      return assign(corpus, idCol, vecCol, lloyd(corpus, idCol, vecCol, nlist, iters))
    }
    val centroids = lloyd(train, idCol, vecCol, nlist, iters)
    // centroids are materialized nlist-row frames — the train sample's
    // lineage is no longer referenced by the final assignment plan
    train.unpersist(blocking = false)
    assign(corpus, idCol, vecCol, centroids)
  }

  /** Cell centroids of a built index — compute ONCE and persist/reuse
    * across query batches (each call is a full-index aggregation;
    * re-deriving it per batch is the avoidable cost at scale).
    */
  def centroids(index: DataFrame, vecCol: String): DataFrame =
    recenter(index, vecCol)

  /** Top-k by cosine, scanning only each query's `nprobe` nearest
    * cells of a prebuilt index. Pass `cellCentroids` (from
    * [[centroids]], persisted) to skip the per-call full-index
    * aggregation. Output: (query_id, neighbor_id, sim, rnk).
    */
  def topK(index: DataFrame, queries: DataFrame,
           corpusId: String, queryId: String, vecCol: String,
           k: Int, nprobe: Int = 2,
           cellCentroids: Option[DataFrame] = None): DataFrame = {
    val centroids = cellCentroids.getOrElse(recenter(index, vecCol))
    val wProbe = Window.partitionBy(col(queryId))
      .orderBy(col("__csim").desc, col("__cid").asc)
    // per-side norms folded once, not per pair (see assign)
    val cents = centroids.withColumn("__nc", Similarity.norm(col("__cvec")))
    val probeDenom = col("__nq") * col("__nc")
    val probes = queries
      .select(col(queryId), col(vecCol).as("__qvec"))
      .withColumn("__nq", Similarity.norm(col("__qvec")))
      .crossJoin(broadcast(cents))
      .withColumn("__csim",
        when(probeDenom =!= 0.0,
          round(Similarity.dot(col("__qvec"), col("__cvec")) / probeDenom, 6)))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col(queryId), col("__qvec"), col("__nq"), col("__cid"))
    val wTop = Window.partitionBy(col(queryId))
      .orderBy(col("sim").desc, col(corpusId).asc)
    val simDenom = col("__ni") * col("__nq")
    index.withColumn("__ni", Similarity.norm(col(vecCol)))
      .join(broadcast(probes), Seq("__cid"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("sim",
        when(simDenom =!= 0.0,
          round(Similarity.dot(col(vecCol), col("__qvec")) / simDenom, 6)))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        col("sim"), col("rnk").cast("long").as("rnk"))
  }
}
