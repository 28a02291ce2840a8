package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixture operators for training-data
  * pipelines. (Beyond the reference repo, which has no sampling
  * primitives; required by the engine brief for LLM data pipelines.)
  *
  * Every operator keys off `md5(key)` rather than `rand()`:
  * - **reproducible** — the same corpus always yields the same sample,
  *   regardless of partitioning, executor count, task retries, or AQE
  *   re-plans (`rand()` changes under all of those);
  * - **map-side** — a codegen'd filter with zero shuffle, so sampling
  *   100 TB costs one scan;
  * - **engine-portable** — md5 is bit-identical everywhere, so the
  *   DuckDB oracle selects the EXACT same rows, not just the same
  *   expected count.
  *
  * The first 8 hex chars of the digest are a uniform draw over
  * [0, 2^32); comparing them LEXICOGRAPHICALLY against a fixed-width
  * hex cutoff avoids a hex→int conversion that not every engine can
  * express. `cutoffHex` is the single source of truth for the cutoff
  * literal — query code and oracle SQL both call it, so the two sides
  * can never disagree on rounding.
  */
object Sampling {

  /** 8-hex-char cutoff for `fraction` of the [0, 2^32) hash space. */
  def cutoffHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Uniform hash prefix of a key — the sampling coordinate. */
  def hashPrefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** True for the deterministic `fraction`-sized subset keyed by `key`. */
  def hashFilter(key: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else hashPrefix(key) < lit(cutoffHex(fraction))

  /** Bernoulli-style sample: keep ~`fraction` of rows, exactly
    * reproducibly (same key → same verdict, any run, any engine).
    */
  def sample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashFilter(col(keyCol), fraction))

  /** PER-ROW probability sampling: keep each row with the probability
    * in `probCol` (clamped to [0,1]) — quality-weighted corpus
    * selection, where a scorer column decides each document's keep
    * chance. Same determinism contract as [[sample]]: the draw is the
    * key's hash prefix, the cutoff is the row's probability mapped to
    * the same 2^32 hash space with pure integer/hex arithmetic (no
    * float parsing of hex anywhere), compared lexicographically at
    * fixed width — one codegen'd map-side filter, zero shuffle, and an
    * engine-portable expression the oracle reproduces verbatim.
    * Boundary semantics: the comparison is `<=` against
    * `min(floor(p·2^32), 2^32−1)`, so p = 1.0 keeps everything and
    * p = 0.0 keeps only the ~2^-32 draw that hashes to exactly zero.
    */
  def sampleByProb(df: DataFrame, keyCol: String, probCol: Column): DataFrame = {
    val p = least(greatest(probCol.cast("double"), lit(0.0)), lit(1.0))
    val cutoff = lpad(lower(hex(
      least(floor(p * lit(4294967296.0)).cast("long"), lit(4294967295L)))), 8, "0")
    df.filter(hashPrefix(col(keyCol)) <= cutoff)
  }

  /** Per-stratum sampling fractions (ref use case: rebalancing a
    * training corpus by language/source). Strata absent from
    * `fractions` fall back to `defaultFraction`. Still one map-side
    * codegen'd filter — the CASE chain never shuffles.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0): DataFrame = {
    val verdict = fractions.foldLeft(hashFilter(col(keyCol), defaultFraction)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), hashFilter(col(keyCol), f)).otherwise(acc)
    }
    df.filter(verdict)
  }

  /** Exactly `n` rows per stratum (fewer when the stratum is smaller),
    * picked by hash order with id tie-break — a deterministic
    * "reservoir". One shuffle on the strata key; the per-stratum sort
    * is bounded by stratum size. At skewed scale prefer rank pushdown
    * via [[sample]] first (sample at ~n/|stratum| then cap).
    */
  def samplePerStratum(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(hashPrefix(col(keyCol)), col(keyCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Per-group quota by priority (the C4/RefinedWeb-style per-domain
    * cap: keep at most `n` documents per source, preferring the
    * highest-`priorityCol` rows; `tieCol` ascending pins ties so the
    * survivor set is reproducible across runs and engines). Contrast
    * with [[samplePerStratum]], which picks a hash-UNIFORM subset —
    * this keeps the BEST rows under the quota. One shuffle on the
    * group key; the `row_number <= n` filter becomes a
    * WindowGroupLimit, so each map task pre-prunes to its local top-n
    * per group BEFORE the shuffle — a hot domain with 10^9 docs ships
    * ~n rows per upstream partition, not 10^9.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], priorityCol: String,
                  tieCol: String, n: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(n >= 1, s"cap must be >= 1, got $n")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(priorityCol).desc, col(tieCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Disjoint, exhaustive split tag (train/valid/test...): the hash
    * coordinate lands in exactly one cumulative bucket. `splits` are
    * (name, fraction) with fractions summing to <= 1; the remainder
    * (hash >= last cutoff) gets the final split name — pass the bulk
    * split last so rounding dust lands there.
    */
  def splitTag(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "need at least one split")
    val cum = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val h = hashPrefix(key)
    splits.init.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cutUpper), other) =>
        when(h < lit(cutoffHex(cutUpper)), lit(name)).otherwise(other)
    }
  }

  /** Data-mixture resampling: per-stratum multiplicity `weights`
    * (w < 1 downsamples, w > 1 replicates — floor(w) copies plus one
    * more for the deterministic frac(w) subset). Output repeats each
    * surviving row with `copy_idx` 1..k, so downstream shuffles spread
    * the copies. Map-side: the only data growth is the emitted copies
    * themselves.
    */
  def mixture(df: DataFrame, keyCol: String, strataCol: String,
              weights: Map[String, Double],
              defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0), "negative weight")
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toInt
      val frac = w - whole
      lit(whole) + when(hashFilter(col(keyCol), frac), 1).otherwise(0)
    }
    val copies = weights.foldLeft(copiesFor(defaultWeight)) {
      case (acc, (stratum, w)) =>
        when(col(strataCol) === lit(stratum), copiesFor(w)).otherwise(acc)
    }
    df.withColumn("__k", copies)
      // sequence(1, 0) would generate DESCENDING [1, 0] — guard to empty
      .withColumn("copy_idx",
        explode(when(col("__k") >= 1, sequence(lit(1), col("__k")))
          .otherwise(array().cast("array<int>"))))
      .drop("__k")
  }

  /** Sequence packing for training shards (concatenate-then-split, the
    * GPT-style pack: documents are laid out in a deterministic order
    * and cut into `budget`-token sequences; a document may straddle a
    * boundary, recorded by its starting offset). Assigns, per row:
    * `pack_id` — which sequence the document STARTS in — and
    * `pack_offset` — its token offset within that sequence.
    *
    * Layout order inside a shard is (md5(key), key): reproducible
    * across runs, partitionings, and engines, and uncorrelated with
    * any input order. Packing is inherently sequential per shard, so
    * parallelism = #shards: pass shard columns that give thousands of
    * shards at cluster scale (e.g. a hash bucket of the key) — each
    * shard's running total is one partition of ONE window pass.
    */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    budget: Int, shardCols: Seq[String]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(hashPrefix(col(keyCol)), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("pack_id", floor(before / lit(budget.toLong)))
      .withColumn("pack_offset", before % lit(budget.toLong))
  }
}
