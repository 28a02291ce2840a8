package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Times.epochMicros

/** Temporal/relational analytics operators the reference framework's
  * users build by hand in pandas (`merge_asof`, interval filters,
  * funnel/cohort groupbys — reference: src/transform/
  * transformation_library.py join/window sections) and that Spark has
  * no first-class operator for. Each is expressed as a declarative
  * plan with a bounded shuffle story:
  *
  *  - [[asofJoin]]: ONE shuffle + sort per side (union-tag + ordered
  *    scan), never a range-join pair explosion.
  *  - [[rangeJoin]]: equi-join on (keys, time bucket) — candidate
  *    volume is intervals x buckets-per-interval, not |L| x |R|.
  *  - [[funnel]] / [[cohortRetention]]: cascaded per-user aggregates,
  *    all co-partitioned on the user key after the first shuffle.
  *  - [[fuzzyPairs]]: length-banded candidate join + codegen'd
  *    levenshtein verify over a deduplicated vocabulary.
  */
object Relational {

  // ---- 1. As-of join (pandas merge_asof; Spark has no native operator)

  /** As-of join: for every left row, attach the payload of the nearest
    * right row in `direction` ("backward" = latest right with
    * rightTs <= leftTs; "forward" = earliest right with
    * rightTs >= leftTs; "nearest" = whichever of the two is closer in
    * time, ties to backward) within the same `keys` group. Inclusive
    * equality is controlled by `inclusive`. A non-negative
    * `toleranceSeconds` voids matches farther than that from the left
    * timestamp (pandas merge_asof's `tolerance`).
    *
    * Implementation is the scalable union-scan form: tag both sides,
    * union, then one window over (keys) ordered by the timestamp — the
    * running `last` non-null payload at each left row IS the as-of
    * match. Cost: one shuffle of |L|+|R| rows and a sort, independent
    * of match distances — the naive range join is |L|x|R| in the worst
    * case and needs a per-row argmax on top. At 100 TB both sides
    * shuffle once on the join keys; no broadcast, no skew beyond the
    * key histogram itself.
    *
    * Ties among right rows sharing (keys, ts) resolve deterministically
    * to the LARGEST payload struct (field-wise comparison, so order
    * `payloadCols` with a unique column included). Output = all left
    * columns + `prefix`+rightTs + `prefix`+payloadCols (null when no
    * match exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               direction: String = "backward", inclusive: Boolean = true,
               prefix: String = "asof_", toleranceSeconds: Long = -1L): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asofNearest(left, right, keys, leftTs, rightTs, payloadCols,
        inclusive, prefix, toleranceSeconds)
    val payFields = rightTs +: payloadCols
    val payStruct = struct(payFields.map(col): _*)
    val payType = right.select(payStruct.as("__pay")).schema("__pay").dataType
    val lrowStruct = struct(left.columns.map(col): _*)
    val lrowType = left.select(lrowStruct.as("__lrow")).schema("__lrow").dataType

    val lt = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__ats"), lit(1).as("__side"),
      lrowStruct.as("__lrow"), lit(null).cast(payType).as("__pay")): _*)
    val rt = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ats"), lit(0).as("__side"),
      lit(null).cast(lrowType).as("__lrow"), payStruct.as("__pay")): _*)

    // Scan order: backward walks time ascending, forward descending; a
    // right row "usable" by a left row must sort BEFORE it. At equal
    // timestamps the side order encodes inclusivity (right first =
    // inclusive). Final __pay key makes tied right rows deterministic.
    val ts = if (direction == "backward") col("__ats").asc else col("__ats").desc
    val side = if (inclusive) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts, side, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lt.unionByName(rt)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance: a match farther than the bound is no match at all —
    // the whole payload nulls out, exactly like pandas' tolerance
    val inTol =
      if (toleranceSeconds < 0) lit(true)
      else abs(epochMicros(col(s"__m.$rightTs")) - epochMicros(col("__ats"))) <=
        lit(toleranceSeconds * 1000000L)
    matched.select(col("__lrow.*") +: payFields.map(f =>
      when(inTol, col(s"__m.$f")).as(prefix + f)): _*)
  }

  /** "nearest" direction: chain a backward pass then a forward pass
    * (each one shuffle+sort; left rows are preserved 1:1 so no extra
    * join is needed), then pick per row whichever side is closer —
    * ties go backward, pandas-style. Tolerance applies per side before
    * the choice.
    */
  private def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftTs: String, rightTs: String, payloadCols: Seq[String],
                          inclusive: Boolean, prefix: String,
                          toleranceSeconds: Long): DataFrame = {
    val payFields = rightTs +: payloadCols
    val b = asofJoin(left, right, keys, leftTs, rightTs, payloadCols,
      "backward", inclusive, "__b_", toleranceSeconds)
    val f = asofJoin(b, right, keys, leftTs, rightTs, payloadCols,
      "forward", inclusive, "__f_", toleranceSeconds)
    val bTs = col(s"__b_$rightTs")
    val fTs = col(s"__f_$rightTs")
    val useBackward = fTs.isNull ||
      (bTs.isNotNull &&
        epochMicros(col(leftTs)) - epochMicros(bTs) <=
          epochMicros(fTs) - epochMicros(col(leftTs)))
    f.select(left.columns.map(col) ++ payFields.map(p =>
      when(useBackward, col(s"__b_$p")).otherwise(col(s"__f_$p")).as(prefix + p)): _*)
  }

  // ---- 2. Range (point-in-interval) join

  /** Join points (`tsCol`) into intervals ([startCol, endCol]) sharing
    * `keys`, without a cartesian: both sides are mapped onto fixed-width
    * time buckets (`bucketSeconds`), intervals exploding to every bucket
    * they overlap, and the join becomes an equi-join on
    * (keys, bucket) + an exact range filter. Candidate volume is
    * |intervals| x ceil(span/bucket) + |points| — pick `bucketSeconds`
    * near the typical interval length so intervals explode to ~2
    * buckets. A point falls in exactly one bucket, so matches are
    * already unique (no pair dedup pass).
    *
    * Bounds are inclusive unless `strictStart`/`strictEnd`. Intervals
    * with end < start produce no matches (empty bucket sequence guard).
    */
  def rangeJoin(points: DataFrame, tsCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                keys: Seq[String], bucketSeconds: Long,
                strictStart: Boolean = false, strictEnd: Boolean = false): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val width = lit(bucketSeconds * 1000000L)
    def bucketOf(c: Column): Column = floor(epochMicros(c) / width)
    val p = points.withColumn("__b", bucketOf(col(tsCol)))
    val iv = intervals
      .withColumn("__bs", bucketOf(col(startCol)))
      .withColumn("__be", bucketOf(col(endCol)))
      .filter(col("__be") >= col("__bs"))
      .withColumn("__b", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
    val lo = if (strictStart) col(tsCol) > col(startCol) else col(tsCol) >= col(startCol)
    val hi = if (strictEnd) col(tsCol) < col(endCol) else col(tsCol) <= col(endCol)
    p.join(iv, keys :+ "__b").filter(lo && hi).drop("__b")
  }

  // ---- 3. Histogram / binning

  /** Fixed-width histogram of `valueCol` over [lo, hi) with `nbins`
    * bins; values outside the range clamp into the edge bins (so the
    * output is a complete partition of the input — no silent drops).
    * One map-side bucket expression + one hash aggregation; bin edges
    * are derived arithmetic (`lo + bin*width`), reproducible across
    * engines because both sides run the identical IEEE expression.
    * Output: bin, bin_lo, bin_hi, n — ordered by bin.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nbins: Int): DataFrame = {
    require(nbins > 0 && hi > lo, "need nbins > 0 and hi > lo")
    val width = (hi - lo) / nbins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)),
      lit(nbins - 1L)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bin") + lit(1L)) * lit(width))
      .select(col("bin"), col("bin_lo"), col("bin_hi"), col("n"))
      .orderBy(col("bin"))
  }

  /** EQUI-DEPTH histogram: `nbins` buckets holding ~equal row counts,
    * edges = exact quantiles at i/nbins. Edges come from
    * [[graft.functions.Quantiles.exactQuantiles]] (all probes fused
    * into the three shared bounded scans — no full sort, no
    * per-probe passes), land as LITERALS in one codegen'd when-chain,
    * and the bucket assignment is a single map-side pass + one hash
    * aggregation — the same plan shape as the equi-width
    * [[histogram]], just with data-derived edges. Mass points can
    * collapse adjacent edges; the buckets between duplicate edges are
    * simply empty and (like [[histogram]]) unoccupied bins emit no
    * row. Output: (bin, bin_lo, bin_hi, n), bin ascending.
    */
  def histogramEquiDepth(df: DataFrame, valueCol: String, nbins: Int,
                         bracketEps: Double = 0.002,
                         accuracy: Int = 10000): DataFrame = {
    require(nbins > 0, "need nbins > 0")
    val probes = (0 to nbins).map(i => valueCol -> i.toDouble / nbins)
    val qs = graft.functions.Quantiles
      .exactQuantiles(df, probes, bracketEps, accuracy).map(_._2)
    if (qs.head.isEmpty) // no non-null values: empty histogram, right shape
      return df.filter(lit(false))
        .select(lit(0L).as("bin"), lit(0.0).as("bin_lo"),
          lit(0.0).as("bin_hi"), lit(0L).as("n"))
    val edges = qs.map(_.get)
    val v = col(valueCol).cast("double")
    // number of INTERIOR edges at or below the value = bucket index;
    // clamps itself to [0, nbins-1] (values sit within [min, max])
    val bin = edges.slice(1, nbins).foldLeft(lit(0L)) { (acc, e) =>
      acc + when(v >= lit(e), 1L).otherwise(0L)
    }
    val loArr = array(edges.init.map(lit): _*)
    val hiArr = array(edges.tail.map(lit): _*)
    df.filter(col(valueCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        element_at(loArr, (col("bin") + 1).cast("int")).as("bin_lo"),
        element_at(hiArr, (col("bin") + 1).cast("int")).as("bin_hi"),
        col("n"))
      .orderBy(col("bin"))
  }

  // ---- 4. Funnel analysis

  /** Ordered-step funnel: step i counts users whose earliest qualifying
    * step-i event is at-or-after their earliest qualifying step-(i-1)
    * event. One-pass plan: a single per-user window cascade — the
    * running min of each step's qualified timestamps over a RANGE frame
    * (all events at-or-before the current timestamp, ties included, so
    * "at-or-after" equality matches exactly) qualifies the next step —
    * then one per-user aggregate and one tiny global rollup. The input
    * is scanned ONCE and shuffled ONCE (the user-key window sort; the
    * per-user groupBy reuses that partitioning); the k window passes
    * share one sort. The naive alternative (per-step filter-join
    * cascade) scans the events table O(k^2) times. Returns
    * (step_idx, step, n_users), one row per step.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // __c_i = this event's timestamp iff it is a QUALIFIED step-i event
    // (right type, and some qualified step-(i-1) event at-or-before it)
    val cascaded = steps.zipWithIndex.foldLeft(df) { case (d, (step, i)) =>
      val qualified =
        if (i == 0) col(typeCol) === lit(step)
        else col(typeCol) === lit(step) && min(col(s"__c_${i - 1}")).over(w).isNotNull
      d.withColumn(s"__c_$i", when(qualified, col(tsCol)))
    }
    val perUser = cascaded.groupBy(col(userCol))
      .agg(min(col("__c_0")).as("__t_0"),
        steps.indices.tail.map(i => min(col(s"__c_$i")).as(s"__t_$i")): _*)
    val totals = perUser.agg(
      count(col("__t_0")).as("__n_0"),
      steps.indices.tail.map(i => count(col(s"__t_$i")).as(s"__n_$i")): _*)
    totals.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i + 1).cast("int").as("step_idx"), lit(step).as("step"),
          col(s"__n_$i").as("n_users"))
      }: _*)).as("__s"))
      .select(col("__s.*"))
  }

  // ---- 5. Cohort retention

  /** Classic retention matrix: cohort = each user's first activity
    * date; for every (cohort, day offset) count distinct active users.
    * The cohort date is a whole-partition window min over the user key
    * — no self-join, no second scan: one shuffle to co-locate each
    * user's events, one partial-aggregating shuffle for the
    * (cohort, offset) rollup. Output:
    * (cohort DATE, day_offset BIGINT, n_users BIGINT).
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df.withColumn("cohort", min(to_date(col(tsCol))).over(w))
      .groupBy(col("cohort"),
        datediff(to_date(col(tsCol)), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  // ---- 6. Fuzzy (edit-distance) matching

  /** All pairs of rows whose `strCol` values are within levenshtein
    * distance `maxDist`. Candidates come from a LENGTH-BANDED equi-join
    * (|len(a) - len(b)| <= maxDist is necessary for distance <= maxDist):
    * the shorter side explodes its admissible partner lengths, so each
    * unordered pair is generated exactly once, then the codegen'd
    * `levenshtein` verifies. Run it over a DEDUPLICATED vocabulary
    * (distinct strings + a representative id) — at 100 TB the distinct
    * short-string vocabulary is orders of magnitude smaller than the
    * table, and that dedup is what keeps the within-band product
    * tractable. For web-scale vocabularies where one length band is
    * still huge, generate candidates with the q-gram/MinHash index
    * ([[graft.llm.Dedup]]) and keep this operator as the exact
    * verifier. Output: (id_a, id_b, str_a, str_b, dist) oriented so
    * str_a < str_b lexicographically.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val v = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .withColumn("__len", length(col("__s")))
    val probe = v.withColumn("__lb",
      explode(sequence(col("__len"), col("__len") + lit(maxDist))))
    val a = probe.as("a")
    val b = v.as("b")
    a.join(b, col("a.__lb") === col("b.__len"))
      .filter(col("a.__len") < col("b.__len") ||
        (col("a.__len") === col("b.__len") && col("a.__id") < col("b.__id")))
      .filter(levenshtein(col("a.__s"), col("b.__s")) <= lit(maxDist))
      .select(
        when(col("a.__s") <= col("b.__s"), col("a.__id")).otherwise(col("b.__id")).as("id_a"),
        when(col("a.__s") <= col("b.__s"), col("b.__id")).otherwise(col("a.__id")).as("id_b"),
        least(col("a.__s"), col("b.__s")).as("str_a"),
        greatest(col("a.__s"), col("b.__s")).as("str_b"),
        levenshtein(col("a.__s"), col("b.__s")).cast("long").as("dist"))
  }

  /** First-order (Markov) event-transition matrix: for each ordered
    * pair of consecutive event types within a user's stream, the
    * transition count and probability P(to | from). One partitioned
    * window pass for the lag (the same shuffle shape as
    * sessionization) + one hash agg; the per-from totals are a window
    * sum OVER the already-aggregated pair frame (type-cardinality
    * sized), so the pair lineage runs once and nothing routes through
    * the driver. Probabilities are exact integer ratios, rounded at
    * 6 dp. Output: (from_type, to_type, n, p).
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, orderBy: Seq[Column] = Nil): DataFrame = {
    val order = if (orderBy.nonEmpty) orderBy else Seq(col(tsCol).asc)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val wTot = Window.partitionBy(col("from_type"))
    df.withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(
        col("n").cast("double") / sum(col("n")).over(wTot).cast("double"), 6))
  }
}
