package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at scale.
  *
  * Spark's native exact `percentile` buffers every value of the column
  * in the aggregation state and merges it onto one reducer — fine for
  * thousands of rows, a single-node bottleneck for billions (it is the
  * dominant cost wherever the DQ/anomaly family needs an exact
  * boundary). [[exactQuantiles]] returns the SAME exact interpolated
  * values with a bounded plan, fusing ALL requested (column, q) probes
  * into three full scans total (not per probe):
  *
  *  1. ONE aggregation: per-column non-null counts + a GK sketch
  *     (`approx_percentile`) bracketing every probe's target rank at
  *     `q ± bracketEps` (map-side combinable, rank error ≤ n/accuracy);
  *  2. ONE aggregation of exact conditional counts of values strictly
  *     below each probe's bracket — fixing every probe's local rank;
  *  3. ONE scan that tags each row with the probes whose bracket it
  *     falls in (a per-row filter over a tiny literal bracket array —
  *     non-matching rows emit nothing), then ranks each probe's sliver
  *     (~2·bracketEps·n rows by construction) independently via a
  *     window partitioned by probe id, keeping only the two order
  *     statistics around each target rank; interpolation is Spark
  *     `percentile`'s own formula.
  *
  * Probes whose sketch bracket misses the target rank (ties massed at
  * the boundary, or `bracketEps = 0`) fall back to the native exact
  * percentile — one final aggregation for just those probes — so every
  * result is exact and therefore partition/AQE-invariant: the sketch
  * only ever narrows WHERE we sort, never WHAT we return. Tune
  * `bracketEps`/`accuracy` so sliver ≈ 2·eps·n fits one executor's
  * sort (at 10^12 rows, eps = 1e-5 → ~2·10^7-row sliver).
  *
  * The default `accuracy = 2000` is sized to the BRACKET's needs, not
  * an output guarantee: the bracket holds whenever GK rank error
  * n/accuracy < bracketEps·n, i.e. accuracy > 1/eps = 500 — 2000 is a
  * 4× margin, and a miss is verified (pass 2) and repaired (exact
  * fallback), never wrong. GK insert cost scales with summary size:
  * accuracy 10000 → 2000 measured 9.7 → 4.7 s on a 60M×2-column
  * pass-1 scan (PLANS.md r15).
  */
object Quantiles {

  /** Single-probe convenience over [[exactQuantiles]]. */
  def exactQuantile(df: DataFrame, column: String, q: Double,
                    bracketEps: Double = 0.002,
                    accuracy: Int = 2000): Option[Double] =
    exactQuantiles(df, Seq(column -> q), bracketEps, accuracy).head._2

  private final case class Probe(id: Int, c: String, q: Double,
                                 loIdx: Long, hiIdx: Long, frac: Double,
                                 b1: Double, b2: Double)

  /** All probes resolved with three shared full scans (+ one fallback
    * aggregation if any bracket missed). Result order mirrors `probes`;
    * `None` for a column with no non-null values (what native
    * `percentile` returns as SQL NULL).
    */
  def exactQuantiles(df0: DataFrame, probes: Seq[(String, Double)],
                     bracketEps: Double = 0.002,
                     accuracy: Int = 2000): Seq[((String, Double), Option[Double])] = {
    require(probes.nonEmpty, "need at least one (column, q) probe")
    probes.foreach { case (c, q) =>
      require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q for $c") }
    // NOT fanned out (r20-opt, measured): passes 1-2 partially
    // aggregate map-side — a single-row-group scan reduces to ONE
    // row before any exchange, so inserting a fan-out repartition
    // ships the full row set per pass instead and read 2.0-2.7x
    // SLOWER across the quantile-family queries (the §2.5 fan-out
    // only pays where a derived frame is re-consumed or per-row CPU
    // dominates — see ellipticBoundary, which caches its scored
    // frame fanned).
    val df = df0
    val cols = probes.map(_._1).distinct
    def v(c: String): Column = col(c).cast("double")

    // pass 1: per-column non-null count + one GK sketch over every
    // probe's bracket edges (nulls skipped by both, like percentile)
    val edges: Map[String, Seq[Double]] = cols.map { c =>
      c -> probes.filter(_._1 == c).flatMap { case (_, q) =>
        Seq(math.max(0.0, q - bracketEps), math.min(1.0, q + bracketEps))
      }
    }.toMap
    val aggExprs: Seq[Column] = cols.flatMap { c =>
      Seq(count(v(c)).as(s"__n_$c"),
        expr(s"approx_percentile(CAST(`$c` AS DOUBLE), " +
          s"array(${edges(c).mkString(",")}), $accuracy)").as(s"__b_$c"))
    }
    val r1 = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val nByCol = cols.map(c => c -> r1.getLong(r1.fieldIndex(s"__n_$c"))).toMap
    val brByCol = cols.map { c =>
      val i = r1.fieldIndex(s"__b_$c")
      c -> (if (r1.isNullAt(i)) Seq.empty[Double] else r1.getSeq[Double](i))
    }.toMap

    // per-probe target ranks; id = index into `probes`
    val live = probes.zipWithIndex.collect { case ((c, q), id) if nByCol(c) > 0L =>
      val n = nByCol(c)
      val rank = (n - 1).toDouble * q
      val loIdx = math.floor(rank).toLong
      // this probe's bracket pair within the column's edge array
      val base = probes.take(id).count(_._1 == c) * 2
      val br = brByCol(c)
      Probe(id, c, q, loIdx, math.ceil(rank).toLong, rank - loIdx,
        br(base), br(base + 1))
    }

    val resolved = scala.collection.mutable.Map[Int, Double]()
    val fallbacks = scala.collection.mutable.LinkedHashSet[Int]()
    if (live.nonEmpty) {
      // pass 2: exact below-bracket AND in-bracket counts for every
      // live probe at once
      val belowExprs = live.flatMap(p => Seq(
        count(when(v(p.c) < p.b1, 1)).as(s"__below_${p.id}"),
        count(when(v(p.c) >= p.b1 && v(p.c) <= p.b2, 1)).as(s"__in_${p.id}")))
      val r2 = df.agg(belowExprs.head, belowExprs.tail: _*).head()
      // local (1-based) ranks of the target order statistics inside the
      // sliver; a rank outside [1, inBracket] means the bracket missed
      // → exact fallback
      val locals = live.map { p =>
        val below = r2.getLong(r2.fieldIndex(s"__below_${p.id}"))
        p.id -> ((p.loIdx + 1 - below, p.hiIdx + 1 - below))
      }.toMap
      val inBracket = live.map(p =>
        p.id -> r2.getLong(r2.fieldIndex(s"__in_${p.id}"))).toMap
      val (bracketed, missed) = live.partition { p =>
        locals(p.id)._1 >= 1 && locals(p.id)._2 <= inBracket(p.id)
      }
      fallbacks ++= missed.map(_.id)
      // ties massed at the target collapse the bracket to one value
      // (b1 == b2): every in-bracket order statistic IS that value, so
      // the quantile is b1 with no sliver sort at all — this also
      // removes the degenerate case where a heavy tie run would have
      // made the "sliver" a large fraction of the table
      val (collapsed, ok) = bracketed.partition(p => p.b1 == p.b2)
      collapsed.foreach(p => resolved(p.id) = p.b1)

      // pass 3: tag sliver rows with their probe ids in one scan, rank
      // each probe's sliver via a window partitioned by probe id, keep
      // the two order statistics around each target rank
      if (ok.nonEmpty) {
        val spark = df.sparkSession
        import spark.implicits._
        // flat when/array tagging, NOT higher-order filter/transform:
        // HOF lambdas evaluate INTERPRETED per row — measured 20× the
        // whole-stage-codegen'd form on this very scan (PLANS.md r15;
        // same lesson as the native dot product). One array slot per
        // probe, null for a non-matching row, dropped after explode —
        // the tagged (id, v) set is identical.
        val parts: Seq[Column] = ok.map(p =>
          when(v(p.c) >= p.b1 && v(p.c) <= p.b2,
            struct(lit(p.id).as("id"), v(p.c).as("v"))))
        val tagged = df
          .select(explode(array(parts: _*)).as("m"))
          .filter(col("m").isNotNull)
          .select(col("m.id").as("id"), col("m.v").as("v"))
        val targets = ok.map(p => (p.id, locals(p.id)._1, locals(p.id)._2))
          .toDF("id", "lo", "hi")
        val picked = tagged
          .withColumn("__rn",
            row_number().over(Window.partitionBy(col("id")).orderBy(col("v")))
              .cast("long"))
          .join(broadcast(targets), "id")
          .filter(col("__rn") === col("lo") || col("__rn") === col("hi"))
          .select(col("id"), col("__rn"), col("v"))
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
        ok.foreach { p =>
          val (lo, hi) = locals(p.id)
          (picked.get((p.id, lo)), picked.get((p.id, hi))) match {
            case (Some(l), Some(h)) =>
              // Spark Percentile.getPercentile's interpolation, verbatim
              resolved(p.id) = l * (1.0 - p.frac) + h * p.frac
            case _ => fallbacks += p.id // bracket missed an order statistic
          }
        }
      }

      // fallback: native exact percentile, only for the missed probes —
      // correctness never depends on the sketch
      if (fallbacks.nonEmpty) {
        val fb = live.filter(p => fallbacks.contains(p.id))
        val fbExprs = fb.map(p =>
          expr(s"percentile(CAST(`${p.c}` AS DOUBLE), ${p.q}D)").as(s"__fb_${p.id}"))
        val r3 = df.agg(fbExprs.head, fbExprs.tail: _*).head()
        fb.foreach(p => resolved(p.id) = r3.getDouble(r3.fieldIndex(s"__fb_${p.id}")))
      }
    }

    probes.zipWithIndex.map { case ((c, q), id) =>
      ((c, q), if (nByCol(c) == 0L) None else Some(resolved(id)))
    }
  }
}
