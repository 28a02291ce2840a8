package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantiles at scale.
  *
  * Spark's native exact `percentile` buffers every value of the column
  * in the aggregation state and merges it onto one reducer — fine for
  * thousands of rows, a single-node bottleneck for billions (it is the
  * dominant cost wherever the DQ/anomaly family needs an exact
  * boundary). [[exactQuantile]] returns the SAME exact interpolated
  * value with a bounded plan:
  *
  *  1. bracket the target rank with `approx_percentile` at
  *     `q ± bracketEps` (GK sketch, map-side combinable, rank error
  *     ≤ n/accuracy);
  *  2. one exact COUNT of values strictly below the bracket;
  *  3. sort ONLY the in-bracket sliver (~2·bracketEps·n rows by
  *     construction) and read the two order statistics around the
  *     target rank; interpolate with Spark `percentile`'s own formula.
  *
  * If the sketch bracket somehow misses the target rank (ties massed
  * at the boundary), it falls back to the native exact percentile, so
  * the result is always exact and therefore partition/AQE-invariant —
  * the approx step only ever narrows WHERE we sort, never WHAT we
  * return. Tune `bracketEps`/`accuracy` so sliver ≈ 2·eps·n fits one
  * executor's sort (at 10^12 rows, eps = 1e-5 → ~2·10^7-row sliver).
  */
object Quantiles {

  def exactQuantile(df: DataFrame, column: String, q: Double,
                    bracketEps: Double = 0.002,
                    accuracy: Int = 10000): Option[Double] = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val c = col(column)
    val vals = df.filter(c.isNotNull).select(c.cast("double").as(column))
    val n = vals.count()
    if (n == 0) return None
    val rank = (n - 1).toDouble * q
    val loIdx = math.floor(rank).toLong
    val hiIdx = math.ceil(rank).toLong
    val frac = rank - loIdx

    def fallback(): Option[Double] = Some(
      vals.agg(expr(s"percentile($column, ${q}D)")).head().getDouble(0))

    val qLo = math.max(0.0, q - bracketEps)
    val qHi = math.min(1.0, q + bracketEps)
    val br = vals.agg(
      expr(s"approx_percentile($column, array(${qLo}D, ${qHi}D), $accuracy)"))
      .head().getSeq[Double](0)
    val (b1, b2) = (br.head, br.last)
    val below = vals.filter(col(column) < b1).count()
    // local (1-based) ranks of the two global order statistics inside
    // the sliver; if either falls outside, the bracket missed → exact
    // fallback (correctness never depends on the sketch)
    val loLocal = loIdx + 1 - below
    val hiLocal = hiIdx + 1 - below
    if (loLocal < 1) return fallback()
    val sliver = vals.filter(col(column) >= b1 && col(column) <= b2)
    // the sliver is small by construction, so a single-partition
    // row_number sort is the cheap step here, not a bottleneck
    val picked = sliver
      .withColumn("__rn", row_number().over(Window.orderBy(col(column))))
      .filter(col("__rn") === loLocal || col("__rn") === hiLocal)
      .select(col("__rn"), col(column))
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
    (picked.get(loLocal), picked.get(hiLocal)) match {
      case (Some(lo), Some(hi)) =>
        // Spark Percentile.getPercentile's own interpolation, verbatim
        Some(lo * (1.0 - frac) + hi * frac)
      case _ => fallback()
    }
  }
}
