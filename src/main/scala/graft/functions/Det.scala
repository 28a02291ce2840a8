package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (order-independent) numeric aggregates.
  *
  * Floating-point SUM/AVG/STDDEV over doubles depend on accumulation
  * order, which differs across engines and across partition counts.
  * For cross-engine reproducibility (and stable results under AQE
  * re-partitioning at scale) we sum in fixed-point decimal — decimal
  * addition is exact and associative — then convert the single final
  * value to double. One extra cast per row, fully codegen'd, no extra
  * shuffle or pass.
  */
object Det {

  /** Exact sum of a money-like column (2 decimal places), as double. */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum at the given decimal scale, as double. */
  def sumAt(c: Column, scale: Int, precision: Int = 28): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, one double div. */
  def meanAt(c: Column, scale: Int = 6): Column =
    sumAt(c, scale) / count(c)

  /** Order-independent sample stddev via exact decimal moments:
    * sqrt((sum(x^2) - sum(x)^2/n) / (n-1)). All sums exact; the final
    * few double ops are identical IEEE operations on both engines.
    */
  def stddevAt(c: Column, scale: Int = 6): Column = {
    val n = count(c).cast("double")
    val s = sumAt(c, scale)
    val s2 = sumAt(c * c, scale)
    sqrt(greatest(lit(0.0), (s2 - s * s / n) / (n - lit(1.0))))
  }

  /** [[stddevAt]] that yields NULL (not an ANSI divide-by-zero error)
    * for single-value groups — for operators whose grouping can
    * legitimately produce n = 1 (e.g. one-row series). Mirror with
    * [[sqlStddevSafeAt]].
    */
  def stddevSafeAt(c: Column, scale: Int = 6): Column = {
    val n = count(c).cast("double")
    val s = sumAt(c, scale)
    val s2 = sumAt(c * c, scale)
    sqrt(greatest(lit(0.0),
      (s2 - s * s / n) / when(n - lit(1.0) =!= 0.0, n - lit(1.0))))
  }

  /** SQL fragments mirroring the above, for DuckDB oracle parity. */
  def sqlSumMoney(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSumAt(e: String, scale: Int, precision: Int = 28): String =
    s"CAST(SUM(CAST($e AS DECIMAL($precision,$scale))) AS DOUBLE)"
  def sqlMeanAt(e: String, scale: Int = 6): String =
    s"(${sqlSumAt(e, scale)} / COUNT($e))"
  def sqlStddevAt(e: String, scale: Int = 6): String = {
    val n = s"CAST(COUNT($e) AS DOUBLE)"
    val s = sqlSumAt(e, scale)
    val s2 = sqlSumAt(s"($e)*($e)", scale)
    s"SQRT(GREATEST(0.0, ($s2 - $s*$s/$n) / ($n - 1.0)))"
  }
  def sqlStddevSafeAt(e: String, scale: Int = 6): String = {
    val n = s"CAST(COUNT($e) AS DOUBLE)"
    val s = sqlSumAt(e, scale)
    val s2 = sqlSumAt(s"($e)*($e)", scale)
    s"SQRT(GREATEST(0.0, ($s2 - $s*$s/$n) / NULLIF($n - 1.0, 0.0)))"
  }
}
