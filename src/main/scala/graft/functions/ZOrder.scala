package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data
  * clustering — the layout trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`: rows sorted by the bit-interleaved key are
  * simultaneously "almost sorted" on EVERY clustering column, so
  * per-file min/max statistics become tight on all of them at once
  * and a selective filter on any clustered column skips most files.
  * (The reference's file connector writes hive partitions only —
  * cloud_connector.py/file_connector.py:203 — which prunes on one
  * coarse key; z-ordering is the 100 TB-scale companion for the
  * high-cardinality columns partitioning can't take.)
  *
  * Everything here is a pure Column expression (bit shifts + masks),
  * codegen'd and shuffle-free; the only exchange in
  * [[graft.sources.FileSink.writeZOrdered]] is the final range
  * repartition that the clustered layout requires anyway.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (non-negative integral)
    * column into one long: bit b of column d lands at position
    * b*dims + (dims-1-d), so column 0 contributes the most-significant
    * bit of each group — the classic Morton layout. Requires
    * bits*dims ≤ 63.
    *
    * The expression is a flat sum of `bits × dims` shift/mask terms:
    * whole-stage-codegen folds it into straight-line long arithmetic.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must fit a long: bits=$bits dims=${cols.size}")
    val dims = cols.size
    val terms = for {
      b <- 0 until bits
      d <- 0 until dims
    } yield shiftleft(
      shiftright(cols(d).cast("long"), b).bitwiseAND(lit(1L)),
      b * dims + (dims - 1 - d))
    terms.reduce(_ + _)
  }

  /** Scale an arbitrary numeric column into [0, 2^bits) given its
    * min/max (pass literals from one stats pass — see
    * [[scaleToGrid]]). Constant columns map to 0.
    */
  def linearScale(c: Column, minV: Double, maxV: Double,
                  bits: Int): Column = {
    val cells = (1L << bits) - 1
    if (maxV <= minV) lit(0L)
    else least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(minV)) * cells / (maxV - minV))
        .cast("long")))
  }

  /** One min/max aggregation over `cols`, then each column scaled
    * onto the 2^bits grid as `__z_<col>`, plus the interleaved
    * `__zvalue`. The stats row is a bounded driver collect (2 values
    * per clustering column). Nulls sort first (scaled to 0).
    */
  def scaleToGrid(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val scaled = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val (mn, mx) = (Option(stats.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
        Option(stats.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double]))
      acc.withColumn(s"__z_$c",
        coalesce(linearScale(col(c), mn, mx, bits), lit(0L)))
    }
    scaled.withColumn("__zvalue",
      interleave(cols.map(c => col(s"__z_$c")), bits))
  }

  /** The DuckDB-expressible mirror of [[interleave]] for oracle
    * parity checks: the identical flat shift/mask sum as SQL text
    * over the given column expressions.
    */
  def interleaveSql(exprs: Seq[String], bits: Int): String = {
    val dims = exprs.size
    val terms = for {
      b <- 0 until bits
      d <- 0 until dims
    } yield s"((((${exprs(d)}) >> $b) & 1) << ${b * dims + (dims - 1 - d)})"
    terms.mkString(" + ")
  }
}
