package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops
import graft.functions.Det

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("filterBy supports all comparison operators") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x")
    assert(Ops.filterBy(df, "x", ">", 3).count() == 2)
    assert(Ops.filterBy(df, "x", "<=", 2).count() == 2)
    assert(Ops.filterBy(df, "x", "==", 5).count() == 1)
    assert(Ops.filterBy(df, "x", "!=", 5).count() == 4)
    assertThrows[IllegalArgumentException](Ops.filterBy(df, "x", "~", 1))
  }

  test("melt is the wide-to-long inverse of pivot, nulls preserved") {
    val wide = Seq((1, Some(10.0), Some(0.1)), (2, None, Some(0.2)))
      .toDF("k", "a", "b")
    val long = graft.operators.Ops.melt(wide, Seq("k"), Seq("a", "b"))
      .orderBy("k", "variable")
      .as[(Int, String, Option[Double])].collect().toSeq
    assert(long == Seq(
      (1, "a", Some(10.0)), (1, "b", Some(0.1)),
      (2, "a", None), (2, "b", Some(0.2)))) // pandas melt keeps NaN rows
    // plans as a map-side Expand — no shuffle anywhere
    val plan = graft.operators.Ops.melt(wide, Seq("k"), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Exchange"))
  }

  test("rolling computes trailing-window aggregates per partition") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0))
      .toDF("k", "seq", "v")
    val r = Ops.rolling(df, Seq("k"), Seq(col("seq").asc), "v", 2, "sum", "roll")
      .orderBy("k", "seq").select("roll").as[Double].collect()
    assert(r.toSeq == Seq(10.0, 30.0, 50.0, 5.0))
  }

  test("rolling with empty partitionBy is a global trailing window") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("seq", "v")
    val r = Ops.rolling(df, Seq.empty, Seq(col("seq").asc), "v", 3, "mean", "m")
      .orderBy("seq").select("m").as[Double].collect()
    assert(r.toSeq == Seq(1.0, 1.5, 2.0))
  }

  test("joinMany chains N frames on shared keys") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "a")
    val b = Seq((1, 10), (2, 20)).toDF("k", "b")
    val c = Seq((1, true)).toDF("k", "c")
    val j = Ops.joinMany(Seq(a, b, c), Seq("k"))
    assert(j.columns.toSeq == Seq("k", "a", "b", "c"))
    assert(j.count() == 1)
  }

  test("saltedJoin matches plain join results") {
    val left = table("orders").select("o_orderkey", "o_custkey")
    val right = table("customer").select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = Ops.join(left, right, Seq("o_custkey")).count()
    val salted = Ops.saltedJoin(left, right, "o_custkey", buckets = 4).count()
    assert(plain == salted && plain > 0)
  }

  test("Det.stddevAt matches the textbook sample stddev") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val got = df.agg(Det.stddevAt(col("x"), 4)).as[Double].head()
    assert(math.abs(got - 2.13808993529939) < 1e-9) // sample stddev
  }

  test("Det sums are exact under repartitioning") {
    val df = table("lineitem")
    val a = df.agg(Det.sumMoney(col("l_extendedprice"))).as[Double].head()
    val b = df.repartition(17).agg(Det.sumMoney(col("l_extendedprice"))).as[Double].head()
    assert(a == b)
  }

  test("interpolateLinear fills interior gaps, leaves boundary nulls") {
    val df = Seq(
      ("a", 0, Some(0.0)), ("a", 1, None), ("a", 2, None), ("a", 3, Some(30.0)),
      ("a", 5, None), // trailing: stays null
      ("b", 0, None), ("b", 1, Some(7.0)) // leading: stays null
    ).toDF("k", "ord", "v")
    val got = Ops.interpolateLinear(df, "v", Seq("k"), col("ord"))
      .orderBy("k", "ord").as[(String, Int, Option[Double])].collect().toSeq
    assert(got.map(_._3) == Seq(Some(0.0), Some(10.0), Some(20.0), Some(30.0),
      None, None, Some(7.0)))
    // non-uniform spacing: value at ord 5 between (3, 30) and (7, 70) = 50
    val df2 = Seq((3, Some(30.0)), (5, None), (7, Some(70.0))).toDF("ord", "v")
    val g2 = Ops.interpolateLinear(df2, "v", Seq.empty, col("ord"))
      .orderBy("ord").as[(Int, Option[Double])].collect()
    assert(g2(1)._2.contains(50.0))
  }

  test("winsorize clamps to group percentiles and keeps every row") {
    val df = (Seq.fill(8)(10.0) ++ Seq(-1000.0, 1000.0)).zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("id", "v")
    val got = Ops.winsorize(df, "v", 0.1, 0.9, Seq.empty, "w")
    assert(got.count() == 10)
    val w = got.orderBy("id").select("w").as[Double].collect()
    assert(w.forall(x => x >= -1000.0 && x <= 1000.0))
    assert(w.max < 1000.0 && w.min > -1000.0) // extremes got capped
    assert(w.count(_ == 10.0) == 8) // interior untouched
    // nulls stay null — the clamp must not fabricate the lower bound
    val withNull = Seq((1, Some(1.0)), (2, None), (3, Some(9.0)))
      .toDF("id", "v")
    val g2 = Ops.winsorize(withNull, "v", 0.0, 1.0, Seq.empty, "w")
      .orderBy("id").select("w").as[Option[Double]].collect()
    assert(g2.toSeq == Seq(Some(1.0), None, Some(9.0)))
  }

  test("resampleDaily densifies every day between a key's first and last") {
    val df = Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-03-10", 9.0)
    ).toDF("k", "d", "v").withColumn("d", to_date(col("d")))
    val dense = Ops.resampleDaily(df, Seq("k"), "d").orderBy("k", "day")
    val a = dense.filter(col("k") === "a").collect()
    assert(a.length == 4) // Jan 1,2,3,4
    assert(a.map(r => Option(r.getAs[Double]("v"))).toSeq ==
      Seq(Some(1.0), None, None, Some(4.0)))
    assert(dense.filter(col("k") === "b").count() == 1) // single-day key
  }

  test("missing-data ops: ffill carries last non-null, fill/drop behave") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None), ("a", 4, Some(40.0)),
      ("b", 1, None), ("b", 2, Some(5.0))
    ).toDF("k", "ord", "v")
    val ff = Ops.forwardFill(df, Seq("v"), Seq("k"), Seq(col("ord").asc))
      .orderBy("k", "ord").as[(String, Int, Option[Double])].collect().toSeq
    assert(ff.map(_._3) == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0),
      None, Some(5.0))) // leading null stays: nothing earlier to carry
    val filled = Ops.fillMissing(df, Map("v" -> -1.0))
      .filter(col("v") === -1.0).count()
    assert(filled == 3)
    assert(Ops.dropMissing(df, Seq("v")).count() == 3)
  }

  test("quantilesByRanked equals quantilesBy on every group shape") {
    val rng = new scala.util.Random(7)
    // uneven group sizes, ties, a single-row group, and an all-null
    // group (must survive with null quantiles, percentile's contract)
    val rows =
      (1 to 500).map(i => ("big", Some(rng.nextGaussian() * 10))) ++
      (1 to 97).map(i => ("ties", Some((i % 5).toDouble))) ++
      Seq(("one", Some(42.0)), ("allnull", None), ("allnull", None)) ++
      (1 to 30).map(i => ("mixed", if (i % 3 == 0) None else Some(i.toDouble)))
    val df = rows.toDF("k", "v")
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(_.toSeq).toSeq
    assert(sorted(Ops.quantilesByRanked(df, Seq("k"), "v", probs)) ==
      sorted(Ops.quantilesBy(df, Seq("k"), "v", probs)))
  }
}
