package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("jsonField extracts nested values") {
    val df = Seq("""{"k": 7, "s": {"x": "y"}}""", """{"k": null}""", "not json")
      .toDF("j")
    val r = df.select(
      Ops.jsonField(col("j"), "$.k").cast("long"),
      Ops.jsonField(col("j"), "$.s.x")).collect()
    assert(r(0).getLong(0) == 7L && r(0).getString(1) == "y")
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))
  }

  test("sessionize splits on gaps and numbers sessions cumulatively") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("u1", 1L, ts("2024-01-01 10:00:00")),
      ("u1", 2L, ts("2024-01-01 10:10:00")),  // same session (10 min)
      ("u1", 3L, ts("2024-01-01 11:30:00")),  // new session (80 min gap)
      ("u2", 4L, ts("2024-01-01 10:00:00"))
    ).toDF("u", "id", "ts")
    val out = Ops.sessionize(df, Seq("u"), "ts",
        Seq(col("ts").asc, col("id").asc), gapSeconds = 1800)
      .orderBy("id").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("rollingRange uses value ranges, shrinking over gaps") {
    // day numbers 1,2,10: a 3-unit range window at 10 must NOT see 1,2
    val df = Seq((1, 10.0), (2, 20.0), (10, 5.0)).toDF("d", "v")
    val out = Ops.rollingRange(df, Seq.empty, col("d"), 2, "v", "sum", "s")
      .orderBy("d").select("s").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 30.0, 5.0))
  }

  test("DQ.distribution computes chi-square against expected proportions") {
    val uniform = (1 to 100).map(i => (i % 10).toDouble).toDF("x")
    val r = graft.quality.DQ.distribution(uniform, "x",
      edges = Seq(0, 5, 10), expectedProbs = Seq(0.5, 0.5), critical = 1.0).head()
    assert(r.getAs[Long]("n") == 100)
    assert(r.getAs[Double]("chi2") == 0.0) // exactly uniform
    assert(r.getAs[Boolean]("passed"))
  }
}
