package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema canary for the gate tables.
  *
  * The driver regenerates /root/testdata between rounds, and a writer
  * change can silently alter inferred Spark types (it happened:
  * events.ts flipped TIMESTAMP(NANOS) → naive timestamp[us], which
  * Spark 4 infers as TIMESTAMP_NTZ, breaking every event-time operator
  * at once). This spec pins the POST-`Tables.load` schema of every
  * gate table so such a regen fails here with a readable diff instead
  * of as a scatter of downstream DATATYPE_MISMATCH errors.
  */
class TablesSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every gate table loads with its pinned normalized schema") {
    val diffs = Tables.names.flatMap { name =>
      val got = table(name).schema.fields.map(f => f.name -> f.dataType).toSeq
      expected.get(name) match {
        case None => // a new gate table must be pinned here, readably
          Seq(s"$name: not pinned in TablesSchemaSpec.expected — add:" +
            s"\n  ${got.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}")
        case Some(want) if got == want => Nil
        case Some(want) =>
          Seq(s"$name:\n  expected ${want.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}" +
            s"\n  actual   ${got.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}")
      }
    }
    assert(diffs.isEmpty, "\nGate table schema drift (driver testdata regen?):\n" +
      diffs.mkString("\n"))
  }

  test("normalizeEventsTs converts an NTZ ts to session-zoned TIMESTAMP, value-preserving under UTC") {
    import spark.implicits._
    val ntz = Seq("2024-03-01 10:15:30.123456", "2024-03-02 00:00:00")
      .toDF("s")
      .withColumn("ts", col("s").cast(TimestampNTZType)).drop("s")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fixed = Tables.normalizeEventsTs(ntz)
    assert(fixed.schema("ts").dataType == TimestampType)
    val micros = fixed.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(micros.sameElements(Array(1709288130123456L, 1709337600000000L)))
  }

  test("normalizeEventsTs converts legacy long-nanos ts to micros TIMESTAMP") {
    import spark.implicits._
    val nanos = Seq(1709288130123456789L).toDF("ts")
    val fixed = Tables.normalizeEventsTs(nanos)
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.select(unix_micros(col("ts"))).as[Long].head() == 1709288130123456L)
  }

  test("event-time operators run directly over an NTZ-typed frame (defense in depth)") {
    import spark.implicits._
    def ntzFrame = Seq(
      (1L, "2024-01-01 10:00:00", "a", 1.0),
      (1L, "2024-01-01 10:10:00", "a", 2.0),
      (1L, "2024-01-01 13:00:00", "a", 3.0),
      (2L, "2024-01-01 09:00:00", "b", 4.0))
      .toDF("user_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast(TimestampNTZType)).drop("s")
    assert(ntzFrame.schema("ts").dataType == TimestampNTZType)

    // sessionize: 10:00/10:10 share a session; 13:00 opens a new one
    val sess = operators.Ops.sessionize(ntzFrame, Seq("user_id"), "ts",
      Seq(col("ts")), gapSeconds = 3600L)
    val byUser1 = sess.filter($"user_id" === 1L).orderBy("ts")
      .select("session_id").as[Long].collect()
    assert(byUser1.sameElements(Array(1L, 1L, 2L)))

    // as-of nearest over NTZ on both sides
    val left = ntzFrame.select($"user_id", $"ts", $"value")
    val right = ntzFrame.select($"user_id", $"ts".as("rts"), ($"value" * 10).as("rv"))
    val nearest = operators.Relational.asofJoin(left, right, Seq("user_id"),
      "ts", "rts", Seq("rv"), direction = "nearest")
    assert(nearest.count() == 4L)
    assert(nearest.filter($"asof_rv".isNull).count() == 0L)

    // range join: points into +/- 30 min intervals around themselves
    val iv = ntzFrame.select($"user_id",
      ($"ts".cast(TimestampType) - expr("INTERVAL 30 MINUTES")).cast(TimestampNTZType).as("lo"),
      ($"ts".cast(TimestampType) + expr("INTERVAL 30 MINUTES")).cast(TimestampNTZType).as("hi"))
    val rj = operators.Relational.rangeJoin(ntzFrame.select($"user_id", $"ts"), "ts",
      iv, "lo", "hi", Seq("user_id"), bucketSeconds = 1800L)
    // user 1: events at 10:00 and 10:10 fall in each other's windows
    // (2 matches each? no — each point matches its own interval plus the
    // neighbor's when within 30 min): 10:00∈[09:30,10:30]x2, 10:10 same,
    // 13:00 own only, user 2 own only → 2+2+1+1 = 6
    assert(rj.count() == 6L)

    // streaming entry points accept the NTZ column (analysis succeeds)
    val wa = streaming.Streams.windowedAgg(ntzFrame, "ts", "10 minutes",
      "1 hour", None, Seq("event_type"), Seq(count(lit(1)).as("n")))
    assert(wa.schema.fieldNames.contains("n"))
  }
}
