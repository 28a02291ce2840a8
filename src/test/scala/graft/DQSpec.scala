package graft

import org.apache.spark.sql.functions._
import graft.quality.DQ

class DQSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, Some("a@x.com"), 10.0),
    (2, Some("bad-email"), 200.0),
    (3, None, -5.0),
    (3, Some("c@x.com"), 50.0)
  ).toDF("id", "email", "amount")

  test("check fuses rules into one pass and counts violations") {
    val res = DQ.check(df, Seq(
      DQ.NotNull("nn_email", "email"),
      DQ.ValueRange("rng_amount", "amount", 0, 100),
      DQ.RegexMatch("re_email", "email", "^[^@]+@[^@]+$"),
      DQ.CrossField("cf_pos", "amount>0", col("amount") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(5))).toMap
    assert(res("nn_email") == ((1L, false)))
    assert(res("rng_amount") == ((2L, false))) // 200 and -5
    assert(res("re_email") == ((1L, false)))   // bad-email (null doesn't violate regex)
    assert(res("cf_pos") == ((1L, false)))     // -5
  }

  test("split partitions rows exactly and tags every violated rule in order") {
    val rules = Seq(
      DQ.NotNull("nn_email", "email"),
      DQ.ValueRange("rng_amount", "amount", 0, 100),
      DQ.RegexMatch("re_email", "email", "^[^@]+@[^@]+$"))
    val (clean, quarantined) = DQ.split(df, rules)
    // clean ∪ quarantined = df, disjoint
    assert(clean.count() + quarantined.count() == df.count())
    assert(clean.columns.toSeq == df.columns.toSeq) // original shape
    assert(clean.select("id").as[Int].collect().toSet == Set(1, 3)) // id=3/c@x.com row
    val tags = quarantined.collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("email"),
        r.getAs[String]("failed_rules"))).toSet
    assert(tags == Set(
      (2, "bad-email", "rng_amount,re_email"),  // 200 out of range AND bad format
      (3, null, "nn_email,rng_amount")))        // null email, -5 out of range
                                                // (regex over NULL counts clean)
    // split's tag semantics equal check's counts rule-by-rule
    val counts = DQ.check(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val tagged = quarantined.select(explode(split(col("failed_rules"), ",")).as("r"))
      .groupBy("r").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tagged == counts.filter(_._2 > 0))
  }

  test("check honors maxViolationPct thresholds") {
    val res = DQ.check(df, Seq(DQ.NotNull("nn", "email", maxViolationPct = 50.0)))
      .select("passed").as[Boolean].head()
    assert(res) // 25% nulls <= 50%
  }

  test("profile reports nulls, distincts and moments") {
    val p = DQ.profile(df, numericCols = Seq("amount"), otherCols = Seq("email"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("amount").getAs[Long]("n_rows") == 4)
    assert(p("amount").getAs[Long]("null_count") == 0)
    assert(p("email").getAs[Long]("null_count") == 1)
    assert(p("email").getAs[Long]("distinct_cnt") == 3)
    assert(p("amount").getAs[Double]("min_val") == -5.0)
    assert(p("amount").getAs[Double]("max_val") == 200.0)
    assert(math.abs(p("amount").getAs[Double]("mean_val") - 63.75) < 1e-9)
  }

  test("uniqueness flags duplicate keys") {
    val u = DQ.uniqueness(df, Seq("id")).head()
    assert(u.getAs[Long]("total") == 4 && u.getAs[Long]("dup_count") == 1)
    assert(!u.getAs[Boolean]("passed"))
  }

  test("refIntegrity counts orphans") {
    val parent = Seq(1, 2).toDF("pid")
    val r = DQ.refIntegrity(df, "id", parent, "pid", "child->parent").head()
    assert(r.getAs[Long]("orphans") == 2) // both id=3 rows
    assert(!r.getAs[Boolean]("passed"))
  }

  test("score aggregates pass rates by type") {
    val checks = DQ.check(df, Seq(
      DQ.NotNull("nn_id", "id"),
      DQ.NotNull("nn_email", "email"),
      DQ.ValueRange("rng", "amount", -100, 1000)))
    val s = DQ.score(checks).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("score")).toMap
    assert(s("completeness") == 50.0)
    assert(s("validity") == 100.0)
    assert(math.abs(s("overall") - 200.0 / 3) < 1e-9)
  }

  test("TypeCastable and DateFormat rules flag unparseable values") {
    val df2 = Seq(("12", "2024-01-05"), ("x9", "2024-13-45"), ("7", "2024-02-29"))
      .toDF("num", "d")
    val res = DQ.check(df2, Seq(
      DQ.TypeCastable("tc", "num", "INT"),
      DQ.DateFormat("df", "d", "yyyy-MM-dd")))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(res("tc") == 1L) // "x9"
    assert(res("df") == 1L) // month 13; 2024-02-29 is a real leap day
  }

  test("TypeCastable regexp fast-path agrees with bare try_cast on edge cases") {
    // the guard must only short-circuit values try_cast would ALSO
    // reject: overflow slips past the regexp (all digits) and must be
    // caught by the cast; whitespace padding and exponents must pass;
    // NaN/Infinity are castable to double (guard disabled there)
    val vals = Seq("12", " 34 ", "+5", "-6", "1e2", "2147483648", // int overflow
      "12.5", "x9", "1-URGENT", "", " ", "NaN", "Infinity", "0x1F", null)
    val df3 = vals.toDF("v")
    for (target <- Seq("INT", "BIGINT", "DECIMAL(18,2)", "DOUBLE")) {
      val guarded = DQ.check(df3, Seq(DQ.TypeCastable("g", "v", target)))
        .select("violations").head().getLong(0)
      val bare = df3.filter(col("v").isNotNull &&
        expr(s"try_cast(v AS $target)").isNull).count()
      assert(guarded == bare, s"target=$target guarded=$guarded bare=$bare")
    }
    // control-char whitespace: Spark's cast trims every char <= 0x20,
    // so "12" IS castable and must not be flagged by the guard
    val ctl = Seq("\u0006" + "12", "\u0001" + " 7 ").toDF("v")
    assert(DQ.check(ctl, Seq(DQ.TypeCastable("c", "v", "INT")))
      .select("violations").head().getLong(0) == 0L)
    // NON-string sources: the guard must stay off — boolean->INT is a
    // legal ANSI cast even though its string rendering is "true"
    val b = Seq(true, false).toDF("flag")
    assert(DQ.check(b, Seq(DQ.TypeCastable("b", "flag", "INT")))
      .select("violations").head().getLong(0) == 0L)
    val ts = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).toDF("t")
    val viaCheck = DQ.check(ts, Seq(DQ.TypeCastable("t", "t", "BIGINT")))
      .select("violations").head().getLong(0)
    val direct = ts.filter(col("t").isNotNull &&
      expr("try_cast(t AS BIGINT)").isNull).count()
    assert(viaCheck == direct) // whatever the engine says, guard agrees
  }

  test("quantileProfile approx tracks exact within sketch accuracy") {
    val data = (1 to 10000).map(i => (i.toDouble, (i * i).toDouble))
      .toDF("a", "b")
    def vals(approx: Boolean): Map[String, Seq[Double]] =
      DQ.quantileProfile(data, Seq("a", "b"), approx = approx)
        .collect().map(r => r.getString(0) ->
          (1 to 4).map(r.getDouble)).toMap
    val exact = vals(approx = false)
    val approx = vals(approx = true)
    // GK accuracy 10000 on 10k rows: rank error <= n/accuracy = 1 row;
    // 'a' is uniform 1..10000 so one rank = one unit
    for (c <- Seq("a", "b"); i <- 0 until 4) {
      val (e, g) = (exact(c)(i), approx(c)(i))
      val tol = if (c == "a") 2.0 else math.abs(e) * 0.001 + 2.0
      assert(math.abs(e - g) <= tol, s"$c p$i exact=$e approx=$g")
    }
    assert(exact("a")(1) == 5000.5 || math.abs(exact("a")(1) - 5000.5) < 1.0)
  }

  test("freshness detects future rows and lag") {
    val events = Seq("2024-01-01 10:00:00", "2024-02-05 00:00:00")
      .toDF("raw").select(col("raw").cast("timestamp").as("ts"))
    val f = DQ.freshness(events, "ts", "2024-02-01 00:00:00", maxLagDays = 7).head()
    assert(f.getAs[Long]("future_cnt") == 1)
    assert(!f.getAs[Boolean]("passed"))
  }

  test("requireQuality gates pipeline composition on the score") {
    val rules = Seq(DQ.NotNull("nn_id", "id"), DQ.NotNull("nn_email", "email"))
    // 1 of 2 rules passes → score 50
    val ex = intercept[DQ.QualityGateException](
      DQ.requireQuality(df, rules, minScore = 80.0))
    assert(ex.score == 50.0 && ex.failed == Seq("nn_email"))
    // same frame passes a 50% gate and flows on
    assert(DQ.requireQuality(df, rules, minScore = 50.0).count() == df.count())
  }

  test("correlation is exactly 1 for a linear relationship") {
    val lin = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
    val c = DQ.correlation(lin, "x", "y").head().getAs[Double]("corr_val")
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("psi: zero for identical distributions, flags a real shift") {
    val a = (1 to 100).map(i => (i % 10).toDouble).toDF("x")
    val same = DQ.psi(a, a, "x", Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0)).head()
    assert(same.getAs[Double]("psi") == 0.0 && !same.getAs[Boolean]("drifted"))
    // shift all mass into the top buckets
    val b = (1 to 100).map(i => 8.0 + (i % 2)).toDF("x")
    val moved = DQ.psi(a, b, "x", Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0)).head()
    assert(moved.getAs[Double]("psi") > 0.25 && moved.getAs[Boolean]("drifted"))
    assert(moved.getAs[Long]("n_ref") == 100L && moved.getAs[Long]("n_cur") == 100L)
    // an empty snapshot: counts still real zeros, psi/drifted null
    // (not NaN) — assert via isNullAt, a null Long unboxes to 0 and
    // would green-light the wrong output
    val empty = a.filter($"x" < -1)
    val r = DQ.psi(a, empty, "x", Seq(0.0, 5.0, 10.0)).head()
    assert(r.isNullAt(r.fieldIndex("psi")) && r.isNullAt(r.fieldIndex("drifted")))
    assert(!r.isNullAt(r.fieldIndex("n_cur")) && r.getAs[Long]("n_cur") == 0L)
    assert(r.getAs[Long]("n_ref") == 100L)
  }

  test("entropy: 0 for constant, log2(k) for uniform, null-blind") {
    val const = Seq.fill(10)("x").toDF("c")
    assert(DQ.entropy(const, "c").head().getAs[Double]("entropy") == 0.0)
    val uniform = (1 to 64).map(i => s"v${i % 8}").toDF("c")
    val u = DQ.entropy(uniform, "c").head()
    assert(u.getAs[Long]("n_values") == 8L)
    assert(math.abs(u.getAs[Double]("entropy") - 3.0) < 1e-9) // log2(8)
    val withNulls = (Seq("a", "a", "b", "b") ++ Seq.fill(4)(null: String)).toDF("c")
    val w = DQ.entropy(withNulls, "c").head()
    assert(w.getAs[Long]("n_values") == 2L && w.getAs[Double]("entropy") == 1.0)
  }

  test("psiCategorical flags a category-mix shift; benford flags uniform data") {
    val a = (Seq.fill(80)("x") ++ Seq.fill(20)("y")).toDF("c")
    val b = (Seq.fill(20)("x") ++ Seq.fill(80)("y")).toDF("c")
    val same = DQ.psiCategorical(a, a, "c", Seq("x", "y")).head()
    assert(same.getAs[Double]("psi") == 0.0)
    val moved = DQ.psiCategorical(a, b, "c", Seq("x", "y"), threshold = 0.25).head()
    assert(moved.getAs[Double]("psi") > 0.25 && moved.getAs[Boolean]("drifted"))
    // benford: 1-leading values pass easily, uniform 100..900 fails
    val benfordish = (1 to 9).flatMap(d =>
      Seq.fill((DQ.benfordP(d) * 1000).round.toInt)(d * 10.0)).toDF("v")
    assert(DQ.benford(benfordish, "v", critical = 20.0).head().getAs[Boolean]("passed"))
    val uniform = (1 to 9).flatMap(d => Seq.fill(100)(d * 100.0)).toDF("v")
    assert(!DQ.benford(uniform, "v", critical = 20.0).head().getAs[Boolean]("passed"))
    // sub-1 values are out of scope; empty scope yields null chi2
    val tiny = Seq(0.1, 0.5).toDF("v")
    val r = DQ.benford(tiny, "v").head()
    assert(r.getAs[Long]("n") == 0L && r.isNullAt(r.fieldIndex("chi2")))
  }

  test("ksBinned: zero for identical samples, one for disjoint ones") {
    val a = (1 to 100).map(i => (i % 10).toDouble).toDF("x")
    val same = DQ.ksBinned(a, a, "x", Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0)).head()
    assert(same.getAs[Double]("ks") == 0.0 && !same.getAs[Boolean]("drifted"))
    // all reference mass in [0,2), all current mass in [8,10): KS = 1
    val lo = Seq.fill(50)(1.0).toDF("x")
    val hi = Seq.fill(50)(9.0).toDF("x")
    val far = DQ.ksBinned(lo, hi, "x", Seq(0.0, 2.0, 4.0, 6.0, 8.0, 10.0)).head()
    assert(far.getAs[Double]("ks") == 1.0 && far.getAs[Boolean]("drifted"))
    // empty snapshot: counts real, ks/drifted null
    val r = DQ.ksBinned(a, a.filter($"x" < -1), "x", Seq(0.0, 5.0, 10.0)).head()
    assert(r.isNullAt(r.fieldIndex("ks")) && r.getAs[Long]("n_cur") == 0L &&
      !r.isNullAt(r.fieldIndex("n_cur")))
  }

  test("kAnonymity counts violating quasi-identifier groups") {
    // groups: (x,1) x5 ok for k=3; (x,2) x2 and (y,1) x1 violate
    val df = (Seq.fill(5)(("x", 1)) ++ Seq.fill(2)(("x", 2)) ++ Seq(("y", 1)))
      .toDF("a", "b")
    val r = DQ.kAnonymity(df, Seq("a", "b"), k = 3).head()
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_violating") == 2L)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(r.getAs[Long]("n_rows_at_risk") == 3L)
  }

  test("keySkew surfaces the hot key with its share and ratio-to-average") {
    // key "hot" has 6 of 10 rows across 3 distinct keys: share 0.6, ratio 1.8
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold")).toDF("k")
    val top = DQ.keySkew(df, Seq("k"), topN = 2)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(top == Seq(("hot", 6L, 0.6, 1.8), ("warm", 3L, 0.3, 0.9)))
  }

  test("topValues profiles per-column top-k with shares against non-null totals") {
    // col a: x*4, y*3, z*2, w*1 over 10 rows; col b has 5 nulls → the
    // share denominator must be the NON-NULL total (5), not the row count
    val df = (Seq.fill(4)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z") ++ Seq("w"))
      .zipWithIndex
      .map { case (a, i) => (a, if (i < 5) null else "k") }
      .toDF("a", "b")
    val got = DQ.topValues(df, Seq("a", "b"), k = 2)
      .as[(String, String, Long, Double, Int)].collect().toSet
    assert(got == Set(
      ("a", "x", 4L, 0.4, 1), ("a", "y", 3L, 0.3, 2),
      ("b", "k", 5L, 1.0, 1)))
    // count ties resolve by value ascending, and the plan carries the
    // WindowGroupLimit pre-shuffle prune (the 100 TB guard)
    val tied = Seq("m", "m", "n", "n", "o").toDF("a")
    val top = DQ.topValues(tied, Seq("a"), k = 1)
      .as[(String, String, Long, Double, Int)].collect().toSeq
    assert(top == Seq(("a", "m", 2L, 0.4, 1)))
    val plan = DQ.topValues(tied, Seq("a"), k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("rulesFromJson parses the reference config shape into the Rule ADT") {
    import spark.implicits._
    val df = Seq(("A", Some(5.0), 1.0), ("Z", None, -1.0)).toDF("s", "x", "y")
    val json =
      """{"rules": [
        |  {"rule_id": "nn", "type": "completeness", "column": "x"},
        |  {"rule_id": "rng", "type": "range", "column": "y", "min": 0, "max": 10},
        |  {"rule_id": "pat", "type": "pattern", "column": "s", "pattern": "^[A-M]"},
        |  {"rule_id": "al", "type": "allowed_values", "column": "s", "values": ["A", "B"]},
        |  {"rule_id": "xf", "type": "consistency", "name": "xy", "condition": "x > y"}
        |]}""".stripMargin
    val viaJson = DQ.check(df, DQ.rulesFromJson(json))
      .select("rule_id", "violations", "passed")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaJson("nn") == ((1L, false)))   // one null x
    assert(viaJson("rng") == ((1L, false)))  // -1 out of range
    assert(viaJson("pat") == ((1L, false)))  // "Z" fails ^[A-M]
    assert(viaJson("al") == ((1L, false)))   // "Z" not allowed
    assert(viaJson("xf") == ((1L, false)))   // null x > y -> violation
    // config output == hand-built ADT output, row for row
    val hand = DQ.check(df, Seq(
      DQ.NotNull("nn", "x"), DQ.ValueRange("rng", "y", 0, 10),
      DQ.RegexMatch("pat", "s", "^[A-M]"),
      DQ.AllowedValues("al", "s", Seq("A", "B")),
      DQ.CrossField("xf", "xy", col("x") > col("y"))))
    assert(DQ.check(df, DQ.rulesFromJson(json)).collect().toSeq ==
      hand.collect().toSeq)
    // loud failures on malformed configs
    assert(intercept[IllegalArgumentException](
      DQ.rulesFromJson("""{"rules": [{"rule_id": "u", "type": "wat"}]}"""))
      .getMessage.contains("wat"))
    assert(intercept[IllegalArgumentException](
      DQ.rulesFromJson("""{"nope": []}""")).getMessage.contains("rules"))
  }

  test("ksExact equals the brute-force statistic, on every bucket count") {
    import spark.implicits._
    val ref = (1 to 200).map(i => (i % 37).toDouble).toDF("v")
    val cur = (1 to 150).map(i => ((i % 29) + 3).toDouble).toDF("v")
    // brute force on the driver: max CDF gap at every pooled value
    val rv = ref.as[Double].collect().sorted
    val cv = cur.as[Double].collect().sorted
    val pool = (rv ++ cv).distinct.sorted
    val brute = pool.map { x =>
      math.abs(rv.count(_ <= x).toDouble / rv.length -
        cv.count(_ <= x).toDouble / cv.length)
    }.max
    // bucket edges must never change the statistic — probe the
    // degenerate single-bucket case and a count above the distinct
    // value count alongside the default
    for (b <- Seq(1, 4, 64, 1000)) {
      val row = DQ.ksExact(ref, cur, "v", threshold = 0.05, rangeBuckets = b).head()
      assert(math.abs(row.getDouble(row.fieldIndex("ks")) - brute) < 1e-6, s"buckets=$b")
      assert(row.getLong(row.fieldIndex("n_ref")) == 200L)
      assert(row.getLong(row.fieldIndex("n_cur")) == 150L)
    }
    // identical samples → 0; disjoint samples → 1
    assert(DQ.ksExact(ref, ref, "v").head().getDouble(3) == 0.0)
    val far = (1 to 50).map(i => (i + 1000).toDouble).toDF("v")
    assert(DQ.ksExact(ref, far, "v").head().getDouble(3) == 1.0)
    // an empty snapshot → counts populated, ks/drifted null
    val e = DQ.ksExact(ref, cur.filter(lit(false)), "v").head()
    assert(e.getLong(1) == 200L && e.getLong(2) == 0L && e.isNullAt(3) && e.isNullAt(4))
    GraftSession.releaseAll(spark)
  }

  test("profileFull carries profile stats plus ordered value_counts columns") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), (null, 5.0))
      .toDF("k", "x")
    val r = DQ.profileFull(df, numericCols = Seq("x"), otherCols = Seq("k"), k = 2)
      .orderBy("colname").collect()
    val k = r(0)
    assert(k.getString(k.fieldIndex("colname")) == "k")
    assert(k.getString(k.fieldIndex("top_values")) == "a:3,b:1")
    assert(k.getDouble(k.fieldIndex("top_share")) == 0.75)
    assert(k.getDouble(k.fieldIndex("top_ratio")) == 1.5) // 0.75 share × 2 distinct
    val x = r(1)
    assert(x.getString(x.fieldIndex("colname")) == "x")
    assert(x.getLong(x.fieldIndex("distinct_cnt")) == 5L)
    assert(x.getString(x.fieldIndex("top_values")) == "1.0:1,2.0:1") // ties → value asc
  }

  test("profileFull maxDistinct routes big columns through the salted ranking") {
    import spark.implicits._
    // 500 distinct ids (over the cap) + a 3-value category (under it)
    val df = (1 to 1000).map(i => (s"id_${i % 500}", s"cat_${i % 3}"))
      .toDF("id", "cat")
    val base = DQ.profileFull(df, numericCols = Nil,
      otherCols = Seq("id", "cat"), k = 3)
    val capped = DQ.profileFull(df, numericCols = Nil,
      otherCols = Seq("id", "cat"), k = 3, maxDistinct = 100L)
    // identical output — the salted two-stage top-k is exact
    assert(capped.orderBy("colname").collect().toSeq ==
      base.orderBy("colname").collect().toSeq)
    // the capped plan ranks over a SALTED exchange (Catalyst aliases
    // the pmod(xxhash64) partition expression into a projection feeding
    // the window); the default plan has no salt anywhere
    def salted(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.executedPlan.toString.contains("pmod(xxhash64")
    assert(salted(capped), "expected a salted ranking window")
    assert(!salted(base))
    GraftSession.releaseAll(spark)
  }

  test("exactQuantile matches native percentile bit-for-bit on every path") {
    import graft.functions.Quantiles.exactQuantile
    val rng = new scala.util.Random(42)
    // continuous, ties-heavy, and constant columns; interior nulls
    val rows = (1 to 2000).map { i =>
      (if (i % 17 == 0) None else Some(rng.nextGaussian() * 100),
       (i % 7).toDouble, 5.0)
    }
    val df = rows.toDF("x", "ties", "const")
    def native(c: String, q: Double): Double =
      df.agg(expr(s"percentile($c, ${q}D)")).head().getDouble(0)
    for (c <- Seq("x", "ties", "const");
         q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)) {
      assert(exactQuantile(df, c, q).get == native(c, q), s"$c q=$q")
      // a 1-value sketch bracket forces the rank-miss fallback path on
      // most targets; the answer must not change
      assert(exactQuantile(df, c, q, bracketEps = 0.0).get == native(c, q),
        s"fallback $c q=$q")
    }
    // fused multi-probe call: every (column, q) resolved from the three
    // shared passes, still bit-for-bit with native percentile
    val probes = for (c <- Seq("x", "ties", "const");
                      q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) yield (c, q)
    graft.functions.Quantiles.exactQuantiles(df, probes).foreach {
      case ((c, q), res) => assert(res.get == native(c, q), s"multi $c q=$q")
    }
    // empty / all-null input → None (native percentile returns null)
    assert(exactQuantile(df.filter(lit(false)), "x", 0.5).isEmpty)
    assert(exactQuantile(df.filter(col("x").isNull), "x", 0.5).isEmpty)

    // the bounded profile equals the exact quantileProfile frame
    val a = DQ.quantileProfileBounded(df, Seq("x", "ties"), Seq(0.25, 0.5, 0.95))
      .orderBy("colname").collect().map(_.toSeq).toSeq
    val b = DQ.quantileProfile(df, Seq("x", "ties"), Seq(0.25, 0.5, 0.95),
      approx = false).orderBy("colname").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("UniqueKeys rides the fused pass; nulls group; split refuses it") {
    val df = Seq((1, "a"), (1, "a"), (2, "b"), (3, null), (4, null))
      .toDF("k", "v")
    val res = DQ.check(df, Seq(
        DQ.UniqueKeys("uk", Seq("k", "v")),
        DQ.UniqueKeys("uv", Seq("v"), maxViolationPct = 50.0),
        DQ.NotNull("nn", "v", maxViolationPct = 50.0)))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("violations"), r.getAs[Boolean]("passed"))).toMap
    // (k,v) pairs: (1,a)x2 collapses -> 5 rows, 4 distinct -> 1 dup
    assert(res("uk") == ((1L, false)))
    // v alone: a,a,b,null,null -> 3 distinct groups (nulls group like
    // pandas duplicated) -> 2 dups = 40% <= 50%
    assert(res("uv") == ((2L, true)))
    assert(res("nn") == ((2L, true))) // row rule fused alongside
    // aggregate-level rules have no row membership
    val err = intercept[IllegalArgumentException](
      DQ.split(df, Seq(DQ.UniqueKeys("uk", Seq("k")))))
    assert(err.getMessage.contains("uk"))
    // json dialect parses it
    val fromJson = DQ.rulesFromJson(
      """{"rules": [{"rule_id": "j", "type": "uniqueness", "columns": ["k"]}]}""")
    assert(fromJson == Seq(DQ.UniqueKeys("j", Seq("k"))))
    intercept[IllegalArgumentException](DQ.rulesFromJson(
      """{"rules": [{"rule_id": "j", "type": "uniqueness", "columns": []}]}"""))
  }

  test("correlationMatrix entries equal standalone correlation bit-for-bit") {
    val li = table("lineitem")
    val m = DQ.correlationMatrix(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"), 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[java.lang.Double]("corr_val")).toMap
    assert(m.size == 3)
    for (((a, b), v) <- m) {
      val solo = DQ.correlation(li, a, b, 4).head().getAs[java.lang.Double]("corr_val")
      assert(v == solo, s"$a~$b: matrix $v vs standalone $solo")
    }
    // a constant column yields NULL (zero variance), not a crash
    val withConst = li.withColumn("one", lit(1.0))
    val mc = DQ.correlationMatrix(withConst, Seq("l_quantity", "one"), 4).head()
    assert(mc.isNullAt(mc.fieldIndex("corr_val")))
    intercept[IllegalArgumentException](DQ.correlationMatrix(li, Seq("l_quantity")))
  }

  test("Privacy: AES round-trip, join-safe pseudonyms, partial masking") {
    import graft.quality.Privacy
    import spark.implicits._
    val key = "0123456789abcdef" // 16 bytes = AES-128
    val df = Seq((1L, "alice@example.org", "555-867-5309"),
      (2L, "bob@example.org", null),
      (3L, "alice@example.org", "555-000-1111"))
      .toDF("id", "email", "phone")

    // encrypt → decrypt round-trips exactly; ciphertext is base64 text
    // and NOT deterministic (GCM random IV: equal plaintexts differ)
    val enc = Privacy.encryptColumns(df, Seq("email", "phone"), key)
    val encRows = enc.orderBy("id").collect()
    assert(encRows.forall(r => r.isNullAt(1) == false))
    assert(encRows(0).getString(1) != encRows(2).getString(1)) // same email, different ct
    assert(encRows(1).isNullAt(2)) // null encrypts to null
    val dec = Privacy.decryptColumns(enc, Seq("email", "phone"), key)
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(dec == Seq((1L, "alice@example.org", "555-867-5309"),
      (2L, "bob@example.org", null),
      (3L, "alice@example.org", "555-000-1111")))
    // wrong key: strict decrypt fails the job, try-variant yields nulls
    intercept[Exception](
      Privacy.decryptColumns(enc, Seq("email"), "ffffffffffffffff")
        .collect())
    val tryDec = Privacy.tryDecryptColumns(enc, Seq("email"), "ffffffffffffffff")
    assert(tryDec.filter(col("email").isNotNull).count() == 0)
    intercept[IllegalArgumentException](
      Privacy.encryptColumns(df, Seq("email"), "short"))

    // pseudonymize: deterministic per key (join-safe), key-dependent,
    // null-preserving, 64-hex shape
    val p1 = Privacy.pseudonymize(df, Seq("email"), "k1")
      .orderBy("id").select("email").as[String].collect()
    assert(p1(0) == p1(2) && p1(0) != p1(1)) // same value → same token
    assert(p1(0).matches("[0-9a-f]{64}"))
    val p2 = Privacy.pseudonymize(df, Seq("email"), "k2")
      .orderBy("id").select("email").as[String].collect()
    assert(p1(0) != p2(0)) // different key → different token space
    // join-safety across tables: pseudonymized keys still join
    val other = Seq(("alice@example.org", 7.0)).toDF("email", "score")
    val joined = Privacy.pseudonymize(df, Seq("email"), "k1")
      .join(Privacy.pseudonymize(other, Seq("email"), "k1"), Seq("email"))
    assert(joined.count() == 2) // both alice rows
    // nulls stay null
    assert(Privacy.pseudonymize(df, Seq("phone"), "k1")
      .filter(col("id") === 2 && col("phone").isNull).count() == 1)

    // masking keeps the last 4, stars the rest; short values mask fully
    val m = Privacy.maskColumns(df, Seq("phone"), keepLast = 4)
      .orderBy("id").select("phone").as[String].collect()
    assert(m(0) == "********5309" && m(1) == null)
    val short = Privacy.maskColumns(Seq(("abc")).toDF("phone"), Seq("phone"), 4)
      .select("phone").as[String].head()
    assert(short == "***")
  }
}
