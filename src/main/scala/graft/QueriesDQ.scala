package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.DQ
import graft.functions.Det

/** DQ-engine query pack: every q_dq_* query + its DuckDB oracle.
  * Reference semantics: src/quality/dq_engine.py:42-383 and
  * src/quality/dq_rule_examples.py (rule types cited per query).
  */
object QueriesDQ {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val ordersCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  // Shared by q_dq_quarantine / q_dq_quarantine_clean and their
  // oracles: three rules with overlapping violations (a pricey urgent
  // 'P' order can fail all three), so failed_rules ordering is tested
  private[graft] val quarantineRules: Seq[DQ.Rule] = Seq(
    DQ.ValueRange("rng_price", "o_totalprice", 0, 200000),
    DQ.RegexMatch("re_prio", "o_orderpriority", "^[1-3]-"),
    DQ.AllowedValues("allow_status", "o_orderstatus", Seq("O", "F")))

  // the same three violation predicates in DuckDB terms
  private val quarantineViols = Seq(
    "rng_price" -> "(o_totalprice IS NOT NULL AND NOT (o_totalprice BETWEEN 0 AND 200000))",
    "re_prio" -> "(o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-'))",
    "allow_status" -> "(o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F'))")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // profile_data — ref dq_engine.py:45-67
    "q_dq_profile" -> ((s, dir) => {
      DQ.profile(t(s, dir, "orders"),
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        otherCols = Seq("o_orderstatus", "o_orderpriority"))
    }),

    // profile_data with value_counts — ref dq_rule_examples.py:711
    "q_dq_profile_full" -> ((s, dir) => {
      DQ.profileFull(t(s, dir, "orders"),
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        otherCols = Seq("o_orderstatus", "o_orderpriority"), k = 5)
    }),

    // config-driven rule set — ref dq_engine.py:73-135 (rules arrive
    // as dicts); the JSON document drives the SAME fused one-pass check
    "q_dq_rules_json" -> ((s, dir) => {
      val json =
        """{"rules": [
          |  {"rule_id": "cfg_nn", "type": "completeness", "column": "o_custkey"},
          |  {"rule_id": "cfg_rng", "type": "range", "column": "o_totalprice",
          |   "min": 0, "max": 1000000},
          |  {"rule_id": "cfg_pat", "type": "pattern", "column": "o_orderpriority",
          |   "pattern": "^[1-5]-[A-Z ]+$"},
          |  {"rule_id": "cfg_allow", "type": "allowed_values",
          |   "column": "o_orderstatus", "values": ["O", "F", "P"]},
          |  {"rule_id": "cfg_xf", "type": "consistency", "name": "price_pos",
          |   "condition": "o_totalprice > 0 OR o_orderkey IS NULL"}
          |]}""".stripMargin
      DQ.check(t(s, dir, "orders"), DQ.rulesFromJson(json))
    }),

    // uniqueness joins the SAME fused pass as an aggregate-level rule
    // (dup count = rows − distinct keys, dq_engine.py:109) — one scan
    // carries per-row and aggregate rules together
    "q_dq_rules_unique" -> ((s, dir) => {
      val json =
        """{"rules": [
          |  {"rule_id": "u_cust", "type": "uniqueness",
          |   "columns": ["o_custkey"], "threshold": 95.0},
          |  {"rule_id": "u_pk", "type": "uniqueness", "columns": ["o_orderkey"]},
          |  {"rule_id": "nn_prio", "type": "completeness", "column": "o_orderpriority"}
          |]}""".stripMargin
      DQ.check(t(s, dir, "orders"), DQ.rulesFromJson(json))
    }),

    // row-level quarantine split — ref error_recovery.py:345
    // quarantine_bad_records: the failed side, tagged with every rule
    // id the row violates (comma-joined in rule order)
    "q_dq_quarantine" -> ((s, dir) => {
      DQ.split(t(s, dir, "orders").select(ordersCols.map(col): _*),
        quarantineRules)._2
    }),

    // the clean side of the same split — together with q_dq_quarantine
    // this partitions the table exactly
    "q_dq_quarantine_clean" -> ((s, dir) => {
      DQ.split(t(s, dir, "orders").select(ordersCols.map(col): _*),
        quarantineRules)._1
    }),

    // deterministic privacy ops (security_manager.py's crypto applied
    // to data columns): keyed-hash pseudonymization + partial masking
    // — both pure projections DuckDB can replay byte-for-byte (the
    // AES path is random-IV by design and spec-gated instead)
    "q_privacy" -> ((s, dir) => {
      graft.quality.Privacy.maskColumns(
        graft.quality.Privacy.pseudonymize(
          t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
          Seq("c_name"), "pii-key-1"),
        Seq("c_mktsegment"), keepLast = 4)
    }),

    // completeness / not_null — ref dq_rule_examples.py:144,199,275
    "q_dq_completeness" -> ((s, dir) => {
      DQ.check(t(s, dir, "orders"),
        ordersCols.map(c => DQ.NotNull(s"nn_$c", c)))
    }),

    // check_value_range — ref dq_rule_examples.py:388
    "q_dq_range" -> ((s, dir) => {
      DQ.check(t(s, dir, "lineitem"), Seq(
        DQ.ValueRange("rng_qty", "l_quantity", 1, 50),
        DQ.ValueRange("rng_disc", "l_discount", 0, 0.1),
        DQ.ValueRange("rng_tax", "l_tax", 0, 0.08),
        DQ.ValueRange("rng_price", "l_extendedprice", 0, 1e9)))
    }),

    // check_regex_pattern — ref dq_rule_examples.py:454,587
    "q_dq_regex" -> ((s, dir) => {
      DQ.check(t(s, dir, "customer"), Seq(
        DQ.RegexMatch("re_name", "c_name", "^Customer#[0-9]+$"),
        DQ.RegexMatch("re_seg", "c_mktsegment", "^[A-Z]+$")))
    }),

    // check_phone_format — ref dq_rule_examples.py:592. The testdata
    // customer table carries no phone column, so one is derived
    // deterministically from the keys (mirrored in the oracle): a NANP
    // third, a generic-international third, and a non-phone third — so
    // both the US and generic patterns see genuine pass AND fail rows.
    "q_dq_phone" -> ((s, dir) => {
      val ph = when(col("c_custkey") % 3 === 0,
          concat(lit("555-"), lpad(col("c_nationkey").cast("string"), 3, "0"),
            lit("-"), lpad((col("c_custkey") % 10000).cast("string"), 4, "0")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("+"), col("c_custkey").cast("string"), lit(" 42")))
        .otherwise(col("c_name"))
      DQ.check(t(s, dir, "customer").withColumn("c_phone", ph), Seq(
        DQ.PhoneFormat("ph_us", "c_phone"),
        DQ.PhoneFormat("ph_any", "c_phone", countryCode = "INTL")))
    }),

    // check_allowed_values — ref dq_rule_examples.py:496
    "q_dq_allowed" -> ((s, dir) => {
      DQ.check(t(s, dir, "orders"), Seq(
        DQ.AllowedValues("av_status", "o_orderstatus", Seq("O", "F", "P")),
        DQ.AllowedValues("av_prio", "o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))
    }),

    // check_primary_key_unique / duplicate_rows — ref dq_rule_examples.py:603,643
    "q_dq_unique" -> ((s, dir) => {
      DQ.uniqueness(t(s, dir, "orders"), Seq("o_orderkey"))
        .unionByName(DQ.uniqueness(t(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber")))
    }),

    // check_referential_integrity — ref dq_rule_examples.py:737
    "q_dq_refint" -> ((s, dir) => {
      DQ.refIntegrity(t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey",
          "orders.o_custkey->customer.c_custkey", broadcastParent = true)
        .unionByName(
          DQ.refIntegrity(t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey",
            "lineitem.l_orderkey->orders.o_orderkey", broadcastParent = true))
    }),

    // cross_field / calculated_field — ref dq_rule_examples.py:781,931
    "q_dq_crossfield" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      DQ.check(li, Seq(
        DQ.CrossField("cf_price_ge_qty", "l_extendedprice>=l_quantity",
          col("l_extendedprice") >= col("l_quantity")),
        DQ.CrossField("cf_disc_tax", "l_discount+l_tax<1",
          col("l_discount") + col("l_tax") < 1.0),
        DQ.CrossField("cf_qty_pos", "l_quantity>0", col("l_quantity") > 0.0)))
    }),

    // check_data_freshness / future_dates — ref dq_rule_examples.py:1073,1119
    "q_dq_freshness" -> ((s, dir) => {
      DQ.freshness(t(s, dir, "events"), "ts", "2024-02-01 00:00:00", 30)
    }),

    // check_correlation — ref dq_rule_examples.py:1034
    "q_dq_corr" -> ((s, dir) => {
      DQ.correlation(t(s, dir, "lineitem"), "l_quantity", "l_extendedprice", 4)
        .unionByName(DQ.correlation(t(s, dir, "customer"), "c_nationkey", "c_acctbal", 4))
    }),

    // all-pairs correlation matrix FUSED into one aggregation pass
    // (the reference's consistency checks run pair-by-pair)
    "q_dq_corr_matrix" -> ((s, dir) => {
      DQ.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), 4)
    }),

    // quality score — ref dq_engine.py:363-378
    "q_dq_score" -> ((s, dir) => {
      DQ.score(DQ.check(t(s, dir, "orders"), scoreRules))
    }),

    // check_date_format via try_to_timestamp — ref dq_rule_examples.py:537
    "q_dq_dateformat" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("od_str", date_format(col("o_orderdate"), "MM/dd/yyyy"))
      DQ.check(o, Seq(
        DQ.DateFormat("df_ok", "od_str", "MM/dd/yyyy"),
        DQ.DateFormat("df_iso", "od_str", "yyyy-MM-dd")))
    }),

    // check_data_type via try_cast — ref dq_rule_examples.py:333
    "q_dq_types" -> ((s, dir) => {
      DQ.check(t(s, dir, "orders"), Seq(
        DQ.TypeCastable("tc_prio_int", "o_orderpriority", "INT"),
        DQ.TypeCastable("tc_price_dec", "o_totalprice", "DECIMAL(18,2)")))
    }),

    // join-key skew profile: heaviest keys + ratio to the mean key
    // weight (the salted-join / AQE-skew decision input at scale)
    "q_dq_skew" -> ((s, dir) => {
      DQ.keySkew(t(s, dir, "orders"), Seq("o_custkey"), topN = 10)
    }),

    // per-column top-5 frequent values (two categoricals + one
    // high-cardinality key that exercises the WindowGroupLimit cap)
    "q_dq_topvalues" -> ((s, dir) => {
      DQ.topValues(t(s, dir, "orders"),
        Seq("o_orderstatus", "o_orderpriority", "o_custkey"), k = 5)
    }),

    // PSI distribution drift between two yearly snapshots
    "q_dq_psi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ref = li.filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      val cur = li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      DQ.psi(ref, cur, "l_quantity", Seq(1, 11, 21, 31, 41, 51), threshold = 0.1)
    }),

    // binned two-sample KS drift between the same yearly snapshots
    "q_dq_ks" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ref = li.filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      val cur = li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      DQ.ksBinned(ref, cur, "l_quantity", Seq(1, 11, 21, 31, 41, 51), threshold = 0.05)
    }),

    // EXACT (unbinned) two-sample KS between the same snapshots — the
    // bucketed-prefix-sum plan; ksBinned stays the 100 TB default
    "q_dq_ks_exact" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ref = li.filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      val cur = li.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      DQ.ksExact(ref, cur, "l_quantity", threshold = 0.05, rangeBuckets = 8)
    }),

    // categorical drift on order priority between the same snapshots
    "q_dq_psi_cat" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val ref = o.filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      val cur = o.filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      DQ.psiCategorical(ref, cur, "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        threshold = 0.1)
    }),

    // Benford first-digit screen on order totals
    "q_dq_benford" -> ((s, dir) => {
      DQ.benford(t(s, dir, "orders"), "o_totalprice", critical = 1000.0)
    }),

    // value-distribution entropy of a categorical column
    "q_dq_entropy" -> ((s, dir) => {
      DQ.entropy(t(s, dir, "orders"), "o_orderpriority")
    }),

    // k-anonymity privacy audit over quasi-identifier columns
    "q_dq_kanon" -> ((s, dir) => {
      DQ.kAnonymity(t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 5)
    }),

    // statistical distribution / chi-square — ref dq_rule_examples.py:980
    "q_dq_distribution" -> ((s, dir) => {
      DQ.distribution(t(s, dir, "lineitem"), "l_quantity",
        edges = Seq(1, 11, 21, 31, 41, 51),
        expectedProbs = Seq(0.2, 0.2, 0.2, 0.2, 0.2), critical = 100.0)
    }),

    // exact quantile profile (oracle parity; DQSpec bounds the approx
    // variant against this one)
    "q_dq_quantiles" -> ((s, dir) => {
      DQ.quantileProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"), approx = false)
    }),

    // the 100 TB path: Greenwald-Khanna sketches, one combinable pass —
    // rows-only (sketch outputs are engine-specific by construction)
    "q_dq_quantiles_approx" -> ((s, dir) => {
      DQ.quantileProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"), approx = true)
    }),

    // exact-mode oracle companion for the GK sketch: with accuracy >= n
    // the rank error n/accuracy drops below one position, so the sketch
    // returns the exact discrete quantile element and DuckDB's
    // quantile_disc is a bit-for-bit oracle (gate SFs have n <= 6e5;
    // production runs keep the default accuracy and the spec bound)
    "q_dq_quantiles_approx_exact" -> ((s, dir) => {
      DQ.quantileProfile(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"), approx = true,
        accuracy = 10000000)
    }),

    // bounded-memory EXACT quantiles (functions.Quantiles.exactQuantiles:
    // GK-sketch bracket → exact rank count → sliver-only sort; same
    // values as native percentile without its buffer-everything single
    // reducer — ALL probes fused into three shared scans). Probed over
    // ties-heavy (l_quantity, l_discount) and high-cardinality
    // (l_extendedprice) columns + a tail quantile.
    "q_dq_quantile_bounded" -> ((s, dir) => {
      import graft.functions.Quantiles
      val probes = Seq(
        ("l_quantity", 0.25), ("l_discount", 0.9),
        ("l_extendedprice", 0.5), ("l_extendedprice", 0.99))
      val rows = Quantiles.exactQuantiles(t(s, dir, "lineitem"), probes)
        .map { case ((c, q), res) => (c, q, res.get) }
      import s.implicits._
      rows.toDF("colname", "q", "value")
    }),

    // the full exact profile through the same bounded path — identical
    // output contract (and oracle) as q_dq_quantiles, no single-reducer
    // percentile buffering anywhere in the plan
    "q_dq_quantiles_bounded" -> ((s, dir) => {
      DQ.quantileProfileBounded(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))
    })
  )

  private def scoreRules: Seq[DQ.Rule] = Seq(
    DQ.NotNull("nn_okey", "o_orderkey"),
    DQ.NotNull("nn_cust", "o_custkey"),
    DQ.AllowedValues("av_status", "o_orderstatus", Seq("O", "F", "P")),
    DQ.ValueRange("rng_price", "o_totalprice", 0, 1e6),
    DQ.CrossField("cf_price_pos", "o_totalprice>0", col("o_totalprice") > 0.0))

  // -------------------------------------------------------------------
  // DuckDB oracles (identical column names + identical IEEE math)
  // -------------------------------------------------------------------

  private def nnOracle(table: String, c: String): String =
    s"""SELECT 'nn_$c' AS rule_id, 'completeness' AS rule_type, '$c' AS colname,
       |COUNT(*)-COUNT($c) AS violations, COUNT(*) AS total,
       |((COUNT(*)-COUNT($c))*100.0/COUNT(*) <= 0.0) AS passed FROM $table""".stripMargin

  private def profCol(c: String, numeric: Boolean): String = {
    val stats = if (numeric)
      s"""CAST(MIN($c) AS DOUBLE) AS min_val, CAST(MAX($c) AS DOUBLE) AS max_val,
         |ROUND(${Det.sqlMeanAt(c, 2)}, 6) AS mean_val, ROUND(${Det.sqlStddevAt(c, 2)}, 6) AS std_val""".stripMargin
    else
      """CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val,
        |CAST(NULL AS DOUBLE) AS mean_val, CAST(NULL AS DOUBLE) AS std_val""".stripMargin
    s"""SELECT '$c' AS colname, COUNT(*) AS n_rows,
       |COUNT(*)-COUNT($c) AS null_count,
       |(COUNT(*)-COUNT($c))*100.0/COUNT(*) AS null_pct,
       |COUNT(DISTINCT $c) AS distinct_cnt, $stats FROM orders""".stripMargin
  }

  private def rangeOracle(id: String, c: String, lo: String, hi: String): String =
    s"""SELECT '$id' AS rule_id, 'validity' AS rule_type, '$c' AS colname,
       |CAST(SUM(CASE WHEN $c IS NOT NULL AND NOT ($c BETWEEN $lo AND $hi) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       |COUNT(*) AS total,
       |(SUM(CASE WHEN $c IS NOT NULL AND NOT ($c BETWEEN $lo AND $hi) THEN 1 ELSE 0 END)*100.0/COUNT(*) <= 0.0) AS passed
       |FROM lineitem""".stripMargin

  private def checkOracle(table: String, id: String, ruleType: String, colname: String,
                          violatedSql: String): String =
    s"""SELECT '$id' AS rule_id, '$ruleType' AS rule_type, '$colname' AS colname,
       |CAST(SUM(CASE WHEN $violatedSql THEN 1 ELSE 0 END) AS BIGINT) AS violations, COUNT(*) AS total,
       |(SUM(CASE WHEN $violatedSql THEN 1 ELSE 0 END)*100.0/COUNT(*) <= 0.0) AS passed
       |FROM $table""".stripMargin

  private def uniqueOracle(table: String, id: String, keyCols: String,
                           pct: Double): String = {
    // DQ.uniqueOracle's ROW()-packed form: null keys count as values,
    // matching the engine's struct countDistinct — a bare
    // COUNT(DISTINCT col) would skip nulls and silently under-count
    // on any future NULLABLE key (DQ.scala uniqueOracle scaladoc)
    val distinct = graft.quality.DQ.uniqueOracle(keyCols.split(",").toSeq)
    s"""SELECT '$id' AS rule_id, 'uniqueness' AS rule_type, '$keyCols' AS colname,
       |CAST($distinct AS BIGINT) AS violations,
       |COUNT(*) AS total,
       |(($distinct)*100.0/COUNT(*) <= $pct) AS passed
       |FROM $table""".stripMargin
  }

  private def corrMatrixOracle(table: String,
                               pairs: Seq[(String, String)]): String =
    pairs.map { case (x, y) =>
      val n = "COUNT(*)"
      val sx = Det.sqlSumAt(x, 4); val sy = Det.sqlSumAt(y, 4)
      val sxy = Det.sqlSumAt(s"($x)*($y)", 4)
      val sxx = Det.sqlSumAt(s"($x)*($x)", 4)
      val syy = Det.sqlSumAt(s"($y)*($y)", 4)
      s"""SELECT '$x' AS col_a, '$y' AS col_b, $n AS n,
         |ROUND(($n * $sxy - $sx * $sy) /
         | (SQRT($n * $sxx - $sx * $sx) * SQRT($n * $syy - $sy * $sy)), 10) AS corr_val
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def corrOracle(table: String, x: String, y: String): String = {
    val n = "COUNT(*)"
    val sx = Det.sqlSumAt(x, 4); val sy = Det.sqlSumAt(y, 4)
    val sxy = Det.sqlSumAt(s"($x)*($y)", 4)
    val sxx = Det.sqlSumAt(s"($x)*($x)", 4)
    val syy = Det.sqlSumAt(s"($y)*($y)", 4)
    s"""SELECT '$x~$y' AS pair, $n AS n,
       |ROUND(($n * $sxy - $sx * $sy) /
       | (SQRT($n * $sxx - $sx * $sx) * SQRT($n * $syy - $sy * $sy)), 10) AS corr_val
       |FROM $table""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    // sha256(key:len:value) pseudonyms + star-mask keeping the last 4
    // — DuckDB replays both transformations exactly
    "q_privacy" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NOT NULL THEN
        |    sha256('pii-key-1' || ':' || CAST(length(c_name) AS VARCHAR)
        |           || ':' || c_name) END AS c_name,
        |  CASE WHEN c_mktsegment IS NULL THEN NULL
        |       WHEN length(c_mktsegment) <= 4 THEN repeat('*', length(c_mktsegment))
        |       ELSE repeat('*', length(c_mktsegment) - 4) ||
        |            substr(c_mktsegment, length(c_mktsegment) - 3, 4)
        |  END AS c_mktsegment
        |FROM customer""".stripMargin,

    "q_dq_profile" ->
      Seq(profCol("o_orderkey", numeric = true),
          profCol("o_custkey", numeric = true),
          profCol("o_totalprice", numeric = true),
          profCol("o_orderstatus", numeric = false),
          profCol("o_orderpriority", numeric = false)).mkString("\nUNION ALL\n"),

    "q_dq_profile_full" -> {
      val prof = Seq(profCol("o_orderkey", numeric = true),
        profCol("o_custkey", numeric = true),
        profCol("o_totalprice", numeric = true),
        profCol("o_orderstatus", numeric = false),
        profCol("o_orderpriority", numeric = false)).mkString("\nUNION ALL\n")
      val pairCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority")
      val pairs = pairCols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM orders WHERE $c IS NOT NULL")
        .mkString("\nUNION ALL\n")
      s"""WITH prof AS ($prof),
         |pairs AS ($pairs),
         |c AS (SELECT col_name, value, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
         |t AS (SELECT col_name, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
         |r AS (SELECT col_name, value, n,
         |             row_number() OVER (PARTITION BY col_name
         |                                ORDER BY n DESC, value) AS rk
         |      FROM c),
         |top AS (
         |  SELECT r.col_name AS colname,
         |         string_agg(r.value || ':' || CAST(r.n AS VARCHAR), ',' ORDER BY r.rk) AS top_values,
         |         MAX(CASE WHEN r.rk = 1 THEN ROUND(r.n / t.total, 6) END) AS top_share
         |  FROM r JOIN t USING (col_name) WHERE r.rk <= 5 GROUP BY 1)
         |SELECT prof.*, top.top_values, top.top_share,
         |       ROUND(top.top_share * prof.distinct_cnt, 6) AS top_ratio
         |FROM prof LEFT JOIN top USING (colname)""".stripMargin
    },

    "q_dq_rules_json" ->
      Seq(
        checkOracle("orders", "cfg_nn", "completeness", "o_custkey",
          "o_custkey IS NULL"),
        checkOracle("orders", "cfg_rng", "validity", "o_totalprice",
          "o_totalprice IS NOT NULL AND NOT (o_totalprice BETWEEN 0 AND 1000000)"),
        checkOracle("orders", "cfg_pat", "validity", "o_orderpriority",
          "o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')"),
        checkOracle("orders", "cfg_allow", "validity", "o_orderstatus",
          "o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F', 'P')"),
        checkOracle("orders", "cfg_xf", "consistency", "price_pos",
          "NOT COALESCE(o_totalprice > 0 OR o_orderkey IS NULL, FALSE)")
      ).mkString("\nUNION ALL\n"),

    "q_dq_rules_unique" ->
      Seq(
        uniqueOracle("orders", "u_cust", "o_custkey", 95.0),
        uniqueOracle("orders", "u_pk", "o_orderkey", 0.0),
        checkOracle("orders", "nn_prio", "completeness", "o_orderpriority",
          "o_orderpriority IS NULL")
      ).mkString("\nUNION ALL\n"),

    "q_dq_quarantine" -> {
      val cases = quarantineViols.map { case (id, v) =>
        s"CASE WHEN $v THEN '$id' END" }.mkString(",\n         ")
      val any = quarantineViols.map(_._2).mkString(" OR ")
      s"""SELECT ${ordersCols.mkString(", ")},
         |       concat_ws(',',
         |         $cases) AS failed_rules
         |FROM orders
         |WHERE $any""".stripMargin
    },

    "q_dq_quarantine_clean" -> {
      val any = quarantineViols.map(_._2).mkString(" OR ")
      s"""SELECT ${ordersCols.mkString(", ")}
         |FROM orders
         |WHERE NOT ($any)""".stripMargin
    },

    "q_dq_completeness" ->
      ordersCols.map(c => nnOracle("orders", c)).mkString("\nUNION ALL\n"),

    "q_dq_range" ->
      Seq(rangeOracle("rng_qty", "l_quantity", "1", "50"),
          rangeOracle("rng_disc", "l_discount", "0", "0.1"),
          rangeOracle("rng_tax", "l_tax", "0", "0.08"),
          rangeOracle("rng_price", "l_extendedprice", "0", "1000000000.0")).mkString("\nUNION ALL\n"),

    "q_dq_regex" ->
      Seq(
        checkOracle("customer", "re_name", "validity", "c_name",
          "c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#[0-9]+$')"),
        checkOracle("customer", "re_seg", "validity", "c_mktsegment",
          "c_mktsegment IS NOT NULL AND NOT regexp_matches(c_mktsegment, '^[A-Z]+$')")
      ).mkString("\nUNION ALL\n"),

    "q_dq_phone" ->
      ("""WITH customer2 AS (
         |  SELECT *, CASE
         |    WHEN c_custkey % 3 = 0 THEN '555-' || lpad(CAST(c_nationkey AS VARCHAR), 3, '0')
         |      || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |    WHEN c_custkey % 3 = 1 THEN '+' || CAST(c_custkey AS VARCHAR) || ' 42'
         |    ELSE c_name END AS c_phone
         |  FROM customer)
         |""".stripMargin +
        Seq(
          checkOracle("customer2", "ph_us", "validity", "c_phone",
            """c_phone IS NOT NULL AND NOT regexp_matches(c_phone, '^\+?1?[-.\s]?\(?([0-9]{3})\)?[-.\s]?([0-9]{3})[-.\s]?([0-9]{4})$')"""),
          checkOracle("customer2", "ph_any", "validity", "c_phone",
            """c_phone IS NOT NULL AND NOT regexp_matches(c_phone, '^\+?[0-9\s\-\(\)]+$')""")
        ).mkString("\nUNION ALL\n")),

    "q_dq_allowed" ->
      Seq(
        checkOracle("orders", "av_status", "validity", "o_orderstatus",
          "o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')"),
        checkOracle("orders", "av_prio", "validity", "o_orderpriority",
          "o_orderpriority IS NOT NULL AND o_orderpriority NOT IN " +
            "('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')")
      ).mkString("\nUNION ALL\n"),

    "q_dq_unique" ->
      """SELECT keyname, total, distinct_cnt, total-distinct_cnt AS dup_count,
        |       total=distinct_cnt AS passed FROM (
        |  SELECT 'o_orderkey' AS keyname, COUNT(*) AS total,
        |         COUNT(DISTINCT o_orderkey) AS distinct_cnt FROM orders
        |  UNION ALL
        |  SELECT 'l_orderkey,l_linenumber', COUNT(*),
        |         (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
        |  FROM lineitem)""".stripMargin,

    "q_dq_refint" ->
      """SELECT 'orders.o_custkey->customer.c_custkey' AS rel,
        |COUNT(*) AS child_rows,
        |CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
        |(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) = 0) AS passed
        |FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
        |  ON o_custkey = p.c_custkey
        |UNION ALL
        |SELECT 'lineitem.l_orderkey->orders.o_orderkey',
        |COUNT(*),
        |CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0)
        |FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
        |  ON l_orderkey = p.o_orderkey""".stripMargin,

    "q_dq_crossfield" ->
      Seq(
        checkOracle("lineitem", "cf_price_ge_qty", "consistency", "l_extendedprice>=l_quantity",
          "NOT COALESCE(l_extendedprice >= l_quantity, FALSE)"),
        checkOracle("lineitem", "cf_disc_tax", "consistency", "l_discount+l_tax<1",
          "NOT COALESCE(l_discount + l_tax < 1.0, FALSE)"),
        checkOracle("lineitem", "cf_qty_pos", "consistency", "l_quantity>0",
          "NOT COALESCE(l_quantity > 0.0, FALSE)")
      ).mkString("\nUNION ALL\n"),

    "q_dq_freshness" ->
      """SELECT date_trunc('microseconds', MAX(ts)) AS max_ts,
        |CAST(SUM(CASE WHEN ts > TIMESTAMP '2024-02-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS future_cnt,
        |CAST(date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01') AS BIGINT) AS lag_days,
        |(SUM(CASE WHEN ts > TIMESTAMP '2024-02-01 00:00:00' THEN 1 ELSE 0 END) = 0
        | AND date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01') <= 30) AS passed
        |FROM events""".stripMargin,

    "q_dq_corr" ->
      Seq(corrOracle("lineitem", "l_quantity", "l_extendedprice"),
          corrOracle("customer", "c_nationkey", "c_acctbal")).mkString("\nUNION ALL\n"),

    "q_dq_corr_matrix" ->
      corrMatrixOracle("lineitem", Seq(
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"))),

    "q_dq_dateformat" -> {
      val derived = "(SELECT strftime(o_orderdate, '%m/%d/%Y') AS od_str FROM orders)"
      Seq(
        checkOracle(derived, "df_ok", "validity", "od_str",
          "od_str IS NOT NULL AND try_strptime(od_str, '%m/%d/%Y') IS NULL"),
        checkOracle(derived, "df_iso", "validity", "od_str",
          "od_str IS NOT NULL AND try_strptime(od_str, '%Y-%m-%d') IS NULL")
      ).mkString("\nUNION ALL\n")
    },

    "q_dq_types" ->
      Seq(
        checkOracle("orders", "tc_prio_int", "validity", "o_orderpriority",
          "o_orderpriority IS NOT NULL AND TRY_CAST(o_orderpriority AS INTEGER) IS NULL"),
        checkOracle("orders", "tc_price_dec", "validity", "o_totalprice",
          "o_totalprice IS NOT NULL AND TRY_CAST(o_totalprice AS DECIMAL(18,2)) IS NULL")
      ).mkString("\nUNION ALL\n"),

    "q_dq_skew" ->
      """WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
        |s AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS nkeys FROM c)
        |SELECT o_custkey, CAST(n AS BIGINT) AS n,
        |       ROUND(n / total, 6) AS share,
        |       ROUND(n / total * nkeys, 6) AS ratio_to_avg
        |FROM c, s ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin,

    "q_dq_topvalues" ->
      """WITH pairs AS (
        |  SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |c AS (SELECT col_name, value, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
        |t AS (SELECT col_name, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
        |r AS (SELECT col_name, value, n,
        |             CAST(row_number() OVER (PARTITION BY col_name
        |                                     ORDER BY n DESC, value) AS INTEGER) AS rk
        |      FROM c)
        |SELECT r.col_name, r.value, CAST(r.n AS BIGINT) AS n,
        |       ROUND(r.n / t.total, 6) AS share, r.rk
        |FROM r JOIN t USING (col_name) WHERE rk <= 5""".stripMargin,

    "q_dq_psi" -> {
      val edges = Seq(1.0, 11.0, 21.0, 31.0, 41.0, 51.0)
      def buckets(tag: String) = edges.sliding(2).toSeq.zipWithIndex.map {
        case (Seq(lo, hi), i) =>
          s"SUM(CASE WHEN l_quantity >= $lo AND l_quantity < $hi THEN 1 ELSE 0 END) AS ${tag}$i"
      }.mkString(", ")
      def total(tag: String) = (0 until 5).map(i => s"$tag$i").mkString(" + ")
      val nR = s"CAST(${total("r")} AS DOUBLE)"
      val nC = s"CAST(${total("c")} AS DOUBLE)"
      // operand order mirrors DQ.psi exactly: (pC - pR) * ln(pC / pR),
      // probabilities floored at 1e-4, terms summed left to right
      val terms = (0 until 5).map { i =>
        val pR = s"GREATEST(CAST(r$i AS DOUBLE) / $nR, 1.0e-4)"
        val pC = s"GREATEST(CAST(c$i AS DOUBLE) / $nC, 1.0e-4)"
        s"(($pC) - ($pR)) * ln(($pC) / ($pR))"
      }.mkString(" + ")
      s"""WITH r AS (
         |  SELECT ${buckets("r")} FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'),
         |c AS (
         |  SELECT ${buckets("c")} FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
         |SELECT 'l_quantity' AS colname,
         |  CAST(${total("r")} AS BIGINT) AS n_ref,
         |  CAST(${total("c")} AS BIGINT) AS n_cur,
         |  round($terms, 6) AS psi,
         |  (round($terms, 6) > 0.1) AS drifted
         |FROM r, c""".stripMargin
    },

    "q_dq_ks" -> {
      val edges = Seq(1.0, 11.0, 21.0, 31.0, 41.0, 51.0)
      def buckets(tag: String) = edges.sliding(2).toSeq.zipWithIndex.map {
        case (Seq(lo, hi), i) =>
          s"SUM(CASE WHEN l_quantity >= $lo AND l_quantity < $hi THEN 1 ELSE 0 END) AS ${tag}$i"
      }.mkString(", ")
      def cum(tag: String, i: Int) =
        (0 to i).map(j => s"COALESCE($tag$j, 0)").mkString(" + ")
      val nR = s"CAST(${cum("r", 4)} AS DOUBLE)"
      val nC = s"CAST(${cum("c", 4)} AS DOUBLE)"
      // same gap expressions in the same order as DQ.ksBinned — the
      // top-edge gap is |1 - 1| = 0 by construction and is excluded
      val gaps = (0 until 4).map { i =>
        s"abs(CAST(${cum("r", i)} AS DOUBLE) / $nR - CAST(${cum("c", i)} AS DOUBLE) / $nC)"
      }
      val ks = s"round(GREATEST(${gaps.mkString(", ")}), 6)"
      s"""WITH r AS (
         |  SELECT ${buckets("r")} FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'),
         |c AS (
         |  SELECT ${buckets("c")} FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
         |SELECT 'l_quantity' AS colname,
         |  CAST(${cum("r", 4)} AS BIGINT) AS n_ref,
         |  CAST(${cum("c", 4)} AS BIGINT) AS n_cur,
         |  $ks AS ks,
         |  ($ks > 0.05) AS drifted
         |FROM r, c""".stripMargin
    },

    "q_dq_ks_exact" -> {
      // identical expression shape to DQ.ksExact: integer cumulative
      // counts cast to double, one division per side, abs, max, round(6)
      s"""WITH pooled AS (
         |  SELECT v, SUM(r) AS dr, SUM(c) AS dc FROM (
         |    SELECT CAST(l_quantity AS DOUBLE) AS v, 1 AS r, 0 AS c FROM lineitem
         |    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         |      AND l_quantity IS NOT NULL
         |    UNION ALL
         |    SELECT CAST(l_quantity AS DOUBLE) AS v, 0 AS r, 1 AS c FROM lineitem
         |    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |      AND l_quantity IS NOT NULL
         |  ) GROUP BY v),
         |tot AS (
         |  SELECT CAST(SUM(dr) AS DOUBLE) AS nr, CAST(SUM(dc) AS DOUBLE) AS nc,
         |         CAST(SUM(dr) AS BIGINT) AS nri, CAST(SUM(dc) AS BIGINT) AS nci
         |  FROM pooled),
         |cum AS (
         |  SELECT
         |    SUM(dr) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
         |    SUM(dc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
         |  FROM pooled),
         |mx AS (
         |  SELECT MAX(ABS(CAST(cr AS DOUBLE) / tot.nr - CAST(cc AS DOUBLE) / tot.nc)) AS ksraw
         |  FROM cum, tot)
         |SELECT 'l_quantity' AS colname, tot.nri AS n_ref, tot.nci AS n_cur,
         |  round(mx.ksraw, 6) AS ks, (round(mx.ksraw, 6) > 0.05) AS drifted
         |FROM mx, tot""".stripMargin
    },

    "q_dq_psi_cat" -> {
      val cats = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      def buckets(tag: String) = cats.zipWithIndex.map { case (v, i) =>
        s"SUM(CASE WHEN o_orderpriority = '$v' THEN 1 ELSE 0 END) AS ${tag}$i"
      }.mkString(", ")
      def total(tag: String) =
        cats.indices.map(i => s"COALESCE($tag$i, 0)").mkString(" + ")
      val nR = s"CAST(${total("r")} AS DOUBLE)"
      val nC = s"CAST(${total("c")} AS DOUBLE)"
      val terms = cats.indices.map { i =>
        val pR = s"GREATEST(CAST(r$i AS DOUBLE) / $nR, 1.0e-4)"
        val pC = s"GREATEST(CAST(c$i AS DOUBLE) / $nC, 1.0e-4)"
        s"(($pC) - ($pR)) * ln(($pC) / ($pR))"
      }.mkString(" + ")
      s"""WITH r AS (
         |  SELECT ${buckets("r")} FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         |c AS (
         |  SELECT ${buckets("c")} FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
         |SELECT 'o_orderpriority' AS colname,
         |  CAST(${total("r")} AS BIGINT) AS n_ref,
         |  CAST(${total("c")} AS BIGINT) AS n_cur,
         |  round($terms, 6) AS psi,
         |  (round($terms, 6) > 0.1) AS drifted
         |FROM r, c""".stripMargin
    },

    "q_dq_benford" -> {
      val digit = "substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)"
      val buckets = (1 to 9).map(d =>
        s"SUM(CASE WHEN o_totalprice >= 1.0 AND o_totalprice < 9.0e18 " +
          s"AND $digit = '$d' THEN 1 ELSE 0 END) AS d$d"
      ).mkString(", ")
      val n = s"CAST(${(1 to 9).map(d => s"COALESCE(d$d, 0)").mkString(" + ")} AS DOUBLE)"
      // probabilities injected from the SAME Scala doubles the operator
      // uses (Double.toString round-trips exactly)
      val chi2 = (1 to 9).map { d =>
        val p = graft.quality.DQ.benfordP(d)
        s"(d$d - $n * $p) * (d$d - $n * $p) / ($n * $p)"
      }.mkString(" + ")
      // n > 0 guard mirrors DQ.benford's when(n > 0.0): on an empty or
      // out-of-range snapshot Spark yields null chi2/passed, and 0/0
      // here would diverge (degenerate-data parity, same as psi/ks)
      val score = s"CASE WHEN $n > 0 THEN round($chi2, 4) END"
      s"""WITH b AS (SELECT $buckets FROM orders)
         |SELECT 'o_totalprice' AS colname, CAST($n AS BIGINT) AS n,
         |  $score AS chi2, ($score <= 1000.0) AS passed
         |FROM b""".stripMargin
    },

    "q_dq_entropy" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS v, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
        |SELECT 'o_orderpriority' AS colname, COUNT(*) AS n_values,
        |  round(CAST(SUM(CAST(
        |    -(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)) *
        |      log2(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
        |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy
        |FROM c, t""".stripMargin,

    "q_dq_kanon" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |  MIN(n) AS min_group_size,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk
        |FROM g""".stripMargin,

    "q_dq_distribution" -> {
      val edges = Seq(1.0, 11.0, 21.0, 31.0, 41.0, 51.0)
      val buckets = edges.sliding(2).toSeq.zipWithIndex.map { case (Seq(lo, hi), i) =>
        s"SUM(CASE WHEN l_quantity >= $lo AND l_quantity < $hi THEN 1 ELSE 0 END) AS b$i"
      }.mkString(", ")
      val nD = "CAST(b0+b1+b2+b3+b4 AS DOUBLE)"
      val chi2 = (0 until 5).map(i =>
        s"(b$i - $nD * 0.2) * (b$i - $nD * 0.2) / ($nD * 0.2)").mkString(" + ")
      s"""WITH b AS (SELECT $buckets FROM lineitem)
         |SELECT 'l_quantity' AS colname, CAST($nD AS BIGINT) AS n,
         |$chi2 AS chi2, (($chi2) <= 100.0) AS passed FROM b""".stripMargin
    },

    "q_dq_quantiles" -> {
      def side(c: String) =
        s"""SELECT '$c' AS colname,
           |CAST(quantile_cont($c, 0.25) AS DOUBLE) AS p25,
           |CAST(quantile_cont($c, 0.50) AS DOUBLE) AS p50,
           |CAST(quantile_cont($c, 0.75) AS DOUBLE) AS p75,
           |CAST(quantile_cont($c, 0.95) AS DOUBLE) AS p95
           |FROM lineitem""".stripMargin
      side("l_quantity") + "\nUNION ALL\n" + side("l_extendedprice")
    },

    "q_dq_quantiles_approx_exact" -> {
      def side(c: String) =
        s"""SELECT '$c' AS colname,
           |CAST(quantile_disc($c, 0.25) AS DOUBLE) AS p25,
           |CAST(quantile_disc($c, 0.50) AS DOUBLE) AS p50,
           |CAST(quantile_disc($c, 0.75) AS DOUBLE) AS p75,
           |CAST(quantile_disc($c, 0.95) AS DOUBLE) AS p95
           |FROM lineitem""".stripMargin
      side("l_quantity") + "\nUNION ALL\n" + side("l_extendedprice")
    },

    "q_dq_score" -> {
      val rules = Seq(
        ("nn_okey", "completeness", "COUNT(*)-COUNT(o_orderkey)"),
        ("nn_cust", "completeness", "COUNT(*)-COUNT(o_custkey)"),
        ("av_status", "validity",
          "SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)"),
        ("rng_price", "validity",
          "SUM(CASE WHEN o_totalprice IS NOT NULL AND NOT (o_totalprice BETWEEN 0 AND 1000000.0) THEN 1 ELSE 0 END)"),
        ("cf_price_pos", "consistency",
          "SUM(CASE WHEN NOT COALESCE(o_totalprice > 0.0, FALSE) THEN 1 ELSE 0 END)"))
      val r = rules.map { case (id, tpe, viol) =>
        s"SELECT '$id' AS rule_id, '$tpe' AS rule_type, (($viol)*100.0/COUNT(*) <= 0.0) AS passed FROM orders"
      }.mkString("\nUNION ALL\n")
      s"""WITH r AS ($r)
         |SELECT rule_type, COUNT(*) AS n_rules,
         |       CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
         |       SUM(CASE WHEN passed THEN 1 ELSE 0 END)*100.0/COUNT(*) AS score
         |FROM r GROUP BY rule_type
         |UNION ALL
         |SELECT 'overall', COUNT(*), CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT),
         |       SUM(CASE WHEN passed THEN 1 ELSE 0 END)*100.0/COUNT(*)
         |FROM r""".stripMargin
    },

    "q_dq_quantile_bounded" -> {
      // quantile_cont == Spark percentile's linear interpolation; the
      // bounded path returns the identical exact value by construction
      Seq(("l_quantity", 0.25), ("l_discount", 0.9),
          ("l_extendedprice", 0.5), ("l_extendedprice", 0.99)).map { case (c, q) =>
        s"""SELECT '$c' AS colname, CAST($q AS DOUBLE) AS q,
           |CAST(quantile_cont(CAST($c AS DOUBLE), $q) AS DOUBLE) AS value
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "q_dq_quantiles_bounded" -> {
      def side(c: String) =
        s"""SELECT '$c' AS colname,
           |CAST(quantile_cont($c, 0.25) AS DOUBLE) AS p25,
           |CAST(quantile_cont($c, 0.50) AS DOUBLE) AS p50,
           |CAST(quantile_cont($c, 0.75) AS DOUBLE) AS p75,
           |CAST(quantile_cont($c, 0.95) AS DOUBLE) AS p95
           |FROM lineitem""".stripMargin
      side("l_quantity") + "\nUNION ALL\n" + side("l_extendedprice")
    }
  )
}
