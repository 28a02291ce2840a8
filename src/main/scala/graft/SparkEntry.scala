package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.operators.Ops
import graft.functions.Det

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Every entry in [[queries]] exercises the graft operator library and
  * has (where SQL-expressible) a DuckDB oracle in [[oracleSql]] with
  * IDENTICAL output column names. Numeric aggregates use the
  * order-independent [[graft.functions.Det]] forms on both sides so
  * results hash-match bit-for-bit across engines.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg")(spark, "/root/testdata/sf0.001")

  // -------------------------------------------------------------------
  // Queries (this file: core transformations; module packs merged below)
  // -------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ QueriesDQ.queries ++ QueriesAnomaly.queries ++
      QueriesIncremental.queries ++ QueriesText.queries ++ QueriesLlm.queries ++
      QueriesPipeline.queries ++ QueriesTime.queries ++ QueriesWindow.queries ++
      QueriesSampling.queries ++ QueriesRelational.queries ++ QueriesSearch.queries

  def oracleSql: Map[String, String] =
    baseOracleSql ++ QueriesDQ.oracleSql ++ QueriesAnomaly.oracleSql ++
      QueriesIncremental.oracleSql ++ QueriesText.oracleSql ++ QueriesLlm.oracleSql ++
      QueriesPipeline.oracleSql ++ QueriesTime.oracleSql ++ QueriesWindow.oracleSql ++
      QueriesSampling.oracleSql ++ QueriesRelational.oracleSql ++ QueriesSearch.oracleSql

  /** Oracle PARITY ANCHORS: queries whose registered formulation is
    * deliberately the exact-but-unscalable one, kept because a DuckDB
    * oracle can check it bit-for-bit — each anchors the correctness of
    * a production path registered beside it. Their bench timings are
    * correctness collateral, not the engine's recommended-path cost:
    *  - q_dq_quantiles: Spark's native `percentile` (single-reducer
    *    value buffer) as the exact-quantile parity anchor for the
    *    bounded-memory three-scan path (q_dq_quantiles_bounded /
    *    q_dq_quantile_bounded, `graft.functions.Quantiles`);
    *  - q_dedup_jaccard: unsampled all-pairs blocked Jaccard as the
    *    pair-exactness anchor for the bounded auto-routed path
    *    (q_dedup_jaccard_bounded, `Dedup.ngramJaccardPairsAuto`).
    */
  def anchorQueries: Set[String] = Set("q_dq_quantiles", "q_dedup_jaccard")

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- filters ------------------------------------------------------
    "q_filter" -> ((s, dir) => {
      val li = Ops.filterAll(t(s, dir, "lineitem"),
        Seq(("l_quantity", ">", 45.0), ("l_returnflag", "==", "R")))
      Ops.selectOrder(li, Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
    }),

    "q_filter_dates" -> ((s, dir) => {
      val li = Ops.filterDateRange(t(s, dir, "lineitem"),
        "l_shipdate", "1995-01-01", "1995-03-31")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Det.sumMoney(col("l_extendedprice")).as("revenue"))
    }),

    // -- aggregation (TPC-H Q1 shape) ----------------------------------
    "q_agg" -> ((s, dir) => {
      val li = Ops.filterBy(t(s, dir, "lineitem"), "l_shipdate", "<=", "1998-09-01")
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        Det.sumAt(col("l_quantity"), 2).as("sum_qty"),
        Det.sumMoney(col("l_extendedprice")).as("sum_base_price"),
        Det.sumAt(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Det.meanAt(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
    }),

    // -- joins ----------------------------------------------------------
    "q_join_inner" -> ((s, dir) => {
      val cust = Ops.renameColumns(t(s, dir, "customer"), Map("c_custkey" -> "o_custkey"))
      val j = Ops.join(t(s, dir, "orders"), cust, Seq("o_custkey"),
        how = "inner", broadcastRight = true)
      j.groupBy(col("c_mktsegment")).agg(
        count(lit(1)).as("n_orders"),
        Det.sumMoney(col("o_totalprice")).as("total_price"))
    }),

    "q_join_left" -> ((s, dir) => {
      val ord = Ops.renameColumns(t(s, dir, "orders"), Map("o_custkey" -> "c_custkey"))
      val j = Ops.join(t(s, dir, "customer"), ord, Seq("c_custkey"), how = "left")
      Ops.groupAgg(j, Seq("c_custkey"), Seq(("o_orderkey", "count", "n_orders")))
    }),

    "q_join_multi" -> ((s, dir) => {
      // lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (Q5 shape).
      // Dims are broadcast; the fact table never shuffles for them.
      val li = t(s, dir, "lineitem")
      val ord = Ops.renameColumns(t(s, dir, "orders"), Map("o_orderkey" -> "l_orderkey"))
      val cust = Ops.renameColumns(t(s, dir, "customer"), Map("c_custkey" -> "o_custkey"))
      val nat = Ops.renameColumns(t(s, dir, "nation"), Map("n_nationkey" -> "c_nationkey"))
      val reg = Ops.renameColumns(t(s, dir, "region"), Map("r_regionkey" -> "n_regionkey"))
      val j = Ops.join(
        Ops.join(
          Ops.join(
            Ops.join(li, ord, Seq("l_orderkey")),
            cust, Seq("o_custkey"), broadcastRight = true),
          nat, Seq("c_nationkey"), broadcastRight = true),
        reg, Seq("n_regionkey"), broadcastRight = true)
      Ops.filterBy(j, "r_name", "==", "ASIA")
        .groupBy(col("n_name"))
        .agg(Det.sumAt(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
    }),

    // skew-resistant salted join: bit-identical to the plain join
    // (salting only re-partitions the hot key's rows; the oracle IS the
    // plain join, proving equivalence at the result level)
    "q_join_salted" -> ((s, dir) => {
      val ord = Ops.renameColumns(t(s, dir, "orders"), Map("o_orderkey" -> "l_orderkey"))
      val j = Ops.saltedJoin(t(s, dir, "lineitem"), ord, "l_orderkey", buckets = 8)
      j.groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"), Det.sumAt(col("l_quantity"), 2).as("sum_qty"))
    }),

    // -- pivot ----------------------------------------------------------
    "q_pivot" -> ((s, dir) => {
      Ops.pivot(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_linestatus",
        Seq("F", "O"), Det.sumAt(col("l_quantity"), 2))
    }),

    // multi-value pivot — ref transformation_library.py:538 (values=[...])
    "q_pivot_multi" -> ((s, dir) => {
      Ops.pivotMulti(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_linestatus",
        Seq("F", "O"),
        Seq(Det.sumAt(col("l_quantity"), 2).as("qty"), count(lit(1)).as("n")))
    }),

    // melt / unpivot — the inverse of q_pivot (pandas melt; map-side
    // Expand, no shuffle)
    "q_melt" -> ((s, dir) => {
      Ops.melt(t(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_discount", "l_tax"))
    }),

    // -- window functions ------------------------------------------------
    "q_rank" -> ((s, dir) => {
      val r = Ops.rankWithin(t(s, dir, "supplier"), Seq("s_nationkey"),
        Seq(col("s_acctbal").desc, col("s_suppkey").asc), dense = false, alias = "rnk")
      Ops.filterBy(r, "rnk", "<=", 3)
        .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          col("rnk").cast("long").as("rnk"))
    }),

    "q_lag" -> ((s, dir) => {
      Ops.lagLead(t(s, dir, "orders"), "o_totalprice", Seq("o_custkey"),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc), 1, "prev_price")
        .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price")
    }),

    "q_running_total" -> ((s, dir) => {
      Ops.runningTotal(t(s, dir, "orders"), "o_totalprice", Seq("o_custkey"),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc), alias = "running_spend")
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
    }),

    "q_rolling" -> ((s, dir) => {
      // Daily revenue + exact 7-day rolling sum via Ops.rolling. The
      // day-level frame is tiny post-aggregation, so the single
      // unpartitioned window is fine; at 100 TB the pre-aggregation
      // did the heavy lifting.
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev"))
      Ops.rolling(daily, Seq.empty, Seq(col("day").asc), "rev", 7, "sum", "rev_7d")
        .select(col("day"), col("rev").cast("double").as("revenue"),
          col("rev_7d").cast("double").as("rev_7d"))
    }),

    "q_join_many" -> ((s, dir) => {
      // Ops.joinMany: N frames sharing one key joined pairwise; dims
      // and pre-aggregated sides stay broadcast-sized at any scale.
      val nat = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val custAgg = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("n_nationkey"))
        .agg(count(lit(1)).as("n_cust"), Det.sumMoney(col("c_acctbal")).as("cust_bal"))
      val suppAgg = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("n_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      Ops.joinMany(Seq(nat, custAgg, suppAgg), Seq("n_nationkey"))
    }),

    // -- type conversion / projection -------------------------------------
    "q_typeconv" -> ((s, dir) => {
      val o = Ops.convertTypes(t(s, dir, "orders"), Map("o_orderdate" -> "date"))
      o.select(col("o_orderkey"),
        col("o_orderdate"),
        year(col("o_orderdate")).cast("int").as("yr"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_num"))
    }),

    // explicit-pattern datetime parsing (ref transformation_library.py:333
    // convert_to_datetime(format=...)): format a timestamp to a non-ISO
    // string, parse it back with the declared pattern — a bare cast of
    // "25/03/2024 ..." would be NULL
    "q_typeconv_fmt" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("od_str", date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss"))
      Ops.convertTypes(o, Map("od_str" -> "datetime"),
          datetimeFormats = Map("od_str" -> "dd/MM/yyyy HH:mm:ss"))
        .select(col("o_orderkey"), col("od_str").as("od_ts"))
    }),

    "q_project" -> ((s, dir) => {
      val p = Ops.renameColumns(t(s, dir, "part"), Map("p_name" -> "part_name"))
      val d = Ops.dropColumns(p, Seq("p_brand", "p_retailprice"))
      Ops.selectOrder(d, Seq("p_partkey", "part_name", "p_type", "p_size"))
    }),

    // -- missing-data handling (pandas fillna/ffill parity) ---------------
    // nulls are planted deterministically (every 7th order), forward-
    // filled per customer in date order, leading nulls constant-filled
    "q_fill" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("p",
        when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      val ff = Ops.forwardFill(o, Seq("p"), Seq("o_custkey"),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc))
      Ops.fillMissing(ff, Map("p" -> 0.0))
        .select(col("o_orderkey"), col("o_custkey"), col("p").as("price_filled"))
    }),

    // interior null runs interpolated linearly along the order
    // coordinate; boundary nulls stay null by contract
    "q_interpolate" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("p",
        when(col("o_orderkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      Ops.interpolateLinear(o, "p", Seq("o_custkey"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("p").as("price_interp"))
    }),

    // percentile outlier capping per priority group. The capped value
    // rounds to cents on BOTH sides: the bounds come from each engine's
    // own exact-percentile interpolation, and a last-ulp difference
    // there would otherwise flip hash parity data-dependently
    "q_winsorize" -> ((s, dir) => {
      Ops.winsorize(t(s, dir, "orders"), "o_totalprice", 0.05, 0.95,
        Seq("o_orderpriority"), alias = "price_capped")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          round(col("price_capped"), 2).as("price_capped"))
    }),

    // daily-grid resample (pandas asfreq + ffill): every day between a
    // customer's first and last order; gap days carry the last revenue
    // forward, order counts fill with zero
    "q_resample" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(col("o_custkey") <= 20)
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"), Det.sumMoney(col("o_totalprice")).as("rev"))
      val dense = Ops.resampleDaily(daily, Seq("o_custkey"), "d")
      val filled = Ops.forwardFill(dense, Seq("rev"), Seq("o_custkey"),
        Seq(col("day").asc))
      Ops.fillMissing(filled, Map("n_orders" -> 0L))
        .select(col("o_custkey"), col("day"), col("n_orders"), col("rev"))
    }),

    // -- SQL transform ----------------------------------------------------
    "q_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      Ops.sqlTransform(s, sqlPriority)
    }),

    // -- custom expression (reference's custom-UDF slot, codegen-native) ---
    "q_custom_expr" -> ((s, dir) => {
      val bucket = when(col("o_totalprice") < 50000.0, "low")
        .when(col("o_totalprice") < 150000.0, "mid")
        .otherwise("high")
      t(s, dir, "orders")
        .withColumn("price_bucket", bucket)
        .groupBy(col("price_bucket"))
        .agg(count(lit(1)).as("n"), Det.sumMoney(col("o_totalprice")).as("total"))
    })
  )

  private val sqlPriority: String =
    "SELECT o_orderpriority, COUNT(*) AS n, " +
      Det.sqlSumMoney("o_totalprice") + " AS total " +
      "FROM orders GROUP BY o_orderpriority"

  // -------------------------------------------------------------------
  // DuckDB oracles (identical column names + Det-deterministic math)
  // -------------------------------------------------------------------
  private def baseOracleSql: Map[String, String] = Map(
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q_filter_dates" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |${Det.sqlSumMoney("l_extendedprice")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND l_shipdate <= TIMESTAMP '1995-03-31 00:00:00'
         |GROUP BY l_returnflag""".stripMargin,

    "q_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${Det.sqlSumAt("l_quantity", 2)} AS sum_qty,
         |${Det.sqlSumMoney("l_extendedprice")} AS sum_base_price,
         |${Det.sqlSumAt("l_extendedprice*(1.0-l_discount)", 4)} AS sum_disc_price,
         |${Det.sqlMeanAt("l_discount", 6)} AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_inner" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |${Det.sqlSumMoney("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q_join_multi" ->
      s"""SELECT n_name,
         |${Det.sqlSumAt("l_extendedprice*(1.0-l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders   ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation   ON n_nationkey = c_nationkey
         |JOIN region   ON r_regionkey = n_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,

    "q_join_salted" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |${Det.sqlSumAt("l_quantity", 2)} AS sum_qty
         |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority""".stripMargin,

    "q_melt" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
        |       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |       CAST(l_discount AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax',
        |       CAST(l_tax AS DOUBLE) FROM lineitem""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS "F",
        |CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_pivot_multi" ->
      """SELECT l_returnflag,
        |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS F_qty,
        |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F_n,
        |CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(28,2)) END) AS DOUBLE) AS O_qty,
        |CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O_n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_rank" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal, rnk FROM (
        |  SELECT s_nationkey, s_suppkey, s_acctbal,
        |         RANK() OVER (PARTITION BY s_nationkey
        |                      ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
        |  FROM supplier) WHERE rnk <= 3""".stripMargin,

    "q_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,

    "q_rolling" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue,
        |CAST(SUM(rev) OVER (ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
        |FROM daily""".stripMargin,

    "q_join_many" ->
      s"""SELECT n_nationkey, n_name, n_cust, cust_bal, n_supp
         |FROM nation
         |JOIN (SELECT c_nationkey AS n_nationkey, COUNT(*) AS n_cust,
         |             ${Det.sqlSumMoney("c_acctbal")} AS cust_bal
         |      FROM customer GROUP BY 1) USING (n_nationkey)
         |JOIN (SELECT s_nationkey AS n_nationkey, COUNT(*) AS n_supp
         |      FROM supplier GROUP BY 1) USING (n_nationkey)""".stripMargin,

    "q_typeconv" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
        |CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS priority_num
        |FROM orders""".stripMargin,

    "q_typeconv_fmt" ->
      """SELECT o_orderkey,
        |strptime(strftime(o_orderdate, '%d/%m/%Y %H:%M:%S'), '%d/%m/%Y %H:%M:%S') AS od_ts
        |FROM orders""".stripMargin,

    "q_project" ->
      """SELECT p_partkey, p_name AS part_name, p_type, p_size FROM part""".stripMargin,

    "q_fill" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS p
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  COALESCE(LAST_VALUE(p IGNORE NULLS) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS price_filled
        |FROM o""".stripMargin,

    "q_interpolate" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS p
        |  FROM orders),
        |f AS (
        |  SELECT o_orderkey, o_custkey, p,
        |    CAST(o_orderkey AS DOUBLE) AS ord,
        |    LAST_VALUE(p IGNORE NULLS) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    LAST_VALUE(CASE WHEN p IS NOT NULL THEN CAST(o_orderkey AS DOUBLE) END IGNORE NULLS) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_o,
        |    FIRST_VALUE(p IGNORE NULLS) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderkey
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    FIRST_VALUE(CASE WHEN p IS NOT NULL THEN CAST(o_orderkey AS DOUBLE) END IGNORE NULLS) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderkey
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_o
        |  FROM o)
        |SELECT o_orderkey, o_custkey,
        |  CASE WHEN p IS NOT NULL THEN p
        |       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
        |         THEN prev_v + (next_v - prev_v) * (ord - prev_o) / (next_o - prev_o)
        |  END AS price_interp
        |FROM f""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  round(LEAST(GREATEST(o_totalprice, lo), hi), 2) AS price_capped
        |FROM orders JOIN b USING (o_orderpriority)""".stripMargin,

    "q_resample" ->
      s"""WITH a AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
         |         ${Det.sqlSumMoney("o_totalprice")} AS rev
         |  FROM orders WHERE o_custkey <= 20 GROUP BY 1, 2),
         |b AS (SELECT o_custkey, MIN(d) AS lo, MAX(d) AS hi FROM a GROUP BY 1),
         |g AS (
         |  SELECT o_custkey, CAST(u.gs AS DATE) AS day
         |  FROM b, unnest(generate_series(CAST(lo AS TIMESTAMP),
         |                 CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS u(gs)),
         |j AS (
         |  SELECT g.o_custkey, g.day, a.n_orders, a.rev
         |  FROM g LEFT JOIN a ON g.o_custkey = a.o_custkey AND g.day = a.d)
         |SELECT o_custkey, day, COALESCE(n_orders, 0) AS n_orders,
         |  LAST_VALUE(rev IGNORE NULLS) OVER (
         |    PARTITION BY o_custkey ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev
         |FROM j""".stripMargin,

    "q_sql" -> sqlPriority,

    "q_custom_expr" ->
      s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
         |            WHEN o_totalprice < 150000.0 THEN 'mid'
         |            ELSE 'high' END AS price_bucket,
         |COUNT(*) AS n, ${Det.sqlSumMoney("o_totalprice")} AS total
         |FROM orders GROUP BY 1""".stripMargin
  )
}
