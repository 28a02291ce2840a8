package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.Anomaly
import graft.functions.Det

/** Anomaly-detection query pack: q_anom_* + DuckDB oracles.
  * Reference semantics: src/quality/anomaly_manager.py:110-360.
  */
object QueriesAnomaly {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def ev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select("event_id", "user_id", "ts", "value")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // zscore_detection — ref anomaly_manager.py:110
    "q_anom_zscore" -> ((s, dir) => {
      Anomaly.zscore(ev(s, dir), "value", threshold = 3.0)
        .select("event_id", "value", "z")
    }),

    // config-driven dispatch — ref dq_engine.py:146 detect_anomalies
    // routes on a config dict; identical output to q_anom_zscore, so
    // the same oracle hash-checks the whole front-end path
    "q_anom_config" -> ((s, dir) => {
      Anomaly.fromJson(ev(s, dir),
        """{"method": "zscore", "column": "value", "threshold": 3.0}""")
        .select("event_id", "value", "z")
    }),

    // iqr_detection — ref anomaly_manager.py:125
    "q_anom_iqr" -> ((s, dir) => {
      Anomaly.iqr(ev(s, dir), "value", multiplier = 1.5)
        .select("event_id", "value", "conf")
    }),

    // robust (median/MAD) z-score per event type
    "q_anom_mad" -> ((s, dir) => {
      val e = t(s, dir, "events").select("event_id", "event_type", "value")
      Anomaly.madZscore(e, "value", Seq("event_type"), threshold = 3.0)
        .select("event_id", "event_type", "value", "robust_z")
    }),

    // moving_average_detection — ref anomaly_manager.py:146
    "q_anom_movavg" -> ((s, dir) => {
      Anomaly.movingAvg(ev(s, dir), "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), window = 7, threshold = 2.0)
        .select("event_id", "user_id", "value", "z")
    }),

    // ensemble_vote — ref anomaly_manager.py:335-360
    "q_anom_ensemble" -> ((s, dir) => {
      val e = ev(s, dir)
      Anomaly.ensemble(Seq(
        (Anomaly.zscore(e, "value", 3.0), "z"),
        (Anomaly.iqr(e, "value", 1.5), "conf"),
        (Anomaly.movingAvg(e, "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), 7, 2.0), "z")),
        keyCols = Seq("event_id"), minVotes = 2)
    }),

    // severity triage over the ensemble vote share — ref
    // anomaly_manager.py:335 classify_severity (vote-share confidence
    // = votes/detectors, the ref ensemble_vote:355 definition, so the
    // bands are float-exact on both engines)
    "q_anom_severity" -> ((s, dir) => {
      val e = ev(s, dir)
      Anomaly.ensemble(Seq(
          (Anomaly.zscore(e, "value", 3.0), "z"),
          (Anomaly.iqr(e, "value", 1.5), "conf"),
          (Anomaly.movingAvg(e, "value", Seq("user_id"),
            Seq(col("ts").asc, col("event_id").asc), 7, 2.0), "z")),
          keyCols = Seq("event_id"), minVotes = 2)
        .withColumn("conf", col("votes").cast("double") / 3.0)
        .select(col("event_id"), col("votes"), col("conf"),
          Anomaly.classifySeverity(col("conf")).as("severity"))
    }),

    // stl-ish seasonal residual — ref anomaly_manager.py:262
    "q_anom_seasonal" -> ((s, dir) => {
      Anomaly.seasonalResidual(ev(s, dir), "value", hour(col("ts")), threshold = 2.5)
        .select("event_id", "season", "value", "z")
    }),

    // FULL decomposition (trend/seasonal/resid columns) — the
    // reusable surface behind the :262 residual screen
    "q_anom_decompose" -> ((s, dir) => {
      Anomaly.decompose(ev(s, dir), "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), hour(col("ts")),
          halfWindow = 3)
        .select(col("event_id"), col("season"), col("trend"),
          col("seasonal"), col("resid"))
    }),

    // isolation forest — ref anomaly_manager.py:183 (no SQL oracle: the
    // forest is not SQL-expressible; deterministic by construction, so
    // the driver's rows-only check is stable and AnomalySpec pins the
    // semantics on planted data)
    "q_anom_iforest" -> ((s, dir) => {
      graft.quality.IsolationForest.detect(ev(s, dir), Seq("value"),
          threshold = 0.6, numTrees = 50, sampleSize = 256)
        .select("event_id", "value", "iforest_score")
    }),

    // AR(1)-residual outliers — ref anomaly_manager.py:238
    "q_anom_ar" -> ((s, dir) => {
      Anomaly.arResidual(ev(s, dir), "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), threshold = 3.0)
        .select("event_id", "user_id", "value", "z")
    }),

    // local outlier factor over embeddings — ref anomaly_manager.py:214
    // (rows-only: the kNN/lrd chain is not reasonably SQL-expressible;
    // deterministic, AnomalySpec pins semantics on planted data).
    // REGISTERED at the scale-safe operating point: detectAuto sizes
    // the LSH plane count for constant bucket occupancy (Lof.planesFor),
    // which is what holds the chain LINEAR as the corpus grows — the r12
    // sf1 gate measured the old fixed planes=4 shape at 12.9× wall for
    // 10× data (quadratic in-bucket growth) vs ~linear adaptive
    // (PLANS.md r12 addendum). The registered query is the statement of
    // record, so it carries the plan a 100 TB user should run.
    "q_anom_lof" -> ((s, dir) => {
      // uniform synthetic embeddings have LOF tightly around 1.0 (no
      // local structure), so the gate sits just above the bulk: ~top
      // few percent of locally-sparse points
      graft.quality.Lof.detectAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 1.04, k = 5, targetBucketSize = 512)
        .select("vec_id", "label", "lof")
    }),

    // exact-mode companion: planes = 0 is single-bucket all-pairs, so
    // the full Breunig LOF chain (kNN -> k-dist -> reachability -> lrd
    // -> ratio) is SQL-derivable and oracle-checked end-to-end. Scores
    // round at 3 dp here: lrd/lof pass through unrounded double sums
    // whose last-ulp order sensitivity 6 dp would surface as spurious
    // cross-engine diffs (the dist/rank math itself is 6 dp exact,
    // proven by the sim-family oracles).
    "q_anom_lof_exact" -> ((s, dir) => {
      // deterministic mod-4 snapshot: the exact all-pairs oracle only
      // needs a bounded fixture (500 vectors covers every LOF branch;
      // the unsampled LSH-bucketed q_anom_lof is the production path)
      graft.quality.Lof.scores(
          t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0),
          "vec_id", "embedding", k = 5, planes = 0)
        .select(col("vec_id"), col("n_neighbors"),
          round(col("lrd"), 3).as("lrd3"), round(col("lof"), 3).as("lof3"))
    }),

    // IVF-cell (learned-neighbourhood) LOF — the r17 opt-in quality
    // path: candidate pools are k-means cells instead of data-blind
    // hyperplane half-spaces, with singleton-cell rescue. AnomalySpec's
    // planted comparison measures the adjudication: recovery 6/6 (5/6
    // without rescue) vs 2/6 for hyperplane buckets at equal occupancy,
    // at in-bucket pair-cost parity. detectAuto KEEPS hyperplanes as
    // the default (O(n log n) bucket derivation vs the cell
    // assignment's O(n·nlist) — see Lof.scoresIvf's scale note); this
    // registration is the per-round cost/recall visibility of the
    // quality path. Rows-only: learned geometry; companions are the
    // planted spec and the exact-chain q_anom_lof_exact oracle.
    "q_anom_lof_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      // the REGISTERED form exercises the amortized production shape:
      // the quantizer comes from the same memoized training the whole
      // IVF family shares (q_sim_ivf*, q_dedup_semantic,
      // q_cluster_kmeans), so LOF screening costs one map-side
      // assignment pass — not a private Lloyd run per call
      val (_, cents) = graft.llm.Ivf.trainAutoCached(e, "vec_id",
        "embedding", iters = 2, cacheKey = s"$dir/embeddings")
      graft.quality.Lof.detectIvf(e, "vec_id", "embedding",
          threshold = 1.04, k = 5, targetBucketSize = 512,
          quantizer = Some(cents))
        .select("vec_id", "label", "lof")
    }),

    // mean-shift changepoint scan — ref anomaly_manager.py:304
    "q_anom_changepoint" -> ((s, dir) => {
      Anomaly.changepoints(ev(s, dir), "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc), window = 20, threshold = 3.0)
        .select("event_id", "user_id", "value", "score")
    }),

    // multi-scale variant: 10/20/40-row frames in ONE window pass
    "q_anom_changepoint_ms" -> ((s, dir) => {
      Anomaly.changepointsMultiScale(ev(s, dir), "value", Seq("user_id"),
          Seq(col("ts").asc, col("event_id").asc),
          windows = Seq(10, 20, 40), threshold = 3.0)
        .select("event_id", "user_id", "value", "win", "score")
    }),

    // elliptic (Mahalanobis) boundary, ocsvm stand-in — ref
    // anomaly_manager.py:221 (quantity/price are genuinely correlated,
    // so the elliptic boundary differs from a per-axis screen)
    "q_anom_ocsvm" -> ((s, dir) => {
      Anomaly.ellipticBoundary(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
          "l_quantity", "l_extendedprice", nu = 0.1)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "md2")
    }),

    // trend+seasonality forecast residual, prophet stand-in — ref
    // anomaly_manager.py:282 (per-user linear trend over the day index,
    // hourly additive seasonality)
    "q_anom_prophet" -> ((s, dir) => {
      Anomaly.prophetResidual(ev(s, dir), "value",
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
          hour(col("ts")), Seq("user_id"), threshold = 2.5)
        .select("event_id", "user_id", "value", "season", "z")
    }),

    // dbscan-ish grid density — ref anomaly_manager.py:162
    "q_anom_grid" -> ((s, dir) => {
      Anomaly.gridDensity(ev(s, dir).select("event_id", "user_id", "value"),
          Seq(("value", 50.0), ("user_id", 10.0)), minPts = 5)
        .select("event_id", "user_id", "value", "cell_n")
    })
  )

  // -------------------------------------------------------------------
  // DuckDB oracles
  // -------------------------------------------------------------------

  private val zExpr = "ABS(value - s.m) / s.sd"

  // CTE fragment (no WITH keyword — composes into larger WITH lists)
  /** Single-scale changepoint oracle at window `w`; `withWin` adds the
    * win column for the multi-scale union.
    */
  private def cpOracleSql(w: Int, withWin: Boolean): String = {
    val pooled = "((GREATEST(0.0, s2l - sl*sl/nl) + GREATEST(0.0, s2r - sr*sr/nr)) / (nl + nr - 2.0))"
    val denom = s"SQRT($pooled * (1.0/nl + 1.0/nr))"
    val score = s"ROUND(CASE WHEN $denom <> 0.0 THEN ABS(sr/nr - sl/nl) / $denom END, 6)"
    val winCol = if (withWin) s"CAST($w AS INTEGER) AS win, " else ""
    s"""SELECT event_id, user_id, value, $winCol$score AS score FROM (
       |  SELECT event_id, user_id, value,
       |    CAST(COUNT(value) OVER wl AS DOUBLE) AS nl,
       |    CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER wl AS DOUBLE) AS sl,
       |    CAST(SUM(CAST((value)*(value) AS DECIMAL(28,6))) OVER wl AS DOUBLE) AS s2l,
       |    CAST(COUNT(value) OVER wr AS DOUBLE) AS nr,
       |    CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER wr AS DOUBLE) AS sr,
       |    CAST(SUM(CAST((value)*(value) AS DECIMAL(28,6))) OVER wr AS DOUBLE) AS s2r
       |  FROM events
       |  WINDOW
       |    wl AS (PARTITION BY user_id ORDER BY ts, event_id
       |           ROWS BETWEEN $w PRECEDING AND 1 PRECEDING),
       |    wr AS (PARTITION BY user_id ORDER BY ts, event_id
       |           ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING))
       |WHERE nl = $w AND nr = $w AND $score > 3.0""".stripMargin
  }

  private def movavgCte: String =
    """w AS (
      |  SELECT event_id, user_id, value,
      |    CAST(COUNT(value) OVER win AS DOUBLE) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER win AS DOUBLE) AS s,
      |    CAST(SUM(CAST((value)*(value) AS DECIMAL(28,6))) OVER win AS DOUBLE) AS s2
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))""".stripMargin

  private def ensembleSql: String =
    s"""WITH zs AS (
       |  SELECT event_id, ABS(value - s.m) / s.sd AS conf
       |  FROM events, (SELECT ${Det.sqlMeanAt("value", 6)} AS m,
       |                       ${Det.sqlStddevAt("value", 6)} AS sd FROM events) s
       |  WHERE ABS(value - s.m) / s.sd > 3.0),
       |iq AS (
       |  SELECT event_id,
       |    ABS(value - (s.q1 + s.q3) / 2.0) / ((s.q3 - s.q1) / 2.0) AS conf
       |  FROM events, (SELECT quantile_cont(value, 0.25) AS q1,
       |                       quantile_cont(value, 0.75) AS q3 FROM events) s
       |  WHERE value < s.q1 - 1.5 * (s.q3 - s.q1)
       |     OR value > s.q3 + 1.5 * (s.q3 - s.q1)),
       |$movavgCte ,
       |mv AS (
       |  SELECT event_id, $movavgZ AS conf
       |  FROM w WHERE n = 7 AND $movavgZ > 2.0),
       |allv AS (SELECT * FROM zs UNION ALL SELECT * FROM iq UNION ALL SELECT * FROM mv)
       |SELECT event_id, COUNT(*) AS votes, MAX(conf) AS max_conf
       |FROM allv GROUP BY event_id HAVING COUNT(*) >= 2""".stripMargin

  private val movavgZ =
    "ABS(value - s/n) / SQRT(GREATEST(0.0, (s2 - s*s/n) / (n - 1.0)))"

  // shared by q_anom_zscore and its config-dispatch twin — one
  // definition so the two oracles can never drift apart
  private lazy val zscoreOracle: String =
    s"""WITH s AS (SELECT ${Det.sqlMeanAt("value", 6)} AS m,
       |                  ${Det.sqlStddevAt("value", 6)} AS sd FROM events)
       |SELECT event_id, value, $zExpr AS z
       |FROM events, s WHERE $zExpr > 3.0""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // mirrors Lof.scores with planes=0 step for step: cosine distance
    // rounded at 6 dp, kNN ties on neighbor id, reach = max(kdist_o,
    // dist), lrd capped at 1e12 on zero reach sums, double-rounded
    // (6 then 3 dp) exactly as the Spark side emits
    "q_anom_lof_exact" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                          CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings WHERE vec_id % 4 = 0),
        |pair AS (
        |  SELECT a.vec_id AS p, b.vec_id AS o,
        |    1.0 - (CASE WHEN a.nrm * b.nrm <> 0 THEN
        |      ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[]))
        |            / (a.nrm * b.nrm), 6) ELSE 0.0 END) AS dist
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        |knn AS (
        |  SELECT p, o, dist FROM (
        |    SELECT p, o, dist, ROW_NUMBER() OVER (
        |      PARTITION BY p ORDER BY dist ASC, o ASC) AS rn FROM pair)
        |  WHERE rn <= 5),
        |kdist AS (SELECT p, MAX(dist) AS kdist FROM knn GROUP BY p),
        |reach AS (
        |  SELECT k.p, k.o, GREATEST(kd.kdist, k.dist) AS reach
        |  FROM knn k JOIN kdist kd ON kd.p = k.o),
        |lrd AS (
        |  SELECT p, COUNT(*) AS n_neighbors,
        |    CASE WHEN SUM(reach) > 0.0
        |         THEN CAST(COUNT(*) AS DOUBLE) / SUM(reach)
        |         ELSE 1e12 END AS lrd
        |  FROM reach GROUP BY p),
        |agg AS (
        |  SELECT r.p, AVG(l.lrd) AS avg_o
        |  FROM reach r JOIN lrd l ON l.p = r.o GROUP BY r.p)
        |SELECT l.p AS vec_id, l.n_neighbors,
        |  ROUND(ROUND(l.lrd, 6), 3) AS lrd3,
        |  ROUND(ROUND(CASE WHEN l.lrd > 0.0 THEN a.avg_o / l.lrd END, 6), 3) AS lof3
        |FROM agg a JOIN lrd l ON l.p = a.p""".stripMargin,

    "q_anom_zscore" -> zscoreOracle,
    "q_anom_config" -> zscoreOracle,

    "q_anom_iqr" ->
      """WITH s AS (SELECT quantile_cont(value, 0.25) AS q1,
        |                  quantile_cont(value, 0.75) AS q3 FROM events)
        |SELECT event_id, value,
        |  ABS(value - (s.q1 + s.q3) / 2.0) / ((s.q3 - s.q1) / 2.0) AS conf
        |FROM events, s
        |WHERE value < s.q1 - 1.5 * (s.q3 - s.q1)
        |   OR value > s.q3 + 1.5 * (s.q3 - s.q1)""".stripMargin,

    "q_anom_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_id, e.event_type, e.value, med.m,
        |         ABS(e.value - med.m) AS d
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(d, 0.5) AS mad,
        |    (CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) / COUNT(d)) AS meandev
        |  FROM dev GROUP BY 1),
        |z AS (
        |  SELECT event_id, event_type, value,
        |    round(0.6745 * (value - m) /
        |      (CASE WHEN mad <> 0.0 THEN mad ELSE meandev END), 6) AS robust_z
        |  FROM dev JOIN mad USING (event_type)
        |  WHERE (CASE WHEN mad <> 0.0 THEN mad ELSE meandev END) <> 0.0)
        |SELECT event_id, event_type, value, robust_z
        |FROM z WHERE ABS(robust_z) > 3.0""".stripMargin,

    "q_anom_movavg" ->
      s"""WITH $movavgCte
         |SELECT event_id, user_id, value, $movavgZ AS z
         |FROM w WHERE n = 7 AND $movavgZ > 2.0""".stripMargin,

    "q_anom_ensemble" -> ensembleSql,

    "q_anom_severity" ->
      s"""WITH e AS ($ensembleSql)
         |SELECT event_id, votes, CAST(votes AS DOUBLE) / 3.0 AS conf,
         |CASE WHEN CAST(votes AS DOUBLE) / 3.0 > 0.8 THEN 'high'
         |     WHEN CAST(votes AS DOUBLE) / 3.0 > 0.5 THEN 'medium'
         |     ELSE 'low' END AS severity
         |FROM e""".stripMargin,

    "q_anom_decompose" ->
      s"""WITH t AS (
         |  SELECT event_id, value, hour(ts) AS season,
         |    CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
         |      / COUNT(value) OVER w AS trend
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |s AS (SELECT season, ${Det.sqlMeanAt("value - trend", 6)} AS seasonal
         |      FROM t GROUP BY season)
         |SELECT t.event_id, t.season, ROUND(t.trend, 6) AS trend,
         |  ROUND(s.seasonal, 6) AS seasonal,
         |  ROUND(t.value - t.trend - s.seasonal, 6) AS resid
         |FROM t JOIN s USING (season)""".stripMargin,

    "q_anom_seasonal" ->
      s"""WITH k AS (SELECT event_id, value, hour(ts) AS season FROM events),
         |s AS (SELECT season, ${Det.sqlMeanAt("value", 6)} AS m,
         |             ${Det.sqlStddevAt("value", 6)} AS sd FROM k GROUP BY season)
         |SELECT k.event_id, k.season, k.value, $zExpr AS z
         |FROM k JOIN s USING (season) WHERE $zExpr > 2.5""".stripMargin,

    "q_anom_ar" -> {
      val sx = Det.sqlSumAt("value", 6)
      val sxl = Det.sqlSumAt("xl", 6)
      val sxx = Det.sqlSumAt("(value)*(value)", 6)
      val sxy = Det.sqlSumAt("(value)*(xl)", 6)
      val sxlxl = Det.sqlSumAt("(xl)*(xl)", 6)
      s"""WITH l AS (
         |  SELECT event_id, user_id, value,
         |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS xl
         |  FROM events),
         |f AS (SELECT * FROM l WHERE xl IS NOT NULL),
         |s AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
         |  $sx AS sx, $sxl AS sxl, $sxx AS sxx, $sxy AS sxy, $sxlxl AS sxlxl
         |  FROM f GROUP BY user_id),
         |p AS (SELECT *, CASE WHEN (n * sxlxl - sxl * sxl) <> 0.0
         |  THEN (n * sxy - sx * sxl) / (n * sxlxl - sxl * sxl) END AS phi FROM s),
         |q AS (SELECT *, (sx - phi * sxl) / n AS c FROM p),
         |r AS (SELECT *, GREATEST(0.0, sxx - 2.0 * c * sx - 2.0 * phi * sxy
         |  + c * c * n + 2.0 * c * phi * sxl + phi * phi * sxlxl) AS ssr FROM q),
         |t AS (SELECT user_id, phi, c, SQRT(ssr / (n - 1.0)) AS std FROM r)
         |SELECT f.event_id, f.user_id, f.value,
         |  ROUND(CASE WHEN t.std <> 0.0
         |    THEN ABS(f.value - t.c - t.phi * f.xl) / t.std END, 6) AS z
         |FROM f JOIN t USING (user_id)
         |WHERE ROUND(CASE WHEN t.std <> 0.0
         |  THEN ABS(f.value - t.c - t.phi * f.xl) / t.std END, 6) > 3.0""".stripMargin
    },

    "q_anom_ocsvm" -> {
      val sx = Det.sqlSumAt("l_quantity", 6)
      val sy = Det.sqlSumAt("l_extendedprice", 6)
      val sxx = Det.sqlSumAt("(l_quantity)*(l_quantity)", 6)
      val syy = Det.sqlSumAt("(l_extendedprice)*(l_extendedprice)", 6)
      val sxy = Det.sqlSumAt("(l_quantity)*(l_extendedprice)", 6)
      // operand order mirrors Anomaly.ellipticBoundary exactly
      val vx = "(n * sxx - sx * sx)"
      val vy = "(n * syy - sy * sy)"
      val rho = s"((n * sxy - sx * sy) / (SQRT($vx) * SQRT($vy)))"
      val zx = "((l_quantity - sx / n) / SQRT((sxx - sx * sx / n) / n))"
      val zy = "((l_extendedprice - sy / n) / SQRT((syy - sy * sy / n) / n))"
      val md2 = s"""CASE WHEN $vx > 0.0 AND $vy > 0.0 AND 1.0 - $rho * $rho <> 0.0
                   | THEN ROUND(($zx * $zx - 2.0 * $rho * $zx * $zy + $zy * $zy)
                   |            / (1.0 - $rho * $rho), 6) END""".stripMargin
      s"""WITH s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |  $sx AS sx, $sy AS sy, $sxx AS sxx, $syy AS syy, $sxy AS sxy
         |  FROM lineitem),
         |d AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         |  $md2 AS md2 FROM lineitem, s),
         |t AS (SELECT ROUND(quantile_cont(md2, 0.9), 6) AS thr FROM d)
         |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, md2
         |FROM d, t WHERE md2 > thr""".stripMargin
    },

    "q_anom_prophet" -> {
      val sx = Det.sqlSumAt("xd", 6)
      val sy = Det.sqlSumAt("value", 6)
      val sxx = Det.sqlSumAt("(xd)*(xd)", 6)
      val sxy = Det.sqlSumAt("(value)*(xd)", 6)
      // operand order mirrors Anomaly.prophetResidual exactly
      s"""WITH k AS (
         |  SELECT event_id, user_id, value,
         |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS xd,
         |    hour(ts) AS season
         |  FROM events),
         |s AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
         |  $sx AS sx, $sy AS sy, $sxx AS sxx, $sxy AS sxy FROM k GROUP BY user_id),
         |f AS (SELECT user_id, n, sx, sy,
         |  CASE WHEN (n * sxx - sx * sx) <> 0.0
         |       THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0.0 END AS slope
         |  FROM s),
         |g AS (SELECT user_id, slope, (sy - slope * sx) / n AS c FROM f),
         |d AS (SELECT k.event_id, k.user_id, k.value, k.season,
         |  k.value - g.c - g.slope * k.xd AS r FROM k JOIN g USING (user_id)),
         |m AS (SELECT user_id, season, ${Det.sqlMeanAt("r", 6)} AS ms
         |  FROM d GROUP BY user_id, season),
         |e AS (SELECT d.*, d.r - m.ms AS resid FROM d JOIN m USING (user_id, season)),
         |t AS (SELECT user_id, ${Det.sqlMeanAt("resid", 6)} AS rm,
         |  ${Det.sqlStddevSafeAt("resid", 6)} AS rsd FROM e GROUP BY user_id)
         |SELECT e.event_id, e.user_id, e.value, e.season,
         |  ROUND(CASE WHEN t.rsd <> 0.0 THEN ABS(e.resid - t.rm) / t.rsd END, 6) AS z
         |FROM e JOIN t USING (user_id)
         |WHERE ROUND(CASE WHEN t.rsd <> 0.0 THEN ABS(e.resid - t.rm) / t.rsd END, 6) > 2.5""".stripMargin
    },

    "q_anom_changepoint" -> cpOracleSql(20, withWin = false),

    "q_anom_changepoint_ms" ->
      Seq(10, 20, 40).map(cpOracleSql(_, withWin = true))
        .mkString("\nUNION ALL\n"),

    "q_anom_grid" ->
      """WITH k AS (SELECT event_id, user_id, value,
        |  FLOOR(value / 50.0) AS cv, FLOOR(user_id / 10.0) AS cu FROM events),
        |c AS (SELECT cv, cu, COUNT(*) AS cell_n FROM k GROUP BY cv, cu)
        |SELECT k.event_id, k.user_id, k.value, c.cell_n
        |FROM k JOIN c USING (cv, cu) WHERE c.cell_n < 5""".stripMargin
  )
}
