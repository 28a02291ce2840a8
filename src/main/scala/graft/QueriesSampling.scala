package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Sampling, Text}

/** Sampling / data-mixture / decontamination / PII query pack:
  * q_sample_*, q_decontaminate, q_text_redact — all fully
  * oracle-checkable because every operator keys off md5 (portable)
  * instead of rand(): the DuckDB oracle selects the EXACT same rows.
  */
object QueriesSampling {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // cutoff literals shared verbatim by query code (via Sampling) and
  // oracle SQL (interpolated below) — one source of truth for rounding
  private val cut10 = Sampling.cutoffHex(0.1)
  private val cut25 = Sampling.cutoffHex(0.25)
  private val cut50 = Sampling.cutoffHex(0.5)
  private val cutValid = Sampling.cutoffHex(0.05)
  private val cutTest = Sampling.cutoffHex(0.05 + 0.05) // same fold as splitTag's scanLeft
  private def h(key: String) = s"substring(md5(CAST($key AS VARCHAR)), 1, 8)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // deterministic 10% Bernoulli sample — reproducible across runs,
    // partitionings and engines; map-side filter, no shuffle
    "q_sample_hash" -> ((s, dir) => {
      Sampling.sample(t(s, dir, "orders"), "o_orderkey", 0.1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // per-language fractions: downsample en to 25%, zh to 50%
    "q_sample_stratified" -> ((s, dir) => {
      Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 0.5))
        .select("doc_id", "lang", "source")
    }),

    // deterministic n-per-stratum reservoir: 3 docs per (lang, source)
    "q_sample_perkey" -> ((s, dir) => {
      Sampling.samplePerStratum(t(s, dir, "documents"),
        Seq("lang", "source"), "doc_id", n = 3)
        .select("doc_id", "lang", "source", "rn")
    }),

    // per-source quota: keep the 4 LONGEST docs per source (C4-style
    // per-domain cap — best rows under the quota, not a uniform draw)
    "q_sample_cap" -> ((s, dir) => {
      Sampling.capPerGroup(t(s, dir, "documents"),
        Seq("source"), priorityCol = "n_chars", tieCol = "doc_id", n = 4)
        .select("doc_id", "source", "n_chars", "rn")
    }),

    // disjoint+exhaustive train/valid/test assignment, counted per lang
    "q_sample_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("split", Sampling.splitTag(col("doc_id"),
          Seq("valid" -> 0.05, "test" -> 0.05, "train" -> 0.9)))
        .groupBy("lang", "split").agg(count(lit(1)).as("n"))
    }),

    // quality-weighted sampling: each doc kept with probability
    // n_chars/(n_chars+500) — longer docs more likely; per-row cutoff
    // from pure integer/hex arithmetic, one map-side filter
    "q_sample_weighted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.sampleByProb(docs, "doc_id",
        col("n_chars") / (col("n_chars") + lit(500)))
        .select("doc_id", "lang", "n_chars")
    }),

    // data-mixture resampling: en halved, zh replicated 2.5x
    "q_sample_mixture" -> ((s, dir) => {
      Sampling.mixture(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 2.5))
        .select("doc_id", "lang", "copy_idx")
    }),

    // benchmark decontamination: corpus docs sharing any word 5-gram
    // with the benchmark subset (doc_id % 97 == 0), benchmark broadcast
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramContamination(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 5)
    }),

    // per-benchmark contamination report: the publishable per-eval
    // overlap stats (docs touched + gram mass), benchmark sets named
    // by the source column, clean benchmarks zero-filled
    "q_decontaminate_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", benchNameCol = "source", n = 5)
    }),

    // the Bloom-pruned decontamination path, SAME exact output (the
    // filter narrows where the join looks, never what it returns) —
    // hash-checked against the identical oracle as q_decontaminate
    "q_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.ngramContaminationBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 5)
    }),

    // line-level boilerplate removal: docs are framed with a per-source
    // header and a global footer on BOTH sides; lines occurring in >= 2
    // distinct docs (headers, footers, duplicated bodies) are dropped,
    // survivors keep their original order
    "q_corpus_linededup" -> ((s, dir) => {
      val framed = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("== "), col("source"), lit(" ==\n"), col("text"),
          lit("\n-- footer --")).as("t"))
      Dedup.dropBoilerplateLines(framed, "doc_id", "t", minDocs = 2)
    }),

    // PII redaction: the corpus text is salted with deterministic
    // doc_id-derived PII (email/phone/SSN/IP) on BOTH sides so the
    // oracle actually exercises every replacement, then scrubbed
    "q_text_redact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pii = concat_ws(" ",
        lit("contact"),
        concat(lit("user"), col("doc_id").cast("string"), lit("@mail.example.com")),
        lit("call"),
        concat(lit("415-555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")),
        lit("ssn"),
        concat(lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-12-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")),
        lit("from"),
        concat(lit("10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")),
        col("text"))
      val countCols = Text.piiCounts(pii).map { case (name, c) => c.as(s"n_$name") }
      docs.select(col("doc_id") +: Text.redactPii(pii).as("clean") +: countCols: _*)
    })
  )

  // shared by q_decontaminate and q_decontaminate_bloom: the Bloom
  // variant is output-identical by construction (prune + exact verify)
  private val decontaminateOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |pos AS (
      |  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i
      |  FROM toks),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS g FROM pos),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
      |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM grams g JOIN bench b USING (g)
      |WHERE g.doc_id % 97 <> 0
      |GROUP BY g.doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q_sample_hash" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE ${h("o_orderkey")} < '$cut10'""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE CASE WHEN lang = 'zh' THEN ${h("doc_id")} < '$cut50'
         |           WHEN lang = 'en' THEN ${h("doc_id")} < '$cut25'
         |           ELSE TRUE END""".stripMargin,

    "q_sample_perkey" ->
      s"""SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS rn FROM (
         |  SELECT doc_id, lang, source,
         |         row_number() OVER (PARTITION BY lang, source
         |                            ORDER BY ${h("doc_id")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 3""".stripMargin,

    "q_sample_cap" ->
      """SELECT doc_id, source, n_chars, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 4""".stripMargin,

    "q_sample_split" ->
      s"""SELECT lang,
         |  CASE WHEN ${h("doc_id")} < '$cutValid' THEN 'valid'
         |       WHEN ${h("doc_id")} < '$cutTest' THEN 'test'
         |       ELSE 'train' END AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin,

    "q_sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h("doc_id")} <= lpad(lower(hex(
         |  least(CAST(floor(least(greatest(n_chars / (n_chars + 500), 0.0), 1.0)
         |    * 4294967296.0) AS BIGINT), 4294967295))), 8, '0')""".stripMargin,

    "q_sample_mixture" ->
      s"""SELECT doc_id, lang, CAST(unnest(generate_series(1, k)) AS INTEGER) AS copy_idx
         |FROM (
         |  SELECT doc_id, lang,
         |    CASE WHEN lang = 'zh' THEN 2 + CASE WHEN ${h("doc_id")} < '$cut50' THEN 1 ELSE 0 END
         |         WHEN lang = 'en' THEN 0 + CASE WHEN ${h("doc_id")} < '$cut50' THEN 1 ELSE 0 END
         |         ELSE 1 END AS k
         |  FROM documents)""".stripMargin,

    "q_decontaminate" -> decontaminateOracle,
    "q_decontaminate_bloom" -> decontaminateOracle,

    "q_decontaminate_report" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |pos AS (
        |  SELECT doc_id, source, w, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS i
        |  FROM toks),
        |grams AS (
        |  SELECT DISTINCT doc_id, source, array_to_string(w[i:i+4], ' ') AS g FROM pos),
        |bench AS (SELECT DISTINCT source AS bench_name, g FROM grams WHERE doc_id % 97 = 0),
        |sizes AS (SELECT bench_name, CAST(COUNT(*) AS BIGINT) AS n_bench_grams
        |          FROM bench GROUP BY bench_name),
        |hits AS (
        |  SELECT b.bench_name,
        |    CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_gram_hits
        |  FROM (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0) c
        |  JOIN bench b USING (g) GROUP BY b.bench_name)
        |SELECT s.bench_name, COALESCE(h.n_docs, 0) AS n_docs,
        |  COALESCE(h.n_gram_hits, 0) AS n_gram_hits, s.n_bench_grams
        |FROM sizes s LEFT JOIN hits h USING (bench_name)""".stripMargin,

    "q_corpus_linededup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         '== ' || source || ' ==' || chr(10) || text || chr(10) || '-- footer --' AS t
        |  FROM documents),
        |sp AS (SELECT doc_id, string_split(t, chr(10)) AS w FROM base),
        |pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM sp),
        |lines AS (SELECT doc_id, i, w[i] AS line FROM pos),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS docs FROM lines GROUP BY 1)
        |SELECT l.doc_id,
        |  COALESCE(string_agg(CASE WHEN f.docs < 2 THEN l.line END, chr(10) ORDER BY l.i), '') AS clean,
        |  CAST(COUNT(CASE WHEN f.docs < 2 THEN 1 END) AS INTEGER) AS n_kept,
        |  CAST(COUNT(CASE WHEN f.docs >= 2 THEN 1 END) AS INTEGER) AS n_dropped
        |FROM lines l JOIN freq f USING (line)
        |GROUP BY l.doc_id""".stripMargin,

    "q_text_redact" -> {
      // single-line on purpose: this fragment is embedded in a
      // stripMargin'd template below, which would eat one '|' of any
      // line-leading '||' concatenation
      val pii = "concat_ws(' ', 'contact', " +
        "'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com', " +
        "'call', '415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
        "'ssn', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-12-' || " +
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), " +
        "'from', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7', text)"
      val redacted = Text.piiPatterns.foldLeft(pii) { case (acc, (_, pat, token)) =>
        s"regexp_replace($acc, '$pat', '$token', 'g')"
      }
      val counts = Text.piiPatterns.map { case (name, pat, _) =>
        s"len(regexp_extract_all($pii, '$pat')) AS n_$name"
      }.mkString(",\n")
      s"""SELECT doc_id,
         |$redacted AS clean,
         |$counts
         |FROM documents""".stripMargin
    }
  )
}
