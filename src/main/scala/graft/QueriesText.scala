package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Text

/** Text-analysis query pack over the `documents` corpus: q_text_* +
  * DuckDB oracles. All operators are map-side Column expressions.
  */
object QueriesText {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_text_tokens" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars_computed"),
        Text.tokenCount(col("text")).as("n_tokens"),
        Text.bpeishTokenCount(col("text")).as("n_tokens_bpe"))
    }),

    // token-distribution drift between the even/odd corpus halves:
    // PSI over the reference half's top-30 tokens + __other
    "q_text_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.llm.Text.tokenDriftPsi(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "text", topK = 30)
    }),

    // corpus-LM perplexity proxy: mean smoothed bigram log-prob under
    // the corpus's own bigram model (CCNet-style quality screen)
    "q_text_lm" -> ((s, dir) => {
      graft.llm.Text.bigramLmScore(docs(s, dir), "doc_id", "text")
    }),

    "q_text_quality" -> ((s, dir) => {
      val c = col("text")
      docs(s, dir).select(
        col("doc_id"),
        Text.alphaRatio(c).as("alpha_ratio"),
        Text.punctRatio(c).as("punct_ratio"),
        Text.stopwordRatio(c).as("stop_ratio"),
        Text.qualityScore(c).as("quality"))
    }),

    // Gopher/RefinedWeb-style corpus filtering rules (public
    // heuristics) — one map-side pass per document
    "q_text_gopher" -> ((s, dir) => {
      val c = col("text")
      docs(s, dir).select(
        col("doc_id"),
        Text.tokenCount(c).as("n_tokens"),
        Text.meanWordLength(c).as("mean_wlen"),
        Text.symbolToWordRatio(c).as("symbol_ratio"),
        Text.bulletLineFraction(c).as("bullet_frac"),
        Text.ellipsisLineFraction(c).as("ellipsis_frac"),
        Text.alphaWordFraction(c).as("alpha_word_frac"),
        Text.distinctWordRatio(c).as("distinct_ratio"),
        Text.gopherPasses(c, minTokens = 20).as("passes"))
    }),

    "q_text_langid" -> ((s, dir) => {
      val c = col("text")
      docs(s, dir).select(
        col("doc_id"),
        Text.langScore(c, "en").as("s_en"),
        Text.langScore(c, "de").as("s_de"),
        Text.langScore(c, "fr").as("s_fr"),
        Text.langScore(c, "es").as("s_es"),
        Text.langId(c).as("lang_guess"))
    }),

    // normalization: the text is deliberately dirtied (tabs, case,
    // trailing newline padding) identically on both sides, then
    // canonicalized — control-strip + whitespace-collapse + trim + lower
    "q_text_normalize" -> ((s, dir) => {
      val messy = concat(lit("  \t"), upper(col("text")), lit("\nEND  "))
      docs(s, dir).select(
        col("doc_id"),
        Text.normalize(messy).as("norm"),
        Text.tokenCount(Text.normalize(messy)).as("n_tokens"))
    }),

    "q_text_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        Text.fingerprint(col("text")).as("fp"),
        Text.shingleFingerprint(col("text"), 8).as("fp_shingle"))
    }),

    "q_text_readability" -> ((s, dir) => {
      val c = col("text")
      docs(s, dir).select(
        col("doc_id"),
        Text.tokenCount(c).as("n_words"),
        Text.sentenceCount(c).as("n_sentences"),
        Text.syllableCount(c).as("n_syllables"),
        round(Text.fleschScore(c), 4).as("flesch"))
    }),

    // encoding quality: replacement-char / stray-control detection.
    // Decode failures are planted deterministically (every 10th doc
    // gets U+FFFD markers appended, every 25th a 0x01 control run) so
    // the screen has positives to catch — identically on both sides
    "q_text_encoding" -> ((s, dir) => {
      val planted = when(col("doc_id") % 10 === 0, concat(col("text"), lit("\uFFFD\uFFFD")))
        .when(col("doc_id") % 25 === 0, concat(col("text"), lit("\u0001\u0001\u0001")))
        .otherwise(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        Text.replacementCharCount(planted).as("n_repl"),
        Text.strayControlCount(planted).as("n_ctrl"),
        Text.encodingClean(planted).as("clean"))
    }),

    // Gopher repetition rules: duplicate-line mass (each word becomes
    // a line so the word-salad corpus has real duplicates) and the
    // most-common-bigram share of all bigrams per document
    "q_text_repetition" -> ((s, dir) => {
      val asLines = regexp_replace(col("text"), " ", "\n")
      val perDoc = docs(s, dir).select(
        col("doc_id"),
        Text.dupLineFraction(asLines).as("dup_line_frac"))
      val grams = graft.llm.Search.ngramCounts(docs(s, dir), "doc_id", "text", 2)
        .groupBy(col("doc_id")).agg(
          max(col("cnt")).as("top_bigram_cnt"),
          sum(col("cnt")).as("n_bigrams"))
        .withColumn("top_bigram_frac",
          col("top_bigram_cnt").cast("double") / col("n_bigrams").cast("double"))
      perDoc.join(grams, Seq("doc_id"), "left")
        .select(col("doc_id"), round(col("dup_line_frac"), 6).as("dup_line_frac"),
          coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"))
    }),

    // salted pseudonymization: stable surrogate identifiers for
    // analytics over PII columns (masking, not encryption)
    "q_text_pseudo" -> ((s, dir) => {
      Tables.load(s, dir, "customer").select(
        col("c_custkey"),
        Text.pseudonymize(col("c_name"), "graft-salt").as("name_token"))
    })
  )

  // DuckDB fragments mirroring the Text column builders exactly.
  private def reCount(expr: String, pat: String): String =
    s"len(regexp_extract_all($expr, '$pat'))"
  private val tc = reCount("text", "\\S+")
  private val ac = reCount("text", "[A-Za-z]")
  private val pc = reCount("text", "[.,;:!?]")
  private val sc = reCount("lower(text)", "\\b(the|a|and|of|to|in|is)\\b")
  private val alphaRatio = s"CAST($ac AS DOUBLE) / GREATEST(length(text), 1)"
  private val punctRatio = s"CAST($pc AS DOUBLE) / GREATEST(length(text), 1)"
  private val stopRatio = s"CAST($sc AS DOUBLE) / GREATEST($tc, 1)"
  private def langScoreSql(words: Seq[String]): String =
    reCount("lower(text)", "\\b(" + words.mkString("|") + ")\\b")

  def oracleSql: Map[String, String] = Map(

    "q_text_tokens" ->
      s"""SELECT doc_id, length(text) AS n_chars_computed,
         |$tc AS n_tokens,
         |${reCount("text", " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+")} AS n_tokens_bpe
         |FROM documents""".stripMargin,

    "q_text_drift" -> {
      def half(pred: String) =
        s"""SELECT tok FROM (
           |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
           |  FROM documents WHERE $pred) WHERE tok <> ''"""
      val pR = "GREATEST(CAST(rn AS DOUBLE) / tot.tr, 1.0e-4)"
      val pC = "GREATEST(CAST(cn AS DOUBLE) / tot.tc, 1.0e-4)"
      s"""WITH rt AS (${half("doc_id % 2 = 0").stripMargin}),
         |ct AS (${half("doc_id % 2 = 1").stripMargin}),
         |topk AS (SELECT tok FROM (
         |  SELECT tok, COUNT(*) AS n FROM rt GROUP BY 1
         |  ORDER BY n DESC, tok LIMIT 30)),
         |rc AS (SELECT CASE WHEN tok IN (SELECT tok FROM topk) THEN tok
         |              ELSE '(other tokens)' END AS cat, COUNT(*) AS rn
         |       FROM rt GROUP BY 1),
         |cc AS (SELECT CASE WHEN tok IN (SELECT tok FROM topk) THEN tok
         |              ELSE '(other tokens)' END AS cat, COUNT(*) AS cn
         |       FROM ct GROUP BY 1),
         |j AS (SELECT COALESCE(rc.cat, cc.cat) AS cat,
         |             COALESCE(rn, 0) AS rn, COALESCE(cn, 0) AS cn
         |      FROM rc FULL OUTER JOIN cc ON rc.cat = cc.cat),
         |tot AS (SELECT CAST(SUM(rn) AS BIGINT) AS tr, CAST(SUM(cn) AS BIGINT) AS tc FROM j),
         |terms AS (
         |  SELECT ($pC - $pR) * ln($pC / $pR) AS term, tot.tr, tot.tc
         |  FROM j, tot)
         |SELECT CAST(MAX(tr) AS BIGINT) AS n_ref, CAST(MAX(tc) AS BIGINT) AS n_cur,
         |  CAST(COUNT(*) AS BIGINT) AS n_categories,
         |  ROUND(${graft.functions.Det.sqlSumAt("term", 6)}, 6) AS psi,
         |  (ROUND(${graft.functions.Det.sqlSumAt("term", 6)}, 6) > 0.1) AS drifted
         |FROM terms""".stripMargin
    },

    "q_text_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                t -> t <> '') AS w
         |  FROM documents),
         |bigrams AS (
         |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |  FROM (SELECT doc_id, w,
         |          unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
         |        FROM toks)),
         |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY 1, 2),
         |ug AS (SELECT w1, COUNT(*) AS c1
         |       FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY 1),
         |v AS (SELECT COUNT(*) AS nv FROM ug),
         |terms AS (
         |  SELECT b.doc_id, ln((bg.c12 + 0.5) / (ug.c1 + 0.5 * v.nv)) AS term
         |  FROM bigrams b JOIN bg USING (w1, w2) JOIN ug USING (w1) CROSS JOIN v),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(CAST(term AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS smic
         |  FROM terms GROUP BY doc_id)
         |SELECT doc_id, n_bigrams,
         |  CAST(CASE WHEN smic >= 0 THEN (2 * smic + n_bigrams) // (2 * n_bigrams)
         |            ELSE -((2 * (-smic) + n_bigrams) // (2 * n_bigrams)) END
         |       AS DOUBLE) / 1000000.0 AS lm_score
         |FROM agg""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id,
         |$alphaRatio AS alpha_ratio,
         |$punctRatio AS punct_ratio,
         |$stopRatio AS stop_ratio,
         |LEAST(1.0, CAST($tc AS DOUBLE) / 50.0) * 0.3
         |  + ($alphaRatio) * 0.4 + ($stopRatio) * 0.3 AS quality
         |FROM documents""".stripMargin,

    "q_text_gopher" -> {
      val mwl = s"CAST(length(text) - ${reCount("text", "\\s")} AS DOUBLE) / GREATEST($tc, 1)"
      val sym = s"CAST(${reCount("text", "#|\\.\\.\\.|…")} AS DOUBLE) / GREATEST($tc, 1)"
      val lines = s"(${reCount("text", "\\n")} + 1)"
      val bullet = s"CAST(${reCount("text", "(?m)^\\s*[-*•]")} AS DOUBLE) / $lines"
      val ellipsis = s"CAST(${reCount("text", "(?m)(\\.\\.\\.|…) *$$")} AS DOUBLE) / $lines"
      val alphaW = s"CAST(${reCount("text", "\\S*[A-Za-z]\\S*")} AS DOUBLE) / GREATEST($tc, 1)"
      val words = "regexp_extract_all(lower(trim(text)), '\\S+')"
      val distinctR = s"CASE WHEN $tc = 0 THEN 0.0 ELSE " +
        s"CAST(len(list_distinct($words)) AS DOUBLE) / CAST($tc AS DOUBLE) END"
      s"""SELECT doc_id,
         |$tc AS n_tokens,
         |$mwl AS mean_wlen,
         |$sym AS symbol_ratio,
         |$bullet AS bullet_frac,
         |$ellipsis AS ellipsis_frac,
         |$alphaW AS alpha_word_frac,
         |$distinctR AS distinct_ratio,
         |($tc BETWEEN 20 AND 100000 AND ($mwl) BETWEEN 3.0 AND 10.0
         |  AND ($sym) < 0.1 AND ($bullet) < 0.9 AND ($ellipsis) < 0.3
         |  AND ($alphaW) > 0.8) AS passes
         |FROM documents""".stripMargin
    },

    "q_text_langid" -> {
      val scores = Text.langMarkers.map { case (l, ws) => l -> langScoreSql(ws) }
      val g = scores.map(_._2).mkString("GREATEST(", ", ", ")")
      val cases = scores.map { case (l, s) => s"WHEN $s = __g THEN '$l'" }.mkString(" ")
      s"""SELECT doc_id,
         |${scores.map { case (l, s) => s"$s AS s_$l" }.mkString(",\n")},
         |CASE WHEN ${reCount("text", "[\\x{4e00}-\\x{9fff}]")} > 0 THEN 'zh'
         |     $cases ELSE 'und' END AS lang_guess
         |FROM (SELECT doc_id, text, $g AS __g FROM documents)""".stripMargin
    },

    "q_text_normalize" -> {
      val messy = "'  ' || chr(9) || upper(text) || chr(10) || 'END  '"
      val norm = "lower(trim(regexp_replace(regexp_replace(" + messy +
        ", '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')))"
      s"""SELECT doc_id, $norm AS norm,
         |${reCount(norm, "\\S+")} AS n_tokens
         |FROM documents""".stripMargin
    },

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        |list_min(list_transform(range(1, GREATEST(1, length(text) - 7) + 1),
        |  i -> md5(substring(text, i, 8)))) AS fp_shingle
        |FROM documents""".stripMargin,

    "q_text_pseudo" ->
      """SELECT c_custkey, sha256('graft-salt' || c_name) AS name_token
        |FROM customer""".stripMargin,

    "q_text_readability" -> {
      val words = s"GREATEST($tc, 1)"
      val sentences = s"GREATEST(${reCount("text", "[.!?]+")}, 1)"
      val syllables = reCount("lower(text)", "[aeiouy]+")
      s"""SELECT doc_id,
         |$tc AS n_words,
         |$sentences AS n_sentences,
         |$syllables AS n_syllables,
         |round(206.835 - 1.015 * CAST($words AS DOUBLE) / CAST($sentences AS DOUBLE)
         |  - 84.6 * CAST($syllables AS DOUBLE) / CAST($words AS DOUBLE), 4) AS flesch
         |FROM documents""".stripMargin
    },

    "q_text_repetition" ->
      """WITH lines AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(text, ' ', chr(10), 'g'), chr(10)) AS l
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, round(
        |    CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / len(l), 6) AS dup_line_frac
        |  FROM lines),
        |tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |       FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, GREATEST(len(t) - 1, 0) + 1),
        |    i -> t[i] || ' ' || t[i + 1])) AS ngram
        |  FROM tl),
        |gc AS (SELECT doc_id, ngram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, MAX(cnt) AS top_bigram_cnt,
        |         CAST(SUM(cnt) AS BIGINT) AS n_bigrams
        |  FROM gc GROUP BY 1)
        |SELECT d.doc_id, d.dup_line_frac,
        |  COALESCE(top_bigram_cnt, 0) AS top_bigram_cnt,
        |  COALESCE(n_bigrams, 0) AS n_bigrams,
        |  round(COALESCE(CAST(top_bigram_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
        |                 0.0), 6) AS top_bigram_frac
        |FROM d LEFT JOIN agg USING (doc_id)""".stripMargin,

    "q_text_encoding" -> {
      val planted = "CASE WHEN doc_id % 10 = 0 THEN text || chr(65533) || chr(65533) " +
        "WHEN doc_id % 25 = 0 THEN text || chr(1) || chr(1) || chr(1) ELSE text END"
      val repl = s"len(regexp_extract_all(p, chr(65533)))"
      val ctrl = s"len(regexp_extract_all(p, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]'))"
      s"""SELECT doc_id, $repl AS n_repl, $ctrl AS n_ctrl,
         |($repl = 0 AND CAST($ctrl AS DOUBLE) <= GREATEST(length(p), 1) * 0.001) AS clean
         |FROM (SELECT doc_id, $planted AS p FROM documents)""".stripMargin
    }
  )
}
