package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * pure codegen'd Column expressions (no UDFs) — they run map-side at
  * full whole-stage-codegen speed and never shuffle.
  *
  * (These extend beyond the reference repo, which has no text
  * analytics; required by the engine brief for LLM data pipelines.)
  */
object Text {

  // ---- token counting ------------------------------------------------

  // counts use regexp_count (no match-array materialization); the
  // DuckDB oracles keep len(regexp_extract_all(...)) — same value

  /** Whitespace tokenization count. */
  def tokenCount(c: Column): Column =
    regexp_count(c, lit("\\S+"))

  /** BPE-ish pre-tokenizer count: letter runs / digit runs / symbol
    * runs, each with an optional leading space (GPT-2-style pattern
    * minus lookaheads, which RE2-class engines reject).
    */
  val bpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit(bpeishPattern))

  // ---- quality scoring ----------------------------------------------

  def alphaCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]"))
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[.,;:!?]"))

  val enStopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  def stopwordCount(c: Column, words: Seq[String] = enStopwords): Column =
    regexp_count(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"))

  def alphaRatio(c: Column): Column =
    alphaCount(c).cast("double") / greatest(length(c), lit(1))
  def punctRatio(c: Column): Column =
    punctCount(c).cast("double") / greatest(length(c), lit(1))
  def stopwordRatio(c: Column, words: Seq[String] = enStopwords): Column =
    stopwordCount(c, words).cast("double") / greatest(tokenCount(c), lit(1))

  /** Composite quality score in [0,1]: length component (saturates at
    * `fullTokens` tokens) + alphabetic-character ratio + stopword
    * ratio. Deterministic double arithmetic; identical on any engine.
    */
  def qualityScore(c: Column, fullTokens: Int = 50): Column =
    least(lit(1.0), tokenCount(c).cast("double") / lit(fullTokens.toDouble)) * lit(0.3) +
      alphaRatio(c) * lit(0.4) + stopwordRatio(c) * lit(0.3)

  // ---- language ID ---------------------------------------------------

  /** Stopword/charset marker lists per language (n-gram heuristic).
    * CJK presence wins outright; otherwise argmax of stopword hits
    * with deterministic tie-break in declaration order (en first).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def langScore(c: Column, lang: String): Column = {
    val words = langMarkers.toMap.apply(lang)
    regexp_count(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"))
  }

  def cjkCount(c: Column): Column =
    regexp_count(c, lit("[\\u4e00-\\u9fff]"))

  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = greatest(scores.map(_._2): _*)
    // first-wins tie-break in declaration order (en, de, fr, es)
    val firstWins = scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best, lit(l)).otherwise(acc)
    }
    when(cjkCount(c) > 0, lit("zh")).otherwise(firstWins)
  }

  // ---- fingerprinting ------------------------------------------------

  /** Exact content fingerprint (md5 of the full text). */
  def fingerprint(c: Column): Column = md5(c)

  /** Rolling-hash document fingerprint: the minimum md5 over all
    * k-character shingles (a 1-permutation MinHash — robust to small
    * edits anywhere but the minimal shingle). Higher-order functions
    * only; stays inside codegen, no UDF.
    */
  def shingleFingerprint(c: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(lit(1), length(c) - lit(k - 1))),
      i => md5(c.substr(i, lit(k)))))
}
