package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level privacy operations for sensitive data in a training
  * pipeline — the data-plane face of the reference's security layer
  * (reference: src/utils/security_manager.py:150 encrypt_credential /
  * :182 decrypt_credential encrypt CONFIG secrets with Fernet; the
  * engine-side need is the same primitives applied to DATA COLUMNS at
  * corpus scale, where a driver-side crypto loop cannot run). All
  * three operations are native codegen'd expressions — they ride the
  * scan/write projection, no UDF, no shuffle:
  *
  *  - [[encryptColumns]]/[[decryptColumns]]: AES-GCM via Spark's
  *    built-in `aes_encrypt`/`aes_decrypt` (random IV per value — NOT
  *    deterministic, so ciphertexts don't leak equality; store as
  *    base64 string columns)
  *  - [[pseudonymize]]: keyed-hash tokenization (sha256 over
  *    key‖length‖value). DETERMINISTIC by design: the same value maps
  *    to the same token under one key, so pseudonymized keys still
  *    JOIN across tables — the property GDPR-style pipelines need to
  *    keep referential analytics after de-identification. Without the
  *    key, tokens resist dictionary reversal; unlike encryption there
  *    is no un-pseudonymize.
  *  - [[maskColumns]]: partial display masking (keep the last
  *    `keepLast` chars, star the rest) for human-facing surfaces.
  *
  * Key handling stays with the caller (the reference's credential
  * vault / cloud KMS is control-plane): pass key MATERIAL in, never
  * store it in data or config written by the engine.
  */
object Privacy {

  /** AES-GCM encrypt `cols` in place (base64 text output). Key must be
    * 16/24/32 bytes (AES-128/192/256).
    */
  def encryptColumns(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    requireKey(key)
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      base64(aes_encrypt(col(c).cast("string").cast("binary"), keyCol(key)))))
  }

  /** Inverse of [[encryptColumns]]: base64 AES-GCM ciphertext back to
    * the plaintext string. Wrong key / tampered value raises (GCM
    * authenticates) — use [[tryDecryptColumns]] for null-on-failure.
    */
  def decryptColumns(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    requireKey(key)
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      aes_decrypt(unbase64(col(c)), keyCol(key)).cast("string")))
  }

  /** [[decryptColumns]] that yields null for values the key cannot
    * authenticate instead of failing the job — the quarantine-style
    * posture for mixed-key datasets.
    */
  def tryDecryptColumns(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    requireKey(key)
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      try_aes_decrypt(unbase64(col(c)), keyCol(key)).cast("string")))
  }

  /** Deterministic keyed tokenization: sha256(key ‖ length(value) ‖
    * value) as 64-char hex. Same key + same value → same token (the
    * join-safe property); nulls stay null. The length prefix blocks
    * trivial concatenation collisions between adjacent fields.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    require(key.nonEmpty, "pseudonymize needs a non-empty key")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNotNull,
        sha2(concat(
          lit(key), lit(":"),
          length(col(c).cast("string")).cast("string"), lit(":"),
          col(c).cast("string")), 256))))
  }

  /** Partial display mask: all but the last `keepLast` characters
    * become `*`. Values at or under `keepLast` chars mask fully —
    * a 4-char value shown verbatim under keepLast=4 would not be
    * masked at all.
    */
  def maskColumns(df: DataFrame, cols: Seq[String],
                  keepLast: Int = 4, maskChar: String = "*"): DataFrame = {
    require(keepLast >= 0, "keepLast >= 0")
    require(maskChar.length == 1, "maskChar is one character")
    // Column-form repeat throughout: SQL-string interpolation would
    // break on a quote maskChar or a backtick in the column name
    cols.foldLeft(df)((d, c) => d.withColumn(c, {
      val s = col(c).cast("string")
      when(col(c).isNull, lit(null).cast("string"))
        .when(length(s) <= keepLast, repeat(lit(maskChar), length(s)))
        .otherwise(concat(
          repeat(lit(maskChar), length(s) - lit(keepLast)),
          substring(s, -keepLast, keepLast)))
    }))
  }

  private def keyCol(key: String): Column = lit(key.getBytes("UTF-8"))
  private def requireKey(key: String): Unit = {
    val n = key.getBytes("UTF-8").length
    require(Seq(16, 24, 32).contains(n),
      s"AES key must be 16/24/32 bytes, got $n")
  }
}
