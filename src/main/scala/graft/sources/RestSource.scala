package graft.sources

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** REST API source — the Spark-native re-expression of the reference's
  * `APIConnector` (reference: src/connectors/api_connector.py:20-310:
  * auth modes, pagination, retry/backoff, JSON payload extraction).
  *
  * Scale design: the reference loops pages on one machine; here the
  * page URL list is a Dataset distributed across executors, each task
  * fetches its pages with plain JDK HTTP (no driver dependency) and
  * the payload is parsed with a DECLARED schema through `from_json` —
  * never driver-side accumulation of RECORDS, never schema inference
  * over network data. Page-numbered and offset pagination distribute
  * (page count known up front, e.g. from a count endpoint); cursor
  * pagination ([[readCursor]]) is inherently a sequential chain — the
  * driver walks the cursor handing each raw page body off, and only
  * the payload PARSE distributes. Bound it with maxPages and prefer
  * landing unbounded cursor feeds to object storage.
  *
  * The whole config is a serializable case class, so the fetch closure
  * ships to executors as-is.
  */
final case class RestSource(
    baseUrl: String,
    endpoint: String,
    authType: String = "none", // none | basic | bearer | api_key
    authConfig: Map[String, String] = Map.empty,
    headers: Map[String, String] = Map.empty,
    params: Map[String, String] = Map.empty,
    timeoutMs: Int = 30000,
    maxRetries: Int = 3,
    backoffMs: Int = 300,
    pagination: String = "page", // page | offset | none
    pageParam: String = "page",
    sizeParam: String = "per_page",
    pageSize: Int = 100,
    dataField: String = "data" // response field holding the record array; "" = root IS the array
) extends Serializable {

  /** Auth expressed as request headers — ref api_connector.py:65-82.
    * Evaluated per request ATTEMPT (see [[fetch]]), so an oauth2 token
    * that expires mid-pagination is re-fetched transparently before
    * the next page goes out.
    */
  def authHeaders: Map[String, String] = authType match {
    case "basic" =>
      val cred = s"${authConfig.getOrElse("username", "")}:${authConfig.getOrElse("password", "")}"
      Map("Authorization" -> ("Basic " + java.util.Base64.getEncoder
        .encodeToString(cred.getBytes(StandardCharsets.UTF_8))))
    case "bearer" =>
      Map("Authorization" -> s"Bearer ${authConfig.getOrElse("token", "")}")
    case "api_key" =>
      Map(authConfig.getOrElse("header", "X-API-Key") -> authConfig.getOrElse("key", ""))
    case "oauth2" =>
      Map("Authorization" -> s"Bearer ${oauthToken()}")
    case _ => Map.empty
  }

  /** OAuth2 client-credentials bearer token — the flow the reference
    * stubs out (api_connector.py:77-82: "OAuth2 implementation would
    * go here... assume token is provided"). POSTs `token_url` with
    * `grant_type=client_credentials` (+ client_id / client_secret /
    * optional scope, form-encoded), parses `access_token` +
    * `expires_in`, and caches per full credential identity
    * (token_url, client_id, client_secret, scope) PER JVM —
    * executor tasks share one token, the driver its own — until the
    * expiry window minus a refresh margin passes, then re-fetches.
    * Margin: `refresh_margin_sec` (default min(30, expires_in/10)).
    * A 401 on a data request additionally invalidates the cached
    * token once and retries (reactive refresh for servers that revoke
    * early — clock skew, key rotation).
    */
  // the full credential identity — distinct scopes or a rotated secret
  // must NOT reuse each other's cached token
  private def oauthCacheKey(tokenUrl: String): (String, String, String, String) =
    (tokenUrl, authConfig.getOrElse("client_id", ""),
      authConfig.getOrElse("client_secret", ""), authConfig.getOrElse("scope", ""))

  private def oauthToken(): String = {
    val tokenUrl = authConfig.getOrElse("token_url",
      throw new IllegalArgumentException("oauth2 auth needs 'token_url'"))
    RestSource.tokenCache.compute(oauthCacheKey(tokenUrl), (_, cur) =>
      if (cur != null && System.currentTimeMillis() < cur._2) cur
      else fetchOauthToken(tokenUrl))._1
  }

  private def invalidateOauthToken(): Unit =
    authConfig.get("token_url").foreach(u =>
      RestSource.tokenCache.remove(oauthCacheKey(u)))

  private def fetchOauthToken(tokenUrl: String): (String, Long) = {
    val form = (Map("grant_type" -> "client_credentials") ++
      authConfig.get("client_id").map("client_id" -> _) ++
      authConfig.get("client_secret").map("client_secret" -> _) ++
      authConfig.get("scope").map("scope" -> _))
      .map { case (k, v) =>
        URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
    val conn = new URI(tokenUrl).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(form.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val code = conn.getResponseCode
    if (code < 200 || code >= 300) {
      Option(conn.getErrorStream).foreach(_.close())
      val msg = s"HTTP $code from token endpoint $tokenUrl"
      // 5xx from the auth server is as transient as 5xx from the data
      // URL — surface it as IOException so fetch's retry/backoff loop
      // applies; only 4xx (bad credentials/request) fails fast
      if (code >= 500) throw new IOException(msg)
      else throw new RestSource.ClientError(msg, code)
    }
    val body = {
      val in = conn.getInputStream
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    }
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val token = Option(node.get("access_token")).map(_.asText()).getOrElse(
      throw new IOException(s"token endpoint $tokenUrl returned no access_token"))
    val expiresIn = Option(node.get("expires_in")).map(_.asLong()).getOrElse(3600L)
    val margin = authConfig.get("refresh_margin_sec").map(_.toLong)
      .getOrElse(math.min(30L, expiresIn / 10))
    (token, System.currentTimeMillis() +
      math.max(0L, expiresIn - margin) * 1000L)
  }

  /** Pagination query params for 1-based page `n` — ref api_connector.py:164. */
  def paginationParams(n: Int): Map[String, String] = pagination match {
    case "page"   => Map(pageParam -> n.toString, sizeParam -> pageSize.toString)
    case "offset" => Map(pageParam -> ((n - 1) * pageSize).toString, sizeParam -> pageSize.toString)
    case _        => Map.empty
  }

  def pageUrl(n: Int): String = urlWith(paginationParams(n))

  /** Endpoint URL with `params` plus the given extra query params. */
  def urlWith(extra: Map[String, String]): String = {
    val qs = (params ++ extra).map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val sep = if (qs.isEmpty) "" else if (endpoint.contains("?")) "&" else "?"
    s"${baseUrl.stripSuffix("/")}/${endpoint.stripPrefix("/")}$sep$qs"
  }

  /** One GET with retry + exponential backoff — ref
    * api_connector.py:137-162 (`backoff_factor ** attempt`). Retries
    * IOExceptions and 5xx; 4xx fails fast (client errors don't heal).
    * Error bodies are drained (truncated into the exception message) so
    * the API's diagnostic isn't lost and the keep-alive connection can
    * be reused across retries. Runs executor-side.
    */
  def fetch(url: String): String = request(url, None, "GET")

  /** POST with a JSON body through the same retry/auth machinery. */
  def fetchPost(url: String, body: String): String = request(url, Some(body), "POST")

  /** Lightweight connectivity pre-flight — ref base_connector.py:137
    * test_connection / connector_factory.py:196: one first-page GET
    * through the same auth/retry machinery; true on success, false on
    * any failure, NEVER throws. The cheap "will the real read work"
    * answer a config-driven pipeline wants before scheduling the fan-out.
    */
  def validate(): Boolean =
    try { fetch(pageUrl(1)); true }
    catch { case scala.util.control.NonFatal(_) => false }

  private def request(url: String, reqBody: Option[String],
                      method: String): String = {
    var attempt = 0
    var last: Throwable = null
    var retriedAuth = false
    while (attempt <= maxRetries) {
      // exponential, capped: the shift is bounded (no Long wrap for
      // large maxRetries) and one sleep never exceeds 30 s
      if (attempt > 0)
        Thread.sleep(math.min(30000L, backoffMs.toLong << math.min(attempt - 1, 20)))
      try {
        val (code, okBody, errBody) = doHttp(url, method, reqBody)
        if (code >= 200 && code < 300) return okBody
        else {
          val msg = s"HTTP $code from $url" + (if (errBody.isEmpty) "" else s": $errBody")
          if (code >= 500) last = new IOException(msg) // transient server side: retry
          else if (code == 401 && authType == "oauth2" && !retriedAuth) {
            // reactive refresh: the server rejected a token we still
            // considered live (revocation, clock skew) — drop it and
            // retry ONCE with a fresh one; a second 401 is a real
            // credential problem and fails fast below
            invalidateOauthToken()
            retriedAuth = true
            last = new IOException(msg)
          }
          else // 4xx: the request itself is wrong, retrying can't heal it
            throw new RestSource.ClientError(msg, code)
        }
      } catch {
        case e: RestSource.ClientError => throw e
        case e: IOException            => last = e
      }
      attempt += 1
    }
    throw new IOException(s"giving up on $url after ${maxRetries + 1} attempts", last)
  }

  /** ONE HTTP attempt → (status, 2xx body or null, truncated error
    * body). PATCH rides the JDK HttpClient ([[RestSource.clientFor]],
    * one per distinct connect timeout so `timeoutMs` governs
    * connection establishment on this path too) because
    * HttpURLConnection refuses the verb; every other method keeps the
    * keep-alive HttpURLConnection path. On BOTH paths the JSON
    * Content-Type is a default the caller's `headers` may REPLACE
    * (set-then-override ordering; `header` would append a duplicate).
    */
  private def doHttp(url: String, method: String,
                     reqBody: Option[String]): (Int, String, String) =
    if (method == "PATCH") {
      val builder = java.net.http.HttpRequest.newBuilder(new URI(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .method("PATCH", java.net.http.HttpRequest.BodyPublishers
          .ofString(reqBody.getOrElse(""), StandardCharsets.UTF_8))
        .setHeader("Content-Type", "application/json")
      (headers ++ authHeaders).foreach { case (k, v) => builder.setHeader(k, v) }
      val resp = RestSource.clientFor(timeoutMs).send(builder.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      if (code >= 200 && code < 300) (code, resp.body(), "")
      else (code, null, Option(resp.body()).getOrElse("").take(500))
    } else {
      val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      reqBody.foreach(_ =>
        conn.setRequestProperty("Content-Type", "application/json"))
      (headers ++ authHeaders).foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (method != "GET") conn.setRequestMethod(method)
      reqBody.foreach { b =>
        conn.setDoOutput(true)
        val os = conn.getOutputStream
        try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
      }
      val code = conn.getResponseCode
      if (code >= 200 && code < 300) {
        val in = conn.getInputStream
        // fully-read + closed streams go back to the keep-alive pool
        try (code, new String(in.readAllBytes(), StandardCharsets.UTF_8), "")
        finally in.close()
      } else {
        val body = Option(conn.getErrorStream).fold("") { s =>
          try new String(s.readAllBytes().take(500), StandardCharsets.UTF_8)
          finally s.close()
        }
        (code, null, body)
      }
    }

  /** Distributed read of pages 1..numPages: URLs are spread across
    * tasks, each fetch's JSON payload is cut to the record array
    * (`dataField`) and parsed against the DECLARED `schema`. A page
    * whose payload lacks the record array (misconfigured `dataField`,
    * an HTTP-200 error envelope, malformed JSON) FAILS the read rather
    * than silently contributing zero rows — an HTTP-level error
    * retries/fails loudly, so a payload-level one must too.
    */
  def read(spark: SparkSession, schema: StructType, numPages: Int): DataFrame = {
    require(numPages >= 1, "numPages >= 1")
    val self = this
    val parallelism = math.min(numPages, spark.sparkContext.defaultParallelism)
    val bodies = spark.createDataset((1 to numPages).map(pageUrl))(Encoders.STRING)
      .repartition(parallelism)
      .map(url => self.fetch(url))(Encoders.STRING)
      .toDF("__body")
    parseBodies(bodies, schema)
  }

  /** Cursor-paginated read — ref api_connector.py's cursor mode. A
    * cursor chain is sequential BY CONSTRUCTION (page n+1's address
    * only exists inside page n's response), so the driver walks the
    * chain fetching raw bodies — records are never accumulated
    * driver-side, and the JSON parse + explode still distribute. The
    * walk stops when the response's `cursorField` is null/absent/empty
    * or after `maxPages` (unbounded feeds belong in object storage,
    * not a query plan).
    */
  def readCursor(spark: SparkSession, schema: StructType, maxPages: Int,
                 cursorField: String = "next_cursor",
                 cursorParam: String = "cursor"): DataFrame = {
    require(maxPages >= 1, "maxPages >= 1")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    var cursor = Option.empty[String]
    var done = false
    while (!done && bodies.length < maxPages) {
      val extra = Map(sizeParam -> pageSize.toString) ++ cursor.map(cursorParam -> _)
      val body = fetch(urlWith(extra))
      bodies += body
      cursor =
        try {
          val node = mapper.readTree(body).get(cursorField)
          Option(node).filter(n => !n.isNull && n.asText.nonEmpty).map(_.asText)
        } catch { case _: IOException => None }
      done = cursor.isEmpty
    }
    val parallelism = math.min(bodies.length, spark.sparkContext.defaultParallelism)
    parseBodies(
      spark.createDataset(bodies.toSeq)(Encoders.STRING)
        .repartition(parallelism).toDF("__body"),
      schema)
  }

  /** Cut each raw page body to the record array and parse it against
    * the declared schema. A page whose payload lacks the record array
    * (misconfigured `dataField`, an HTTP-200 error envelope, malformed
    * JSON) FAILS the read rather than silently contributing zero rows
    * — an HTTP-level error retries/fails loudly, so a payload-level
    * one must too.
    */
  /** GraphQL query — ref api_connector.py:287 graphql_query: POST
    * `{"query":…, "variables":…}` to the graphql endpoint (one
    * request; GraphQL pagination is API-specific cursors, out of a
    * generic connector's scope — as in the reference). The record
    * array is expected at `data.<rootField>` and parses distributed
    * against the declared schema like every other read; an
    * errors-only response (data null) fails loudly through the same
    * no-parsable-array check.
    */
  def readGraphql(spark: SparkSession, schema: StructType, query: String,
                  rootField: String,
                  variables: Map[String, String] = Map.empty,
                  graphqlEndpoint: String = "graphql"): DataFrame = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val payload = mapper.createObjectNode()
    payload.put("query", query)
    if (variables.nonEmpty) {
      val vs = payload.putObject("variables")
      variables.foreach { case (k, v) => vs.put(k, v) }
    }
    val body = mapper.writeValueAsString(payload)
    val url = s"${baseUrl.stripSuffix("/")}/${graphqlEndpoint.stripPrefix("/")}"
    val self = this
    val bodies = spark.createDataset(Seq(url))(Encoders.STRING)
      .map(u => self.fetchPost(u, body))(Encoders.STRING)
      .toDF("__body")
    copy(dataField = s"data.$rootField").parseBodies(bodies, schema)
  }

  /** REST write-back sink — ref api_connector.py:212 `write(endpoint,
    * data, method)`: each record goes out as a JSON object via
    * POST/PUT/PATCH, 2xx counts as written, anything else counts as
    * failed, and the call returns `{written, failed}` statistics
    * instead of throwing (the reference's contract: partial delivery
    * is reported, not raised — the stats ARE the loud signal).
    *
    * Scale design: the reference iterates records on one machine;
    * here each PARTITION ships its rows from its own executor through
    * the same per-request retry/backoff/auth machinery as the read
    * path — a transient 5xx or token expiry retries transparently,
    * a 4xx (the record itself is rejected) fails that request fast
    * and is counted, never retried. Rows serialize executor-side with
    * codegen'd `to_json`; nothing funnels through the driver except
    * the two final counters. OAuth2 tokens cache per executor JVM
    * ([[RestSource.tokenCache]]), so a thousand-task write still
    * fetches one token per executor, not per record.
    *
    * `batchSize > 1` sends a JSON ARRAY of up to that many records
    * per request (bounded per-partition batching — the knob that
    * keeps request count sane at scale, for APIs with a bulk
    * endpoint). A failed batch counts ALL its records as failed (the
    * server rejected the delivery unit; per-record blame inside a
    * bulk body is API-specific and out of a generic connector's
    * scope).
    */
  def write(df: DataFrame, method: String = "POST",
            batchSize: Int = 1): RestSource.WriteStats = {
    val m = method.toUpperCase(java.util.Locale.ROOT)
    require(Seq("POST", "PUT", "PATCH").contains(m),
      s"write method must be POST, PUT or PATCH (got '$method')")
    require(batchSize >= 1, "batchSize >= 1")
    val self = this
    val url = urlWith(Map.empty)
    val single = batchSize == 1
    val counts = df
      .select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("__rec"))
      .as(Encoders.STRING)
      .mapPartitions { it =>
        var written = 0L
        var failed = 0L
        it.grouped(batchSize).foreach { group =>
          val body = if (single) group.head else group.mkString("[", ",", "]")
          try {
            self.request(url, Some(body), m)
            written += group.size
          } catch {
            // retries are already spent inside request(); what reaches
            // here is a terminal failure for this delivery unit
            case scala.util.control.NonFatal(_) => failed += group.size
          }
        }
        Iterator.single((written, failed))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("__w", "__f")
      .agg(coalesce(sum("__w"), lit(0L)), coalesce(sum("__f"), lit(0L)))
      .head()
    RestSource.WriteStats(counts.getLong(0), counts.getLong(1))
  }

  private def parseBodies(bodies: DataFrame, schema: StructType): DataFrame = {
    val arrJson =
      if (dataField.isEmpty) col("__body")
      else get_json_object(col("__body"), s"$$.$dataField")
    bodies
      .withColumn("__arr", from_json(arrJson, ArrayType(schema)))
      .withColumn("__arr",
        when(col("__arr").isNull, raise_error(concat(
          lit(s"RestSource: page payload has no parsable '$dataField' record array: "),
          substring(col("__body"), 1, 200)))).otherwise(col("__arr")))
      .select(explode(col("__arr")).as("__rec"))
      .select(col("__rec.*"))
  }
}

object RestSource {
  /** Non-retryable 4xx response. */
  final class ClientError(msg: String, val code: Int = 0) extends IOException(msg)

  /** [[RestSource.write]] outcome — ref api_connector.py:259
    * `{"written": …, "failed": …}`.
    */
  final case class WriteStats(written: Long, failed: Long)

  /** Per-JVM HttpClients for the verbs HttpURLConnection refuses
    * (PATCH), ONE PER DISTINCT CONNECT TIMEOUT so a source's
    * `timeoutMs` governs connection establishment as well as the
    * per-request timeout (the builder pins connectTimeout at
    * construction). Connection pooling is internal to each client;
    * distinct timeout values are config-bounded, so the map is tiny.
    */
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[Int, java.net.http.HttpClient]()

  private[sources] def clientFor(timeoutMs: Int): java.net.http.HttpClient =
    clients.computeIfAbsent(timeoutMs, t =>
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(t.toLong))
        .build())

  /** Per-JVM OAuth2 token cache: (token_url, client_id, client_secret,
    * scope) → (access_token, refreshAfterEpochMs). The key is the FULL
    * credential identity; `compute`'s per-key lock single-flights
    * concurrent refreshes within the JVM.
    */
  private val tokenCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, String), (String, Long)]()

  /** Test/lifecycle hook: forget every cached token. */
  private[graft] def clearTokenCache(): Unit = tokenCache.clear()
}

/** NoSQL source config — ref nosql_connector.py:17-240 (MongoDB /
  * Cassandra / DynamoDB client code). The respective Spark connectors
  * own distribution and filter pushdown; their driver jars are not
  * bundled here, so for those kinds this builds the reader
  * configuration the same way [[JdbcSource]] does for relational —
  * `.load()` is the caller's step in an environment with the connector
  * on the classpath. Kind `memory` routes through the bundled
  * [[KvSource]] DSv2 provider (an in-JVM document store), which proves
  * the whole config → scan → pushdown → partitioned-read contract
  * live, without external jars — the same role embedded Derby plays
  * for the JDBC family.
  */
final case class NoSqlSource(kind: String, // mongodb | cassandra | dynamodb | memory
                             uri: String = "",
                             database: String = "",
                             collection: String = "",
                             region: String = "") {
  def format: String = kind.toLowerCase match {
    case "mongodb"   => "mongodb"
    case "cassandra" => "org.apache.spark.sql.cassandra"
    case "dynamodb"  => "dynamodb"
    case "memory"    => classOf[KvSource].getName
    case other       => throw new IllegalArgumentException(s"unsupported NoSQL kind: $other")
  }

  def options: Map[String, String] = kind.toLowerCase match {
    case "mongodb" => Map(
      "connection.uri" -> uri,
      "database" -> database,
      "collection" -> collection)
    case "cassandra" => Map(
      "keyspace" -> database,
      "table" -> collection)
    case "dynamodb" => Map(
      "tableName" -> collection,
      "region" -> region)
    case "memory" => Map(
      "database" -> database,
      "collection" -> collection)
    case other => throw new IllegalArgumentException(s"unsupported NoSQL kind: $other")
  }

  def reader(spark: SparkSession): org.apache.spark.sql.DataFrameReader =
    spark.read.format(format).options(options)

  /** Connectivity pre-flight (ref base_connector.py:137
    * test_connection): a limit-1 probe through the real connector;
    * false on ANY failure — including a missing connector jar, which
    * is exactly what a deploy-time pre-flight should catch — never
    * throws.
    */
  def validate(spark: SparkSession): Boolean =
    try { reader(spark).load().limit(1).collect(); true }
    catch { case scala.util.control.NonFatal(_) => false }
}

/** NoSQL sink — ref nosql_connector.py:141 `write(data, collection,
  * mode)`. The reference's three modes map per store kind:
  *  - append: plain insert (`insert_many` / batched puts)
  *  - overwrite: drop + reload (`db[collection].drop()` then insert) —
  *    DSv2 truncate for `memory`, the connector's own
  *    overwrite handling otherwise
  *  - upsert: key-addressed replace. DynamoDB `put_item` and
  *    Cassandra primary-key INSERT are upserts already (plain append
  *    carries the semantics); MongoDB needs the connector told
  *    (`operationType=update` + `idFieldList`); `memory` passes
  *    `upsertKeys` to [[KvSource]]'s commit.
  * Mirrors [[JdbcSink]]: the config builder owns the dialect table,
  * the write itself is Spark's partition-parallel writer — rows
  * stream from executors, nothing funnels through the driver (except
  * in the in-JVM `memory` store, whose commit IS driver-side state).
  */
object NoSqlSink {
  def write(df: DataFrame, source: NoSqlSource, mode: String = "append",
            upsertKeys: Seq[String] = Nil): Unit = {
    val m = mode.toLowerCase
    require(Seq("append", "overwrite", "upsert").contains(m),
      s"unknown nosql write mode '$mode' (append|overwrite|upsert)")
    require(m != "upsert" || upsertKeys.nonEmpty ||
      Seq("cassandra", "dynamodb").contains(source.kind.toLowerCase),
      "upsert needs upsertKeys (cassandra/dynamodb upsert by primary key)")
    val upsertOpts: Map[String, String] =
      if (m != "upsert") Map.empty
      else source.kind.toLowerCase match {
        case "mongodb" => Map("operationType" -> "update",
          "idFieldList" -> upsertKeys.mkString(","))
        case "memory" => Map("upsertKeys" -> upsertKeys.mkString(","))
        case _ => Map.empty // cassandra/dynamodb: append IS upsert
      }
    df.write.format(source.format)
      .options(source.options ++ upsertOpts)
      .mode(if (m == "overwrite") "overwrite" else "append")
      .save()
  }
}
