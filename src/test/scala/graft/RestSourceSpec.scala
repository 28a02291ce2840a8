package graft

import java.io.IOException
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._
import graft.sources.{NoSqlSource, RestSource}

/** RestSource against a real (in-JVM, loopback) HTTP server: the fetch
  * path, auth headers, pagination fan-out through Spark, retry on 5xx
  * and fail-fast on 4xx are all exercised for real — no driver stubs.
  */
class RestSourceSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val failuresLeft = new AtomicInteger(0)
  @volatile private var lastAuthHeader: Option[String] = None

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // /items?page=N&per_page=K → {"data": [K records of page N]}, 3 pages
    server.createContext("/api/items", (ex: HttpExchange) => {
      lastAuthHeader = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
      val page = params.getOrElse("page", "1").toInt
      val size = params.getOrElse("per_page", "2").toInt
      val recs = (1 to size).map { i =>
        val id = (page - 1) * size + i
        s"""{"id": $id, "name": "item$id", "price": ${id * 1.5}}"""
      }
      respond(ex, 200, s"""{"data": [${recs.mkString(",")}], "page": $page}""")
    })
    // first `failuresLeft` hits 500, then 200 with a root-array payload
    server.createContext("/api/flaky", (ex: HttpExchange) => {
      if (failuresLeft.getAndDecrement() > 0) respond(ex, 500, "boom")
      else respond(ex, 200, """[{"id": 7, "name": "ok", "price": 1.0}]""")
    })
    server.createContext("/api/secret", (ex: HttpExchange) => respond(ex, 404, "no"))
    // cursor chain: c0 -> c1 -> c2 (last page has next_cursor null);
    // 2 records per page, ids keyed off the cursor ordinal
    server.createContext("/api/cursor", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
      val ord = params.get("cursor").map(_.stripPrefix("c").toInt + 1).getOrElse(0)
      val recs = (1 to 2).map { i =>
        val id = ord * 2 + i
        s"""{"id": $id, "name": "item$id", "price": ${id * 1.5}}"""
      }
      val next = if (ord >= 2) "null" else s""""c$ord""""
      respond(ex, 200, s"""{"data": [${recs.mkString(",")}], "next_cursor": $next}""")
    })
    // OAuth2 client-credentials token endpoint: validates the form
    // grant, issues tok<N> with the currently configured expires_in
    server.createContext("/oauth/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (tokenFailuresLeft.getAndDecrement() > 0)
        respond(ex, 503, "auth server hiccup")
      else if (ex.getRequestMethod != "POST" ||
          !form.contains("grant_type=client_credentials") ||
          !form.contains("client_id=cid") || !form.contains("client_secret=sec"))
        respond(ex, 401, """{"error": "invalid_client"}""")
      else {
        val tok = s"tok${tokensIssued.incrementAndGet()}"
        currentToken = tok
        respond(ex, 200,
          s"""{"access_token": "$tok", "token_type": "Bearer", "expires_in": $tokenTtlSec}""")
      }
    })
    // OAuth-protected resource: only the NEWEST issued token is valid
    // (an expired/rotated-away token gets 401, like a real authz layer)
    server.createContext("/api/oitems", (ex: HttpExchange) => {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $currentToken")) respond(ex, 401, "expired")
      else {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        val page = params.getOrElse("page", "1").toInt
        val size = params.getOrElse("per_page", "2").toInt
        val recs = (1 to size).map { i =>
          val id = (page - 1) * size + i
          s"""{"id": $id, "name": "item$id", "price": ${id * 1.5}}"""
        }
        respond(ex, 200, s"""{"data": [${recs.mkString(",")}], "page": $page}""")
      }
    })
    // GraphQL endpoint: POST-only, echoes records under data.<root>
    // when the query names `users`; unknown roots get an errors-only
    // response with data null (the GraphQL error envelope)
    server.createContext("/api/graphql", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastGraphqlBody = Some(body)
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, "graphql is POST-only")
      else if (body.contains("users")) {
        val n = if (body.contains("\"limit\":\"3\"")) 3 else 2
        val recs = (1 to n).map(i => s"""{"id": $i, "name": "user$i", "price": $i.5}""")
        respond(ex, 200, s"""{"data": {"users": [${recs.mkString(",")}]}}""")
      } else
        respond(ex, 200, """{"data": null, "errors": [{"message": "unknown root"}]}""")
    })
    // write-back ingestion: records a (method, body) pair per request;
    // bodies containing "poison" get 400 (a bad record can't heal);
    // ingestFailuresLeft 503s first (transient, retryable)
    server.createContext("/api/ingest", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastAuthHeader = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (ingestFailuresLeft.getAndDecrement() > 0) respond(ex, 503, "busy")
      else if (body.contains("poison")) respond(ex, 400, "bad record")
      else {
        ingested.add((ex.getRequestMethod, body))
        respond(ex, 201, """{"ok": true}""")
      }
    })
    // OAuth-protected ingestion, same token discipline as /api/oitems
    server.createContext("/api/oingest", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $currentToken")) respond(ex, 401, "expired")
      else { ingested.add((ex.getRequestMethod, body)); respond(ex, 200, "{}") }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private val ingested =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private val ingestFailuresLeft = new AtomicInteger(0)

  @volatile private var lastGraphqlBody: Option[String] = None

  private val tokensIssued = new AtomicInteger(0)
  private val tokenFailuresLeft = new AtomicInteger(0)
  @volatile private var currentToken: String = ""
  @volatile private var tokenTtlSec: Int = 3600

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType)))

  test("paginated read fans pages across Spark and parses the declared schema") {
    val src = RestSource(base, "/api/items", pagination = "page",
      pageSize = 2, dataField = "data",
      authType = "bearer", authConfig = Map("token" -> "t0ken"))
    val df = src.read(spark, schema, numPages = 3)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    assert(rows.head.getString(1) == "item1" && rows.head.getDouble(2) == 1.5)
    assert(lastAuthHeader.contains("Bearer t0ken")) // auth reached the wire
  }

  test("cursor pagination walks the chain to its end and stops") {
    val src = RestSource(base, "/api/cursor", pagination = "none",
      pageSize = 2, dataField = "data")
    val rows = src.readCursor(spark, schema, maxPages = 10).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L)) // 3 pages, then null cursor
    // maxPages caps an unbounded-looking walk
    val capped = src.readCursor(spark, schema, maxPages = 2)
    assert(capped.count() == 4)
  }

  test("offset pagination computes offsets, page mode computes page numbers") {
    val page = RestSource(base, "items", pagination = "page",
      pageParam = "p", sizeParam = "n", pageSize = 25)
    assert(page.paginationParams(3) == Map("p" -> "3", "n" -> "25"))
    val off = RestSource(base, "items", pagination = "offset",
      pageParam = "offset", sizeParam = "limit", pageSize = 25)
    assert(off.paginationParams(3) == Map("offset" -> "50", "limit" -> "25"))
    assert(RestSource(base, "items", pagination = "none").paginationParams(3).isEmpty)
  }

  test("5xx retries until success; 4xx fails fast") {
    failuresLeft.set(2)
    val src = RestSource(base, "/api/flaky", pagination = "none",
      dataField = "", maxRetries = 3, backoffMs = 10)
    val df = src.read(spark, schema, numPages = 1)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L)) // 2 failures absorbed
    failuresLeft.set(100)
    assertThrows[Exception](src.read(spark, schema, numPages = 1).collect())
    val notFound = RestSource(base, "/api/secret", pagination = "none", maxRetries = 5)
    val t0 = System.nanoTime()
    val e404 = intercept[Exception](notFound.read(spark, schema, numPages = 1).collect())
    // fail-fast: nowhere near 5 backoff cycles
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // the API's error body ("no") is drained into the diagnostic
    assert(messages(e404).exists(m => m.contains("HTTP 404") && m.contains("no")),
      s"got: ${messages(e404)}")
  }

  test("a page without the declared record array fails loudly, never silently drops") {
    // real endpoint, wrong dataField: the 200 payload has "data", not "items"
    val src = RestSource(base, "/api/items", pagination = "page",
      pageSize = 2, dataField = "items")
    val e = intercept[Exception](src.read(spark, schema, numPages = 1).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("RestSource")), s"got: ${messages(e)}")
  }

  test("auth header construction covers basic, api_key and none") {
    val basic = RestSource(base, "x", authType = "basic",
      authConfig = Map("username" -> "u", "password" -> "p"))
    assert(basic.authHeaders("Authorization") ==
      "Basic " + java.util.Base64.getEncoder.encodeToString("u:p".getBytes))
    val key = RestSource(base, "x", authType = "api_key",
      authConfig = Map("header" -> "X-Token", "key" -> "k1"))
    assert(key.authHeaders == Map("X-Token" -> "k1"))
    assert(RestSource(base, "x").authHeaders.isEmpty)
  }

  test("oauth2: one cached token serves a whole paginated read") {
    RestSource.clearTokenCache()
    tokensIssued.set(0); tokenTtlSec = 3600
    val src = RestSource(base, "/api/oitems", pagination = "page",
      pageSize = 2, dataField = "data", authType = "oauth2",
      authConfig = Map("token_url" -> s"$base/oauth/token",
        "client_id" -> "cid", "client_secret" -> "sec"))
    val rows = src.read(spark, schema, numPages = 3).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    // local mode = one JVM: driver and tasks share the cache, so the
    // long-lived token is fetched exactly once for all three pages
    assert(tokensIssued.get() == 1)
  }

  test("oauth2: a token expiring mid-pagination is re-fetched, not failed") {
    RestSource.clearTokenCache()
    tokensIssued.set(0); tokenTtlSec = 1
    // refresh_margin_sec = ttl → effective lifetime 0: every page
    // finds its token past the refresh line and re-fetches first;
    // the server only honors the newest token, so any stale reuse
    // would 401 the read
    val src = RestSource(base, "/api/oitems", pagination = "page",
      pageSize = 2, dataField = "data", authType = "oauth2",
      authConfig = Map("token_url" -> s"$base/oauth/token",
        "client_id" -> "cid", "client_secret" -> "sec",
        "refresh_margin_sec" -> "1"))
    val rows = src.read(spark, schema, numPages = 3).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    assert(tokensIssued.get() >= 3, s"expected a re-fetch per page, got ${tokensIssued.get()}")
  }

  test("oauth2: a 401 on a live token invalidates and retries once") {
    RestSource.clearTokenCache()
    tokensIssued.set(0); tokenTtlSec = 3600
    val src = RestSource(base, "/api/oitems", pagination = "page",
      pageSize = 2, dataField = "data", authType = "oauth2",
      authConfig = Map("token_url" -> s"$base/oauth/token",
        "client_id" -> "cid", "client_secret" -> "sec"))
    assert(src.fetch(src.pageUrl(1)).contains("item1") && tokensIssued.get() == 1)
    // server-side rotation the client can't see: its cached token is
    // still inside expires_in but no longer honored
    currentToken = "rotated-away"
    assert(src.fetch(src.pageUrl(2)).contains("item3"))
    assert(tokensIssued.get() == 2)
    // wrong credentials fail fast at the token endpoint (no retry storm)
    val bad = src.copy(authConfig = src.authConfig + ("client_secret" -> "wrong"))
    RestSource.clearTokenCache()
    assertThrows[RestSource.ClientError](bad.fetch(bad.pageUrl(1)))
    // a TRANSIENT 5xx from the token endpoint retries like any other
    // transient failure instead of failing the task fast
    RestSource.clearTokenCache()
    tokenFailuresLeft.set(1)
    assert(src.copy(backoffMs = 1).fetch(src.pageUrl(1)).contains("item1"))
    assert(tokenFailuresLeft.get() <= 0)
  }

  test("graphql: POST payload with variables, records parsed from data.<root>") {
    val src = RestSource(base, "/api/graphql")
    val df = src.readGraphql(spark, schema,
      query = "query($limit: Int) { users(limit: $limit) { id name price } }",
      rootField = "users", variables = Map("limit" -> "3"),
      graphqlEndpoint = "/api/graphql")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSeq == Seq("user1", "user2", "user3"))
    // the wire payload is the reference's {"query":…, "variables":…}
    val sent = lastGraphqlBody.get
    assert(sent.contains("\"query\"") && sent.contains("\"variables\"") &&
      sent.contains("\"limit\":\"3\""))
    // no variables -> no variables key on the wire (ref :304)
    src.readGraphql(spark, schema,
      query = "{ users { id name price } }", rootField = "users",
      graphqlEndpoint = "/api/graphql").collect()
    assert(!lastGraphqlBody.get.contains("variables"))
    // an errors-only envelope (data null) fails loudly, not 0 rows
    val err = intercept[Exception] { // raise_error surfaces as SparkRuntimeException
      src.readGraphql(spark, schema, query = "{ nope { id } }",
        rootField = "nope", graphqlEndpoint = "/api/graphql").collect()
    }
    assert((err.getMessage + Option(err.getCause).fold("")(_.getMessage))
      .contains("no parsable"))
  }

  test("write: every partition's records POST to the wire, {written, failed} returned") {
    import spark.implicits._
    ingested.clear(); ingestFailuresLeft.set(0)
    val src = RestSource(base, "/api/ingest", pagination = "none",
      authType = "bearer", authConfig = Map("token" -> "wtok"), backoffMs = 5)
    val df = (1 to 10).map(i => (i.toLong, s"rec$i")).toDF("id", "name")
      .repartition(4)
    val stats = src.write(df)
    assert(stats == RestSource.WriteStats(10, 0))
    val got = ingested.toArray(Array.empty[(String, String)])
    assert(got.length == 10)
    assert(got.forall(_._1 == "POST"))
    // each body is ONE JSON object of the row (reference: per-item dicts)
    assert(got.map(_._2).sorted.head.startsWith("{\"id\":"))
    assert(got.exists(_._2 == """{"id":7,"name":"rec7"}"""))
    assert(lastAuthHeader.contains("Bearer wtok")) // auth reached the wire

    // PUT and PATCH reach the wire as their own verbs (PATCH rides the
    // JDK HttpClient — HttpURLConnection refuses the verb)
    ingested.clear()
    assert(src.write(Seq((20L, "u")).toDF("id", "name"), method = "PUT") ==
      RestSource.WriteStats(1, 0))
    assert(src.write(Seq((21L, "p")).toDF("id", "name"), method = "PATCH") ==
      RestSource.WriteStats(1, 0))
    assert(ingested.toArray(Array.empty[(String, String)]).map(_._1).sorted.toSeq ==
      Seq("PATCH", "PUT"))
    // unknown verbs are a config error, not a wire surprise
    assertThrows[IllegalArgumentException](
      src.write(df, method = "DELETE"))
  }

  test("write: rejected records count as failed, not thrown; 5xx retries then succeeds") {
    import spark.implicits._
    ingested.clear(); ingestFailuresLeft.set(0)
    val src = RestSource(base, "/api/ingest", pagination = "none",
      maxRetries = 3, backoffMs = 5)
    // 3 poison records 400 per-record (fail-fast, no retry storm); the
    // other 7 land — the reference's written/failed split
    val df = (1 to 10).map(i =>
      (i.toLong, if (i % 3 == 0) "poison" else s"ok$i")).toDF("id", "name")
      .repartition(3)
    assert(src.write(df) == RestSource.WriteStats(7, 3))
    assert(ingested.size == 7)

    // transient 5xx: the retry/backoff loop absorbs it, nothing fails
    ingested.clear(); ingestFailuresLeft.set(2)
    assert(src.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)) ==
      RestSource.WriteStats(2, 0))
    // retries exhausted → those records count failed, the rest written
    ingested.clear(); ingestFailuresLeft.set(100)
    val after = src.copy(maxRetries = 1).write(
      Seq((1L, "a")).toDF("id", "name").coalesce(1))
    assert(after == RestSource.WriteStats(0, 1))

    // an empty frame writes nothing and reports zeros
    ingestFailuresLeft.set(0)
    assert(src.write(spark.emptyDataset[(Long, String)].toDF("id", "name")) ==
      RestSource.WriteStats(0, 0))
  }

  test("write: batchSize bundles records into JSON-array requests") {
    import spark.implicits._
    ingested.clear(); ingestFailuresLeft.set(0)
    val src = RestSource(base, "/api/ingest", pagination = "none", backoffMs = 5)
    val df = (1 to 9).map(i => (i.toLong, s"r$i")).toDF("id", "name").coalesce(1)
    assert(src.write(df, batchSize = 4) == RestSource.WriteStats(9, 0))
    val bodies = ingested.toArray(Array.empty[(String, String)]).map(_._2)
    assert(bodies.length == 3) // 4 + 4 + 1
    assert(bodies.forall(b => b.startsWith("[") && b.endsWith("]")))
    assert(bodies.map(b => b.count(_ == '{')).sorted.toSeq == Seq(1, 4, 4))
  }

  test("write: one oauth2 token serves every partition of the write") {
    import spark.implicits._
    RestSource.clearTokenCache()
    ingested.clear(); tokensIssued.set(0); tokenTtlSec = 3600
    val src = RestSource(base, "/api/oingest", pagination = "none",
      authType = "oauth2", backoffMs = 5,
      authConfig = Map("token_url" -> s"$base/oauth/token",
        "client_id" -> "cid", "client_secret" -> "sec"))
    val df = (1 to 12).map(i => (i.toLong, s"o$i")).toDF("id", "name")
      .repartition(6)
    assert(src.write(df) == RestSource.WriteStats(12, 0))
    // local mode = one JVM: all six partitions share the cached token
    assert(tokensIssued.get() == 1)
    assert(ingested.size == 12)
  }

  test("NoSqlSource builds the documented connector configuration") {
    val mongo = NoSqlSource("mongodb", uri = "mongodb://h:27017",
      database = "db", collection = "events")
    assert(mongo.format == "mongodb")
    assert(mongo.options == Map(
      "connection.uri" -> "mongodb://h:27017",
      "database" -> "db", "collection" -> "events"))
    val cass = NoSqlSource("cassandra", database = "ks", collection = "tbl")
    assert(cass.format == "org.apache.spark.sql.cassandra")
    assert(cass.options == Map("keyspace" -> "ks", "table" -> "tbl"))
    assertThrows[IllegalArgumentException](NoSqlSource("couch").format)
    // reader() composes without a live cluster (.load() is the caller's step)
    assert(mongo.reader(spark) != null)
  }

  test("validate: connectivity pre-flight is true live, false on dead targets, never throws") {
    // REST: live endpoint true; 404 endpoint and dead port false
    assert(RestSource(base, "/api/items").validate())
    assert(!RestSource(base, "/api/secret", maxRetries = 0).validate())
    assert(!RestSource("http://127.0.0.1:1", "/nope", maxRetries = 0,
      timeoutMs = 500).validate())
    // NoSQL memory store: present collection true; absent false;
    // unknown connector class false (missing-driver pre-flight)
    import spark.implicits._
    graft.sources.KvStore.put("vdb", "vcol",
      Seq((1L, "a")).toDF("id", "name"))
    try {
      assert(NoSqlSource("memory", database = "vdb", collection = "vcol")
        .validate(spark))
      assert(!NoSqlSource("memory", database = "vdb", collection = "absent")
        .validate(spark))
      assert(!NoSqlSource("mongodb", uri = "mongodb://127.0.0.1:1",
        database = "x", collection = "y").validate(spark))
    } finally graft.sources.KvStore.drop("vdb", "vcol")
  }

  test("NoSqlSource memory kind round-trips through the DSv2 KvSource live") {
    import spark.implicits._
    import graft.sources.KvStore
    val df = (1 to 40).map(i =>
      (i.toLong, s"doc_$i", i * 1.5, if (i % 5 == 0) null else s"tag${i % 3}"))
      .toDF("id", "name", "score", "tag")
    KvStore.put("db1", "docs", df)
    try {
      val src = NoSqlSource("memory", database = "db1", collection = "docs")
      // full read: schema inferred from the store, all rows, 4 shards
      val all = src.reader(spark).load()
      assert(all.schema.fieldNames.toSeq == Seq("id", "name", "score", "tag"))
      assert(all.count() == 40)
      assert(all.rdd.getNumPartitions == 4)

      // filter pushdown: supported predicates reach the store scan and
      // cut the rows crossing the source boundary
      KvStore.emitted.set(0)
      val picked = src.reader(spark).load()
        .filter($"id" > 30L && $"tag".isNotNull)
        .select("id", "score")
      // sort driver-side: an orderBy adds a range-partitioning sampling
      // job that scans the source a second time and doubles `emitted`
      val got = picked.as[(Long, Double)].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq == (31 to 40).filter(_ % 5 != 0).map(_.toLong))
      assert(got.forall { case (id, s) => s == id * 1.5 })
      assert(KvStore.lastPushed.map(_.getClass.getSimpleName).toSet
        .contains("GreaterThan"))
      assert(KvStore.emitted.get() == 8,
        s"pushdown should emit 8 rows from the store, saw ${KvStore.emitted.get()}")
      // column pruning reached the scan: projected+filter columns only,
      // never the untouched 'name'
      assert(KvStore.lastRequired.contains("id") &&
        !KvStore.lastRequired.contains("name"),
        s"pruned to ${KvStore.lastRequired}")

      // unsupported predicates stay with Spark as residual, results stay right
      val like = src.reader(spark).load().filter($"name".endsWith("_7"))
      assert(like.select("id").as[Long].collect().toSeq == Seq(7L))
    } finally KvStore.drop("db1", "docs")
  }

  test("NoSqlSink writes through the DSv2 KvSource: append, overwrite, upsert") {
    import spark.implicits._
    import graft.sources.{KvStore, NoSqlSink}
    val src = NoSqlSource("memory", database = "db2", collection = "out")
    def readBack() = src.reader(spark).load()
    try {
      // append to a fresh collection creates it (config → write →
      // read-back round-trip, the JdbcSink parity the connector lacked)
      val a = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
      NoSqlSink.write(a, src, mode = "append")
      assert(readBack().orderBy("id").as[(Long, String, Double)].collect().toSeq ==
        Seq((1L, "a", 10.0), (2L, "b", 20.0)))

      // append to an existing collection unions; schema drift fails
      // loudly — both a missing column AND a same-name type change
      NoSqlSink.write(Seq((3L, "c", 30.0)).toDF("id", "name", "v"), src)
      assert(readBack().count() == 3)
      val drifted = Seq((4L, "d")).toDF("id", "name")
      intercept[Exception](NoSqlSink.write(drifted, src))
      val retyped = Seq((4, "d", 40.0)).toDF("id", "name", "v") // id int, not long
      intercept[Exception](NoSqlSink.write(retyped, src))

      // upsert replaces by key, keeps the rest (put_item semantics)
      val up = Seq((2L, "B2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "v")
      NoSqlSink.write(up, src, mode = "upsert", upsertKeys = Seq("id"))
      assert(readBack().orderBy("id").as[(Long, String, Double)].collect().toSeq ==
        Seq((1L, "a", 10.0), (2L, "B2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
      // upsert without keys only legal for the inherently-keyed kinds
      intercept[IllegalArgumentException](NoSqlSink.write(up, src, mode = "upsert"))
      // a batch with duplicate key tuples has no defined winner under a
      // distributed write — rejected, not silently double-stored
      val dupKeys = Seq((5L, "x", 1.0), (5L, "y", 2.0)).toDF("id", "name", "v")
      intercept[Exception](
        NoSqlSink.write(dupKeys, src, mode = "upsert", upsertKeys = Seq("id")))

      // overwrite truncates and reloads — reference drop + insert_many
      NoSqlSink.write(Seq((9L, "z", 90.0)).toDF("id", "name", "v"), src,
        mode = "overwrite")
      assert(readBack().as[(Long, String, Double)].collect().toSeq ==
        Seq((9L, "z", 90.0)))

      // a multi-partition write commits every task's rows exactly once
      import org.apache.spark.sql.functions.{concat, lit, sum}
      val wide = spark.range(100).select($"id",
        concat(lit("n"), $"id".cast("string")).as("name"), ($"id" * 1.0).as("v"))
        .repartition(8)
      NoSqlSink.write(wide, src, mode = "overwrite")
      val got = readBack()
      assert(got.count() == 100 && got.rdd.getNumPartitions == 4)
      assert(got.agg(sum("v")).as[Double].head() == (0 until 100).sum.toDouble)

      // mongodb upsert dialect: the connector is told the id fields
      val mongoOpts = NoSqlSource("mongodb", uri = "mongodb://h:1",
        database = "d", collection = "c")
      // (options-only check — no live mongo in a zero-egress build)
      assert(mongoOpts.options("collection") == "c")
    } finally KvStore.drop("db2", "out")
  }
}
