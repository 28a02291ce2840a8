package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness: times every registered query at the configured
  * scale factor. One untimed warmup pass (JVM/codegen warmup would
  * otherwise land on whichever query runs first), then TWO timed
  * passes in sorted name order with every cached frame / checkpoint /
  * broadcast released before each measurement; the published figure is
  * the per-query min over SUCCESSFUL passes (so `total` is a
  * sum-of-mins, not the wall time of either pass). Failures are
  * recorded per-query in `errors` instead of being silently timed as
  * fast successes, and a failed pass never contributes its (fast)
  * abort duration to a query that succeeded in the other pass. The
  * full per-query JSON line is written to bench_out.json (committed);
  * stdout gets a compact line sized to the driver's 2000-char output
  * tail (total + errors + slowest queries) so it parses instead of
  * being truncated mid-JSON.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q_a,q_b narrows the run for local perf iteration;
    // the driver never sets it, so official numbers always cover all.
    // Unknown names fail loudly rather than silently timing nothing.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { ns =>
      val unknown = ns -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // Warmup: run the flagship agg once untimed to absorb JVM/codegen init.
    try SparkEntry.queries("q_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Two timed passes, min per query. Per-query isolation (releaseAll
    // before the clock starts) keeps accumulated caches/broadcasts from
    // GC-thrashing later queries (r7: 3.66x apparent regression, gone
    // in isolation); min-of-2 then absorbs the remaining host noise
    // (identical back-to-back suites still varied >2x on single
    // queries — one-shot timings punish whoever runs last).
    // per query: (seconds, succeeded) — a transient failure aborts fast,
    // and that abort duration must not masquerade as the query's time
    def timedPass(): Map[String, (Double, Boolean)] = names.map { name =>
      GraftSession.releaseAll(spark)
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          false
        }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    val results = names.map { n =>
      val good = Seq(p1(n), p2(n)).collect { case (t, true) => t }
      // both passes failed: report the min abort time (errors flags it)
      n -> (if (good.nonEmpty) good.min else math.min(p1(n)._1, p2(n)._1))
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    // a SPARK_GRAFT_ONLY-narrowed run must never clobber the official
    // full-suite artifact the driver (and docs) ingest
    val outFile = if (only.isDefined) "bench_only_out.json" else "bench_out.json"
    Files.writeString(Paths.get(outFile), fullLine)
    // The driver keeps only the tail of this process's output (~2000
    // chars), so once the suite passed ~70 queries the full per-query
    // line no longer fit and its head was truncated mid-JSON (every
    // BENCH_r*.json so far has parsed:null). Print a line that is
    // guaranteed to survive the tail window intact: total + errors +
    // the slowest queries that fit a fixed character budget, plus a
    // pointer to the committed full artifact.
    val budget = 1500
    // errors must obey the same budget: a mass failure would otherwise
    // emit one ~200-char message per query and overflow the tail again,
    // in exactly the runs where the errors matter. Show the first few
    // (truncated) and count the rest; the full map is in the artifact.
    val errShown = errors.take(3)
      .map { case (k, v) => "\"" + k + "\":\"" + esc(v.take(80)) + "\"" }
      .mkString("{", ",", "}")
    val base =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","n_queries":${results.size},""" +
        s""""n_errors":${errors.size},"errors":$errShown,"sf":"$sfDir","full":"$outFile","queries":{}}"""
    val picked = scala.collection.mutable.ListBuffer[String]()
    var used = base.length
    results.sortBy(-_._2).foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + f"$v%.3f"
      if (used + entry.length + 1 <= budget) { picked += entry; used += entry.length + 1 }
    }
    val line = base.replace("\"queries\":{}}", "\"queries\":{" + picked.mkString(",") + "}}")
    println(line)
    spark.stop()
  }
}
