package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the pairwise-similarity pack: times each
  * jaccard strategy so perf work targets the measured hot spot, not a
  * guess. (History: this harness caught both the per-shingle-position
  * re-evaluation of split() inside HOF lambdas and AQE coalescing the
  * pre-join shuffle to one partition.)
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    if (args.lift(1).contains("quantiles")) {
      profileQuantiles(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("textlm")) {
      profileTextLm(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("changepoint")) {
      profileChangepoint(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("ensemble")) {
      profileEnsemble(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("gaps")) {
      profileGaps(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("semantic")) {
      profileSemantic(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("media")) {
      profileMedia(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("ocsvm")) {
      profileOcsvm(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("crawl")) {
      profileCrawl(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("streams")) {
      profileStreams(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("expaudio")) {
      profileExpAudio(spark, sfDir, time); spark.stop(); return
    }
    if (args.lift(1).contains("expstats")) {
      // optimizer size estimates vs the small-persist budget for the
      // frames the r20-opt persistIfSmall boundaries gate on
      def stat(name: String, d: org.apache.spark.sql.DataFrame): Unit =
        println(f"PROFILE stats $name%-28s est=${d.queryExecution.optimizedPlan.stats.sizeInBytes} small=${GraftSession.isSmall(d)}")
      println(s"PROFILE budget=${Runtime.getRuntime.maxMemory() / 1024}")
      val docs = Tables.load(spark, sfDir, "documents")
      val li = Tables.load(spark, sfDir, "lineitem")
      stat("documents-scan", docs)
      stat("lineitem-scan", li)
      stat("lineitem-4col", li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
      stat("minhash-bsig", graft.llm.Dedup.minhashHistorySignatures(docs, "doc_id", "text"))
      stat("gated-docs", docs.filter(length(col("text")) > 10))
      spark.stop(); return
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    import graft.llm.Dedup
    time("jaccard-blocked")(
      Dedup.ngramJaccardPairsBlocked(docs, "doc_id", "text",
        Seq("lang", "source"), 1, 0.8).count())
    time("jaccard-inverted-index")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("lang", "source"), 1, 0.8).count())
    time("jaccard-prefix")(
      Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
        Seq("lang", "source"), 1, 0.8).count())
    time("jaccard-auto")(
      Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text",
        Seq("lang", "source"), 1, 0.8).count())
    time("minhash-lsh")(
      Dedup.minhashLsh(docs, "doc_id", "text",
        ngramN = 5, numHashes = 32, bands = 8, threshold = 0.5).count())
    time("simhash-pairs")(
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6).count())
    spark.stop()
  }

  /** Stage breakdown of q_anom_changepoint_ms: the shared sort, the
    * cumulative decimal columns, and the per-scale lag/lead tail.
    */
  private def profileChangepoint(spark: org.apache.spark.sql.SparkSession,
                                 sfDir: String,
                                 time: String => (=> Long) => Unit): Unit = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, sfDir, "events")
    ev.count() // warm
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wc = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    // sort + one trivial window agg: the shuffle/sort floor
    time("cp-sort+count-window")(
      ev.withColumn("cn", count(col("value")).over(wc))
        .filter(col("cn") > 0).count())
    // + the three cumulative decimal columns
    time("cp-cum-decimal")(
      ev.withColumn("cn", count(col("value")).over(wc))
        .withColumn("cs", sum(col("value").cast(dec)).over(wc))
        .withColumn("cs2", sum((col("value") * col("value")).cast(dec)).over(wc))
        .filter(col("cn") > 0).count())
    // cumulative LONG micro-unit variant (cost ceiling probe only)
    time("cp-cum-long")(
      ev.withColumn("cn", count(col("value")).over(wc))
        .withColumn("cs", sum((col("value").cast(dec) * 1000000)
          .cast("long")).over(wc))
        .withColumn("cs2", sum(((col("value") * col("value")).cast(dec) *
          1000000).cast("long")).over(wc))
        .filter(col("cn") > 0).count())
    time("cp-full-query")(
      graft.quality.Anomaly.changepointsMultiScale(ev, "value",
        Seq("user_id"), Seq(col("ts").asc, col("event_id").asc),
        windows = Seq(10, 20, 40), threshold = 3.0).count())
    time("cp-full-query-2nd")(
      graft.quality.Anomaly.changepointsMultiScale(ev, "value",
        Seq("user_id"), Seq(col("ts").asc, col("event_id").asc),
        windows = Seq(10, 20, 40), threshold = 3.0).count())
  }

  /** Stage breakdown of [[graft.llm.Text.bigramLmScore]] (q_text_lm):
    * tokenize+bigram explode vs count aggregations vs the corpus-sized
    * count joins, plus a native-shingle tokenize variant.
    */
  private def profileTextLm(spark: org.apache.spark.sql.SparkSession,
                            sfDir: String,
                            time: String => (=> Long) => Unit): Unit = {
    val df = Tables.load(spark, sfDir, "documents")
    df.count() // warm
    val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val docs = df.select(col("doc_id"), toks.as("__t"))
    val n1 = greatest(size(col("__t")) - 1, lit(0))
    def bigrams = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("__t"), lit(1), n1),
          slice(col("__t"), lit(2), n1),
          (a, b) => struct(a.as("__w1"), b.as("__w2")))).as("__p"))
      .select(col("doc_id"), col("__p.__w1").as("__w1"), col("__p.__w2").as("__w2"))
    time("lm-bigram-explode-hof")(bigrams.count())
    // native word-shingle expression instead of slice/zip_with lambdas
    def bigramsNative = df.select(col("doc_id"),
        explode(graft.plans.TextExpressions.wordShingles(col("text"), 2)).as("__s"))
    time("lm-bigram-explode-native")(bigramsNative.count())
    time("lm-bigram-counts")(bigrams.groupBy("__w1", "__w2")
      .agg(count(lit(1))).count())
    time("lm-unigram-counts")(docs.select(explode(col("__t")).as("__w1"))
      .groupBy("__w1").agg(count(lit(1))).count())
    time("lm-full-query")(
      graft.llm.Text.bigramLmScore(df, "doc_id", "text").count())
    // forced-broadcast variant of the two count joins (skeleton only —
    // no decimal mean tail; measures the join strategy delta)
    time("lm-joins-broadcast") {
      val bg = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      val ug = docs.select(explode(col("__t")).as("__w1"))
        .groupBy("__w1").agg(count(lit(1)).as("__c1"))
      val vocab = ug.agg(count(lit(1)).as("__v"))
      bigrams.join(broadcast(bg), Seq("__w1", "__w2"))
        .join(broadcast(ug), Seq("__w1"))
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(log((col("__c12") + lit(0.5)) /
            (col("__c1") + lit(0.5) * col("__v")))).as("s"))
        .count()
    }
    time("lm-joins-smj-asis") {
      val bg = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      val ug = docs.select(explode(col("__t")).as("__w1"))
        .groupBy("__w1").agg(count(lit(1)).as("__c1"))
      val vocab = ug.agg(count(lit(1)).as("__v"))
      bigrams.join(bg, Seq("__w1", "__w2"))
        .join(ug, Seq("__w1"))
        .crossJoin(broadcast(vocab))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(log((col("__c12") + lit(0.5)) /
            (col("__c1") + lit(0.5) * col("__v")))).as("s"))
        .count()
    }
  }

  /** Detector-by-detector breakdown of q_anom_ensemble: each of the
    * three member detectors in isolation, then the vote aggregation.
    */
  private def profileEnsemble(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String,
                              time: String => (=> Long) => Unit): Unit = {
    import graft.quality.Anomaly
    val e = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "value")
    e.count() // warm
    time("ens-zscore")(Anomaly.zscore(e, "value", 3.0).count())
    time("ens-iqr")(Anomaly.iqr(e, "value", 1.5).count())
    time("ens-movingavg")(Anomaly.movingAvg(e, "value", Seq("user_id"),
      Seq(col("ts").asc, col("event_id").asc), 7, 2.0).count())
    // cost-ceiling probe: same sliding frame with LONG micro-unit sums
    // instead of decimal — measures what an overflow-guarded long path
    // could save before touching the operator
    time("ens-movingavg-long-probe") {
      import org.apache.spark.sql.expressions.Window
      val dec = org.apache.spark.sql.types.DecimalType(28, 6)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-6, Window.currentRow)
      val x = col("value")
      val n = count(x).over(w).cast("double")
      val s = (sum((x.cast(dec) * 1000000).cast("long")).over(w)
        .cast("double") / 1e6)
      val s2 = (sum(((x * x).cast(dec) * 1000000).cast("long")).over(w)
        .cast("double") / 1e6)
      val ma = s / n
      val std = sqrt(greatest(lit(0.0), (s2 - s * s / n) / (n - lit(1.0))))
      e.withColumn("__n", n)
        .withColumn("z", when(std =!= 0.0, abs(x - ma) / std))
        .filter(col("__n") === 7 && col("z") > 2.0)
        .count()
    }
    time("ens-full-query")(Anomaly.ensemble(Seq(
      (Anomaly.zscore(e, "value", 3.0), "z"),
      (Anomaly.iqr(e, "value", 1.5), "conf"),
      (Anomaly.movingAvg(e, "value", Seq("user_id"),
        Seq(col("ts").asc, col("event_id").asc), 7, 2.0), "z")),
      keyCols = Seq("event_id"), minVotes = 2).count())
    time("ens-full-query-2nd")(Anomaly.ensemble(Seq(
      (Anomaly.zscore(e, "value", 3.0), "z"),
      (Anomaly.iqr(e, "value", 1.5), "conf"),
      (Anomaly.movingAvg(e, "value", Seq("user_id"),
        Seq(col("ts").asc, col("event_id").asc), 7, 2.0), "z")),
      keyCols = Seq("event_id"), minVotes = 2).count())
  }

  /** Stage breakdown of q_incr_gaps on lineitem.l_orderkey: the raw
    * cardinality probe, the distinct shuffle, the quantile-sketch edge
    * pass, and the bucketed window — so a pass-count change is
    * attributable per stage.
    */
  private def profileGaps(spark: org.apache.spark.sql.SparkSession,
                          sfDir: String,
                          time: String => (=> Long) => Unit): Unit = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.count() // warm
    val key = col("l_orderkey")
    time("gaps-raw-hll-probe")(
      li.agg(approx_count_distinct(key).as("card")).head().getAs[Long]("card"))
    time("gaps-distinct-count")(li.select(key).distinct().count())
    val distinct = li.select(key).distinct().persist()
    time("gaps-distinct-persist-count")(distinct.count())
    time("gaps-edges-sketch") {
      val probes = (1 until 64).map(_.toDouble / 64).toArray
      distinct.select(key.cast("double").as("k"))
        .stat.approxQuantile("k", probes, 0.001).length.toLong
    }
    time("gaps-full-query")(
      graft.incremental.Incremental.gaps(li, "l_orderkey", 1.0, 1.5).count())
    distinct.unpersist()
    time("gaps-full-query-2nd")(
      graft.incremental.Incremental.gaps(li, "l_orderkey", 1.0, 1.5).count())
  }

  /** Build-vs-pairs split of q_dedup_semantic: the IVF cell build
    * (Lloyd sample + full assignment), the hot-cell occupancy agg,
    * and the within-cell pair join — so the next shave targets the
    * measured stage.
    */
  private def profileSemantic(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String,
                              time: String => (=> Long) => Unit): Unit = {
    import graft.llm.{Dedup, Ivf}
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count() // warm + count
    val nlist = Ivf.nlistFor(n)
    time("sem-cell-build")(
      Ivf.buildIndexSampled(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", nlist).count())
    time("sem-occupancy-agg")(
      Ivf.buildIndexSampled(e.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", nlist)
        .groupBy(col("__cid")).agg(count(lit(1))).count())
    time("sem-full-query")(
      Dedup.semanticNearDup(e, "vec_id", "embedding",
        targetCellSize = 256, threshold = 0.4).count())
    time("sem-full-query-2nd")(
      Dedup.semanticNearDup(e, "vec_id", "embedding",
        targetCellSize = 256, threshold = 0.4).count())
  }

  /** Stage attribution for the media dedup family (q_media_dedup_phash
    * shape): isolates the synthetic-PNG encode, the decode+hash UDF
    * pass, and the band join — and A/Bs the scan-parallelism
    * hypothesis (the doubled corpus runs its per-row codec work in the
    * 2 tasks the single-row-group documents.parquet scan yields, 30
    * cores idle) against an id-only fan-out repartition.
    */
  private def profileMedia(spark: org.apache.spark.sql.SparkSession,
                           sfDir: String,
                           time: String => (=> Long) => Unit): Unit = {
    import graft.multimodal.Media
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
    docs.count() // warm
    val par = spark.sparkContext.defaultParallelism
    def corpus(d: org.apache.spark.sql.DataFrame) = {
      val img = d.select(col("doc_id"),
        Media.syntheticPngCol(col("doc_id"), lit(0)).as("img"))
      img.union(img.withColumn("doc_id", col("doc_id") + lit(1000000L)))
    }
    time("media-encode-only")(
      corpus(docs).select(length(col("img"))).agg(sum("length(img)")).count())
    time("media-sig-pass")(
      Media.imageSignatures(corpus(docs), "doc_id", "img", "phash").count())
    time("media-sig-pass-fanout")(
      Media.imageSignatures(corpus(docs.repartition(par)), "doc_id", "img",
        "phash").count())
    time("media-full-phash")(
      Media.imageNearDup(corpus(docs), "doc_id", "img",
        maxHamming = 0, algo = "phash").count())
    time("media-full-phash-fanout")(
      Media.imageNearDup(corpus(docs.repartition(par)), "doc_id", "img",
        maxHamming = 0, algo = "phash").count())
    time("media-full-dhash-fanout")(
      Media.imageNearDup(corpus(docs.repartition(par)), "doc_id", "img",
        maxHamming = 0).count())
  }

  /** Pass attribution for q_anom_ocsvm (ellipticBoundary over events):
    * the moment aggregation, the exact-quantile machinery, and the
    * final filter scan — each its own driver-sequential job.
    */
  private def profileOcsvm(spark: org.apache.spark.sql.SparkSession,
                           sfDir: String,
                           time: String => (=> Long) => Unit): Unit = {
    import graft.functions.Det
    // q_anom_ocsvm's actual input: lineitem (quantity, extendedprice)
    val e = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_quantity"), col("l_extendedprice"))
    e.count() // warm
    val x = col("l_quantity"); val y = col("l_extendedprice")
    time("ocsvm-moment-agg") {
      e.agg(count(lit(1)).cast("double").as("__n"),
        Det.sumAt(x, 6).as("__sx"), Det.sumAt(y, 6).as("__sy"),
        Det.sumAt(x * x, 6).as("__sxx"), Det.sumAt(y * y, 6).as("__syy"),
        Det.sumAt(x * y, 6).as("__sxy")).head(); 1L
    }
    time("ocsvm-exact-quantile") {
      graft.functions.Quantiles.exactQuantile(
        e.withColumn("md2", round(x * y, 6)), "md2", 0.9); 1L
    }
    time("ocsvm-full-query")(
      graft.quality.Anomaly.ellipticBoundary(e, "l_quantity",
        "l_extendedprice", nu = 0.1).count())
    time("ocsvm-full-query-2nd")(
      graft.quality.Anomaly.ellipticBoundary(e, "l_quantity",
        "l_extendedprice", nu = 0.1).count())
  }

  /** A/B of the q_media_audio_formats fan-out regression: isolates the
    * blob-build+detect UDF cost (unfanned vs hash-fanned vs
    * round-robin), with the agg and with a bare noop-style pass, so the
    * ~2 s delta lands on a stage, not a guess.
    */
  private def profileExpAudio(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String,
                              time: String => (=> Long) => Unit): Unit = {
    import graft.multimodal.Media
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    base.count() // warm
    val cls = pmod(col("doc_id"), lit(5))
    val mp3Hdr = lit(Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte,
      0x00) ++ Array.fill(96)(0.toByte))
    val aacHdr = lit(Array[Byte](0xFF.toByte, 0xF1.toByte, 0x50.toByte,
      0x80.toByte, 0x00.toByte, 0x1F.toByte, 0xFC.toByte))
    val oggHdr = lit("OggS".getBytes("US-ASCII") ++ Array.fill(24)(0.toByte))
    def blob = when(cls === 0,
        Media.syntheticWavCol(pmod(col("doc_id"), lit(30000)) + lit(1)))
      .when(cls === 1, mp3Hdr)
      .when(cls === 2, oggHdr)
      .when(cls === 3, aacHdr)
      .otherwise(concat(lit("X").cast("binary"),
        coalesce(col("text"), lit("")).cast("binary")))
    val par = spark.sparkContext.defaultParallelism
    def agg(d: org.apache.spark.sql.DataFrame) =
      Media.audioFormatProfile(d.select(col("doc_id"), blob.as("wav")), "wav")
    (1 to 2).foreach { i =>
      time(s"audfmt-unfanned-$i")(agg(base).count())
      time(s"audfmt-hash32-$i")(agg(base.repartition(par, col("doc_id"))).count())
      time(s"audfmt-rr32-$i")(agg(base.repartition(par)).count())
      time(s"audfmt-hash8-$i")(agg(base.repartition(8, col("doc_id"))).count())
      time(s"audfmt-blob-noop-unfanned-$i") {
        val d = base.select(col("doc_id"), blob.as("wav"))
        d.write.format("noop").mode("overwrite").save(); 1L
      }
      time(s"audfmt-blob-noop-hash32-$i") {
        val d = base.repartition(par, col("doc_id"))
          .select(col("doc_id"), blob.as("wav"))
        d.write.format("noop").mode("overwrite").save(); 1L
      }
    }
  }

  /** Micro-batch cost attribution for the q_stream_* family: drains
    * one windowed agg and one dedup stream, then prints per-batch
    * durationMs components (addBatch, getBatch, commitOffsets,
    * walCommit, queryPlanning, triggerExecution) and the batch count —
    * so streaming wall-clock lands on a named phase (state machinery
    * vs planning vs the data pass) instead of "streaming is slow".
    */
  private def profileStreams(spark: org.apache.spark.sql.SparkSession,
                             sfDir: String,
                             time: String => (=> Long) => Unit): Unit = {
    import graft.functions.Det
    def drain(name: String, agg: org.apache.spark.sql.DataFrame,
              mode: org.apache.spark.sql.streaming.OutputMode): Unit = {
      spark.catalog.dropTempView(name)
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.startMemorySink(agg, name, mode)
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name%-28s $sec%8.3f s  rows=${spark.table(name).count()}")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
    }
    val ev = Tables.eventsStream(spark, sfDir)
    drain("prof_stream_tumbling",
      graft.streaming.Streams.windowedAgg(ev, "ts", "10 minutes", "1 hour",
        None, Seq("event_type"),
        Seq(count(lit(1)).as("n"), Det.sumAt(col("value"), 6).as("sum_val"))),
      org.apache.spark.sql.streaming.OutputMode.Complete())
    drain("prof_stream_dedup",
      graft.streaming.Streams.dedupStream(Tables.eventsStream(spark, sfDir),
        "ts", "1 hour", Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type")),
      org.apache.spark.sql.streaming.OutputMode.Append())
    drain("prof_stream_sessionize",
      graft.streaming.Streams.sessionWindowAgg(
        Tables.eventsStream(spark, sfDir), "ts", "1 hour", "30 minutes",
        Seq("user_id"),
        Seq(count(lit(1)).as("n_events"), Det.sumAt(col("value"), 6).as("sum_val"))),
      org.apache.spark.sql.streaming.OutputMode.Complete())
  }

  /** Stage attribution for q_corpus_crawl: the two history writes, the
    * Job pipeline (quality gate + two screens), and the sampling tail
    * — so the capstone's 8 s lands on a named stage.
    */
  private def profileCrawl(spark: org.apache.spark.sql.SparkSession,
                           sfDir: String,
                           time: String => (=> Long) => Unit): Unit = {
    import graft.llm.{Dedup, Sampling}
    val all = Tables.load(spark, sfDir, "documents")
    all.count() // warm
    val tmp = java.nio.file.Files.createTempDirectory("graft_crawl_prof").toString
    time("crawl-hist-exact-write") {
      graft.Recovery.idempotentWrite(
        all.filter(col("doc_id") % 5 === 0).select("text"), s"$tmp/hist_exact"); 1L
    }
    time("crawl-hist-minhash-write") {
      graft.Recovery.idempotentWrite(
        Dedup.minhashHistorySignatures(
          all.filter(col("doc_id") % 7 === 0), "doc_id", "text"),
        s"$tmp/hist_minhash"); 1L
    }
    val qExpr =
      "LEAST(1.0, CAST(regexp_count(text, '\\\\S+') AS DOUBLE) / 50.0) * 0.3" +
        " + (CAST(regexp_count(text, '[A-Za-z]') AS DOUBLE) /" +
        " GREATEST(length(text), 1)) * 0.4" +
        " + (CAST(regexp_count(lower(text), '\\\\b(the|a|and|of|to|in|is)\\\\b')" +
        " AS DOUBLE) / GREATEST(regexp_count(text, '\\\\S+'), 1)) * 0.3"
    time("crawl-quality-gate")(
      all.withColumn("q", expr(qExpr))
        .filter(col("q") >= 0.5).count())
    val gated = all.withColumn("q", expr(qExpr))
      .filter(col("q") >= 0.5)
      .withColumn("__batch", col("doc_id") % 5)
      .filter(col("__batch") =!= 0)
    time("crawl-screen-exact") {
      val hist = spark.read.parquet(s"$tmp/hist_exact")
      Dedup.dedupAgainstHistory(gated, hist, "text").count()
    }
    time("crawl-screen-minhash") {
      val hist = spark.read.parquet(s"$tmp/hist_minhash")
      val screened = Dedup.dedupAgainstHistory(gated,
        spark.read.parquet(s"$tmp/hist_exact"), "text")
      Dedup.minhashAgainstHistory(screened, hist, "doc_id", "text").count()
    }
    time("crawl-full-query")(
      SparkEntry.queries("q_corpus_crawl")(spark, sfDir).count())
    time("crawl-full-query-2nd")(
      SparkEntry.queries("q_corpus_crawl")(spark, sfDir).count())
  }

  /** Per-pass breakdown of [[graft.functions.Quantiles.exactQuantiles]]
    * (the q_dq_quantiles plan): replicates each of the three shared
    * scans in isolation so the attribution targets the measured pass.
    */
  private def profileQuantiles(spark: org.apache.spark.sql.SparkSession,
                               sfDir: String,
                               time: String => (=> Long) => Unit): Unit = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.count() // warm scan
    val cols = Seq("l_quantity", "l_extendedprice")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val eps = 0.002
    def v(c: String) = col(c).cast("double")
    val edges = qs.flatMap(q => Seq(q - eps, q + eps))

    // pass 1 shape: counts + one multi-edge GK sketch per column
    var brackets = Map.empty[String, Seq[Double]]
    time("q1-pass1-count+gk") {
      val aggs = cols.flatMap(c => Seq(count(v(c)).as(s"n_$c"),
        expr(s"approx_percentile(CAST(`$c` AS DOUBLE), " +
          s"array(${edges.mkString(",")}), 10000)").as(s"b_$c")))
      val r = li.agg(aggs.head, aggs.tail: _*).head()
      brackets = cols.map(c => c -> r.getSeq[Double](r.fieldIndex(s"b_$c"))).toMap
      1L
    }
    // pass 1 variant: counts only (isolates the GK sketch share)
    time("q1-pass1-count-only") {
      val aggs = cols.map(c => count(v(c)).as(s"n_$c"))
      li.agg(aggs.head, aggs.tail: _*).head(); 1L
    }
    // GK accuracy sweep: the bracket only needs error < eps*n
    // (accuracy >= 1/eps = 500); pass 2 verifies and misses fall back
    Seq(2000, 1000).foreach { acc =>
      time(s"q1-pass1-gk-acc$acc") {
        val aggs = cols.map(c =>
          expr(s"approx_percentile(CAST(`$c` AS DOUBLE), " +
            s"array(${edges.mkString(",")}), $acc)").as(s"b_$c"))
        li.agg(aggs.head, aggs.tail: _*).head(); 1L
      }
    }
    // pass 2 shape: conditional below/in counts per probe
    time("q1-pass2-cond-counts") {
      val aggs = cols.flatMap { c =>
        val br = brackets(c)
        qs.indices.flatMap(i => Seq(
          count(when(v(c) < br(2 * i), 1)).as(s"below_${c}_$i"),
          count(when(v(c) >= br(2 * i) && v(c) <= br(2 * i + 1), 1))
            .as(s"in_${c}_$i")))
      }
      li.agg(aggs.head, aggs.tail: _*).head(); 1L
    }
    // pass 3 shape: HOF bracket tag + explode + per-probe window
    time("q1-pass3-sliver-window") {
      val perCol = cols.zipWithIndex.map { case (c, ci) =>
        val br = brackets(c)
        val arr = array(qs.indices.map(i =>
          struct(lit(ci * 4 + i).as("id"), lit(br(2 * i)).as("b1"),
            lit(br(2 * i + 1)).as("b2"))): _*)
        transform(filter(arr, s => v(c) >= s("b1") && v(c) <= s("b2")),
          s => struct(s("id").as("id"), v(c).as("v")))
      }
      li.select(explode(concat(perCol: _*)).as("m"))
        .select(col("m.id").as("id"), col("m.v").as("v"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("v"))))
        .filter(col("rn") <= 2)
        .count()
    }
    // pass 3 variant: codegen'd boolean tag instead of HOF filter —
    // measures the interpreted-lambda share of the sliver scan
    time("q1-pass3-flat-when") {
      val parts = cols.zipWithIndex.flatMap { case (c, ci) =>
        val br = brackets(c)
        qs.indices.map(i =>
          when(v(c) >= br(2 * i) && v(c) <= br(2 * i + 1),
            struct(lit(ci * 4 + i).as("id"), v(c).as("v"))))
      }
      li.select(explode(array(parts: _*)).as("m"))
        .filter(col("m").isNotNull)
        .select(col("m.id").as("id"), col("m.v").as("v"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("v"))))
        .filter(col("rn") <= 2)
        .count()
    }
  }
}
