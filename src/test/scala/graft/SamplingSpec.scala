package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Sampling, Text}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 4000L).toDF("id")

  test("hash sampling hits the target fraction and is partition-invariant") {
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val n = Sampling.sample(ids, "id", f).count()
      // md5 is uniform: binomial(4000, f) stays well within 5 sigma
      val sigma = math.sqrt(4000 * f * (1 - f))
      assert(math.abs(n - 4000 * f) < 5 * sigma, s"f=$f n=$n")
    }
    // the SAME rows are selected regardless of physical layout
    val a = Sampling.sample(ids, "id", 0.3).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.sample(ids.repartition(17), "id", 0.3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // edge fractions
    assert(Sampling.sample(ids, "id", 0.0).count() == 0)
    assert(Sampling.sample(ids, "id", 1.0).count() == 4000)
  }

  test("stratified sampling applies per-stratum fractions") {
    val df = ids.withColumn("s", when(col("id") % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedSample(df, "id", "s", Map("even" -> 0.1), 1.0)
    val byS = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byS("odd") == 2000) // default fraction 1.0 keeps everything
    assert(math.abs(byS("even") - 200) < 5 * math.sqrt(2000 * 0.1 * 0.9))
  }

  test("samplePerStratum returns exactly n deterministic rows per stratum") {
    val df = ids.withColumn("s", (col("id") % 5).cast("string"))
    val got = Sampling.samplePerStratum(df, Seq("s"), "id", n = 7)
    val counts = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(7L))
    // small stratum: capped at its size
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("s", "id")
    val tinyGot = Sampling.samplePerStratum(tiny, Seq("s"), "id", n = 5)
    assert(tinyGot.count() == 3)
    // deterministic under re-partitioning
    val x = got.select("id").as[Long].collect().sorted.toSeq
    val y = Sampling.samplePerStratum(df.repartition(13), Seq("s"), "id", n = 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(x == y)
  }

  test("capPerGroup keeps the top-n rows per group by priority with stable ties") {
    // group "a": priorities 9,9,5,5,1 — cap 3 keeps both 9s then the
    // LOWER-id 5; group "b" is under the cap and survives whole
    val df = Seq(
      ("a", 10L, 9.0), ("a", 11L, 9.0), ("a", 12L, 5.0), ("a", 13L, 5.0),
      ("a", 14L, 1.0), ("b", 20L, 2.0), ("b", 21L, 7.0)
    ).toDF("g", "id", "pri")
    val got = Sampling.capPerGroup(df, Seq("g"), "pri", "id", n = 3)
      .select("g", "id", "rn").as[(String, Long, Int)].collect().toSeq.sorted
    assert(got == Seq(("a", 10L, 1), ("a", 11L, 2), ("a", 12L, 3),
      ("b", 20L, 2), ("b", 21L, 1)))
    // deterministic under re-partitioning
    val again = Sampling.capPerGroup(df.repartition(7), Seq("g"), "pri", "id", n = 3)
      .select("g", "id", "rn").as[(String, Long, Int)].collect().toSeq.sorted
    assert(again == got)
  }

  test("splitTag is disjoint, exhaustive, and near the requested proportions") {
    val splits = Seq("valid" -> 0.1, "test" -> 0.1, "train" -> 0.8)
    val tagged = ids.withColumn("split", Sampling.splitTag(col("id"), splits))
    val counts = tagged.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("valid", "test", "train")) // exhaustive
    assert(counts.values.sum == 4000)                      // disjoint (one tag per row)
    for ((name, f) <- splits)
      assert(math.abs(counts(name) - 4000 * f) < 5 * math.sqrt(4000 * f * (1 - f)),
        s"$name=${counts(name)}")
  }

  test("mixture replicates floor(w) + fractional subset and downsamples w<1") {
    val df = ids.withColumn("s",
      when(col("id") % 2 === 0, "up").otherwise("down"))
    val got = Sampling.mixture(df, "id", "s", Map("up" -> 2.5, "down" -> 0.25))
    val byS = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(byS("up") - 2000 * 2.5) < 5 * math.sqrt(2000 * 0.5 * 0.5))
    assert(math.abs(byS("down") - 2000 * 0.25) < 5 * math.sqrt(2000 * 0.25 * 0.75))
    // replicated rows carry distinct copy_idx 1..k
    val copies = got.filter(col("s") === "up").groupBy("id")
      .agg(collect_set("copy_idx").as("c"), count(lit(1)).as("n"))
    assert(copies.filter(size(col("c")) =!= col("n")).count() == 0)
    // weight 0 drops the stratum entirely
    assert(Sampling.mixture(df, "id", "s", Map("up" -> 0.0))
      .filter(col("s") === "up").count() == 0)
  }

  test("sampleByProb keeps per-row fractions, monotonically in the probability") {
    val df = (1L to 4000L).map(i => (i, (i % 10) / 10.0)).toDF("k", "p")
    def kept(prob: org.apache.spark.sql.Column) =
      Sampling.sampleByProb(df, "k", prob).select("k").as[Long].collect().toSet
    // boundary semantics: p=1 keeps everything, p=0 essentially nothing
    assert(kept(lit(1.0)).size == 4000)
    assert(kept(lit(0.0)).size <= 1)
    // per-row: rows with p=0.9 kept ~9x as often as p=0.1
    val perRow = kept(col("p"))
    def rate(d: Long) = perRow.count(_ % 10 == d) / 400.0
    assert(math.abs(rate(9) - 0.9) < 0.06 && math.abs(rate(1) - 0.1) < 0.06)
    // monotone: raising every probability only ADDS rows (same keys,
    // same draw, higher cutoff) — the property that makes threshold
    // sweeps on a quality scorer stable
    assert(perRow.subsetOf(kept(least(col("p") + 0.3, lit(1.0)))))
    // clamps, not errors, outside [0,1]
    assert(kept(lit(7.5)).size == 4000 && kept(lit(-2.0)).size <= 1)
  }

  test("ngramContamination flags exactly the docs sharing a benchmark n-gram") {
    val bench = Seq((100L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words the quick brown fox jumps here"), // shares 5-grams
      (2L, "completely different content with no overlap at all"),
      (3L, "quick brown fox jumps over and more text")      // shares one 5-gram
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContamination(corpus, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 3L))
    // shared-gram counts verified against an independent Scala computation
    def grams(t: String) =
      t.split("\\s+").sliding(5).map(_.mkString(" ")).toSet
    val bg = grams("the quick brown fox jumps over dogs")
    for ((id, txt) <- Seq(1L -> "prefix words the quick brown fox jumps here",
                          3L -> "quick brown fox jumps over and more text"))
      assert(got(id) == grams(txt).intersect(bg).size.toLong, s"doc $id")
  }

  test("dropBoilerplateLines drops corpus-frequent lines, keeps order, rebuilds docs") {
    val docs = Seq(
      (1L, "HEADER\nunique body one\nshared paragraph\nFOOTER"),
      (2L, "HEADER\nunique body two\nshared paragraph\nFOOTER"),
      (3L, "HEADER\nanother distinct line\nFOOTER"),
      (4L, "HEADER\nFOOTER")).toDF("doc_id", "text")
    val got = Dedup.dropBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("unique body one", 1, 3))) // HEADER/shared/FOOTER gone
    assert(got(2L) == (("unique body two", 1, 3)))
    assert(got(3L) == (("another distinct line", 1, 2)))
    assert(got(4L) == (("", 0, 2))) // everything was boilerplate
    // order preservation with multiple survivors
    val multi = Seq(
      (10L, "COMMON\nfirst\nsecond\nthird"),
      (11L, "COMMON\nother")).toDF("doc_id", "text")
    val m = Dedup.dropBoilerplateLines(multi, "doc_id", "text")
      .filter(col("doc_id") === 10L).select("clean").as[String].head()
    assert(m == "first\nsecond\nthird")
  }

  test("redactPii scrubs every category and piiCounts audits them") {
    val df = Seq(
      "reach me at jane.doe+x@corp.example.org or 415-555-0123",
      "ssn 123-45-6789 ip 192.168.1.254 done",
      "nothing sensitive here").toDF("t")
    val cleaned = df.select(Text.redactPii(col("t"))).as[String].collect()
    assert(cleaned(0) == "reach me at [EMAIL] or [PHONE]")
    assert(cleaned(1) == "ssn [SSN] ip [IP] done")
    assert(cleaned(2) == "nothing sensitive here")
    val counts = df.select(Text.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(counts(0).getInt(0) == 1 && counts(0).getInt(1) == 1) // email, phone
    assert(counts(1).getInt(2) == 1 && counts(1).getInt(3) == 1) // ssn, ipv4
  }

  test("normalize strips controls, collapses whitespace, trims, lowercases") {
    val df = Seq("  Hello\t\tWorld x\n\n END  ", "already clean", "")
      .toDF("t")
    val r = df.select(Text.normalize(col("t"))).as[String].collect()
    assert(r(0) == "hello world x end")
    assert(r(1) == "already clean")
    assert(r(2) == "")
    // case-preserving mode
    assert(df.select(Text.normalize(col("t"), lowercase = false))
      .as[String].head() == "Hello World x END")
  }

  test("int8 quantization preserves cosine order within tolerance") {
    import graft.llm.Similarity
    val vecs = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        (math.sin(i * 31 + d * 7) * (1 + (i % 5))).toFloat))
    }.toDF("id", "vec")
    val q = Similarity.withQuantizedVec(vecs, "vec")
    // struct shape: scale double + tinyint array
    assert(q.schema("qvec").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(_.name).toSeq == Seq("scale", "q"))
    val err = q.select(
      abs(Similarity.cosine(col("vec"), col("vec")) -
        Similarity.cosine(Similarity.dequantize(col("qvec")), col("vec"))).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(err < 0.02, s"max cosine error $err")
    // zero vector round-trips without dividing by zero
    val z = Seq((1L, Array.fill(4)(0f))).toDF("id", "vec")
    val zq = Similarity.withQuantizedVec(z, "vec")
      .select(Similarity.dequantize(col("qvec"))).as[Seq[Float]].head()
    assert(zq == Seq(0f, 0f, 0f, 0f))
  }

  test("quantizedTopK recalls nearly all of exact brute-force top-k") {
    import graft.llm.Similarity
    val corpus = (1 to 300).map { i =>
      (i.toLong, Array.tabulate(32)(d => math.sin(i * 13 + d * 5).toFloat))
    }.toDF("id", "vec")
    val queries = (1 to 5).map { i =>
      (1000L + i, Array.tabulate(32)(d => math.cos(i * 7 + d * 3).toFloat))
    }.toDF("qid", "vec")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries, "id", "qid", "vec", k = 10))
    val quant = pairs(Similarity.quantizedTopK(corpus, queries, "id", "qid", "vec", k = 10))
    assert(quant.size == exact.size)
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("cutoffHex is monotone and pins the endpoints") {
    assert(Sampling.cutoffHex(0.0) == "00000000")
    assert(Sampling.cutoffHex(1.0) == "ffffffff")
    val cuts = (0 to 100).map(i => Sampling.cutoffHex(i / 100.0))
    assert(cuts == cuts.sorted)
  }
}
