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
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count() // warm scan

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

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
}
