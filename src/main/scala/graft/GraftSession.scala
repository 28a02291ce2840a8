package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for correctness-reproducibility and scale:
  *  - AQE on (runtime re-plan, skew-join splitting, shuffle coalescing)
  *  - shuffle partitions sized to the local core count (the driver's
  *    cluster submit would size this to executors × cores instead)
  *  - UTC session timezone (cross-engine timestamp parity)
  *  - nanos-as-long parquet reads (events.ts is TIMESTAMP(NANOS), which
  *    Spark has no native type for; Tables.load normalizes to micros)
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  /** Release every cached frame and persistent RDD in the session.
    *
    * The persist-ownership contract: operators that persist internal
    * frames for intra-query reuse (Dedup.minhashLsh, Search.tfidfTopTerms,
    * Lof.scores, Ivf.buildIndex, Dedup.connectedComponents'
    * localCheckpoints, …) deliberately leave them alive because callers
    * typically consume the returned frame more than once (collect +
    * write, or probe an index repeatedly). A long-lived session — REPL,
    * server, or harness looping over many queries — MUST call this
    * between units of work, or the accumulated blocks eventually evict
    * and GC-thrash every later query. `clearCache()` drops catalog-
    * tracked Dataset persists; the RDD sweep additionally drops
    * localCheckpoint blocks, which the catalog does not track.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // Broadcasts and shuffle files are reclaimed by ContextCleaner only
    // after their references are GC'd on the driver; with a large heap
    // that can lag many queries behind, so cleanup IO lands in the
    // middle of later work. Forcing a GC at the release boundary keeps
    // the reclaim there instead.
    System.gc()
  }
}
