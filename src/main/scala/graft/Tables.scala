package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table access for the graft engine.
  *
  * All tables are parquet directories/files under a scale-factor dir
  * (see TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst
  * gets full pushdown (filters, column pruning, partition pruning when
  * the layout is partitioned).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load a table. `events.ts` is TIMESTAMP(NANOS) parquet, which Spark
    * reads as long nanos under `spark.sql.legacy.parquet.nanosAsLong`
    * (set by [[graft.GraftSession]]); we normalize it to a microsecond
    * timestamp — the same truncation DuckDB applies — so both engines
    * see identical values.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize `ts` to a session-zoned micros TIMESTAMP — the ONE
    * definition batch loads and streaming replays share, so the two
    * paths cannot drift. Handles every on-disk form the driver has
    * shipped: TIMESTAMP(NANOS) read back as LongType nanos (under
    * nanosAsLong), and naive timestamp[us] read back as TIMESTAMP_NTZ
    * (when inferTimestampNTZ is on). The NTZ cast is value-preserving
    * because the session timezone is pinned UTC, so DuckDB-oracle
    * parity is unchanged.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** The events table replayed as a parquet file STREAM — the one
    * replay definition every streaming oracle query shares. The file
    * source needs a DIRECTORY to watch; glob-filter it down to the
    * events table so sibling tables don't enter the stream, and
    * normalize `ts` exactly as the batch [[load]] does.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    val p = new org.apache.hadoop.fs.Path(path)
    val isDir = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).isDirectory
    // two on-disk layouts: the gate SFs ship events.parquet as a bare
    // FILE in dir (the file source needs the parent dir + a glob to
    // see it), ScaleUp's sfN trees as a DIRECTORY of part files (the
    // glob on the LEAF names would match nothing → a silently EMPTY
    // stream, the r13 sf1 streaming-gate bug) — stream the dataset
    // directory itself there, no filter
    normalizeEventsTs(
      if (isDir)
        graft.streaming.Streams.fileStream(spark, "parquet", path,
          batchSchema, Map.empty)
      else
        graft.streaming.Streams.fileStream(spark, "parquet", dir,
          batchSchema, Map("pathGlobFilter" -> "events.parquet")))
  }

  /** On-disk bytes of a table's parquet path — the driver-side volume
    * probe scale-adaptive knobs derive from (one FS metadata call, no
    * Spark job).
    */
  def inputBytes(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  /** Register every table as a temp view (for SQL transforms). View
    * registration is lazy metadata, but re-deriving ten view plans per
    * query is still wasted setup — skip when this session already
    * registered the same dir.
    */
  // WeakHashMap keyed on the session object itself, not an identity
  // hash: identity hashes can collide or be reused after a stopped
  // session is GC'd, which would silently skip registration for a
  // fresh session (TABLE_OR_VIEW_NOT_FOUND); weak keys also let dead
  // sessions drop out instead of accumulating.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
  }
}
