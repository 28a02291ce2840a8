package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Commit-versioned parquet table — the data-plane semantics behind
  * the reference's `delta_lake` incremental strategy
  * (incremental_load_manager.py:786 _extract_delta_lake, a placeholder
  * that logs "not yet implemented"), re-expressed as the transaction-
  * log design the lakehouse formats publish (Delta's `_delta_log`,
  * Iceberg's snapshot manifests): data files are invisible until a
  * numbered manifest references them, so "give me rows since version
  * V" is a METADATA answer — readers open exactly the delta's files,
  * never scanning or filtering the full table. That file-level pruning
  * is the scale story: a 100 TB table with a 1 GB daily delta reads
  * 1 GB, where even a perfectly pushed-down predicate scan still
  * visits every file's footer.
  *
  * Layout: `<dir>/part-<uuid>.parquet` data files plus
  * `<dir>/_graft_log/<%020d>.manifest` commit files. A manifest lists
  * its data files (relative names, one per line) between a header and
  * an `#end` terminator; the terminator makes partially written claims
  * detectable. Commits CAS-claim the next version with
  * `create(..., overwrite = false)` — atomic on HDFS and local
  * filesystems; object stores want their conditional-put equivalent.
  *
  * Reader visibility rule: the readable table is the longest COMPLETE
  * prefix of versions. An incomplete claim younger than
  * [[staleClaimMs]] is an in-flight commit (readers stop before it —
  * its rows belong to the next read); older than that it is presumed
  * crashed and skipped (its unreferenced data files are [[vacuum]]
  * debris). The same two-phase visibility discipline as
  * [[graft.incremental.WatermarkStore.compact]].
  *
  * Writer replay safety: `commit(df, dir, txnId = Some(id))` is
  * idempotent — a txn id already recorded by a complete manifest
  * returns that version without writing anything (the lakehouse
  * "transactional writer" contract; a retried job cannot double-append
  * its batch).
  */
object VersionedTable {

  /** An incomplete manifest claim older than this is a crashed commit:
    * skipped by readers, its files reclaimable by [[vacuum]]. Writing
    * a manifest is one small create+write+close — minutes of silence
    * mean the writer died.
    */
  val staleClaimMs: Long = 10 * 60 * 1000L

  private val logDirName = "_graft_log"
  private val header = "#graft-versioned-manifest"
  private val endMark = "#end"
  private val txnPrefix = "#txn:"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(dir: String): Path = new Path(dir, logDirName)

  private def manifestPath(dir: String, v: Long): Path =
    new Path(logDir(dir), f"$v%020d.manifest")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.endsWith(".manifest"))
      n.stripSuffix(".manifest").toLongOption.filter(_ >= 0)
    else None
  }

  private final case class Manifest(version: Long, files: Seq[String],
                                    txnId: Option[String], complete: Boolean,
                                    modTime: Long)

  /** Every claimed manifest, parsed, ascending by version — bounded
    * driver-side metadata (one small file per commit).
    */
  private def manifests(fs: FileSystem, dir: String): Seq[Manifest] = {
    val ld = logDir(dir)
    if (!fs.exists(ld)) return Seq.empty
    fs.listStatus(ld).toSeq
      .flatMap(st => versionOf(st.getPath).map(v => (v, st)))
      .sortBy(_._1)
      .map { case (v, st) =>
        val in = fs.open(st.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList finally in.close()
        Manifest(v,
          lines.filterNot(_.startsWith("#")).filter(_.nonEmpty),
          lines.find(_.startsWith(txnPrefix)).map(_.stripPrefix(txnPrefix)),
          lines.lastOption.contains(endMark),
          st.getModificationTime)
      }
  }

  /** The readable prefix: complete manifests up to (not through) the
    * first in-flight claim; stale incomplete claims are crashed
    * commits and are skipped.
    */
  private def readable(fs: FileSystem, dir: String,
                       now: Long = System.currentTimeMillis()): Seq[Manifest] = {
    val out = Seq.newBuilder[Manifest]
    var stop = false
    manifests(fs, dir).foreach { m =>
      if (!stop) {
        if (m.complete) out += m
        else if (now - m.modTime < staleClaimMs) stop = true // in-flight
        // else: stale claim — crashed commit, skip and keep reading
      }
    }
    out.result()
  }

  /** Newest readable version; None for an empty or nonexistent table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    readable(fsOf(spark, new Path(dir)), dir).lastOption.map(_.version)

  /** Append `df` as one atomic commit; returns the published version
    * (versions start at 1). With `txnId`, a replayed commit whose id a
    * complete manifest already records is a no-op returning the
    * original version. Data files stage into a hidden dir and rename
    * into place BEFORE the manifest publishes — a crash leaves only
    * invisible debris, never a half-visible commit.
    */
  def commit(df: DataFrame, dir: String,
             txnId: Option[String] = None): Long = {
    val spark = df.sparkSession
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    val replayed = txnId.flatMap(id =>
      manifests(fs, dir).find(m => m.complete && m.txnId.contains(id)))
    if (replayed.nonEmpty) return replayed.get.version
    val stamp = java.util.UUID.randomUUID().toString
    val staging = new Path(root, s".__vt_stage_$stamp")
    df.write.parquet(staging.toString)
    val names = try {
      val parts = fs.listStatus(staging).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      parts.zipWithIndex.map { case (st, i) =>
        val name = s"part-$stamp-$i.parquet"
        val target = new Path(root, name)
        if (!fs.rename(st.getPath, target))
          throw new java.io.IOException(s"could not publish data file $target")
        name
      }
    } finally fs.delete(staging, true)
    fs.mkdirs(logDir(dir))
    val body = (header +: txnId.map(txnPrefix + _).toSeq) ++ names :+ endMark
    // CAS loop: claim the next unclaimed version slot; losing the race
    // just means someone else published that version — re-list, retry
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 1000, s"could not claim a commit version under $dir")
      val next = manifests(fs, dir).lastOption.fold(1L)(_.version + 1)
      try {
        val out = fs.create(manifestPath(dir, next), false)
        try out.write((body.mkString("\n") + "\n").getBytes("UTF-8"))
        finally out.close()
        return next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => // retry
        case _: java.io.IOException if fs.exists(manifestPath(dir, next)) => // retry
      }
    }
    -1L // unreachable
  }

  private def filesOf(spark: SparkSession, dir: String,
                      ms: Seq[Manifest]): Seq[String] =
    ms.flatMap(_.files).map(n => new Path(new Path(dir), n).toString)

  private def emptyLike(spark: SparkSession, dir: String,
                        all: Seq[Manifest]): DataFrame = {
    val files = filesOf(spark, dir, all)
    if (files.isEmpty)
      throw new IllegalArgumentException(
        s"versioned table at $dir has no committed data")
    // one footer read pins the schema for a no-delta read
    val schema = spark.read.parquet(files.head).schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The whole table at its newest readable version. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val all = readable(fsOf(spark, new Path(dir)), dir)
    val files = filesOf(spark, dir, all)
    if (files.isEmpty) emptyLike(spark, dir, all)
    else spark.read.parquet(files: _*)
  }

  /** Rows committed STRICTLY AFTER `sinceVersion` — the incremental
    * delta, read file-first (only the delta's files open). `-1` (or
    * any version below the first) reads everything.
    */
  def readSince(spark: SparkSession, dir: String,
                sinceVersion: Long): DataFrame = {
    val all = readable(fsOf(spark, new Path(dir)), dir)
    val delta = all.filter(_.version > sinceVersion)
    val files = filesOf(spark, dir, delta)
    if (files.isEmpty) emptyLike(spark, dir, all)
    else spark.read.parquet(files: _*)
  }

  /** Delete data files no complete manifest references (crashed-commit
    * debris), but only those older than [[staleClaimMs]] and only when
    * no in-flight claim exists — an in-flight commit's files are
    * already renamed into place before its manifest publishes.
    * Returns the number of files removed.
    */
  def vacuum(spark: SparkSession, dir: String,
             now: Long = System.currentTimeMillis()): Int = {
    val root = new Path(dir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return 0
    val ms = manifests(fs, dir)
    if (ms.exists(m => !m.complete && now - m.modTime < staleClaimMs)) return 0
    val referenced = ms.filter(_.complete).flatMap(_.files).toSet
    fs.listStatus(root).toSeq.count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
        !referenced.contains(n) && now - st.getModificationTime >= staleClaimMs &&
        fs.delete(st.getPath, false)
    }
  }
}
