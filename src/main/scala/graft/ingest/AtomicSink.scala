package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-swap atomic commit over a plain parquet directory — the
  * transactional sliver of the reference's Delta sink (02_Data
  * Ingest.py:273-282) rebuilt from first principles on the filesystem
  * API, since this environment ships no Delta jar:
  *
  *   - data files land in `<table>/data/<uuid>/` (staging: invisible to
  *     readers, who plan ONLY from manifests);
  *   - a commit writes `_manifests/v<N>` — the FULL file listing of the
  *     new snapshot (previous snapshot's files plus the staged ones:
  *     add-only commits, the reference's append mode) — to a temp name
  *     and publishes it with an ATOMIC rename;
  *   - readers resolve the highest committed `v<N>` and multi-path scan
  *     exactly its files (the q177 time-travel read path — historical
  *     versions stay readable since commits never rewrite data).
  *
  * A crash between the data write and the manifest publish leaves orphan
  * staging files but readers stay on the old snapshot — no torn commit
  * is observable. Version allocation serializes through a
  * create-exclusive commit lock (the Registry lock pattern), so
  * concurrent committers get consecutive versions instead of clobbering
  * each other's manifests.
  *
  * 100 TB posture: manifests are metadata (one line per file); commit
  * cost is one rename regardless of data volume; snapshot planning is a
  * manifest read, and VACUUM of dead/orphan files is an offline listing
  * diff, exactly the lakehouse layout.
  */
object AtomicSink {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")

  /** Committed versions, ascending (empty before the first commit). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val md = manifestDir(table)
    val f = fs(spark, md)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong)
      .sorted
  }

  private def manifestFiles(spark: SparkSession, table: String, v: Long): Seq[String] = {
    val p = new Path(manifestDir(table), s"v$v")
    val f = fs(spark, p)
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Stage `df` as parquet WITHOUT committing — the crash window a test
    * can hold open. Returns the staged files. */
  def stage(df: DataFrame, table: String): Seq[String] = {
    val dir = new Path(new Path(table, "data"),
      java.util.UUID.randomUUID().toString)
    df.write.parquet(dir.toString)
    val f = fs(df.sparkSession, dir)
    f.listStatus(dir).toSeq.map(_.getPath.toString)
      .filter(_.endsWith(".parquet"))
  }

  /** Publish staged files as the next version: new manifest = previous
    * snapshot's listing + `staged` (add-only append commit). Returns the
    * committed version. */
  def commitStaged(spark: SparkSession, table: String, staged: Seq[String]): Long =
    withCommitLock(spark, table) {
      val prev = versions(spark, table)
      val v = prev.lastOption.getOrElse(0L) + 1L
      val all = prev.lastOption.map(manifestFiles(spark, table, _)).getOrElse(Nil) ++ staged
      val md = manifestDir(table)
      val f = fs(spark, md)
      f.mkdirs(md)
      val tmp = new Path(md, s"_tmp_v${v}_${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write((all.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      // the publish: one atomic rename — readers see the old snapshot or
      // the new one, never a partial manifest
      if (!f.rename(tmp, new Path(md, s"v$v")))
        throw new IllegalStateException(s"manifest publish failed for $table v$v")
      v
    }

  /** Write + commit in one call (the normal sink path). */
  def commit(df: DataFrame, table: String): Long =
    commitStaged(df.sparkSession, table, stage(df, table))

  /** Snapshot read AS OF `version` (latest when omitted). Fails loudly on
    * an empty table — an uncommitted sink has no snapshot to read. */
  def read(spark: SparkSession, table: String, version: Long = Long.MaxValue): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed snapshot under $table")
    val v = vs.filter(_ <= version).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot at or before v$version (earliest is v${vs.head})"))
    spark.read.parquet(manifestFiles(spark, table, v): _*)
  }

  // create-exclusive commit lock (see graft.ml.Registry.withLock for the
  // scheme rationale: POSIX O_EXCL locally, atomic namenode create on
  // HDFS; stale takeover + bounded wait so a crashed committer cannot
  // wedge the table)
  private val lockStaleMs = 60000L
  private val lockWaitMs = 30000L
  private def withCommitLock[T](spark: SparkSession, table: String)(f: => T): T = {
    val lockPath = new Path(table, "_commit.lock")
    val fsys = fs(spark, lockPath)
    val isLocal = Option(lockPath.toUri.getScheme).forall(_ == "file")
    def tryAcquire(): Boolean =
      if (isLocal) {
        val lf = new java.io.File(lockPath.toUri.getPath)
        Option(lf.getParentFile).foreach(_.mkdirs())
        lf.createNewFile()
      } else {
        try { fsys.create(lockPath, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    val deadline = System.currentTimeMillis() + lockWaitMs
    var acquired = tryAcquire()
    while (!acquired && System.currentTimeMillis() < deadline) {
      try {
        val st = fsys.getFileStatus(lockPath)
        if (System.currentTimeMillis() - st.getModificationTime > lockStaleMs)
          fsys.delete(lockPath, false)
      } catch { case _: java.io.FileNotFoundException => }
      if (!{ acquired = tryAcquire(); acquired }) Thread.sleep(25)
    }
    if (!acquired)
      throw new IllegalStateException(
        s"commit lock $lockPath not acquired within ${lockWaitMs}ms")
    try f finally fsys.delete(lockPath, false)
  }
}
