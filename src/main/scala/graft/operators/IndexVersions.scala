package graft.operators

import org.apache.spark.sql.SparkSession

/** Versioned-index pointer commits — the [[graft.streaming.UpsertSink]]
  * exactly-once pattern applied to the persisted dedup indexes: a
  * compaction writes index version N+1 BESIDE version N and flips a
  * pointer file last (write-temp + atomic rename), so the rebuild crash
  * window is zero — a crash mid-rebuild leaves the pointer (and every
  * reader) on version N, and rollback is "move the pointer back".
  *
  * Layout: version data lives under `<root>/_ixvN` for path-based
  * indexes ([[Similarity.writeSignIndex]] layouts) or under table names
  * `<prefix>_ixvN_*` for bucketed-catalog indexes; the pointer file
  * `_graft_index_current` sits at the root (for table prefixes: the
  * prefix's would-be warehouse directory). The underscore prefix keeps
  * version dirs invisible to Spark's file listing, so a LEGACY flat
  * layout at the root stays readable while its first versioned rebuild
  * is in flight — no "conflicting partition structure" window.
  *
  * Resolution: pointer present → the version dir/prefix; absent → the
  * root itself (legacy flat layout, generation zero). All probe/attach
  * entry points resolve through here, so a committed compaction is
  * picked up by the NEXT probe with no caller involvement.
  *
  * Object-store safety: the rename behind the pointer flip is atomic
  * on HDFS and local filesystems but NOT on object stores (an S3A
  * rename is copy+delete), so a reader in that window could observe NO
  * pointer and silently resolve to generation zero. To close it,
  * [[commit]] also drops a monotonically named marker file
  * (`_graft_index_current.vN`, a single create — atomic and
  * read-after-write-consistent on every store including S3) BEFORE the
  * rename, and [[currentVersion]] resolves to the MAX of the pointer
  * value and the marker versions: in the rename window the markers
  * still name version N, never generation zero. Rollback goes through
  * [[rollbackTo]], which retracts the markers above the target before
  * moving the pointer back.
  *
  * Retention: old versions are kept (the rollback target). Deleting
  * versions older than N−1 is the same retention job any snapshot
  * store runs — deployment cadence, not operator behavior.
  */
object IndexVersions {

  val PointerFile = "_graft_index_current"

  private def hadoopConf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  /** The monotonic commit markers at `rootDir` (see class doc), as
    * versions. `.tmpN` leftovers from a crashed rename are not
    * markers. */
  private def markerVersions(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Int] = {
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toIndexedSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(s"$PointerFile.v") &&
        n.stripPrefix(s"$PointerFile.v").nonEmpty &&
        n.stripPrefix(s"$PointerFile.v").forall(_.isDigit))
      .map(_.stripPrefix(s"$PointerFile.v").toInt)
  }

  /** The committed version at `rootDir`, or None for a legacy flat
    * layout (or nothing at all). Resolves to the max of the pointer
    * file's value and the monotonic commit markers, so a reader inside
    * an object store's non-atomic rename window (pointer briefly
    * absent) still lands on the committed version, never on
    * generation zero. */
  def currentVersion(spark: SparkSession, rootDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(rootDir, PointerFile)
    val fs = p.getFileSystem(hadoopConf(spark))
    val fromPointer =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val t = txt.trim
        require(t.nonEmpty && t.forall(_.isDigit),
          s"corrupt index pointer at $p: '$txt'")
        Some(t.toInt)
      }
    val fromMarkers = markerVersions(fs, p.getParent).maxOption
    (fromPointer ++ fromMarkers).maxOption
  }

  /** The version a compaction should build next: committed + 1, or 1
    * over a legacy/fresh root (the flat layout is generation 0). */
  def nextVersion(spark: SparkSession, rootDir: String): Int =
    currentVersion(spark, rootDir).getOrElse(0) + 1

  /** Data directory of version `v` under a path-rooted index. */
  def versionDir(rootDir: String, v: Int): String = s"$rootDir/_ixv$v"

  /** Resolve a path-rooted index to its committed data directory. */
  def resolvePath(spark: SparkSession, rootDir: String): String =
    currentVersion(spark, rootDir)
      .map(v => versionDir(rootDir, v)).getOrElse(rootDir)

  /** Table prefix of version `v` of a bucketed-catalog index. */
  def versionPrefix(tablePrefix: String, v: Int): String =
    s"${tablePrefix}_ixv$v"

  /** The pointer root for a bucketed-catalog index: the prefix's
    * would-be managed-table directory (deterministic, warehouse-local,
    * and can never collide with a real table — the index tables are
    * `<prefix>_df` etc., never the bare prefix).
    */
  def tableRoot(spark: SparkSession, tablePrefix: String): String =
    spark.sessionState.catalog.defaultTablePath(
      spark.sessionState.sqlParser.parseTableIdentifier(tablePrefix))
      .toString

  /** Resolve a bucketed-catalog index prefix to its committed table
    * prefix. */
  def resolveTablePrefix(spark: SparkSession, tablePrefix: String): String =
    currentVersion(spark, tableRoot(spark, tablePrefix))
      .map(v => versionPrefix(tablePrefix, v)).getOrElse(tablePrefix)

  /** Commit version `v`: drop the monotonic marker
    * `_graft_index_current.vN` (one create — atomic everywhere, the
    * object-store leg of resolution), then write-temp + atomic rename
    * the pointer (FileContext supports rename-with-overwrite atomically
    * on HDFS; on the local FS it maps to the same java.nio ATOMIC_MOVE
    * the UpsertSink pointer uses). The flip is the LAST step of a
    * compaction — before the marker lands, every reader resolves to the
    * previous version; after it, to `v`, even on stores whose rename
    * window briefly shows no pointer. Markers below `v` are pruned
    * after the flip (their removal can never lower the max).
    */
  def commit(spark: SparkSession, rootDir: String, v: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(hadoopConf(spark))
    fs.mkdirs(root)
    val marker = new org.apache.hadoop.fs.Path(root, s"$PointerFile.v$v")
    val mout = fs.create(marker, true)
    try mout.write(v.toString.getBytes("UTF-8")) finally mout.close()
    val tmp = new org.apache.hadoop.fs.Path(root, s"$PointerFile.tmp$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, hadoopConf(spark))
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, PointerFile),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    markerVersions(fs, root).filter(_ < v).foreach { old =>
      fs.delete(
        new org.apache.hadoop.fs.Path(root, s"$PointerFile.v$old"),
        false): Unit
    }
  }

  /** Roll the committed version back to `v` (a previous, still-retained
    * generation; `v` = 0 is the generation-zero flat layout). Retracts
    * every commit marker above `v` FIRST — max-resolution means the
    * pointer alone cannot move the index backwards — then re-commits
    * `v` (or clears the pointer entirely for generation zero). The
    * caller is responsible for `v`'s data still existing (retention
    * keeps current − `keepPrevious` versions).
    */
  def rollbackTo(spark: SparkSession, rootDir: String, v: Int): Unit = {
    require(v >= 0, s"version: $v")
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(hadoopConf(spark))
    markerVersions(fs, root).filter(_ > v).foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$PointerFile.v$m"),
        false): Unit
    }
    if (v == 0) clearPointer(spark, rootDir)
    else commit(spark, rootDir, v)
  }

  /** Remove the pointer AND the commit markers — a FRESH flat build at
    * the root resets the index to legacy/generation-zero layout;
    * without this, a rebuilt generation 0 would be shadowed by a stale
    * pointer (or marker) from a previous run's compaction. Call it
    * AFTER the flat build completes: while the build is in flight the
    * stale pointer is what keeps readers on the last committed
    * generation instead of a half-written one. */
  def clearPointer(spark: SparkSession, rootDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(rootDir, PointerFile)
    val fs = p.getFileSystem(hadoopConf(spark))
    if (fs.exists(p)) fs.delete(p, false): Unit
    markerVersions(fs, p.getParent).foreach { m =>
      fs.delete(
        new org.apache.hadoop.fs.Path(p.getParent, s"$PointerFile.v$m"),
        false): Unit
    }
  }

  /** Retention for a PATH-rooted index: delete every version older than
    * the committed one minus `keepPrevious` (default keeps current +
    * one rollback target). Generation zero (the legacy flat files at
    * the root) counts as version 0 and is removed by the same rule —
    * its data children are the non-hidden entries beside the version
    * dirs. Refuses to run when no version is committed (there would be
    * nothing newer than the flat layout). Returns what it deleted.
    */
  def dropOldPathVersions(spark: SparkSession, rootDir: String,
      keepPrevious: Int = 1): Seq[String] = {
    require(keepPrevious >= 0, s"keepPrevious: $keepPrevious")
    val cur = currentVersion(spark, rootDir).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version at $rootDir — nothing is newer than the " +
          "flat layout, refusing to delete it"))
    val floor = cur - keepPrevious
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(hadoopConf(spark))
    val deleted = scala.collection.mutable.Buffer.empty[String]
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("_ixv") &&
          name.stripPrefix("_ixv").forall(_.isDigit)) {
        if (name.stripPrefix("_ixv").toInt < floor) {
          fs.delete(st.getPath, true)
          deleted += st.getPath.toString
        }
      } else if (name != PointerFile && !name.startsWith("_") &&
          !name.startsWith(".") && floor > 0) {
        // generation-zero data (bucket=* dirs / flat part files)
        fs.delete(st.getPath, true)
        deleted += st.getPath.toString
      }
    }
    deleted.toSeq
  }

  /** Retention for a bucketed-catalog index: drop the `_df`/`_prefix`/
    * `_shingles` tables (catalog entry AND warehouse data) of every
    * version older than committed minus `keepPrevious`; the bare-prefix
    * tables are generation 0 under the same rule. Returns the table
    * prefixes it dropped.
    */
  def dropOldTableVersions(spark: SparkSession, tablePrefix: String,
      keepPrevious: Int = 1): Seq[String] = {
    require(keepPrevious >= 0, s"keepPrevious: $keepPrevious")
    val cur = currentVersion(spark, tableRoot(spark, tablePrefix))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version for $tablePrefix — nothing is newer " +
          "than generation zero, refusing to drop it"))
    val floor = cur - keepPrevious
    val old = (0 until math.max(0, floor)).map {
      case 0 => tablePrefix
      case v => versionPrefix(tablePrefix, v)
    }
    old.foreach { p =>
      Seq("df", "prefix", "shingles").foreach { s =>
        Bucketed.dropBucketed(spark, s"${p}_$s")
      }
    }
    old
  }
}
