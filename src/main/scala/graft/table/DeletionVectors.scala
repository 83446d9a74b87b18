package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion vectors — soft deletes as a positional sidecar, Delta's
  * modern DELETE mechanism reproduced for [[MedallionTable]].
  *
  * A predicate DELETE through the rewrite path costs O(table): every
  * surviving row of every touched file is rewritten. At 100 TB a GDPR
  * erasure of a few thousand rows cannot pay that. A deletion vector
  * instead records the POSITIONS of deleted rows — `(file, pos)` rows
  * under `_graft_meta/dv/` — and every read drops them with an
  * anti-join against the (tiny, broadcast) position set:
  * write cost O(matched rows), read overhead one broadcast anti-join,
  * zero data files touched (which `DeletionVectorSpec` asserts by file
  * listing + mtime). The next REWRITE of any kind (OPTIMIZE, merge,
  * update, restore) reads through the DV-applied view and therefore
  * materializes the deletions physically; the swap drops the sidecar
  * with the rest of `_graft_meta` — DVs never outlive the files they
  * annotate. Delta stores roaring bitmaps in the log; a parquet
  * position list is the same contract in this layout's idiom.
  *
  * UPDATE rides the same sidecar through [[DvUpdates]]: an update is a
  * position mark over the old row versions plus a staged batch of new
  * row versions, committed by ONE atomic directory rename (the marks
  * landing inside this sidecar is simultaneously the visibility witness
  * for the staged batch) — the multi-action atomicity Delta gets from
  * its log transaction, rebuilt on the filesystem primitive this layout
  * already trusts. See the [[DvUpdates]] scaladoc for the crash-window
  * argument.
  *
  * Files are keyed by their RELATIVE TAIL — the basename plus any
  * trailing `part=value` partition segments — not the full path:
  * archived snapshots relocate data files under
  * `_graft_meta/versions/vN/` (and clones point at another root), so a
  * path-keyed vector would silently resurrect its rows after
  * relocation. Basename alone is NOT enough on a partitioned table: one
  * dynamic-partition write job reuses its task UUID across partition
  * directories, so sibling partitions hold same-named files — the
  * partition segments are the discriminator (caught by
  * IncrementalJoinSpec's pruned-repair test). Row positions come from
  * `_metadata.row_index`, stable for immutable parquet.
  */
object DeletionVectors {

  private[table] def dir(tablePath: String): String =
    s"$tablePath/_graft_meta/dv"

  /** Archived-snapshot sidecar location ([[MedallionTable.readVersion]]):
    * underscore-prefixed so the snapshot's parquet listing ignores it.
    */
  private[table] def archivedDir(versionDir: Path): Path =
    new Path(versionDir, "_graft_dv")

  private[table] def exists(spark: SparkSession, dvPath: String): Boolean = {
    val p = new Path(dvPath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Relocation-stable file key: basename plus trailing `k=v` partition
    * segments (see the class scaladoc). The regex anchors at the end and
    * greedily takes `k=v/` segments before the basename; non-partition
    * ancestors never contain '=' in this layout.
    */
  private val KeyRegex = "((?:[^/]*=[^/]*/)*[^/]+)$"

  /** Every mark writer emits exactly (file: fileKey string, pos:
    * row_index long) — the `__graft_dv_file`/`__graft_dv_pos` producers —
    * so mark scans declare the schema instead of paying a parquet
    * footer-inference job per read (one such job rode EVERY
    * fingerprint-missed sidecar read and every change-feed marks read).
    */
  private[table] val MarkSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType)))

  /** The sidecar read: recursive, because committed UPDATE marks live in
    * `update_<batch>/` SUBDIRECTORIES of the sidecar ([[DvUpdates]] —
    * the atomic commit rename lands a directory, not a file), while
    * DELETE marks are flat appended files. Both carry (file, pos).
    */
  private[table] def sidecar(spark: SparkSession, dvPath: String): DataFrame =
    spark.read.schema(MarkSchema)
      .option("recursiveFileLookup", "true").parquet(dvPath)

  private[table] def fileKey(filePath: Column): Column =
    regexp_extract(filePath, KeyRegex, 1)

  private[table] def fileKeyOf(path: String): String = {
    val segs = path.split('/')
    val parts = segs.dropRight(1).reverse.takeWhile(_.contains("=")).reverse
    (parts :+ segs.last).mkString("/")
  }

  /** `raw` must be a DataFrame directly over a parquet file scan (so the
    * `_metadata` struct resolves); returns it minus the positions listed
    * at `dvPath`, or unchanged when no vector exists. Duplicate
    * positions in the sidecar are harmless (anti-join semantics), which
    * is what lets writers append marks without read-merge cycles.
    *
    * `rootPath` is the directory the annotated data files live under
    * (the table root, or the snapshot directory for archived vectors):
    * the sidecar's basenames resolve to full paths against its listing
    * DRIVER-SIDE — files-sized, like every other manifest read — so the
    * per-row anti-join key is the scan's own `file_path` + `row_index`,
    * with no per-row string surgery (a basename split per row measurably
    * dominated the read overhead in DvProbe).
    */
  def applied(spark: SparkSession, raw: DataFrame, dvPath: String,
      rootPath: String): DataFrame = {
    val f = "__graft_dvap_file"
    val x = "__graft_dvap_pos"
    appliedToKeyed(spark,
      raw.withColumn(f, col("_metadata.file_path"))
        .withColumn(x, col("_metadata.row_index")),
      dvPath, rootPath, f, x).drop(f, x)
  }

  /** [[applied]] over a frame that already CARRIES its (full file path,
    * row index) in explicit columns `fileCol`/`posCol` — the shape a
    * UNION of scan branches has (each branch pins `_metadata` to plain
    * columns before the union, because the metadata struct does not
    * survive one). This is what lets a multi-branch amended read pay ONE
    * anti-join for the whole union instead of one per branch
    * ([[graft.table.DvUpdates]] `amendedOnce`): B+1 separate anti-joins
    * were the dominant plan-construction term DvBatchProbe measured.
    * The helper columns are left in place; the caller drops them.
    */
  private[table] def appliedToKeyed(spark: SparkSession, keyed: DataFrame,
      dvPath: String, rootPath: String,
      fileCol: String, posCol: String): DataFrame = {
    val raw = keyed
    if (!exists(spark, dvPath)) return raw
    val p = new Path(dvPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // One recursive listing serves the emptiness check, the collect cap,
    // and the memo fingerprint.
    // FsWalk census for uniformity (the sidecar dir is small + memoized,
    // but no site keeps the listFiles(recursive) anti-pattern); hidden
    // pruning drops only in-flight committer staging, which must not
    // enter the memo fingerprint anyway
    val listing = FsWalk.files(fs, p, FsWalk.hiddenName).collect {
      case (st, _) if st.getPath.getName.endsWith(".parquet") =>
        (st.getPath.toString, st.getModificationTime, st.getLen)
    }.sortBy(_._1)
    // a sidecar dir with no parquet yet (mkdirs from an aborted
    // update-dv commit) must not break every read with a schema
    // inference error — no marks, nothing to apply
    if (listing.isEmpty) return raw
    val byKey = ShallowClone.scanFiles(spark, rootPath)
      .groupBy(fileKeyOf).view.mapValues(_.head).toMap
    // Sidecar size is O(all rows ever vector-deleted): one huge
    // deleteVectored (a predicate matching half a big table) must not
    // turn every subsequent read into a driver collect/broadcast OOM.
    // Above the cap, skip the collect entirely and anti-join the sidecar
    // DISTRIBUTED (shuffle anti-join, spill-safe); only the files-sized
    // key→path lookup is broadcast. Below it, the collected broadcast
    // stays the fast path (DvProbe: per-row key surgery dominated).
    if (listing.map(_._3).sum > MaxCollectedSidecarBytes) {
      import spark.implicits._
      val keys = byKey.toSeq.toDF("__dv_key", "__dv_file")
      val dv = sidecar(spark, dvPath)
        .select(col("file").as("__dv_key0"), col("pos").as("__dv_pos"))
        .join(broadcast(keys), col("__dv_key0") === col("__dv_key"))
        .select(col("__dv_file"), col("__dv_pos"))
      return raw
        .join(dv,
          col(fileCol) === col("__dv_file") &&
            col(posCol) === col("__dv_pos"),
          "left_anti")
    }
    // Memoize the COLLECTED sidecar per (session, dvPath), fingerprinted
    // by the file listing (path+mtime+len): a multi-branch read — the
    // base scan plus one branch per committed amendment batch — calls
    // applied() B+1 times against the SAME sidecar, and without the memo
    // each call re-reads every mark file, making the read cost QUADRATIC
    // in batch count (DvBatchProbe measured 0.23 s → 25.4 s over 16
    // batches). Writers append/rename mark files, which changes the
    // fingerprint, so cross-session staleness is structurally impossible.
    val memoKey = SessionCaches.token(spark) + "|" + dvPath
    val fp = listing.mkString(";")
    val marks: Seq[(String, Long)] = sidecarCache.get(memoKey) match {
      case Some((`fp`, rows)) => rows
      case _ =>
        val rows = sidecar(spark, dvPath).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        sidecarCache.put(memoKey, (fp, rows))
        rows
    }
    val dvRows = marks.flatMap { case (k, pos) =>
      byKey.get(k).map(full => (full, pos))
    }
    if (dvRows.isEmpty) return raw
    val dv = {
      import spark.implicits._
      dvRows.toDF("__dv_file", "__dv_pos")
    }
    raw
      .join(broadcast(dv),
        col(fileCol) === col("__dv_file") &&
          col(posCol) === col("__dv_pos"),
        "left_anti")
  }

  /** (fingerprint, collected (fileKey, pos) rows) per session|dvPath —
    * see the memo comment in [[applied]]. 64 entries bounds worst-case
    * footprint at 64 × [[MaxCollectedSidecarBytes]]-capped mark sets.
    */
  private val sidecarCache =
    new BoundedLruCache[(String, Seq[(String, Long)])](64)

  /** Collect/broadcast cap for the sidecar (compressed bytes on disk).
    * 64 MB of (key, pos) parquet is ≫ any sane soft-delete set and ≪
    * driver heap; `var` so DeletionVectorSpec can exercise the
    * distributed path without writing gigabytes.
    */
  private[table] var MaxCollectedSidecarBytes: Long = 64L << 20

  /** The FLAT mark files directly under the sidecar dir — the
    * [[graft.table.MedallionTable.deleteVectored]] appends. Committed
    * UPDATE/MERGE marks live in `update_<batch>/` SUBDIRECTORIES and are
    * excluded: their directory existence is the batch-visibility witness
    * ([[DvUpdates]]), so they must never be rewritten or removed outside
    * a materializing rewrite.
    */
  private[table] def flatMarkFiles(spark: SparkSession,
      tablePath: String): Seq[Path] = {
    val d = new Path(dir(tablePath))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.collect {
      case st if st.isFile && st.getPath.getName.endsWith(".parquet") =>
        st.getPath
    }
  }

  /** Staging area for [[graft.table.MedallionTable.compactDv]] — inside
    * `_graft_meta`, invisible to reads; crash litter here is vacuumed.
    */
  private[table] def compactStagingDir(tablePath: String): Path =
    new Path(s"$tablePath/_graft_meta/dv_compact_staging")

}
