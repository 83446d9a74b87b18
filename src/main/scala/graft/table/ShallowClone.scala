package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shallow clone — a zero-copy table whose data files are POINTERS into
  * the source table (Delta `CREATE TABLE … SHALLOW CLONE`): the clone
  * directory holds only metadata (`_graft_meta/clone_sources.txt`, one
  * absolute file path per line) plus whatever is written into the clone
  * AFTER cloning. Reads scan source-pointer files ∪ local files; every
  * write lands locally; the first REWRITE reads through the union and
  * materializes it, dropping the manifest with `_graft_meta` — the same
  * self-clearing lifecycle as [[DeletionVectors]] and [[ColumnMap]].
  *
  * The clone snapshots the source's READ STATE, not just its file list:
  * the source's deletion vector, column map, CHECK registry and schema
  * stash are copied in (positions and renames are basename-keyed /
  * name-keyed, so they hold against the pointed-at files verbatim).
  * Later source WRITES never affect the clone's rows — with one honest
  * caveat, stronger than Delta's vacuum-retention one: a source REWRITE
  * swaps its directory, which RELOCATES the pointed-at files, breaking
  * the pointers immediately (append-only sources stay safe
  * indefinitely). Clone-then-OPTIMIZE decouples; experiments and
  * dev-from-prod forks — the feature's actual use — do exactly that.
  * At 100 TB the cost is O(files) driver metadata, zero data bytes.
  */
object ShallowClone {

  private[graft] def file(tablePath: String): Path =
    new Path(tablePath, "_graft_meta/clone_sources.txt")

  /** Snapshot-relocated manifest ([[MedallionTable.readVersion]]). */
  private[table] def archivedFile(versionDir: Path): Path =
    new Path(versionDir, "_graft_clone_sources.txt")

  private[graft] def sources(spark: SparkSession, p: Path): Seq[String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Is `root` (a live table dir or an archived snapshot dir) a shallow
    * clone that still carries pointers?
    */
  private[graft] def isClone(spark: SparkSession, root: String): Boolean =
    sources(spark, file(root)).nonEmpty ||
      sources(spark, archivedFile(new Path(root))).nonEmpty

  /** Every data file a reader of `root` must scan: clone pointers (live
    * or archived manifest layout) ∪ the local parquet listing. This is
    * THE file-resolution primitive — reads, deletion-vector basename
    * resolution and stats manifests all share it, so a clone composes
    * with every other table feature by construction.
    */
  private[table] def scanFiles(spark: SparkSession, root: String): Seq[String] =
    sources(spark, file(root)) ++
      sources(spark, archivedFile(new Path(root))) ++
      listParquet(spark, root) ++
      // committed DV-update batches are data files too (under
      // `_graft_meta`, so the plain listing skips them) — folding them in
      // here carries them into stats manifests, bloom builds, and the DV
      // sidecar's key→path resolution in one place
      DvUpdates.dataFiles(spark, root)

  /** Recursive parquet listing under `root` in `_metadata.file_path`'s
    * own rendering (qualified URI), hidden path segments excluded.
    *
    * Plain `listStatus` recursion, NOT `fs.listFiles(recursive)`: the
    * located-status iterator resolves block locations per entry, which
    * on the local (checksum) filesystem measured ~4 ms PER FILE — a
    * 32k-file table paid ~2.5 min per bloom prune on the iterator alone
    * (FileCountProbe, round 17). The listStatus walk is the same
    * traversal every other census here uses and costs microseconds per
    * entry; block locations are irrelevant to a name listing.
    */
  private[table] def listParquet(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    FsWalk.dataParquet(fs, p)
      .map(s => fs.makeQualified(s._1.getPath).toString)
  }

  private[table] def write(spark: SparkSession, tablePath: String,
      files: Seq[String]): Unit = {
    val p = file(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"clone manifest write failed: $p")
  }
}
