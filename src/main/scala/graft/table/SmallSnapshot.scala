package graft.table

import org.apache.spark.sql.DataFrame

/** Driver-side snapshot cache for SMALL, frozen artifact tables —
  * centroids, PQ codebooks, per-tag totals: parameter-bounded frames the
  * standing-index protocols re-read on every ingest/query. A plain
  * `table.read` costs a parquet listing + schema job per call, and every
  * `broadcast(read)` spawns its own collect job; snapshotting the rows
  * once per table VERSION turns all of those into a `LocalRelation` —
  * zero Spark jobs to scan, collect, or broadcast (LocalTableScan's
  * executeCollect is driver-side), which is where protocol-heavy
  * scenarios actually spend their wall (ProfileStanding: ~60–300 ms per
  * job × dozens of jobs on sub-kilobyte frames).
  *
  * Safety: the cache key is the table's file CENSUS
  * ([[MedallionTable.metaCensusHash]] — relative path × length of every
  * non-temporary file under the root, `_graft_meta` and DV sidecars
  * included), so any mutation that changes what `read` returns — append,
  * rewrite swap, DV delete, DDL overlay, an external direct-directory
  * write, even a mid-write partial state — changes the key and a stale
  * snapshot cannot be served. A table above `maxRows` is remembered as
  * oversize at that census and served the plain scan. Entries are
  * additionally keyed on the owning SparkSession (by session UUID, see
  * [[SessionCaches]]) so a snapshot never leaks across session restarts
  * (specs stop/start sessions), and the cache is LRU-bounded so dead
  * sessions' snapshots age out instead of accumulating.
  */
object SmallSnapshot {

  /** path+session -> (census hash, localized frame; null = oversize).
    * Session-UUID keyed and LRU-bounded ([[SessionCaches]]): stopped
    * sessions' snapshots age out, and a recycled identity hash can never
    * serve a stale frame to a new session.
    */
  private val cache = new BoundedLruCache[(Long, DataFrame)](256)

  private def key(t: MedallionTable): String =
    SessionCaches.token(t.spark) + "|" + t.path

  def read(table: MedallionTable, maxRows: Int = 65536): DataFrame = {
    val v = table.metaCensusHash()
    val k = key(table)
    cache.get(k) match {
      case Some((`v`, df)) if df != null => df
      case Some((`v`, _)) => table.read
      case _ =>
        val base = table.read
        val rows = base.limit(maxRows + 1).collect()
        if (rows.length > maxRows) {
          cache.put(k, (v, null))
          base
        } else {
          val local = table.spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), base.schema)
          cache.put(k, (v, local))
          local
        }
    }
  }

  /** Test hook. */
  private[graft] def clear(): Unit = cache.clear()
}
