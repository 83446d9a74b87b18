package graft.ops

import graft.SparkSpec
import graft.dedup.StandingDedupIndex
import graft.similarity.StandingAnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tag compaction for the standing indexes: folding old batch_tag
  * partitions into the archive keeps check()/queryPq() results
  * content-identical while collapsing the directory layout, and the
  * watermark preserves replay idempotence for tags whose partitions no
  * longer exist.
  */
class StandingIndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def oneBand(docs: DataFrame): DataFrame =
    docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))

  private def docs(ids: Range, stem: String) =
    ids.map(i => (i.toLong, s"$stem $i")).toDF("doc_id", "text")

  test("dedup compaction folds tag dirs, keeps check() identical, keeps replay no-op") {
    val idx = new StandingDedupIndex(spark, tmpDir("sdi_compact"), oneBand)
    (1 to 5).foreach(t => idx.ingest(docs(t * 10 until t * 10 + 3, "w"), tag = t))
    val probe = docs(10 until 11, "w").unionByName(docs(900 until 901, "x"))
    val before = idx.check(probe).collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet

    val dirsBefore = idx.indexTable.read.inputFiles.map(_.split('/').dropRight(1).last).distinct
    assert(dirsBefore.length == 5)
    idx.compactThrough(3)
    val dirs = idx.indexTable.read.inputFiles.map(_.split('/').dropRight(1).last).distinct.sorted
    assert(dirs.toSet == Set("batch_tag=-1", "batch_tag=4", "batch_tag=5"), dirs.mkString(","))

    // content-identical check after compaction
    val after = idx.check(probe).collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    assert(after == before)

    // a replayed ARCHIVED tag is still a no-op (watermark, not partition probe)
    val n = idx.indexTable.read.count()
    idx.ingest(docs(20 until 23, "w"), tag = 2L)
    assert(idx.indexTable.read.count() == n, "archived-tag replay must not re-append")
    // a NEW tag still ingests (2 docs = 2 hash rows + 2 band rows in the
    // unified layout)
    idx.ingest(docs(60 until 62, "w"), tag = 6L)
    assert(idx.indexTable.read.count() == n + 4)

    // excludeTag replay is only valid above the watermark
    intercept[IllegalArgumentException] { idx.check(probe, excludeTag = Some(2L)).collect() }
    idx.check(probe, excludeTag = Some(6L)).collect() // fine

    // compaction is idempotent-convergent: re-running through the same
    // watermark leaves the same live layout
    idx.compactThrough(3)
    val dirs2 = idx.indexTable.read.inputFiles.map(_.split('/').dropRight(1).last).distinct.sorted
    assert(dirs2.toSet == Set("batch_tag=-1", "batch_tag=4", "batch_tag=5", "batch_tag=6"))
  }

  test("PQ code compaction keeps ADC results identical and replay no-op") {
    def emb(ids: Range) = {
      ids.map { i =>
        val rnd = new scala.util.Random(i)
        (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
    }
    val idx = new StandingAnnIndex(spark, tmpDir("ann_compact"))
    idx.trainPq(emb(0 until 60), m = 4, kCent = 8)
    (1 to 3).foreach(t => idx.ingestPq(emb(t * 100 until t * 100 + 20), tag = t))
    val queries = emb(0 until 4)
    val before = idx.queryPq(queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    idx.compactCodesThrough(2)
    val dirs = idx.codeTable.read.inputFiles.map(_.split('/').dropRight(1).last).distinct.sorted
    assert(dirs.toSet == Set("batch_tag=-1", "batch_tag=3"), dirs.mkString(","))
    val after = idx.queryPq(queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(after == before)

    val n = idx.codeTable.read.count()
    idx.ingestPq(emb(100 until 120), tag = 1L) // archived tag replay
    assert(idx.codeTable.read.count() == n)
  }
}
