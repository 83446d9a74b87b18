package graft.ops

import graft.SparkSpec
import graft.dedup.StandingDedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based property check for tag compaction: across random
  * interleavings of ingest / compactThrough / archived-and-recent tag
  * replays, check() must always agree with a tag-blind driver-side model
  * of the ingested corpus (compaction and replays are invisible to
  * dedup semantics), and replays must never grow the index.
  */
class TagArchivePropertySpec extends SparkSpec {
  import spark.implicits._

  private def oneBand(docs: DataFrame): DataFrame =
    docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), lit(0).as("band_idx"), md5(col("text")).as("band_key"))

  test("random ingest/compact/replay sequences match the tag-blind model") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val idx = new StandingDedupIndex(spark, tmpDir(s"sdi_prop_$seed"), oneBand)
      // model: every (doc_id, text) ever ingested, and the per-tag batches
      val model = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val batches = scala.collection.mutable.Map.empty[Long, Seq[(Long, String)]]
      var nextTag = 1L
      var nextId = 0L
      val stems = Vector("alpha", "beta", "gamma", "delta")

      for (_ <- 0 until 10) {
        rnd.nextInt(4) match {
          case 0 | 1 => // ingest a fresh batch (texts repeat across batches)
            val batch = (0 until 1 + rnd.nextInt(4)).map { _ =>
              val t = s"${stems(rnd.nextInt(stems.size))} body"
              val row = (nextId, t); nextId += 1; row
            }
            batches(nextTag) = batch
            model ++= batch
            idx.ingest(batch.toDF("doc_id", "text"), tag = nextTag)
            nextTag += 1
          case 2 if nextTag > 1 => // compact through a random existing tag
            idx.compactThrough(1L + rnd.nextInt((nextTag - 1).toInt))
          case _ if batches.nonEmpty =>
            // replay a random past tag. The contract is ASYMMETRIC by
            // design: an ARCHIVED tag is a strict no-op (watermark); a
            // recent tag re-appends duplicate rows, which the index
            // tolerates (membership joins + DISTINCT candidates) — the
            // model comparison below proves check() can't tell.
            val (tag, batch) = batches.toSeq(rnd.nextInt(batches.size))
            val wm = graft.table.TagArchive.watermark(
              spark, idx.indexTable.path.split('/').dropRight(1).mkString("/"))
            val before = idx.indexTable.read.count()
            idx.ingest(batch.toDF("doc_id", "text"), tag = tag)
            if (tag <= wm)
              assert(idx.indexTable.read.count() == before,
                s"seed=$seed: archived-tag $tag replay grew the index")
          case _ => ()
        }
      }

      // probe with one known text and one fresh text; expected values come
      // from the tag-blind model only
      val probe = Seq((900000L, s"${stems(0)} body"), (900001L, "zeta fresh"))
      val got = idx.check(probe.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
      probe.foreach { case (id, text) =>
        val dups = model.count(_._2 == text).toLong
        val expected = (dups > 0, dups) // oneBand: same text ⇒ same band key
        assert(got(id) == expected,
          s"seed=$seed: doc $id got ${got(id)}, model says $expected")
      }
    }
  }
}
