package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: media (image/audio/video) as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * The Spark-side design is real and tested — schema, partition-friendly
  * batch shape (`mapPartitions` over a typed Dataset, one decoder init per
  * partition), deterministic outputs. The actual codec call is STUBBED
  * (`decodeStub`): no image/audio libraries ship in this container, so the
  * stub derives deterministic pseudo-features from the bytes. Swapping in a
  * real decoder changes only the function body marked STUB below.
  */
object MultimodalOps {

  /** An asset row: media payload + typed metadata. */
  case class Asset(
      asset_id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,            // images/video
      height: Int,
      sample_rate: Int)      // audio

  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      feat: Array[Float])    // fixed-size feature vector

  /** Builds a deterministic asset table from the documents fixture: the
    * text bytes stand in for media payloads (binary column is real; the
    * media inside it is fake). Kind cycles by id; dims derive from length.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        (length(col("text")) % 640 + 16).cast("int").as("width"),
        (length(col("text")) % 480 + 16).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sample_rate"))
      .as[Asset]
  }

  /** Batch decode + feature extraction: `mapPartitions` so a real decoder
    * would be initialized once per partition (the pandas-UDF batch shape,
    * in Scala). Deterministic given identical input partitioning.
    */
  def extractFeatures(assets: Dataset[Asset], featDim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // STUB: real impl would init the codec here (once per partition).
      it.map { a =>
        val checksum = a.content.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
        val feat = Array.tabulate(featDim) { i =>
          // STUB: deterministic pseudo-feature in place of a model/codec.
          ((checksum >>> (i * 8)) & 0xff).toFloat / 255f
        }
        AssetFeatures(a.asset_id, a.kind, a.content.length, checksum, feat)
      }
    }
  }

  /** Resize plumbing: recomputes metadata; payload transform is STUBBED as
    * identity (a real impl would re-encode pixels).
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.map(a => if (a.kind == "audio") a else a.copy(width = w, height = h))
  }

  /** Frame sampling for "video" assets: every `stride`-th byte window
    * becomes a frame payload (STUB for real frame extraction; the
    * explode/row-per-frame shape is the real part).
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.content.grouped(stride).zipWithIndex.map { case (frame, idx) =>
        (a.asset_id, idx, frame)
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }
}
