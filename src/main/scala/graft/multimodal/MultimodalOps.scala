package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: media (image/audio/video) as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * Image and audio are REAL end-to-end using JDK-only codecs: image
  * payloads are well-formed 24-bit BMP files decoded with
  * `javax.imageio.ImageIO`, audio payloads are PCM-16 WAV files decoded
  * with `javax.sound.sampled.AudioSystem`, and features are computed from
  * the decoded pixels/samples. Only the VIDEO codec is STUBBED (no
  * container/codec library ships in this environment, and the JDK has
  * none): video features derive from a byte checksum, clearly marked
  * below. Swapping in a real video decoder changes only that branch.
  *
  * Scale shape: all per-asset work runs inside `mapPartitions` over a
  * typed Dataset — decoder state is partition-local, payloads never
  * leave the executor, and the operators compose with any upstream
  * partitioning. No driver-side collects anywhere.
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

  /** Minimal 24-bit uncompressed BMP writer (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes) — the format
    * `ImageIO.read` decodes out of the box. `pix(x, y, c)` returns channel
    * c (0=R,1=G,2=B) of the logical top-down pixel grid, 0-255.
    */
  object Bmp {
    def rowSize(w: Int): Int = (3 * w + 3) / 4 * 4

    def encode(w: Int, h: Int, pix: (Int, Int, Int) => Int): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val rs = rowSize(w)
      val dataSize = rs * h
      val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putShort(0).putShort(0).putInt(54)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
        .putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var fy = 0
      while (fy < h) {
        val y = h - 1 - fy // file rows are bottom-up
        var x = 0
        while (x < w) {
          buf.put(pix(x, y, 2).toByte).put(pix(x, y, 1).toByte)
            .put(pix(x, y, 0).toByte)
          x += 1
        }
        var p = 3 * w
        while (p < rs) { buf.put(0.toByte); p += 1 }
        fy += 1
      }
      buf.array()
    }
  }

  /** Minimal PCM-16 mono WAV writer (RIFF/WAVE, fmt + data chunks) — the
    * format `AudioSystem.getAudioInputStream` decodes out of the box.
    */
  object Wav {
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val dataSize = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
        .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }
  }

  /** Image dims for the synthetic assets — kept small so the real pixel
    * payload stays a few KB per row (w ≤ 55, h ≤ 39).
    */
  def imageDims(nBytes: Int): (Int, Int) =
    (nBytes % 48 + 8, nBytes % 32 + 8)

  /** Builds a deterministic asset table from the documents fixture. The
    * payloads are REAL media containers built from the text bytes:
    * image → 24-bit BMP whose pixel stream cycles the UTF-8 bytes
    * (channel c of pixel (x,y) = byte[(y·w·3 + x·3 + c) mod n]);
    * audio → PCM-16 WAV with one centered sample per byte; video → the
    * raw bytes (stand-in payload for the stubbed codec). Kind cycles by
    * id; every derivation is reproducible from `text` alone, which is
    * what lets the decode path be oracle-checked cross-engine.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val tb0 = text.getBytes("UTF-8")
        val tb = if (tb0.isEmpty) Array[Byte](0) else tb0
        val n = tb.length
        (id % 3) match {
          case 0 =>
            val (w, h) = imageDims(tb0.length)
            val content = Bmp.encode(w, h,
              (x, y, c) => tb((y * w * 3 + x * 3 + c) % n) & 0xff)
            Asset(id, "image", content, w, h, 0)
          case 1 =>
            val samples =
              Array.tabulate(tb0.length)(i => (((tb0(i) & 0xff) - 128) * 256).toShort)
            Asset(id, "audio", Wav.encode(16000, samples),
              tb0.length % 640 + 16, tb0.length % 480 + 16, 16000)
          case _ =>
            Asset(id, "video", tb0,
              tb0.length % 640 + 16, tb0.length % 480 + 16, 0)
        }
    }
  }

  /** Batch decode + feature extraction inside `mapPartitions` (decoder
    * state per partition, payloads stay on the executor). Image and audio
    * features come from REALLY decoding the payload (ImageIO pixels /
    * AudioSystem PCM samples); video features are a byte-checksum STUB —
    * the one codec the JDK cannot supply.
    */
  def extractFeatures(assets: Dataset[Asset], featDim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val checksum = a.content.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
        // Fallback for the stubbed video codec AND for undecodable
        // payloads (ImageIO.read returns null on corrupt bytes — one bad
        // row must degrade, not NPE the task and, at scale, the job).
        def pseudo: Array[Float] =
          Array.tabulate(6)(i => ((checksum >>> (i * 8)) & 0xff).toFloat / 255f)
        val raw: Array[Float] = a.kind match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.content))
            if (img == null) pseudo
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val np = (w.toLong * h).toFloat
              Array(w / 1024f, h / 1024f, sr / np / 255f, sg / np / 255f,
                sb / np / 255f, (sr + sg + sb) / (3f * np) / 255f)
            }
          case "audio" =>
            // Degrade-not-fail, like the image branch's null check: one
            // corrupt payload must yield pseudo-features, not throw
            // (UnsupportedAudioFileException/IOException) and fail the
            // task — and at scale the job — wholesale.
            val in =
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(a.content))
              catch { case scala.util.control.NonFatal(_) => null }
            if (in == null) pseudo
            else try {
              val fmt = in.getFormat
              val bytes = in.readAllBytes()
              val ns = bytes.length / 2
              var sum = 0L; var sumSq = 0.0
              var i = 0
              while (i < ns) {
                val s = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
                sum += s; sumSq += s.toDouble * s
                i += 1
              }
              val mean = if (ns > 0) (sum.toDouble / ns).toFloat else 0f
              val rms = if (ns > 0) math.sqrt(sumSq / ns).toFloat else 0f
              Array(fmt.getSampleRate / 48000f, ns / 1e6f,
                mean / 32768f, rms / 32768f)
            } catch {
              case scala.util.control.NonFatal(_) => pseudo
            } finally in.close()
          case _ =>
            // STUB: no video codec in the JDK — deterministic
            // pseudo-features from the payload checksum.
            Array.tabulate(6)(i => ((checksum >>> (i * 8)) & 0xff).toFloat / 255f)
        }
        val feat = Array.tabulate(featDim)(i => if (i < raw.length) raw(i) else 0f)
        AssetFeatures(a.asset_id, a.kind, a.content.length, checksum, feat)
      }
    }
  }

  /** Decode-verification projection for image assets: ImageIO-decoded
    * dimensions plus the EXACT integer sum of all channel values — the
    * quantity a SQL oracle can recompute from the source text bytes, so a
    * wrong header, stride, padding, or channel order shows up as a
    * cross-engine mismatch.
    */
  def decodeImageStats(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.content))
        if (img == null) (a.asset_id, -1, -1, -1L) // corrupt payload: flag, don't NPE
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk fetch
          var s = 0L
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          (a.asset_id, w, h, s)
        }
      }
    }.toDF("asset_id", "dec_w", "dec_h", "px_sum")
  }

  /** Resize: REAL for images — decode, rescale with Graphics2D, re-encode
    * as BMP. Audio passes through untouched; video updates metadata only
    * (payload re-encode needs the stubbed codec).
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.kind match {
          case "audio" => a
          case "image" =>
            val src = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.content))
            if (src == null) a.copy(width = w, height = h) // corrupt: metadata only
            else {
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
              val g = dst.createGraphics()
              try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
              val px = dst.getRGB(0, 0, w, h, null, 0, w) // one bulk fetch
              val content = Bmp.encode(w, h,
                (x, y, c) => (px(y * w + x) >> (16 - 8 * c)) & 0xff)
              a.copy(content = content, width = w, height = h)
            }
          case _ => a.copy(width = w, height = h)
        }
      }
    }
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
