package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset columns: media (image/audio/video) as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * Image, audio AND video are REAL end-to-end using JDK-only codecs:
  * image payloads are well-formed 24-bit BMP files decoded with
  * `javax.imageio.ImageIO`, audio payloads are PCM-16 WAV files decoded
  * with `javax.sound.sampled.AudioSystem`, video payloads are GMJB
  * containers (MJPEG-shaped: length-prefixed intra-coded frames, see
  * [[Mjb]]) whose BMP frames decode through ImageIO — features, frame
  * extraction and resize all operate on the decoded pixels/samples.
  * Every decode path degrades (pseudo-features / flagged rows) on corrupt
  * payloads rather than failing the task.
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

  /** Minimal motion-BMP video container ("GMJB"): 4-byte magic + u32-LE
    * frame count + per-frame u32-LE length-prefixed BMP payloads — the
    * MJPEG shape (independent intra-coded frames in a trivial container)
    * with a lossless JDK-decodable frame codec, so video decode is REAL
    * (ImageIO per frame) and oracle-checkable like the still-image path
    * (exact pixel sums recomputable from the source bytes).
    */
  object Mjb {
    private val Magic = Array[Byte]('G', 'M', 'J', 'B')

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val buf = ByteBuffer.allocate(8 + frames.map(4 + _.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(Magic).putInt(frames.length)
      frames.foreach(f => buf.putInt(f.length).put(f))
      buf.array()
    }

    /** None on anything that does not parse as a well-formed container —
      * callers degrade (pseudo-features / byte-window framing), never throw.
      */
    def frames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
      import java.nio.{ByteBuffer, ByteOrder}
      if (bytes.length < 8 || !Magic.indices.forall(i => bytes(i) == Magic(i)))
        return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      buf.position(4)
      val n = buf.getInt
      if (n < 0 || n > (1 << 20)) return None
      val out = Seq.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        if (buf.remaining() < 4) return None
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        val f = new Array[Byte](len)
        buf.get(f)
        out += f
        i += 1
      }
      Some(out.result())
    }
  }

  /** Image dims for the synthetic assets — kept small so the real pixel
    * payload stays a few KB per row (w ≤ 55, h ≤ 39).
    */
  def imageDims(nBytes: Int): (Int, Int) =
    (nBytes % 48 + 8, nBytes % 32 + 8)

  /** Video frame dims / count / per-frame byte offset for the synthetic
    * assets (smaller than stills — nFrames of them per asset). All three
    * derive from the text byte length alone so the oracle can recompute
    * the full pixel stream.
    */
  def videoDims(nBytes: Int): (Int, Int) = (nBytes % 24 + 8, nBytes % 16 + 8)
  def videoFrameCount(nBytes: Int): Int = nBytes % 3 + 2
  val VideoFrameByteStep = 31

  /** Builds a deterministic asset table from the documents fixture. The
    * payloads are REAL media containers built from the text bytes:
    * image → 24-bit BMP whose pixel stream cycles the UTF-8 bytes
    * (channel c of pixel (x,y) = byte[(y·w·3 + x·3 + c) mod n]);
    * audio → PCM-16 WAV with one centered sample per byte; video → a
    * GMJB container of nFrames BMP frames whose pixel streams cycle the
    * bytes with a per-frame offset (frame f starts at byte f·31). Kind
    * cycles by id; every derivation is reproducible from `text` alone,
    * which is what lets the decode paths be oracle-checked cross-engine.
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
            val (w, h) = videoDims(tb0.length)
            val nf = videoFrameCount(tb0.length)
            val frames = (0 until nf).map(f => Bmp.encode(w, h, (x, y, c) =>
              tb((f * VideoFrameByteStep + y * w * 3 + x * 3 + c) % n) & 0xff))
            Asset(id, "video", Mjb.encode(frames), w, h, 0)
        }
    }
  }

  /** Uniform volume change on a PCM-16 WAV payload: every sample halves
    * in place (EXACT for [[assetsFromDocuments]]' synth, whose samples
    * are 256-aligned — no rounding noise), header untouched. This is the
    * gain-shift re-encode class [[decodeAudioFPrint]] is invariant under
    * by design (adjacent-window energy COMPARISON, not magnitude); the
    * dedup queries plant copies through it so a fingerprint that secretly
    * depended on absolute energy would break the oracle.
    */
  def wavHalfGain(content: Array[Byte]): Array[Byte] = {
    val out = content.clone()
    var i = 44 // RIFF/fmt/data header
    while (i + 1 < out.length) {
      val s = ((((out(i + 1) & 0xff) << 8) | (out(i) & 0xff)).toShort / 2).toShort
      out(i) = (s & 0xff).toByte
      out(i + 1) = ((s >> 8) & 0xff).toByte
      i += 2
    }
    out
  }

  /** Re-container a GMJB video: the same frames, repacked in reverse
    * order — the container-level edit [[decodeVideoFPrint]]'s per-bit
    * majority vote ignores by design. Undecodable payloads pass through
    * (the decode path drops them, never fails).
    */
  def mjbRecontainReversed(content: Array[Byte]): Array[Byte] =
    Mjb.frames(content).map(f => Mjb.encode(f.reverse)).getOrElse(content)

  /** Decoded PCM-16 stats (sampleRate, nSamples, sampleSum, sampleSqSum);
    * None when the payload does not parse as a supported audio container —
    * the ONE audio decode loop shared by feature extraction and the
    * decode-verification projection, so a codec fix cannot diverge them.
    */
  private def decodePcm16(content: Array[Byte]): Option[(Float, Int, Long, Long)] = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) None
    else try {
      val rate = in.getFormat.getSampleRate
      val bytes = in.readAllBytes()
      val ns = bytes.length / 2
      var sum = 0L; var sumSq = 0L
      var i = 0
      while (i < ns) {
        val s = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
        sum += s; sumSq += s.toLong * s
        i += 1
      }
      Some((rate, ns, sum, sumSq))
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally in.close()
  }

  /** 64-bit perceptual difference-hash (dHash) from DECODED pixels: gray
    * = r+g+b over the top-left 9×8 window; bit (y·8 + x) = 1 iff
    * gray(x+1, y) > gray(x, y). Comparing ADJACENT pixels makes the hash
    * invariant under uniform brightness shifts — the canonical
    * perceptual-duplicate class — while any structural edit flips bits.
    * One narrow decode map (no shuffle); images smaller than 9×8 or
    * undecodable payloads are dropped, not failed (degrade-not-fail).
    */
  def decodeImagePHash(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.content))
        dHash64(img).map((a.asset_id, _))
      }
    }.toDF("asset_id", "phash")
  }

  /** The dHash core shared by the still-image and per-video-frame paths;
    * None when the image is null (undecodable) or below the 9×8 window.
    */
  private def dHash64(img: java.awt.image.BufferedImage): Option[Long] = {
    if (img == null || img.getWidth < 9 || img.getHeight < 8) None
    else {
      val px = img.getRGB(0, 0, 9, 8, null, 0, 9)
      def gray(x: Int, y: Int): Int = {
        val rgb = px(y * 9 + x)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(hash)
    }
  }

  /** 64-bit video fingerprint: every GMJB frame dHashes ([[dHash64]]) and
    * bit b of the fingerprint is the MAJORITY vote of the frames' bit b —
    * invariant under frame REORDERING (the vote is order-free) and under
    * per-frame brightness shifts (inherited from dHash), while splicing
    * in different frames flips bits. Undecodable containers, frames, or
    * sub-9×8 frames drop the asset, never fail the task.
    */
  def decodeVideoFPrint(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        decodeVideoFrames(a.content).flatMap { frames =>
          val hs = frames.map(dHash64)
          if (hs.exists(_.isEmpty)) None
          else {
            val hashes = hs.map(_.get)
            var fp = 0L
            var b = 0
            while (b < 64) {
              val votes = hashes.count(h => (h & (1L << b)) != 0)
              if (votes * 2 > hashes.length) fp |= 1L << b
              b += 1
            }
            Some((a.asset_id, fp))
          }
        }
      }
    }.toDF("asset_id", "vfp")
  }

  /** 64-bit acoustic fingerprint from DECODED samples (chromaprint-lite):
    * the sample stream splits into 65 equal windows, window energy =
    * Σ s², and bit j = 1 iff energy(j+1) > energy(j). Comparing ADJACENT
    * window energies makes the fingerprint invariant under uniform volume
    * change (every energy scales by the same factor) — the acoustic
    * analog of the dHash brightness-shift class — while structural edits
    * (cuts, re-orders) flip bits. Streams shorter than 65 samples or
    * undecodable payloads drop, never fail.
    */
  def decodeAudioFPrint(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (in == null) None
        else try {
          val bytes = in.readAllBytes()
          val ns = bytes.length / 2
          val w = ns / 65
          if (w < 1) None
          else {
            val energy = new Array[Long](65)
            var j = 0
            while (j < 65) {
              var e = 0L
              var i = j * w
              val end = i + w
              while (i < end) {
                val s = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
                e += s.toLong * s
                i += 1
              }
              energy(j) = e
              j += 1
            }
            var hash = 0L
            j = 0
            while (j < 64) {
              if (energy(j + 1) > energy(j)) hash |= 1L << j
              j += 1
            }
            Some((a.asset_id, hash))
          }
        } catch {
          case scala.util.control.NonFatal(_) => None
        } finally in.close()
      }
    }.toDF("asset_id", "afp")
  }

  /** Exact per-channel sums over one decoded image (single bulk getRGB). */
  private def rgbChannelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      i += 1
    }
    (sr, sg, sb)
  }

  /** Every GMJB frame ImageIO-decoded; None unless the container parses
    * AND all frames decode — the one video decode path shared by feature
    * extraction and the decode-verification projection.
    */
  private def decodeVideoFrames(content: Array[Byte]): Option[Seq[java.awt.image.BufferedImage]] =
    Mjb.frames(content).filter(_.nonEmpty).flatMap { fbs =>
      val imgs = fbs.map(fb => javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fb)))
      if (imgs.exists(_ == null)) None else Some(imgs)
    }

  /** Batch decode + feature extraction inside `mapPartitions` (decoder
    * state per partition, payloads stay on the executor). All three kinds
    * come from REALLY decoding the payload (ImageIO pixels / AudioSystem
    * PCM samples / ImageIO over every GMJB video frame); an undecodable
    * payload of any kind degrades to checksum pseudo-features — one bad
    * row must never fail the task (and at scale the job).
    */
  def extractFeatures(assets: Dataset[Asset], featDim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val checksum = a.content.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
        def pseudo: Array[Float] =
          Array.tabulate(6)(i => ((checksum >>> (i * 8)) & 0xff).toFloat / 255f)
        val raw: Array[Float] = a.kind match {
          case "image" =>
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(a.content))) match {
              case None => pseudo
              case Some(img) =>
                val (w, h) = (img.getWidth, img.getHeight)
                val (sr, sg, sb) = rgbChannelSums(img)
                val np = (w.toLong * h).toFloat
                Array(w / 1024f, h / 1024f, sr / np / 255f, sg / np / 255f,
                  sb / np / 255f, (sr + sg + sb) / (3f * np) / 255f)
            }
          case "audio" =>
            decodePcm16(a.content) match {
              case None => pseudo
              case Some((rate, ns, sum, sumSq)) =>
                val mean = if (ns > 0) (sum.toDouble / ns).toFloat else 0f
                val rms = if (ns > 0) math.sqrt(sumSq.toDouble / ns).toFloat else 0f
                Array(rate / 48000f, ns / 1e6f, mean / 32768f, rms / 32768f)
            }
          case _ =>
            decodeVideoFrames(a.content) match {
              case None => pseudo
              case Some(imgs) =>
                val (w, h) = (imgs.head.getWidth, imgs.head.getHeight)
                val sums = imgs.map(rgbChannelSums)
                val (sr, sg, sb) = (sums.map(_._1).sum, sums.map(_._2).sum, sums.map(_._3).sum)
                val np = imgs.map(img => img.getWidth.toLong * img.getHeight).sum.toFloat
                Array(imgs.length / 16f, w / 1024f, h / 1024f,
                  sr / np / 255f, sg / np / 255f, sb / np / 255f)
            }
        }
        val feat = Array.tabulate(featDim)(i => if (i < raw.length) raw(i) else 0f)
        AssetFeatures(a.asset_id, a.kind, a.content.length, checksum, feat)
      }
    }
  }

  /** Integer decode components the float feature vector derives from,
    * kind-dependent layout (padded with 0, -1s on an undecodable payload):
    * image (w, h, sumR, sumG, sumB, 0); audio (nSamples, sampleSum,
    * sampleSqSum, 0, 0, 0); video (nFrames, w, h, sumR, sumG, sumB).
    * Shares the single per-kind decode helpers with [[extractFeatures]],
    * so the two cannot diverge on what was decoded.
    */
  private def decodeComponents(a: Asset): Option[Array[Long]] = a.kind match {
    case "image" =>
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.content))).map { img =>
        val (sr, sg, sb) = rgbChannelSums(img)
        Array(img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb, 0L)
      }
    case "audio" =>
      decodePcm16(a.content).map { case (_, ns, sum, sumSq) =>
        Array(ns.toLong, sum, sumSq, 0L, 0L, 0L)
      }
    case _ =>
      decodeVideoFrames(a.content).map { imgs =>
        val sums = imgs.map(rgbChannelSums)
        Array(imgs.length.toLong, imgs.head.getWidth.toLong,
          imgs.head.getHeight.toLong,
          sums.map(_._1).sum, sums.map(_._2).sum, sums.map(_._3).sum)
      }
  }

  /** Feature extraction's oracle-checkable core: the EXACT integer
    * components ([[decodeComponents]]) each float feature is a row-local
    * constant-divisor function of — per-channel pixel sums, PCM sample
    * moments, decoded dims, frame counts. Emitting the integers instead
    * of the floats is what makes the cross-engine hash-match possible
    * (IEEE float division order differs across engines; the integers
    * don't), while still proving the full decode → reduce pipeline.
    * Undecodable payloads flag with -1s (degrade-not-fail).
    */
  def featureComponents(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val c = decodeComponents(a).getOrElse(Array.fill(6)(-1L))
        (a.asset_id, a.kind, a.content.length, c(0), c(1), c(2), c(3), c(4), c(5))
      }
    }.toDF("asset_id", "kind", "n_bytes", "c1", "c2", "c3", "c4", "c5", "c6")
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
          val (sr, sg, sb) = rgbChannelSums(img)
          (a.asset_id, img.getWidth, img.getHeight, sr + sg + sb)
        }
      }
    }.toDF("asset_id", "dec_w", "dec_h", "px_sum")
  }

  /** Rescale one decodable BMP payload to w×h (Graphics2D), None when the
    * payload does not decode.
    */
  private def rescaleBmp(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (src == null) None
    else {
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
      val px = dst.getRGB(0, 0, w, h, null, 0, w) // one bulk fetch
      Some(Bmp.encode(w, h, (x, y, c) => (px(y * w + x) >> (16 - 8 * c)) & 0xff))
    }
  }

  /** Resize: REAL for images AND video — decode, rescale with Graphics2D,
    * re-encode (BMP still / GMJB per frame). Audio passes through
    * untouched; corrupt payloads update metadata only (degrade-not-fail).
    */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.kind match {
          case "audio" => a
          case "image" =>
            rescaleBmp(a.content, w, h) match {
              case Some(content) => a.copy(content = content, width = w, height = h)
              case None => a.copy(width = w, height = h) // corrupt: metadata only
            }
          case _ =>
            Mjb.frames(a.content).map(_.map(rescaleBmp(_, w, h))) match {
              case Some(rs) if rs.forall(_.isDefined) =>
                a.copy(content = Mjb.encode(rs.map(_.get)), width = w, height = h)
              case _ => a.copy(width = w, height = h) // corrupt: metadata only
            }
        }
      }
    }
  }

  /** Frame extraction for "video" assets: one row per REAL container frame
    * (the BMP payload, independently decodable downstream). Payloads that
    * do not parse as GMJB degrade to `stride`-byte windows — a row per
    * chunk, never a task failure.
    */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      Mjb.frames(a.content) match {
        case Some(fbs) =>
          fbs.zipWithIndex.map { case (frame, idx) => (a.asset_id, idx, frame) }
        case None =>
          a.content.grouped(stride).zipWithIndex.map { case (frame, idx) =>
            (a.asset_id, idx, frame)
          }.toSeq
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }

  /** Decode-verification projection for audio assets: AudioSystem-decoded
    * PCM-16 sample count plus the EXACT integer sum and sum-of-squares of
    * all samples — both recomputable by a SQL oracle from the source text
    * bytes (sample i = (byte_i - 128)·256), so a header, byte-order, or
    * sample-width bug shows up as a cross-engine mismatch. Corrupt
    * payloads flag with -1s instead of throwing.
    */
  def decodeAudioStats(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        decodePcm16(a.content) match {
          case Some((_, ns, sum, sumSq)) => (a.asset_id, ns.toLong, sum, sumSq)
          case None => (a.asset_id, -1L, -1L, -1L)
        }
      }
    }.toDF("asset_id", "n_samples", "sample_sum", "sample_sq_sum")
  }

  /** Decode-verification projection for video assets (the [[decodeImageStats]]
    * recipe lifted to the GMJB container): decoded frame count + frame dims
    * + the EXACT integer sum of all channel values over ALL frames — the
    * quantity a SQL oracle recomputes straight from the source text bytes,
    * so a container, header, stride, padding, channel-order or per-frame
    * offset bug shows up as a cross-engine mismatch. Corrupt payloads flag
    * with -1s instead of throwing.
    */
  def decodeVideoStats(assets: Dataset[Asset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.map { a =>
        decodeVideoFrames(a.content) match {
          case Some(imgs) =>
            val s = imgs.map { img =>
              val (sr, sg, sb) = rgbChannelSums(img); sr + sg + sb
            }.sum
            (a.asset_id, imgs.length, imgs.head.getWidth, imgs.head.getHeight, s)
          case None => (a.asset_id, -1, -1, -1, -1L)
        }
      }
    }.toDF("asset_id", "n_frames", "dec_w", "dec_h", "px_sum")
  }
}
