package graft.ops

import graft.SparkSpec
import graft.functions.Geo
import graft.dedup.{MinHash, SimHash}
import graft.similarity.{Ann, Similarity}
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  test("haversine matches known great-circle distances") {
    import spark.implicits._
    val df = Seq(
      ("paris_london", 48.8566, 2.3522, 51.5074, -0.1278, 343.5),
      ("equator_degree", 0.0, 0.0, 0.0, 1.0, 111.19),
      ("same_point", 10.0, 20.0, 10.0, 20.0, 0.0)
    ).toDF("name", "lat1", "lon1", "lat2", "lon2", "expected")
    val got = df.withColumn("d",
      Geo.haversineKm($"lat1", $"lon1", $"lat2", $"lon2"))
      .select("name", "d", "expected").collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1.0,
        s"${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }
}

class MinHashSpec extends SparkSpec {
  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"

  test("near-duplicates found via banded LSH, unrelated docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "sleepy")), // near-dup of 1
      (3L, "completely different words about spark catalyst optimizer plans and shuffles everywhere today"),
      (4L, base) // exact dup of 1
    ).toDF("doc_id", "text")
    val pairs = MinHash.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near dup should share a band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
  }

  test("jaccard is exact on known shingle sets") {
    import spark.implicits._
    val df = Seq((base, base)).toDF("a", "b")
      .select(MinHash.jaccard(MinHash.shingles(col("a")), MinHash.shingles(col("b"))).as("j"))
    assert(df.head().getDouble(0) == 1.0)
  }
}

class SimHashSpec extends SparkSpec {
  test("identical text → hamming 0; banded join finds exact dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "unrelated content entirely different tokens everywhere")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash is deterministic and near-dups have small hamming") {
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq((1L, t1), (2L, t1.replace("river", "ocean"))).toDF("doc_id", "text")
    val sims = SimHash.withSimhash(docs, "text").select("doc_id", "sim")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = SimHash.withSimhash(docs, "text").select("doc_id", "sim")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims == again)
    val ham = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    assert(ham <= 16, s"near-dup hamming too large: $ham")
  }
}

class AnnSpec extends SparkSpec {
  test("LSH ANN achieves high recall on clustered vectors") {
    import spark.implicits._
    // 20 tight clusters of 20 vectors each, dim 16
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = for (c <- 0 until 20; i <- 0 until 20) yield {
      val id = c * 20 + i
      val jitter = new scala.util.Random(id)
      (id.toLong, centers(c).map(x => x + 0.05f * jitter.nextGaussian().toFloat).toSeq, c)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") < 20
    val exact = Similarity.bruteForceTopK(emb, pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.topK(emb, pred, 5, numPlanes = 16, bands = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall too low: $recall")
  }

  test("brute force and ANN never cross-join the corpus with itself at plan level") {
    import spark.implicits._
    val emb = (0 until 50).map(i =>
      (i.toLong, Seq.fill(8)(((i * 31) % 7 - 3).toFloat), i % 3)).toDF("vec_id", "embedding", "label")
    val plan = Ann.topK(emb, col("vec_id") < 3, 2, numPlanes = 8, bands = 4, dim = 8)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cross"), s"ANN plan contains a cross join:\n$plan")
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import graft.dedup.ConnectedComponents

  test("transitive chains merge into one component; isolated vertices survive") {
    import spark.implicits._
    // chain 1-2-3 (1~3 never emitted as a pair), pair 5-4, singleton 9
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 4L)).toDF("id_a", "id_b")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val got = ConnectedComponents.components(edges, "id_a", "id_b", Some(verts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("long path converges and labels everything with the global min") {
    import spark.implicits._
    // 0-1-2-...-19: diameter 19 exercises the iteration loop + checkpoints
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.components(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 20 && got.forall(_._2 == 0L))
  }

  test("clusters summarizes keeper and member counts") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val labels = ConnectedComponents.components(edges, "a", "b",
      Some(Seq(1L, 2L, 3L, 7L).toDF("id")))
    val cl = ConnectedComponents.clusters(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cl == Set((1L, 3L, 3L), (7L, 1L, 7L)))
  }

  test("checkpoint release touches only its own RDDs, never foreign cached state") {
    import spark.implicits._
    val sc = spark.sparkContext
    // A FOREIGN lazy local checkpoint (another job's state on the shared
    // context). Ownership must come from each frame's own LogicalRDD leaf —
    // a getPersistentRDDs diff around ckpt() could capture this one and
    // unpersist it out from under its owner (round-5 review finding).
    val foreign = spark.range(1000).toDF("x").localCheckpoint(false)
    assert(foreign.count() == 1000)
    val foreignIds = foreign.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
    assert(foreignIds.nonEmpty, "test setup: foreign checkpoint not registered")
    val persistedBefore = sc.getPersistentRDDs.keySet.toSet

    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = ConnectedComponents.components(edges, "a", "b")
    assert(labels.count() == 20)

    // The foreign checkpoint survived the run's release passes...
    assert(foreignIds.subsetOf(sc.getPersistentRDDs.keySet.toSet),
      "components() unpersisted a foreign job's checkpoint")
    assert(foreign.count() == 1000)
    // ...and the run left no orphans beyond its own final labels: every
    // newly-persisted RDD is reachable from the returned frame's plan.
    val labelIds = labels.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
    val leaked = sc.getPersistentRDDs.keySet.toSet -- persistedBefore -- labelIds
    assert(leaked.isEmpty, s"per-round checkpoints leaked: $leaked")
    labels.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
    }
    foreign.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
    }
  }
}

class MultimodalSpec extends SparkSpec {
  private def docs = {
    import spark.implicits._
    Seq((0L, "abcdefgh" * 20, "en", "s", 160L),
      (1L, "watermelon sugar " * 10, "en", "s", 170L),
      (2L, "video payload bytes " * 16, "en", "s", 320L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("feature extraction is deterministic with stable schema") {
    val a = MultimodalOps.extractFeatures(MultimodalOps.assetsFromDocuments(docs))
    val rows1 = a.collect().map(f => (f.asset_id, f.checksum, f.feat.toSeq)).toSet
    val rows2 = MultimodalOps.extractFeatures(MultimodalOps.assetsFromDocuments(docs))
      .collect().map(f => (f.asset_id, f.checksum, f.feat.toSeq)).toSet
    assert(rows1 == rows2)
    assert(rows1.forall(_._3.size == 8))
  }

  test("featureComponents are the exact integers the float features derive from") {
    // Pins the mm_features oracle's contract: every float feature is a
    // row-local constant-divisor function of the emitted integer
    // components, reproduced here operation-for-operation in float32.
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val comps = MultimodalOps.featureComponents(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    val feats = MultimodalOps.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(comps.keySet == feats.keySet && comps.nonEmpty)
    comps.foreach { case (id, r) =>
      val f = feats(id)
      val c = Array.tabulate(6)(i => r.getLong(i + 3)) // c1..c6
      assert(r.getString(1) == f.kind && r.getInt(2) == f.n_bytes)
      r.getString(1) match {
        case "image" =>
          val np = (c(0) * c(1)).toFloat
          assert(f.feat.take(6).toSeq == Seq(c(0) / 1024f, c(1) / 1024f,
            c(2) / np / 255f, c(3) / np / 255f, c(4) / np / 255f,
            (c(2) + c(3) + c(4)) / (3f * np) / 255f))
        case "audio" =>
          val ns = c(0)
          val mean = (c(1).toDouble / ns).toFloat
          val rms = math.sqrt(c(2).toDouble / ns).toFloat
          assert(f.feat.take(4).toSeq ==
            Seq(16000 / 48000f, ns / 1e6f, mean / 32768f, rms / 32768f))
        case _ =>
          val np = (c(0) * c(1) * c(2)).toFloat
          assert(f.feat.take(6).toSeq == Seq(c(0) / 16f, c(1) / 1024f,
            c(2) / 1024f, c(3) / np / 255f, c(4) / np / 255f, c(5) / np / 255f))
      }
    }
  }

  test("featureComponents flags undecodable payloads with -1s") {
    import spark.implicits._
    val bad = Seq(MultimodalOps.Asset(20L, "video",
      Array.tabulate(150)(i => (i * 7).toByte), 8, 8, 0)).toDS()
    val r = MultimodalOps.featureComponents(bad).collect().head
    assert((1 to 6).forall(i => r.getLong(i + 2) == -1L))
  }

  test("frame extraction yields the real container frames, each decodable") {
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val frames = MultimodalOps.sampleFrames(assets).collect()
    // doc_id % 3 == 2 → video; 320 text bytes → 320 % 3 + 2 = 4 frames
    assert(frames.map(_.getLong(0)).toSet == Set(2L))
    assert(frames.length == MultimodalOps.videoFrameCount(320))
    val (ew, eh) = MultimodalOps.videoDims(320)
    frames.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame_bytes")))
      assert(img != null && img.getWidth == ew && img.getHeight == eh,
        s"frame ${r.getInt(1)} must decode standalone via ImageIO")
    }
  }

  test("video decode recovers frame count, dims and exact pixel sum (per-frame offset)") {
    val stats = MultimodalOps.decodeVideoStats(MultimodalOps.assetsFromDocuments(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(stats.length == 1) // doc_id 2 is the only video
    val (id, nf, w, h, pxSum) = stats.head
    val tb = ("video payload bytes " * 16).getBytes("UTF-8")
    val (ew, eh) = MultimodalOps.videoDims(tb.length)
    val enf = MultimodalOps.videoFrameCount(tb.length)
    val expected = (0 until enf).map { f =>
      (0L until (ew.toLong * eh * 3)).map(i =>
        (tb(((f * MultimodalOps.VideoFrameByteStep + i) % tb.length).toInt) & 0xff).toLong).sum
    }.sum
    assert((id, nf, w, h) == ((2L, enf, ew, eh)))
    assert(pxSum == expected)
  }

  test("corrupt video payloads degrade: flagged decode stats, byte-window framing") {
    import spark.implicits._
    val bad = Seq(MultimodalOps.Asset(20L, "video",
      Array.tabulate(150)(i => (i * 7).toByte), 8, 8, 0)).toDS()
    val stats = MultimodalOps.decodeVideoStats(bad).collect()
    assert(stats.length == 1 && stats.head.getInt(1) == -1,
      "unparseable container must flag, not throw")
    val frames = MultimodalOps.sampleFrames(bad, stride = 64).collect()
    assert(frames.length == 3, "byte-window fallback: ceil(150/64) = 3 rows")
    val feats = MultimodalOps.extractFeatures(bad).collect()
    assert(feats.length == 1)
    val f = feats.head
    val pseudo = Array.tabulate(6)(i => ((f.checksum >>> (i * 8)) & 0xff).toFloat / 255f)
    assert(f.feat.take(6).toSeq == pseudo.toSeq, "corrupt video → pseudo-features")
  }

  test("resize updates metadata for visual kinds only") {
    val assets = MultimodalOps.assetsFromDocuments(docs)
    val original = assets.collect().map(a => a.asset_id -> (a.width, a.height)).toMap
    val resized = MultimodalOps.resize(assets, 224, 224).collect()
    resized.foreach { a =>
      if (a.kind == "audio") assert((a.width, a.height) == original(a.asset_id))
      else assert((a.width, a.height) == ((224, 224)))
    }
  }

  test("BMP encode/ImageIO decode roundtrip is pixel-exact") {
    // 3×2 with distinct per-channel values: catches channel order, the
    // bottom-up row flip, and the 4-byte row padding (3*3=9 → pad to 12).
    val pix = (x: Int, y: Int, c: Int) => (y * 90 + x * 30 + c * 10) % 256
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MultimodalOps.Bmp.encode(3, 2, pix)))
    assert(img.getWidth == 3 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
        ((pix(x, y, 0), pix(x, y, 1), pix(x, y, 2))))
    }
  }

  test("WAV encode/AudioSystem decode roundtrip is sample-exact") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 42)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MultimodalOps.Wav.encode(16000, samples)))
    assert(in.getFormat.getSampleRate == 16000f)
    assert(in.getFormat.getSampleSizeInBits == 16)
    val bytes = in.readAllBytes()
    val decoded = Array.tabulate(bytes.length / 2)(i =>
      (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("corrupt audio/image payloads degrade to pseudo-features, never fail the job") {
    import spark.implicits._
    // Garbage bytes (no RIFF/BMP header) and a TRUNCATED WAV (header parses,
    // data chunk short) — both must fall back to the checksum
    // pseudo-features instead of throwing inside the task.
    val truncatedWav = MultimodalOps.Wav.encode(16000,
      Array.tabulate(64)(i => (i * 100).toShort)).take(50)
    val bad = Seq(
      MultimodalOps.Asset(10L, "audio", Array[Byte](1, 2, 3, 4, 5), 0, 0, 16000),
      MultimodalOps.Asset(11L, "audio", truncatedWav, 0, 0, 16000),
      MultimodalOps.Asset(12L, "image", Array[Byte](9, 9, 9), 4, 4, 0)).toDS()
    // Headerless garbage flags -1; the truncated WAV may decode partially
    // (header parses, short data chunk) — either way: a row, no throw.
    val audioStats = MultimodalOps.decodeAudioStats(bad).collect()
    assert(audioStats.length == 2, "every corrupt audio row must still produce stats")
    assert(audioStats.find(_.getLong(0) == 10L).get.getLong(1) == -1L,
      "unparseable audio must flag -1 in decodeAudioStats, not throw")
    val feats = MultimodalOps.extractFeatures(bad).collect()
    assert(feats.length == 3, "every corrupt row must still produce a feature row")
    // The headerless payloads are unparseable → exact pseudo-features; the
    // truncated WAV may decode partially (either way: a row, no throw).
    feats.filter(f => Set(10L, 12L).contains(f.asset_id)).foreach { f =>
      val pseudo = Array.tabulate(6)(i => ((f.checksum >>> (i * 8)) & 0xff).toFloat / 255f)
      assert(f.feat.take(6).toSeq == pseudo.toSeq,
        s"asset ${f.asset_id} (${f.kind}) did not degrade to pseudo-features")
    }
  }

  test("decodeImageStats recovers dims and exact pixel sum from the payload") {
    val stats = MultimodalOps.decodeImageStats(MultimodalOps.assetsFromDocuments(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(stats.length == 1) // doc_id 0 is the only image
    val (id, w, h, pxSum) = stats.head
    val tb = ("abcdefgh" * 20).getBytes("UTF-8")
    val (ew, eh) = MultimodalOps.imageDims(tb.length)
    val expected = (0L until (ew.toLong * eh * 3))
      .map(i => (tb((i % tb.length).toInt) & 0xff).toLong).sum
    assert((id, w, h) == ((0L, ew, eh)))
    assert(pxSum == expected)
  }

  test("image dHash: brightness-shift invariant, structural edits flip bits, small images drop") {
    import spark.implicits._
    val (w, h) = (16, 12)
    def grad(x: Int, y: Int, c: Int): Int = (x * 13 + y * 7 + c * 3) % 200
    def asset(id: Long, pix: (Int, Int, Int) => Int) =
      MultimodalOps.Asset(id, "image", MultimodalOps.Bmp.encode(w, h, pix), w, h, 0)
    val assets = Seq(
      asset(0L, grad),
      asset(1L, (x, y, c) => grad(x, y, c) + 40),           // uniform brightness shift
      asset(2L, (x, y, c) => grad(w - 1 - x, y, c)),        // mirrored: structure differs
      MultimodalOps.Asset(3L, "image",
        MultimodalOps.Bmp.encode(5, 5, grad), 5, 5, 0),     // below the 9×8 window
      MultimodalOps.Asset(4L, "image", Array[Byte](1, 2, 3), w, h, 0) // undecodable
    ).toDS()
    val out = MultimodalOps.decodeImagePHash(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L), "small/corrupt images must drop, not fail")
    assert(out(0L) == out(1L), "dHash must be invariant under uniform brightness shift")
    assert(java.lang.Long.bitCount(out(0L) ^ out(2L)) > 2,
      "a structural edit must move the hash beyond the near-dup threshold")
  }

  test("audio fingerprint: volume-invariant, edits flip bits, short streams drop") {
    import spark.implicits._
    def wave(i: Int): Short = (math.sin(i / 9.0) * 900 + (i % 37) * 11).toShort
    def asset(id: Long, s: Int => Short, n: Int = 650) =
      MultimodalOps.Asset(id, "audio",
        MultimodalOps.Wav.encode(16000, Array.tabulate(n)(s)), 0, 0, 16000)
    val assets = Seq(
      asset(0L, wave),
      asset(1L, i => (wave(i) * 3).toShort),                // uniform volume change
      asset(2L, i => wave(649 - i)),                        // reversed: structure differs
      asset(3L, wave, n = 40),                              // below the 65-sample floor
      MultimodalOps.Asset(4L, "audio", Array[Byte](9, 9), 0, 0, 0) // undecodable
    ).toDS()
    val out = MultimodalOps.decodeAudioFPrint(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L), "short/corrupt audio must drop, not fail")
    assert(out(0L) == out(1L), "fingerprint must be invariant under uniform volume change")
    assert(java.lang.Long.bitCount(out(0L) ^ out(2L)) > 2,
      "a structural edit must move the fingerprint beyond the near-dup threshold")
    // the payload-level gain-shift helper the dedup query plants through
    val orig = asset(0L, wave)
    val halved = orig.copy(asset_id = 10L,
      content = MultimodalOps.wavHalfGain(orig.content))
    val out2 = MultimodalOps.decodeAudioFPrint(Seq(orig, halved).toDS())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2(0L) == out2(10L),
      "wavHalfGain (a real re-encode) must preserve the fingerprint")
  }

  test("video fingerprint: frame-reorder invariant, frame splice flips bits") {
    import spark.implicits._
    val (w, h) = (16, 12)
    // per-seed GRADIENTS (not offsets): a constant offset is exactly the
    // brightness-shift class dHash ignores by design
    def frame(seed: Int) = MultimodalOps.Bmp.encode(w, h,
      (x, y, c) => (x * (7 + seed * 11) + y * (5 + seed * 3) + c * 3) % 200)
    def asset(id: Long, frames: Seq[Array[Byte]]) =
      MultimodalOps.Asset(id, "video", MultimodalOps.Mjb.encode(frames), w, h, 0)
    val f = (0 until 3).map(frame)
    val assets = Seq(
      asset(0L, f),
      asset(1L, f.reverse),                         // reordered frames
      asset(2L, Seq(frame(0), frame(7), frame(9))), // spliced: content differs
      MultimodalOps.Asset(3L, "video", Array[Byte](5, 5), w, h, 0) // undecodable
    ).toDS()
    val out = MultimodalOps.decodeVideoFPrint(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L), "corrupt containers must drop, not fail")
    assert(out(0L) == out(1L), "majority vote must be frame-order invariant")
    assert(java.lang.Long.bitCount(out(0L) ^ out(2L)) > 2,
      "a frame splice must move the fingerprint beyond the near-dup threshold")
    // the payload-level re-container helper the dedup query plants through
    val orig = asset(0L, f)
    val repacked = orig.copy(asset_id = 10L,
      content = MultimodalOps.mjbRecontainReversed(orig.content))
    val out2 = MultimodalOps.decodeVideoFPrint(Seq(orig, repacked).toDS())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2(0L) == out2(10L),
      "mjbRecontainReversed (same frames, new container) must preserve " +
        "the fingerprint")
  }

  test("extractFeatures decodes audio to the real mean/RMS of the samples") {
    val feats = MultimodalOps.extractFeatures(MultimodalOps.assetsFromDocuments(docs))
      .collect().filter(_.kind == "audio")
    assert(feats.length == 1) // doc_id 1
    val tb = ("watermelon sugar " * 10).getBytes("UTF-8")
    val samples = tb.map(b => (((b & 0xff) - 128) * 256).toDouble)
    val mean = samples.sum / samples.length
    val rms = math.sqrt(samples.map(s => s * s).sum / samples.length)
    val f = feats.head.feat
    assert(math.abs(f(2) - (mean / 32768f)) < 1e-4)
    assert(math.abs(f(3) - (rms / 32768f)) < 1e-4)
  }
}
