package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.Tables

class MultimodalSpec extends SparkTestBase {

  lazy val media = Multimodal.mediaFromDocuments(
    Tables.load(spark, sfDir, "documents"))

  test("codec round-trips payload bytes exactly") {
    val body = "hello media".getBytes("UTF-8")
    val enc = Multimodal.FakeCodec.encode(320, 240, 16000, body)
    val (w, h, sr, dec) = Multimodal.FakeCodec.decode(enc)
    assert((w, h, sr) == (320, 240, 16000))
    assert(dec.sameElements(body))
  }

  test("decode rejects garbage payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.FakeCodec.decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8,
        9, 10, 11, 12, 13, 14, 15, 16))
    }
  }

  test("media table covers all three kinds with payloads") {
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(media.filter(length(col("payload")) <= Multimodal.FakeCodec.HeaderLen)
      .count() == 0)
  }

  test("imageFeatures decodes every row with consistent meta") {
    val feats = Multimodal.imageFeatures(media)
    assert(feats.count() == media.count())
    val a = feats.toDF().select(col("media_id"), col("width").as("w_dec"))
    val b = media.toDF().select(col("media_id"), col("width").as("w_meta"))
    assert(a.join(b, "media_id").filter(col("w_dec") =!= col("w_meta")).count() == 0)
  }

  test("resize updates header, preserves body") {
    val f = Multimodal.imageFeatures(Multimodal.resize(media, 224, 224))
    val orig = Multimodal.imageFeatures(media)
    assert(f.filter(col("width") =!= 224).count() == 0)
    // body untouched → identical n_bytes and mean
    val joined = f.toDF().alias("a").join(orig.toDF().alias("b"), "media_id")
      .filter(col("a.n_bytes") =!= col("b.n_bytes") ||
        col("a.mean_intensity") =!= col("b.mean_intensity"))
    assert(joined.count() == 0)
  }

  test("sampleFrames emits ceil(n_frames/5) rows per video") {
    val frames = Multimodal.sampleFrames(media, 5).toDF()
    val got = frames.groupBy("media_id").count()
    val want = media.filter(col("kind") === "video").toDF()
      .select(col("media_id"), ceil(col("n_frames") / 5.0).as("want"))
    assert(got.join(want, "media_id").filter(col("count") =!= col("want")).count() == 0)
    assert(frames.count() > 0)
  }

  test("featurize produces fixed-dim vectors usable by ANN") {
    val df = Multimodal.featurize(media, 16)
    assert(df.filter(size(col("embedding")) =!= 16).count() == 0)
  }

  // ------------------------------------------------------------ pHash

  test("pHash implements the block-mean bit test on a hand-built body") {
    // [0,0,255,255] blocks=2: total=510 (mean 127.5). Block 0 sum 0 ->
    // 0*4 > 510*2 false; block 1 sum 510 -> 510*4 > 510*2 true -> h=2.
    val body = Array[Byte](0, 0, -1, -1) // -1 = 0xff unsigned 255
    assert(Multimodal.pHash(body, 2) == 2L)
    // uniform body: no block mean strictly exceeds the global mean
    assert(Multimodal.pHash(Array.fill[Byte](100)(42), 60) == 0L)
    // empty body is defined as 0
    assert(Multimodal.pHash(Array.empty[Byte], 60) == 0L)
    // deterministic
    val b2 = "some stable pixel bytes".getBytes("UTF-8")
    assert(Multimodal.pHash(b2, 60) == Multimodal.pHash(b2.clone(), 60))
  }

  test("pHash enforces the Int64 cross-multiplication bound") {
    val over = new Array[Byte](Multimodal.MaxPHashBytes + 1)
    intercept[IllegalArgumentException] { Multimodal.pHash(over, 60) }
  }

  test("spreadTo64 preserves hamming and feeds every 16-bit band") {
    val rnd = new scala.util.Random(7)
    val hs = Seq.fill(50)(rnd.nextLong() & ((1L << 60) - 1))
    for (a <- hs.take(10); b <- hs.take(10)) {
      assert(java.lang.Long.bitCount(a ^ b) ==
        java.lang.Long.bitCount(Multimodal.spreadTo64(a, 60) ^
          Multimodal.spreadTo64(b, 60)))
    }
    // every one of the four 16-bit LSH blocks gets 15 informative bits
    val positions = (0 until 60).map(b => (b * 64) / 60)
    assert(positions.distinct.size == 60) // injective placement
    for (block <- 0 until 4) {
      val inBlock = positions.count(p => p >= 16 * block && p < 16 * (block + 1))
      assert(inBlock == 15, s"block $block got $inBlock informative bits")
    }
    // the raw packing starves the top band (constant zero for blocks<=48);
    // the spread packing populates it
    val raw48 = hs.map(_ & ((1L << 48) - 1))
    assert(raw48.map(_ >>> 48).distinct.size == 1) // all collide: bucket 0
    // spreading lifts raw bits 45-47 into the top block: up to 2^3
    // buckets from a 48-bit hash (vs exactly 1 raw), and a full-width
    // 60-bit hash spreads 15 bits there
    val spreadTop = raw48.map(h => Multimodal.spreadTo64(h, 60) >>> 48)
    assert(spreadTop.distinct.size > 4)
    val spreadTopFull = hs.map(h => Multimodal.spreadTo64(h, 60) >>> 48)
    assert(spreadTopFull.distinct.size > 40)
  }

  test("pHashPairs finds identical images and skips unrelated ones") {
    import spark.implicits._
    def mk(id: Long, body: Array[Byte]) = Multimodal.MediaRow(
      id, "image", Multimodal.FakeCodec.encode(8, 8, 0, body), 8, 8, 0, 1)
    val a = "the same decoded plane, byte for byte, long enough to spread"
      .getBytes("UTF-8")
    val b = "a completely different image body with other intensity layout!!"
      .getBytes("UTF-8")
    val ds = spark.createDataset(Seq(mk(1, a), mk(2, a.clone()), mk(3, b)))
      .repartition(2)
    val pairs = Multimodal.pHashPairs(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exact-at-hamming<=3 contract: the banded result equals the
    // all-pairs reference computed locally from the same raw hashes
    val h = Map(1L -> Multimodal.pHash(a, 60), 2L -> Multimodal.pHash(a, 60),
      3L -> Multimodal.pHash(b, 60))
    val want = (for {
      x <- h.keys; y <- h.keys if x < y
      d = java.lang.Long.bitCount(h(x) ^ h(y)) if d <= 3
    } yield (x, y, d)).toSet
    assert(pairs == want)
    assert(pairs.contains((1L, 2L, 0)))
  }

  // ------------------------------------------- frameStats / sceneCuts

  test("frameStats sums equal sampleFrames slice sums at stride 1") {
    import spark.implicits._
    val stats = Multimodal.frameStats(media).toDF()
      .select(col("media_id"), col("frame_idx"), col("fsum"))
    val sliced = Multimodal.sampleFrames(media, every = 1).toDF()
      .select(col("media_id"), col("frame_idx"),
        aggregate(transform(split(hex(col("frame_payload")), "(?<=\\G..)"),
          s => when(s =!= "", conv(s, 16, 10).cast("long")).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("psum"))
    val joined = stats.join(sliced, Seq("media_id", "frame_idx"), "full_outer")
    assert(joined.filter(col("fsum").isNull || col("psum").isNull ||
      col("fsum") =!= col("psum")).count() == 0)
  }

  test("sceneCuts flags exactly the planted frame-sum jump") {
    import spark.implicits._
    // 3 frames of 10 bytes: [0]*10, [0]*10, [100]*10 -> sums 0, 0, 1000.
    val body = Array.fill[Byte](10)(0) ++ Array.fill[Byte](10)(0) ++
      Array.fill[Byte](10)(100)
    val row = Multimodal.MediaRow(7L, "video",
      Multimodal.FakeCodec.encode(4, 4, 0, body), 4, 4, 0, 3)
    val ds = spark.createDataset(Seq(row)).repartition(2)
    // tau=5: threshold 5*10=50. Frame 1 delta 0 (no cut), frame 2 delta
    // 1000 (cut).
    val got = Multimodal.sceneCuts(ds, tau = 5).orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq((1, 0L, 0L, false), (2, 1000L, 1000L, true)))
  }

  test("vadSegments finds exactly the planted active runs") {
    import spark.implicits._
    // windows of 400 bytes: [200]*400 | [0]*400 | [200]*400 | [200]*200
    // tau=100: w0 active (80000 > 40000), w1 silent (0), w2 active,
    // w3 active (40000 > 20000) -> segments [0,0] and [2,3]
    val body = Array.fill[Byte](400)(200.toByte) ++ Array.fill[Byte](400)(0) ++
      Array.fill[Byte](600)(200.toByte)
    val row = Multimodal.MediaRow(5L, "audio",
      Multimodal.FakeCodec.encode(0, 0, 16000, body), 0, 0, 16000, 1)
    val ds = spark.createDataset(Seq(row)).repartition(2)
    val got = Multimodal.vadSegments(ds, window = 400, tau = 100)
      .orderBy("seg_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5)))
    assert(got.toSeq == Seq((1, 0, 0, 1, 80000L), (2, 2, 3, 2, 120000L)))
  }

  test("frameDupPairs equals the all-pairs cross-video reference and " +
      "drops within-video pairs") {
    import spark.implicits._
    def mkVid(id: Long, body: Array[Byte], nf: Int) = Multimodal.MediaRow(
      id, "video", Multimodal.FakeCodec.encode(4, 4, 0, body), 4, 4, 0, nf)
    val shared = ("frame one payload bytes here!" * 4 +
      "frame TWO has other content :::" * 4 +
      "third frame, different again..." * 4).getBytes("UTF-8")
    val other = ("totally unrelated video body " * 12).getBytes("UTF-8")
    val vids = Seq(mkVid(1L, shared, 3), mkVid(2L, shared.clone(), 3),
      mkVid(3L, other, 3))
    val ds = spark.createDataset(vids).repartition(2)
    val got = Multimodal.frameDupPairs(ds).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4))).toSet
    // local all-pairs reference from the same per-frame hashes
    val hashes = vids.flatMap { m =>
      val (_, _, _, body) = Multimodal.FakeCodec.decode(m.payload)
      val sl = body.length / m.n_frames
      (0 until m.n_frames).map { f =>
        (m.media_id, f) -> Multimodal.pHash(
          java.util.Arrays.copyOfRange(body, f * sl, (f + 1) * sl), 60)
      }
    }.toMap
    val want = (for {
      a <- hashes.keys; b <- hashes.keys
      if a._1 * 1048576 + a._2 < b._1 * 1048576 + b._2 && a._1 != b._1
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if d <= 3
    } yield (a._1, a._2, b._1, b._2, d)).toSet
    assert(got == want)
    // the planted full copy matches frame-for-frame at hamming 0
    (0 until 3).foreach { f => assert(got.contains((1L, f, 2L, f, 0))) }
    assert(!got.exists(p => p._1 == p._3), "within-video pair leaked")
  }

  test("framePHashSigs skips zero-length frame slices") {
    import spark.implicits._
    val tiny = Multimodal.MediaRow(9L, "video",
      Multimodal.FakeCodec.encode(4, 4, 0, Array[Byte](1, 2)), 4, 4, 0, 5)
    val ds = spark.createDataset(Seq(tiny)).repartition(2)
    assert(Multimodal.framePHashSigs(ds).count() == 0)
  }

  test("keyframes = frame 0 plus each planted cut frame") {
    import spark.implicits._
    // the sceneCuts planted clip: sums 0, 0, 1000 with tau=5 -> cut at
    // frame 2 only; keyframes = {0, 2}
    val body = Array.fill[Byte](10)(0) ++ Array.fill[Byte](10)(0) ++
      Array.fill[Byte](10)(100)
    val row = Multimodal.MediaRow(7L, "video",
      Multimodal.FakeCodec.encode(4, 4, 0, body), 4, 4, 0, 3)
    val ds = spark.createDataset(Seq(row)).repartition(2)
    val got = Multimodal.keyframes(ds, tau = 5).orderBy("frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((7L, 0), (7L, 2)))
  }

  test("signature index round-trips with params; schema drift fails fast") {
    val root = java.nio.file.Files.createTempDirectory("sig_idx").toString
    val sigs = Multimodal.pHashSigs(media)
    Multimodal.saveSigIndex(sigs, s"$root/idx", blocks = 60)
    val loaded = Multimodal.loadSigIndex(spark, s"$root/idx")
    assert(loaded.count() == sigs.count())
    assert(Multimodal.loadSigIndexParams(spark, s"$root/idx") == 60)
    assert(loaded.except(sigs).count() == 0 &&
      sigs.except(loaded).count() == 0)
    // wrong-schema parquet is rejected at the driver
    sigs.withColumnRenamed("simhash", "sh")
      .write.mode("overwrite").parquet(s"$root/bad")
    val e = intercept[IllegalArgumentException] {
      Multimodal.loadSigIndex(spark, s"$root/bad")
    }
    assert(e.getMessage.contains("simhash"))
  }

  test("audioWindows splits clips into fixed windows with integer energy") {
    import spark.implicits._
    val body = Array.tabulate[Byte](1000)(i => (i % 7).toByte)
    val row = Multimodal.MediaRow(9L, "audio",
      Multimodal.FakeCodec.encode(0, 0, 16000, body), 0, 0, 16000, 1)
    val ds = spark.createDataset(Seq(row)).repartition(2)
    val got = Multimodal.audioWindows(ds, window = 400).orderBy("window_idx")
      .collect().map(w => (w.window_idx, w.n_samples, w.energy))
    val want = body.grouped(400).zipWithIndex
      .map { case (c, i) => (i, c.length, c.map(_ & 0xff).map(_.toLong).sum) }
      .toSeq
    assert(got.toSeq == want)
  }

  test("vadSegments decodes each audio payload EXACTLY once — the " +
      "sample plane is shared across the threshold, island, and " +
      "re-index stages (a re-executing decode subtree would double " +
      "the dominant cost of every real-codec audio query)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 300)
    val media = Multimodal.mediaFromDocuments(docs).localCheckpoint(true)
    val nAudio = media.filter(col("kind") === "audio").count()
    val acc = spark.sparkContext.longAccumulator("decodes")
    val counting = new Multimodal.SampleDecoder {
      def decodeSamples(payload: Array[Byte]): (Int, Array[Byte]) = {
        acc.add(1)
        Multimodal.AutoSampleDecoder.decodeSamples(payload)
      }
    }
    val out = Multimodal.vadSegments(media, window = 400, tau = 94,
      decoder = counting)
    out.write.format("noop").mode("overwrite").save()
    assert(acc.value == nAudio,
      s"expected exactly $nAudio decodes, saw ${acc.value}")
    // and the result itself matches the default-decoder path
    assert(out.collect().map(_.toSeq).toSet ==
      Multimodal.vadSegments(media, window = 400, tau = 94)
        .collect().map(_.toSeq).toSet)
  }
}
