package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` payloads with typed metadata, processed by
  * iterator-based `mapPartitions` stages (the Scala analog of Pandas-UDF
  * batch processing — one partition = one batch, payloads never touch the
  * driver).
  *
  * Decoding goes through the [[Multimodal.PixelDecoder]] seam with two
  * implementations: [[Multimodal.ImageIoDecoder]], a REAL image decode via
  * the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF → integer Rec.601 luma
  * plane), and [[Multimodal.FakeCodec]]/[[Multimodal.StubDecoder]], the
  * deterministic synthetic stub the oracled gate data is built from (the
  * testdata ships no binary images). [[Multimodal.AutoDecoder]] (the
  * default) sniffs the stub magic and routes per payload, so both kinds
  * flow through identical operators. Audio mirrors it:
  * [[Multimodal.WavDecoder]] (JDK `javax.sound.sampled`, WAV/PCM →
  * mono unsigned-8-bit sample stream) behind
  * [[Multimodal.SampleDecoder]] with [[Multimodal.AutoSampleDecoder]]
  * routing. Video frames mirror it too: [[Multimodal.GifFrameDecoder]]
  * (animated GIF — the one multi-frame container a pure JVM decodes
  * natively) behind [[Multimodal.FrameDecoder]] with
  * [[Multimodal.AutoFrameDecoder]] routing; general video codecs
  * (H.264 etc.) remain out of reach without ffmpeg, which is the one
  * seam a production deployment swaps. Everything around every
  * decode — schema, partitioning, batch iteration, per-frame
  * explode — is the real distributed plumbing any codec drops into.
  */
object Multimodal {

  /** One media asset. `payload` is opaque bytes; `meta` travels alongside
    * so planning-time pruning/filtering never deserializes payloads. */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      mean_intensity: Double)

  case class FrameRow(media_id: Long, frame_idx: Int, frame_payload: Array[Byte])
  case class AudioWindow(media_id: Long, window_idx: Int, n_samples: Int,
                         energy: Long)

  /** STUB CODEC — stands in for libjpeg/ffmpeg/etc. Encodes a 16-byte
    * little-endian header (magic, width, height, sampleRate, nFrames is
    * carried in meta) followed by the raw "pixel" bytes. A real codec
    * replaces encode/decode only; the Spark plumbing is unchanged. */
  object FakeCodec {
    val Magic = 0x47524654 // "GRFT"
    val HeaderLen = 16

    def encode(width: Int, height: Int, sampleRate: Int, body: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(HeaderLen + body.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(Magic).putInt(width).putInt(height).putInt(sampleRate)
      buf.put(body)
      buf.array()
    }

    /** (width, height, sampleRate, body) */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val magic = buf.getInt
      require(magic == Magic, s"bad magic 0x${magic.toHexString}")
      val w = buf.getInt; val h = buf.getInt; val sr = buf.getInt
      val body = java.util.Arrays.copyOfRange(payload, HeaderLen, payload.length)
      (w, h, sr, body)
    }
  }

  /** The single pixel contract every image consumer reads through: an
    * opaque payload in, a row-major 8-bit intensity plane out. The
    * Spark plumbing (mapPartitions batching, signature shuffles, banded
    * pairing) is codec-oblivious — swapping decoders changes NOTHING
    * downstream of this call. */
  trait PixelDecoder extends Serializable {
    /** (width, height, row-major 8-bit intensity bytes). MUST fail
      * loudly on an unreadable payload — a silent empty plane would
      * pHash to 0 and bucket all broken images together. */
    def decodeIntensity(payload: Array[Byte]): (Int, Int, Array[Byte])
  }

  /** Synthetic stub: GRFT header + raw body bytes AS the intensity
    * plane (the gate-data decoder — testdata ships no real images). */
  object StubDecoder extends PixelDecoder {
    def decodeIntensity(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, _, body) = FakeCodec.decode(payload)
      (w, h, body)
    }
  }

  /** ONE Rec.601 integer-luma reduction `(299·R + 587·G + 114·B) / 1000`
    * for every BufferedImage-backed real decoder (still images AND GIF
    * frames share it — a formula tweak must not be able to drift the
    * decoders apart, or identical pixels stop producing identical
    * signatures). All-integer, so the plane — and every signature
    * derived from it — is bit-reproducible across JVMs and color
    * models. Per-pixel `getRGB` favors correctness over throughput (it
    * normalizes any `ColorModel`); a production hot path would read the
    * raster buffer directly per known model. */
  private[multimodal] def lumaPlane(
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        out(y * w + x) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** The 4-byte little-endian GRFT-magic sniff every Auto* router uses. */
  private[multimodal] def isGrftStub(p: Array[Byte]): Boolean =
    p.length >= 4 &&
      (ByteBuffer.wrap(p, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        == FakeCodec.Magic)

  /** REAL image decode via `javax.imageio` (pure JVM — PNG, JPEG, BMP,
    * GIF; no native libs): decoded ARGB reduces to the shared
    * [[lumaPlane]] integer Rec.601 plane. */
  object ImageIoDecoder extends PixelDecoder {
    def decodeIntensity(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "imageio: unrecognized or corrupt image payload " +
          s"(${payload.length} bytes)")
      (img.getWidth, img.getHeight, lumaPlane(img))
    }
  }

  /** Default decoder: sniffs the 4-byte little-endian GRFT magic and
    * routes synthetic payloads to [[StubDecoder]], anything else to
    * [[ImageIoDecoder]] — so the oracled gate queries stay bit-identical
    * on synthetic data while real PNGs/JPEGs flow through the SAME
    * operators unchanged. */
  object AutoDecoder extends PixelDecoder {
    def decodeIntensity(payload: Array[Byte]): (Int, Int, Array[Byte]) =
      if (isGrftStub(payload)) StubDecoder.decodeIntensity(payload)
      else ImageIoDecoder.decodeIntensity(payload)
  }

  /** The audio sample contract: opaque payload in, `(sampleRate,
    * unsigned 8-bit mono amplitude stream)` out — the unit every audio
    * consumer folds over ([[audioWindows]] energy sums, VAD). Same
    * seam discipline as [[PixelDecoder]]. */
  trait SampleDecoder extends Serializable {
    def decodeSamples(payload: Array[Byte]): (Int, Array[Byte])
  }

  /** Synthetic stub: GRFT header + raw body bytes AS the sample
    * stream. */
  object StubSampleDecoder extends SampleDecoder {
    def decodeSamples(payload: Array[Byte]): (Int, Array[Byte]) = {
      val (_, _, sr, body) = FakeCodec.decode(payload)
      (sr, body)
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * containers, PCM payloads — no native libs): frames reduce to a
    * mono unsigned-8-bit AMPLITUDE-ENVELOPE stream with integer
    * arithmetic only — 16-bit signed → `min(255, |s| >> 7)`, 8-bit
    * unsigned → distance from the 128 midpoint ×2, channels →
    * floor-mean — so silence sits at 0 and loudness scales the value,
    * which is what the mean-amplitude energy/VAD consumers threshold
    * on (an offset `s/256 + 128` mapping would put silence at
    * half-scale and swamp the mean — a symmetric waveform's offset
    * mean is ~128 no matter how loud it is). Every value is
    * bit-reproducible. Supported: PCM_SIGNED 16-bit and PCM_UNSIGNED
    * 8-bit, any channel count; anything else fails LOUDLY (a silently
    * mis-scaled stream would pass VAD thresholds wrongly everywhere). */
  object WavDecoder extends SampleDecoder {
    def decodeSamples(payload: Array[Byte]): (Int, Array[Byte]) = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val bits = f.getSampleSizeInBits
        val ch = f.getChannels
        require((enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
            (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8),
          s"wav: unsupported format $enc/$bits-bit " +
            "(PCM_SIGNED 16 or PCM_UNSIGNED 8 only)")
        val bytes = in.readAllBytes()
        val bytesPerSample = bits / 8
        val frameBytes = bytesPerSample * ch
        val nFrames = bytes.length / frameBytes
        val out = new Array[Byte](nFrames)
        var i = 0
        while (i < nFrames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val off = i * frameBytes + c * bytesPerSample
            val v =
              if (bits == 8) {
                // unsigned 8-bit: distance from the 128 midpoint, ×2
                math.min(255, math.abs((bytes(off) & 0xff) - 128) * 2)
              } else {
                // signed 16-bit sample, either endianness
                val s =
                  if (f.isBigEndian)
                    (bytes(off).toInt << 8) | (bytes(off + 1) & 0xff)
                  else
                    (bytes(off + 1).toInt << 8) | (bytes(off) & 0xff)
                math.min(255, math.abs(s) >> 7)
              }
            acc += v
            c += 1
          }
          out(i) = (acc / ch).toByte
          i += 1
        }
        (math.round(f.getSampleRate), out)
      } finally in.close()
    }
  }

  /** The video frame contract: opaque payload in, per-frame 8-bit
    * intensity planes out — the unit every frame consumer folds over
    * (frame sums → scene cuts/keyframes; frame pHash → content-ID).
    * Same seam discipline as [[PixelDecoder]]/[[SampleDecoder]]. */
  trait FrameDecoder extends Serializable {
    /** (frame_idx, row-major intensity plane) per frame, in order. */
    def decodeFrames(m: MediaRow): Iterator[(Int, Array[Byte])]
  }

  /** Synthetic stub: the GRFT body striped into `n_frames` equal
    * slices (sliceLen = ⌊bytes/nFrames⌋; a clip shorter than its frame
    * count yields empty planes — [[frameStats]] reports them,
    * signature consumers skip them). */
  object StubFrameDecoder extends FrameDecoder {
    def decodeFrames(m: MediaRow): Iterator[(Int, Array[Byte])] = {
      val (_, _, _, body) = FakeCodec.decode(m.payload)
      val sliceLen = if (m.n_frames == 0) 0 else body.length / m.n_frames
      (0 until m.n_frames).iterator.map { f =>
        (f, java.util.Arrays.copyOfRange(body, f * sliceLen,
          math.min((f + 1) * sliceLen, body.length)))
      }
    }
  }

  /** REAL multi-frame container decode via the JDK's `javax.imageio`
    * GIF reader — animated GIF is the one video-like container a pure
    * JVM decodes natively, which makes the whole frame pipeline
    * (per-frame signatures, scene cuts, keyframes, cross-video
    * content-ID) runnable on real animation bytes with no codec libs.
    * Frames reduce to the same integer Rec.601 luma planes as
    * [[ImageIoDecoder]]. Frames are decoded AS STORED — GIFs using
    * partial-frame/disposal optimization should be normalized to
    * full frames upstream (the fixture contract); `n_frames` metadata
    * is ignored in favor of the container's own frame count. */
  object GifFrameDecoder extends FrameDecoder {
    def decodeFrames(m: MediaRow): Iterator[(Int, Array[Byte])] = {
      import javax.imageio.ImageIO
      // decode EAGERLY and close/dispose in finally: under ImageIO's
      // default file cache the input stream owns an on-disk temp file
      // that a never-closed lazy iterator would leak once per payload —
      // an executor decoding millions of clips fills /tmp
      val iis = ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"gif: unrecognized container for media ${m.media_id} " +
            s"(${m.payload.length} bytes)")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n).map(f => (f, lumaPlane(reader.read(f)))).iterator
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** REAL video-container parse: AVI (RIFF) with uncompressed 24-bit
    * BI_RGB DIB frames — the chunk-tree walk per the public RIFF/AVI
    * layout (`RIFF('AVI ')` → `LIST(hdrl)` with `strh`/`strf` stream
    * headers → `LIST(movi)` with `##db`/`##dc` frame chunks), the one
    * true VIDEO container a dependency-free JVM can take apart (GIF
    * covers the animation case; H.264-class codecs remain the ffmpeg
    * seam). Frame geometry comes from the `vids` stream's
    * BITMAPINFOHEADER, NOT from the row's metadata; DIB rows are
    * bottom-up (negative biHeight = top-down), BGR, padded to 4 bytes.
    * Frames reduce to the same integer Rec.601 luma planes as the other
    * real decoders. Anything but BI_RGB 24-bit fails LOUD — a silent
    * wrong-stride read would produce plausible-looking garbage planes. */
  object AviFrameDecoder extends FrameDecoder {
    def decodeFrames(m: MediaRow): Iterator[(Int, Array[Byte])] = {
      val p = m.payload
      def u32(off: Int): Int =
        ByteBuffer.wrap(p, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      def u16(off: Int): Int =
        ByteBuffer.wrap(p, off, 2).order(ByteOrder.LITTLE_ENDIAN)
          .getShort & 0xffff
      def fourcc(off: Int): String = new String(p, off, 4, "US-ASCII")
      require(p.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
        s"avi: media ${m.media_id} is not a RIFF/AVI payload")
      var width = 0; var height = 0; var bitCount = -1
      var inVids = false // set by the preceding strh's fccType
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(off)
          val sz = u32(off + 4)
          require(sz >= 0 && off + 8 + sz <= p.length,
            s"avi: media ${m.media_id} chunk '$id' overruns the payload")
          if (id == "LIST") walk(off + 12, off + 8 + sz)
          else if (id == "strh" && sz >= 4)
            inVids = fourcc(off + 8) == "vids"
          else if (id == "strf" && inVids && bitCount < 0) {
            require(sz >= 40,
              s"avi: media ${m.media_id} vids strf shorter than a " +
                "BITMAPINFOHEADER")
            width = u32(off + 12)
            height = u32(off + 16)
            bitCount = u16(off + 22)
            val compression = u32(off + 24)
            require(compression == 0 && bitCount == 24,
              s"avi: media ${m.media_id} uses compression=$compression " +
                s"bitCount=$bitCount — only uncompressed 24-bit BI_RGB " +
                "decodes here")
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.substring(2) == "db" || id.substring(2) == "dc"))
            frames += ((off + 8, sz))
          off += 8 + sz + (sz & 1) // chunks pad to even length
        }
      }
      walk(12, p.length)
      require(frames.isEmpty || bitCount == 24,
        s"avi: media ${m.media_id} has frame chunks but no vids " +
          "BITMAPINFOHEADER")
      val topDown = height < 0
      val h = math.abs(height)
      val rowSize = ((width * 3 + 3) / 4) * 4
      frames.iterator.zipWithIndex.map { case ((off, sz), f) =>
        require(sz >= rowSize * h,
          s"avi: media ${m.media_id} frame $f has $sz bytes, needs " +
            s"${rowSize * h}")
        val out = new Array[Byte](width * h)
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          var x = 0
          while (x < width) {
            val o = off + srcRow * rowSize + x * 3
            val b = p(o) & 0xff
            val g = p(o + 1) & 0xff
            val r = p(o + 2) & 0xff
            out(y * width + x) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
            x += 1
          }
          y += 1
        }
        (f, out)
      }
    }
  }

  /** Default frame decoder: GRFT magic → stub; RIFF/AVI →
    * [[AviFrameDecoder]]; anything else → [[GifFrameDecoder]] (loud on
    * unrecognized bytes). */
  object AutoFrameDecoder extends FrameDecoder {
    private def isAvi(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' &&
        p(11) == ' '
    def decodeFrames(m: MediaRow): Iterator[(Int, Array[Byte])] =
      if (isGrftStub(m.payload)) StubFrameDecoder.decodeFrames(m)
      else if (isAvi(m.payload)) AviFrameDecoder.decodeFrames(m)
      else GifFrameDecoder.decodeFrames(m)
  }

  /** Default audio decoder: GRFT magic → stub; RIFF/WAVE (and anything
    * else `javax.sound.sampled` recognizes) → [[WavDecoder]]. */
  object AutoSampleDecoder extends SampleDecoder {
    def decodeSamples(payload: Array[Byte]): (Int, Array[Byte]) =
      if (isGrftStub(payload)) StubSampleDecoder.decodeSamples(payload)
      else WavDecoder.decodeSamples(payload)
  }

  /** Synthesize a deterministic media table from the documents table (the
    * driver ships no binary fixtures): payload body = UTF-8 text bytes,
    * dimensions derived from n_chars. Closed-form derivations make the
    * decode round-trip oracle-checkable. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val width = (nChars % 64).toInt + 16
        val height = (nChars % 48).toInt + 16
        val sampleRate = if (kind == "audio") 16000 else 0
        val nFrames = if (kind == "video") (nChars % 30).toInt + 1 else 1
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRow(id, kind, FakeCodec.encode(width, height, sampleRate, body),
          width, height, sampleRate, nFrames)
      }
  }

  /** Decode + feature-extract, batched per partition. The iterator shape
    * (one pass, no materialization of the whole partition) is what a real
    * codec needs for memory-bounded batches. */
  def imageFeatures(media: Dataset[MediaRow],
                    decoder: PixelDecoder = AutoDecoder): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, plane) = decoder.decodeIntensity(m.payload)
        val mean =
          if (plane.isEmpty) 0.0
          else {
            var s = 0L; var i = 0
            while (i < plane.length) { s += plane(i) & 0xff; i += 1 }
            s.toDouble / plane.length
          }
        ImageFeatures(m.media_id, w, h, plane.length, mean)
      }
    }
  }

  /** Fixed-window audio featurization over decoded sample bytes (stub
    * codec: one byte = one sample): per window, sample count + integer
    * energy (sum of unsigned sample values). The frame-energy/VAD shape
    * every audio front-end computes; windows stream out of one
    * `mapPartitions` pass, so memory is bounded by window size — never the
    * clip. Integer energy keeps the feature cross-engine exact (a float
    * RMS would put a sqrt between the engines); a real front-end swaps the
    * per-window fold, the plumbing stays.
    */
  def audioWindows(media: Dataset[MediaRow], window: Int,
                   decoder: SampleDecoder = AutoSampleDecoder)
      : Dataset[AudioWindow] = {
    require(window > 0)
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        val (_, body) = decoder.decodeSamples(m.payload)
        body.grouped(window).zipWithIndex.map { case (chunk, i) =>
          var s = 0L
          var j = 0
          while (j < chunk.length) { s += chunk(j) & 0xff; j += 1 }
          AudioWindow(m.media_id, i, chunk.length, s)
        }
      }
    }
  }

  /** Resize: payload → payload with updated header (STUB transform keeps
    * bytes; a real impl would resample). Demonstrates binary-in/binary-out
    * stages compose without schema churn. */
  def resize(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (_, _, sr, body) = FakeCodec.decode(m.payload)
        m.copy(payload = FakeCodec.encode(newW, newH, sr, body),
          width = newW, height = newH)
      }
    }
  }

  /** Frame sampling: one output row per sampled frame index (stride
    * `every`). flatMap shape — output cardinality is data-dependent, the
    * same contract as real video frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], every: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        val (_, _, _, body) = FakeCodec.decode(m.payload)
        (0 until m.n_frames by every).iterator.map { f =>
          // STUB frame extraction: slice of the body proportional to index
          val sliceLen = if (m.n_frames == 0) 0 else body.length / m.n_frames
          val start = f * sliceLen
          FrameRow(m.media_id, f,
            java.util.Arrays.copyOfRange(body, start,
              math.min(start + sliceLen, body.length)))
        }
      }
    }
  }

  /** Deterministic fake embedding from payload bytes (hash-mixed) — the
    * bridge into the similarity/ANN operators. */
  def featurize(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val (_, _, _, body) = FakeCodec.decode(m.payload)
      val v = new Array[Float](dim)
      var i = 0
      while (i < body.length) {
        val b = body(i) & 0xff
        v(i % dim) += ((b * 2654435761L + i) % 1000 - 500) / 500.0f
        i += 1
      }
      (m.media_id, v)
    }.toDF("media_id", "embedding")
  }

  case class PHashRow(media_id: Long, n_bytes: Int, phash: Long)

  /** Blockhash perceptual signature over the decoded intensity plane: the
    * byte sequence is striped into `blocks` contiguous blocks (byte i →
    * block ⌊i·blocks/n⌋), and bit b is set iff block b's mean intensity
    * exceeds the whole-image mean. The comparison is the integer
    * cross-multiplication `blockSum·n > total·blockLen` — no division, so
    * the signature is bit-exact across engines. Near-duplicate images
    * (crops excepted) differ in a handful of blocks → small hamming
    * distance; [[pHashPairs]] turns that into banded candidate pairs
    * without an all-pairs scan.
    *
    * BAND-SKEW WARNING: bit b of the raw signature is block b, so only
    * the LOW `blocks` bits are informative and the top `64-blocks` bits
    * are constant zero. Feeding this raw value to a banded LSH that
    * buckets on fixed 16-bit fields (e.g.
    * [[graft.similarity.Similarity.simhashPairsFromSigs]], which bands on
    * bits 48-63, 32-47, ...) would make the high band constant for
    * `blocks` <= 48 — every image in one bucket, quadratic candidates —
    * and leave it with only `blocks-48` informative bits otherwise. Use
    * [[pHashPairs]], which first spreads the `blocks` informative bits
    * evenly across the 64-bit word ([[spreadTo64]], hamming-preserving)
    * so every band carries ~`blocks/4` informative bits.
    *
    * `blocks` ≤ 60 keeps every set bit below the sign bit, so the packed
    * BIGINT round-trips through any engine without sign/overflow quirks
    * (same 60-bit budget as the winnowing fingerprint packing).
    * Magnitude bound: `blockSum·n` is at most `255·n²`, which stays
    * inside Int64 only for `n` up to ~190 MB — so that bound is ENFORCED:
    * an oversized plane fails loudly instead of silently wrapping into
    * wrong bits.
    */
  private[graft] val MaxPHashBytes: Int = 190000000

  private[graft] def pHash(body: Array[Byte], blocks: Int): Long = {
    val n = body.length
    require(n <= MaxPHashBytes,
      s"pHash body of $n bytes exceeds $MaxPHashBytes (blockSum*n would overflow Int64)")
    if (n == 0) return 0L
    val bSum = new Array[Long](blocks)
    val bLen = new Array[Long](blocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = ((i.toLong * blocks) / n).toInt
      val v = body(i) & 0xff
      bSum(b) += v; bLen(b) += 1; total += v
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < blocks) {
      if (bSum(b) * n > total * bLen(b)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Per-image perceptual hash, batched per partition (the codec
    * boundary, same shape as [[imageFeatures]]). Map-only: signatures
    * shuffle, payloads never do. */
  def imagePHash(media: Dataset[MediaRow], blocks: Int = 60,
                 decoder: PixelDecoder = AutoDecoder): Dataset[PHashRow] = {
    require(blocks >= 1 && blocks <= 60, s"blocks=$blocks must be in [1, 60]")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val (_, _, plane) = decoder.decodeIntensity(m.payload)
        PHashRow(m.media_id, plane.length, pHash(plane, blocks))
      }
    }
  }

  /** Spread the low `blocks` informative bits of a raw [[pHash]] evenly
    * across the 64-bit word: bit b moves to position ⌊b·64/blocks⌋. The
    * placement is injective (64/blocks ≥ 1), so hamming distance between
    * any two signatures is EXACTLY preserved — and with the default
    * blocks=60 each of the four 16-bit LSH bands receives 15 informative
    * bits, closing the constant-zero / starved high band the raw packing
    * would hand [[graft.similarity.Similarity.simhashPairsFromSigs]].
    * Highest used position is ⌊(blocks−1)·64/blocks⌋ ≤ 62, so the sign
    * bit stays clear and the value round-trips any engine's BIGINT. */
  private[graft] def spreadTo64(h: Long, blocks: Int): Long = {
    var out = 0L
    var b = 0
    while (b < blocks) {
      if (((h >>> b) & 1L) != 0L) out |= 1L << ((b * 64) / blocks)
      b += 1
    }
    out
  }

  /** `(id, simhash)` signatures ready for the banded LSH: raw block-hash
    * bits spread via [[spreadTo64]], columns named for
    * [[graft.similarity.Similarity.simhashPairsFromSigs]]'s contract. */
  def pHashSigs(media: Dataset[MediaRow], blocks: Int = 60,
                decoder: PixelDecoder = AutoDecoder): DataFrame = {
    import media.sparkSession.implicits._
    imagePHash(media, blocks, decoder)
      .map(r => (r.media_id, spreadTo64(r.phash, blocks)))
      .toDF("id", "simhash")
  }

  /** Near-duplicate image pairs at hamming ≤ `maxHamming`, via the same
    * multi-probe 16-bit-block LSH the text simhash path uses — banded
    * candidates, NOT an all-pairs scan, with the pigeonhole recall
    * guarantee (exact at hamming ≤ numProbes−1). Returns
    * `(id_a, id_b, hamming)` where ids are media ids and hamming is
    * measured on the spread signatures — identical to hamming on the raw
    * block hashes because [[spreadTo64]] is an injective bit placement. */
  def pHashPairs(media: Dataset[MediaRow], blocks: Int = 60,
                 maxHamming: Int = 3, numProbes: Int = 4,
                 maxBucket: Int = 0,
                 decoder: PixelDecoder = AutoDecoder): DataFrame =
    graft.similarity.Similarity.simhashPairsFromSigs(
      pHashSigs(media, blocks, decoder), maxHamming, numProbes, maxBucket)

  case class FrameStat(media_id: Long, frame_idx: Int, slice_len: Int, fsum: Long)

  /** Per-frame intensity sums for every frame (stride-1 twin of
    * [[sampleFrames]]' slicing: sliceLen = ⌊bytes/nFrames⌋, frame f =
    * body[f·sliceLen, (f+1)·sliceLen)). Integer sums keep the feature
    * cross-engine exact; one output row per frame, payloads stay inside
    * the partition. */
  def frameStats(media: Dataset[MediaRow],
                 decoder: FrameDecoder = AutoFrameDecoder): Dataset[FrameStat] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        decoder.decodeFrames(m).map { case (f, plane) =>
          var s = 0L
          var j = 0
          while (j < plane.length) { s += plane(j) & 0xff; j += 1 }
          FrameStat(m.media_id, f, plane.length, s)
        }
      }
    }
  }

  case class VadSegment(media_id: Long, seg_idx: Int, start_w: Int,
                        end_w: Int, n_windows: Int, seg_energy: Long)

  /** Voice-activity segments: contiguous runs of audio windows whose
    * mean sample value exceeds `tau` (integer test `energy >
    * n_samples·tau` — division-free, engine-exact), the
    * speech/silence segmentation every audio curation pipeline starts
    * from. Islands form with the classic `window_idx − row_number`
    * gaps-and-islands key (the q_sessionize shape) — ONE media_id hash
    * shuffle end-to-end: the row_number window, the island aggregation,
    * and the segment re-index all share that partitioning. A real VAD
    * model swaps the energy test; the segmentation plumbing stays. */
  def vadSegments(media: Dataset[MediaRow], window: Int, tau: Int,
                  decoder: SampleDecoder = AutoSampleDecoder): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau >= 0, s"vadSegments: tau=$tau must be >= 0")
    val byMedia = Window.partitionBy(col("media_id")).orderBy(col("window_idx"))
    audioWindows(media, window, decoder).toDF()
      .filter(col("energy") > col("n_samples").cast("long") * tau)
      .withColumn("grp", col("window_idx") - row_number().over(byMedia))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("window_idx")).as("start_w"),
        max(col("window_idx")).as("end_w"),
        count(lit(1)).cast("int").as("n_windows"),
        sum(col("energy")).as("seg_energy"))
      .withColumn("seg_idx", row_number().over(
        Window.partitionBy(col("media_id")).orderBy(col("start_w"))))
      .select(col("media_id"), col("seg_idx"), col("start_w"), col("end_w"),
        col("n_windows"), col("seg_energy"))
  }

  /** Per-frame perceptual signatures for video frames (the
    * [[frameStats]] slicing: sliceLen = ⌊bytes/nFrames⌋), already
    * spread for the banded LSH ([[spreadTo64]]). Zero-length frames
    * (clip shorter than its frame count) are SKIPPED — their empty
    * slices all hash to 0 and would cross-match as phantom dups.
    * Map-only; one 8-byte signature per frame leaves the codec pass. */
  def framePHashSigs(media: Dataset[MediaRow], blocks: Int = 60,
                     decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        require(m.media_id >= 0 && m.media_id < Long.MaxValue / FramePack,
          s"framePHashSigs: media_id ${m.media_id} outside the packable " +
            s"[0, ${Long.MaxValue / FramePack}) range")
        decoder.decodeFrames(m)
          // empty planes (clip shorter than its frame count) are SKIPPED
          // — they all hash to 0 and would cross-match as phantom dups
          .filter(_._2.nonEmpty)
          .map { case (f, plane) =>
            // the downstream pair stage packs media_id*2^20 + frame_idx
            // into one BIGINT; an out-of-range frame would silently
            // alias ANOTHER video's frames — fail loudly instead
            require(f < FramePack,
              s"framePHashSigs: media ${m.media_id} frame $f >= " +
                s"$FramePack (frame index would overflow the packed " +
                "pair id)")
            (m.media_id, f, spreadTo64(pHash(plane, blocks), blocks))
          }
      }
    }.toDF("media_id", "frame_idx", "simhash")
  }

  /** Persist a pHash signature index (`(id, simhash)` — the
    * [[pHashSigs]] output and [[graft.streaming.StreamingMedia]]'s
    * evolving state). The `blocks` parameter is stored AS A COLUMN of
    * the same shards — ONE parquet write, so signatures and their
    * banding parameter can never go stale against each other the way a
    * separate sidecar file could (a crash between two writes leaves new
    * shards with an old sidecar). Signature shards are 20 bytes/image —
    * a vanishing fraction of the media bytes, no single-file coalesce.
    * Re-saves should still go to a NEW path with a swap when a live
    * loop reads the old one (the [[graft.text.Fingerprint]] doc). */
  def saveSigIndex(sigs: DataFrame, path: String, blocks: Int): Unit = {
    require(blocks >= 1 && blocks <= 60, s"saveSigIndex: blocks=$blocks")
    sigs.select(col("id").cast("long").as("id"),
        col("simhash").cast("long").as("simhash"),
        lit(blocks).as("blocks"))
      .write.mode("overwrite").parquet(path)
  }

  /** The `blocks` a signature index at `path` was built with; fails
    * fast if shards disagree (a partial overwrite or mixed-save dir). */
  def loadSigIndexParams(spark: SparkSession, path: String): Int = {
    val r = spark.read.parquet(path)
      .agg(min(col("blocks")).cast("int"), max(col("blocks")).cast("int"))
      .head()
    require(r.getInt(0) == r.getInt(1),
      s"loadSigIndexParams($path): shards disagree on blocks " +
        s"(${r.getInt(0)} vs ${r.getInt(1)}) — mixed or partial save")
    r.getInt(0)
  }

  /** Load a signature index, failing fast at the driver on schema
    * drift (the [[graft.similarity.IncrementalDedup]] convention). */
  def loadSigIndex(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val got = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    Seq("id" -> "bigint", "simhash" -> "bigint", "blocks" -> "int")
      .foreach { case (n, t) =>
        require(got.get(n).contains(t),
          s"loadSigIndex($path): expected column $n: $t, found " +
            s"${got.getOrElse(n, "ABSENT")} — not a pHash signature index")
      }
    df.select(col("id"), col("simhash"))
  }

  /** Frame ids pack as `media_id·2²⁰ + frame_idx` for the bander. */
  private[graft] val FramePack = 1048576L

  /** Cross-video near-duplicate FRAMES — the content-ID shape: two
    * videos sharing near-identical frames at hamming ≤ maxHamming,
    * found by the same multi-probe banded LSH as [[pHashPairs]] over
    * per-frame signatures (frame ids packed `media·2²⁰+frame`, the
    * winnowing pack convention). Within-video pairs are dropped —
    * self-similar frames are [[sceneCuts]]' business, cross-video
    * matches are reuse/contamination evidence. */
  def frameDupPairs(media: Dataset[MediaRow], blocks: Int = 60,
                    maxHamming: Int = 3, numProbes: Int = 4,
                    maxBucket: Int = 0,
                    decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    val sigs = framePHashSigs(media, blocks, decoder)
      .select((col("media_id") * FramePack + col("frame_idx")).as("id"),
        col("simhash"))
    graft.similarity.Similarity
      .simhashPairsFromSigs(sigs, maxHamming, numProbes, maxBucket)
      .select(expr(s"id_a div $FramePack").as("media_a"),
        (col("id_a") % FramePack).cast("int").as("frame_a"),
        expr(s"id_b div $FramePack").as("media_b"),
        (col("id_b") % FramePack).cast("int").as("frame_b"),
        col("hamming").cast("int").as("hamming"))
      .filter(col("media_a") =!= col("media_b"))
  }

  /** Keyframe extraction: frame 0 of every video plus the first frame
    * of each new scene (every cut frame from [[sceneCuts]]) — the
    * standard one-representative-per-scene sampling that turns a video
    * into a bounded image set for captioning/embedding. Pure
    * composition: the cut table IS the oracled sceneCuts output, so
    * keyframes inherit its exactness; one media_id shuffle (the lag
    * window), map-only after. */
  def keyframes(media: Dataset[MediaRow], tau: Int,
                decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    val cuts = sceneCuts(media, tau, decoder)
      .filter(col("is_cut"))
      .select(col("media_id"), col("frame_idx"))
    media.filter(col("kind") === "video").toDF()
      .select(col("media_id"), lit(0).as("frame_idx"))
      .unionByName(cuts)
      .distinct()
  }

  /** Scene-cut detection: a cut lands at frame f > 0 iff the absolute
    * frame-sum delta exceeds `tau` intensity units *per byte* of frame —
    * i.e. |Σf − Σf₋₁| > tau·sliceLen, all-integer. The decode stage emits
    * one (media_id, frame_idx, fsum) row per frame; the delta is a plain
    * lag window per video (ONE hash shuffle on media_id, per-video frame
    * counts are codec-bounded so no skew concern). A real pipeline swaps
    * the stub frame sum for a perceptual frame descriptor; the
    * lag-compare plumbing is unchanged. */
  def sceneCuts(media: Dataset[MediaRow], tau: Int,
                decoder: FrameDecoder = AutoFrameDecoder): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    frameStats(media, decoder).toDF()
      .withColumn("delta", abs(col("fsum") - lag(col("fsum"), 1).over(w)))
      .filter(col("frame_idx") > 0)
      .select(col("media_id"), col("frame_idx"), col("fsum"), col("delta"),
        (col("delta") > col("slice_len").cast("long") * tau).as("is_cut"))
  }
}
