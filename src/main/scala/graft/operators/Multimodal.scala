package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested, and as of round 11 so are the codecs for three modalities —
  * all JDK-built-in, headless, no external library, each hash-gated
  * through a lossless round-trip:
  *   - IMAGE ([[ImageIoCodec]]: ImageIO PNG/GIF/BMP/JPEG;
  *     q_image_decode, q_image_phash_dedup),
  *   - AUDIO ([[WavCodec]]: spec-exact RIFF encode + the JDK AudioSystem
  *     parser; q_audio_decode),
  *   - MULTI-FRAME ([[GifAnimCodec]]: animated GIF write/read, the
  *     frame-sample stage against a real container; q_video_frames).
  * TRUE INTERFRAME VIDEO (H.264 …) remains the one honest STUB — no such
  * codec ships with the JDK or this container, so [[FakeCodec]] produces
  * deterministic features from the raw bytes there; swapping in a real
  * video codec means replacing FakeCodec only, every dataflow stage
  * stays identical.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows, so
  * the operators (a) `repartition` by id before the decode stage so work
  * spreads evenly regardless of upstream file layout, (b) run decode in
  * `mapPartitions` so a real codec can amortize per-batch init (model load,
  * decoder context) across a partition — the same batching contract as an
  * arrow-batched UDF.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, byte_len: Long, format: String,
                           width: Option[Int], height: Option[Int],
                           frames_sampled: Int, feature: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("durationMs", LongType))))))

  /** STUB codec — deterministic fake standing in for a real INTERFRAME
    * VIDEO decoder (image, audio, and multi-frame containers have real
    * JDK-backed codecs below). Features are a function of the payload
    * bytes only, so tests are reproducible. Replace with a real decoder
    * to go to production. */
  object FakeCodec {
    def decode(payload: Array[Byte], frames: Int): Array[Array[Byte]] = {
      // "frame-sample": `frames` evenly spaced byte windows of the payload.
      val n = math.max(1, math.min(frames, payload.length))
      (0 until n).map { i =>
        val start = (payload.length.toLong * i / n).toInt
        payload.slice(start, math.min(start + 16, payload.length))
      }.toArray
    }
    def features(frame: Array[Byte]): Array[Double] =
      // 4-dim fake embedding: byte stats of the frame.
      if (frame.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
      else Array(
        frame.length.toDouble,
        frame.map(_ & 0xff).sum.toDouble / frame.length,
        (frame.head & 0xff).toDouble,
        (frame.last & 0xff).toDouble)
  }

  /** REAL image codec on the JDK's built-in ImageIO (java.desktop ships
    * PNG/GIF/BMP/JPEG readers in every JDK — no external library, works
    * headless): decodes a payload to its pixel matrix and encodes RGB
    * matrices back to PNG. PNG is lossless, so encode→decode is an exact
    * round-trip — which is what lets [[graft.QueriesExtras]]'s
    * q_image_decode be HASH-GATED against a SQL oracle that computes the
    * same channel statistics from the pixel-generating formula directly,
    * with no codec at all: the gate passing proves the real decoder
    * reproduced every pixel. Corrupt / non-image payloads yield None,
    * never a throw (the imageMeta sniffing discipline). Audio/video
    * remain behind [[FakeCodec]] — no AV codec ships with the JDK, and
    * that stub stays honestly labeled. */
  object ImageIoCodec {
    // decode needs no display; pin headless so a misconfigured DISPLAY
    // env can never turn a decode into an X11 connection attempt — but
    // only when the embedding application hasn't configured AWT itself
    // (a class-load side effect must never override explicit host config)
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    // In-memory ImageIO streams are scoped PER CALL SITE below
    // (MemoryCacheImage*Stream) instead of flipping the process-global
    // ImageIO.setUseCache(false): the default createImage*Stream wraps a
    // FILE-backed cache — one temp file per payload, which serialized the
    // parallel decode stage on filesystem metadata ops (measured: the
    // q_video_frames row ran at single-thread speed) — but the global
    // flag would also silently force EVERY other ImageIO consumer in the
    // JVM fully in-heap (a large-image decode elsewhere could OOM instead
    // of spilling to its temp-file cache).

    /** payload → (width, height, row-major 0xRRGGBB pixels), or None. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        Option(javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload))))
          .map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val px = Array.ofDim[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
              y += 1
            }
            (w, h, px)
          }
      } catch { case _: Exception => None }

    /** Row-major 0xRRGGBB pixels → PNG bytes (lossless). */
    def encodePng(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
      require(pixels.length == width * height,
        s"pixel count ${pixels.length} != $width x $height")
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, pixels(y * width + x)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios): Unit
      finally ios.close() // flushes the memory cache into bos
      bos.toByteArray
    }

    /** Deterministic nearest-neighbor resize — an explicit sampling loop,
      * not Graphics2D (whose interpolation is renderer-dependent), so the
      * result is bit-identical on any JVM: target pixel (x, y) takes
      * source pixel (floor(x·sw/tw), floor(y·sh/th)). */
    def resizeNearest(sw: Int, sh: Int, pixels: Array[Int],
                      tw: Int, th: Int): Array[Int] = {
      require(tw > 0 && th > 0, s"bad target ${tw}x$th")
      val out = Array.ofDim[Int](tw * th)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * sh / th).toInt
        var x = 0
        while (x < tw) {
          out(y * tw + x) = pixels(sy * sw + (x.toLong * sw / tw).toInt)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** REAL audio codec on the JDK's built-in javax.sound.sampled (WAV /
    * PCM ships in java.desktop — no external library, headless): encodes
    * 16-bit signed little-endian mono PCM to a spec-exact RIFF/WAVE byte
    * layout and decodes arbitrary WAV payloads back through the JDK's
    * actual AudioSystem parser. PCM is lossless, so encode→decode is an
    * exact sample round-trip — the same property that makes
    * q_audio_decode hash-gateable against a codec-free SQL oracle.
    * Corrupt / non-WAV payloads yield None, never a throw. VIDEO remains
    * behind [[FakeCodec]]: no video codec ships with the JDK. */
  object WavCodec {
    /** samples → RIFF/WAVE bytes (PCM_SIGNED, 16-bit, mono, LE). */
    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2)            // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Reusable decoder — resolves the platform's AudioFileReader
      * providers ONCE via the public SPI (javax.sound.sampled.spi +
      * ServiceLoader). The static `AudioSystem.getAudioInputStream`
      * convenience routes every call through a SYNCHRONIZED global
      * provider lookup, which serializes a parallel decode stage
      * (measured: q_audio_decode ran at identical per-row speed on 8
      * threads and at 10× the rows). One Decoder per partition — the
      * Multimodal mapPartitions contract. */
    final class Decoder {
      private val allReaders = {
        val it = java.util.ServiceLoader.load(
          classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[javax.sound.sampled.spi.AudioFileReader]
        while (it.hasNext) buf += it.next()
        buf.toSeq
      }
      // PROBE-ORDERED: find the provider that actually parses RIFF/PCM
      // once (a 1-sample WAV), and try it FIRST on every payload. The
      // naive provider scan reaches the WAV reader only after the AIFF/
      // AU/float readers each throw UnsupportedAudioFileException —
      // per-row exception construction that cost ~0.4 ms/payload and
      // made the decode stage ~300× slower than the actual parsing
      // (micro-benchmarked: 50k decodes = 0.09 s with the right reader,
      // 16 s through the scan). Non-WAV payloads still fall back to the
      // full scan — correctness is unchanged, only the happy path is
      // exception-free.
      private val readers = {
        val probe = encodePcm16(Array[Short](0), 8000)
        val works = allReaders.find { r =>
          try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)); true }
          catch { case _: Exception => false }
        }
        works.toSeq ++ allReaders.filterNot(works.contains)
      }

      /** payload → (sampleRate, samples), decoded by the JDK's WAV parser
        * (the real one — it validates the RIFF structure, not our own
        * reader). Only PCM_SIGNED 16-bit mono maps to samples; anything
        * else (or corrupt bytes) → None. */
      def decode(payload: Array[Byte]): Option[(Int, Array[Short])] = {
        val in = readers.iterator.flatMap { r =>
          try Option(r.getAudioInputStream(new java.io.ByteArrayInputStream(payload)))
          catch { case _: Exception => None }
        }.nextOption()
        in.flatMap { ais =>
          try {
            val f = ais.getFormat
            if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                f.getSampleSizeInBits != 16 || f.getChannels != 1) None
            else {
              val raw = ais.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(raw).order(
                if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              val out = Array.ofDim[Short](raw.length / 2)
              var i = 0
              while (i < out.length) { out(i) = bb.getShort(); i += 1 }
              Some((f.getSampleRate.toInt, out))
            }
          } catch { case _: Exception => None }
        }
      }
    }

    /** One-shot convenience form (tests, small corpora). */
    def decode(payload: Array[Byte]): Option[(Int, Array[Short])] =
      new Decoder().decode(payload)
  }

  /** REAL multi-frame codec on the JDK's animated-GIF support — the
    * frame-sample stage of the video surface exercised against a real
    * multi-frame container: [[encode]] writes an animated GIF through the
    * JDK's GIF writer (one full-size frame per image; a frame with ≤256
    * distinct colors palettizes LOSSLESSLY, and an 8×8 frame has at most
    * 64), [[decodeFrames]] reads every frame back through the JDK's GIF
    * reader. The lossless round-trip is what lets q_video_frames be
    * hash-gated the way the image/audio rows are. TRUE interframe video
    * codecs (H.264 …) remain honestly out of scope — nothing in the JDK
    * decodes them; [[FakeCodec]] stays the labeled stub for that. */
  object GifAnimCodec {
    // see [[ImageIoCodec]]: headless only if the host hasn't chosen, and
    // in-memory streams scoped per call, never the global cache flag
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

    /** Reusable encoder — ONE ImageIO SPI lookup + metadata DOM build for
      * its lifetime. Per-row writer construction contends on the global
      * IIORegistry across executor threads (measured: the 8-thread
      * q_video_frames row ran at single-thread speed); a mapPartitions
      * stage holds one Encoder per partition instead. NOT thread-safe —
      * one per task, the mapPartitions contract. */
    final class Encoder {
      private val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      // INTERLACE OFF, explicitly: the writer's default metadata
      // interlaces, and the JDK writer/reader pair disagrees on the
      // interlace row schedule for heights below 8 — decoded rows come
      // back permuted (measured on 6x4 frames). Non-interlaced frames
      // round-trip exactly at every size.
      private val meta = {
        val m = wr.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
            java.awt.image.BufferedImage.TYPE_INT_RGB),
          wr.getDefaultWriteParam())
        val fmt = m.getNativeMetadataFormatName()
        val root = m.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val ds = root.getElementsByTagName("ImageDescriptor")
        (0 until ds.getLength).foreach(i =>
          ds.item(i).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .setAttribute("interlaceFlag", "FALSE"))
        m.setFromTree(fmt, root)
        m
      }

      /** frames (row-major 0xRRGGBB, all w×h) → animated GIF bytes. */
      def encode(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
        require(frames.nonEmpty, "no frames")
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try {
          wr.setOutput(ios)
          wr.prepareWriteSequence(null)
          frames.foreach { px =>
            require(px.length == width * height,
              s"frame pixel count ${px.length} != $width x $height")
            val img = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { img.setRGB(x, y, px(y * width + x)); x += 1 }
              y += 1
            }
            wr.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
          }
          wr.endWriteSequence()
        } finally ios.close()
        bos.toByteArray
      }
    }

    /** Reusable decoder — same SPI-contention rationale as [[Encoder]]. */
    final class Decoder {
      private val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()

      /** payload → every frame as (width, height, row-major 0xRRGGBB), or
        * None on corrupt / non-GIF bytes. */
      def decodeFrames(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Int])]] =
        try {
          rd.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload)))
          val n = rd.getNumImages(true)
          if (n <= 0) None
          else Some((0 until n).map { f =>
            val img = rd.read(f)
            val (w, h) = (img.getWidth, img.getHeight)
            val px = Array.ofDim[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xffffff; x += 1 }
              y += 1
            }
            (w, h, px)
          })
        } catch { case _: Exception => None }
    }

    /** One-shot convenience forms (tests, small corpora). */
    def encode(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] =
      new Encoder().encode(width, height, frames)
    def decodeFrames(payload: Array[Byte]): Option[Seq[(Int, Int, Array[Int])]] =
      new Decoder().decodeFrames(payload)
  }

  /** AVERAGE-HASH (aHash) perceptual fingerprint of an 8×8 pixel matrix —
    * the classic image near-dup signature: integer luma per pixel
    * ((299·R + 587·G + 114·B) / 1000, exact integer arithmetic so a SQL
    * engine can replay it), bit i set iff luma(i) > the integer mean.
    * Near-identical images differ in few bits; hamming distance over the
    * 64-bit hash is the dedup metric. Callers resize to 8×8 first
    * ([[ImageIoCodec.resizeNearest]]) — kept separate so the hash itself
    * is a pure pixel→Long function. */
  def aHash64(pixels64: Array[Int]): Long = {
    require(pixels64.length == 64, s"aHash64 wants 8x8 pixels, got ${pixels64.length}")
    val luma = pixels64.map(p =>
      (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000)
    val mean = luma.sum / 64
    luma.zipWithIndex.foldLeft(0L) { case (h, (l, i)) =>
      if (l > mean) h | (1L << i) else h }
  }

  /** Hamming-bucketed pair generation over a 64-bit fingerprint column —
    * the pigeonhole construction (the text-simhash discipline applied to
    * image hashes): the hash splits into `maxHamming + 1` disjoint bit
    * bands, two hashes within `maxHamming` bits MUST agree on at least
    * one whole band, so candidates come from band-key equi-joins (never a
    * cartesian) and are exact-verified with `bit_count(a XOR b)`. Output:
    * (id_a, id_b, hamming), id_a < id_b. Requires (maxHamming + 1) | 64
    * so bands are equal-width (1, 3, 7, 15 … are the useful thresholds). */
  def hammingPairs64(df: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    require(nBands > 0 && 64 % nBands == 0,
      s"maxHamming + 1 must divide 64, got $maxHamming")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val banded = df.select(col(idCol), col(hashCol).as("__h"),
        explode(array((0 until nBands).map(j =>
          struct(lit(j).as("band"),
            (shiftrightunsigned(col(hashCol), j * width)
              .bitwiseAND(lit(mask))).as("bv"))): _*)).as("bk"))
      .select(col(idCol), col("__h"), col("bk.band"), col("bk.bv"))
    val cand = banded.select(col(idCol).as("id_a"), col("__h").as("__ha"),
        col("band"), col("bv"))
      .join(banded.select(col(idCol).as("id_b"), col("__h").as("__hb"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__ha"), col("__hb")).distinct()
    cand
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** REAL binary header sniffing — format detection + image dimensions
    * parsed from the payload's magic bytes with pure built-in expressions
    * (substring/hex/conv on BinaryType → whole-stage codegen, no UDF, no
    * codec library). This is the metadata pass a 100 TB media pipeline
    * runs on ingest: it touches only the first ~30 bytes of each payload.
    *
    *  - PNG:  8-byte signature, IHDR width/height as u32 big-endian at
    *    offsets 17/21 (1-indexed).
    *  - GIF:  "GIF87a"/"GIF89a", logical-screen width/height u16
    *    little-endian at 7/9.
    *  - BMP:  "BM", BITMAPINFOHEADER width/height u32 little-endian at
    *    19/23.
    *  - JPEG: detected by FF D8 magic; dimensions live in a SOF marker at
    *    a data-dependent offset — that genuinely needs the
    *    [[extractFeatures]] mapPartitions codec stage, so dims are null
    *    here (sniffing never lies).
    * Unknown formats → format "unknown", null dims. */
  def imageMeta(payload: Column): Column = {
    def u8(off: Int): Column =
      conv(hex(substring(payload, off, 1)), 16, 10).cast("long")
    def u16le(off: Int): Column = u8(off) + u8(off + 1) * 256L
    def u32le(off: Int): Column =
      u8(off) + u8(off + 1) * 256L + u8(off + 2) * 65536L + u8(off + 3) * 16777216L
    def u32be(off: Int): Column = conv(hex(substring(payload, off, 4)), 16, 10).cast("long")
    val isPng = hex(substring(payload, 1, 8)) === "89504E470D0A1A0A"
    val isGif = substring(payload, 1, 6).cast("string").isin("GIF87a", "GIF89a")
    val isBmp = substring(payload, 1, 2).cast("string") === "BM"
    val isJpeg = hex(substring(payload, 1, 2)) === "FFD8"
    val nullL = lit(null).cast("long")
    struct(
      when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
        .when(isJpeg, "jpeg").otherwise("unknown").as("format"),
      when(isPng, u32be(17)).when(isGif, u16le(7)).when(isBmp, u32le(19))
        .otherwise(nullL).as("width"),
      // BMP biHeight is SIGNED int32: negative = top-down row order, same
      // pixel height — report the magnitude, not a value near 2^32
      when(isPng, u32be(21)).when(isGif, u16le(9))
        .when(isBmp, abs(when(u32le(23) >= 2147483648L, u32le(23) - 4294967296L)
          .otherwise(u32le(23))))
        .otherwise(nullL).as("height"))
  }

  /** JPEG dimensions by walking the marker stream to the first SOF frame
    * header — REAL parsing, no codec library (the JFIF marker layout is
    * public spec): each segment is 0xFF, marker byte, big-endian length;
    * SOF0..SOF15 (except DHT/JPG/DAC) carry height then width at offsets
    * 3/5 of their payload. This runs per-row on the JVM side, which is
    * why it lives with the [[extractFeatures]] codec stage and not in
    * [[imageMeta]]'s fixed-offset expressions: the SOF offset is
    * data-dependent (preceded by variable-length APP/COM/quant segments).
    * Malformed/truncated payloads yield None, never a throw. */
  def jpegDims(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (payload.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < payload.length) {
      if (u8(i) != 0xff) return None // desynced marker stream
      val marker = u8(i + 1)
      if (marker == 0xff) {
        i += 1 // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF: no dims
      } else {
        val len = u16(i + 2)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // payload: precision u8, height u16, width u16 — a declared
          // length too short to hold them is corruption, not dims
          return if (len >= 7 && i + 9 <= payload.length)
            Some((u16(i + 7), u16(i + 5))) // (width, height)
          else None
        }
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** Build a media table from any (id, string-payload) source — used by
    * tests to synthesize binary columns from `documents.text`. */
  def synthesize(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id).cast("long").as("media_id"),
      encode(col(text), "UTF-8").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        octet_length(col(text)).as("width"),
        lit(1).as("height"),
        octet_length(col(text)).cast("long").as("durationMs")).as("meta"))

  /** Decode + feature-extract stage. Repartitions by id (even spread for
    * wide rows), then mapPartitions so a real codec could init once per
    * partition. Output is a narrow, shuffle-friendly feature table. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      framesPerItem: Int = 4, parallelism: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(parallelism, col("media_id"))
      .as[MediaRow]
      .mapPartitions { it =>
        // real codec would initialize its decoder context here, once
        it.map { row =>
          val frames = FakeCodec.decode(row.payload, framesPerItem)
          val feats = frames.map(FakeCodec.features)
          val dim = 4
          val pooled = Array.tabulate(dim)(d => feats.map(_(d)).sum / feats.length)
          // REAL dimension resolution where the payload carries it
          // ([[jpegDims]] — this per-row stage is where data-dependent
          // parsing belongs); declared metadata is the fallback
          val parsed = jpegDims(row.payload)
          MediaFeatures(row.media_id, row.payload.length.toLong,
            row.meta.format,
            parsed.map(_._1).orElse(Option(row.meta).map(_.width).filter(_ > 0)),
            parsed.map(_._2).orElse(Option(row.meta).map(_.height).filter(_ > 0)),
            frames.length, pooled)
        }
      }
  }
}
