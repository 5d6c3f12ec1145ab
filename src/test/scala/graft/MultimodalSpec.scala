package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthesize builds the binary media schema from text") {
    val docs = Seq((1L, "hello world"), (2L, "bytes")).toDF("doc_id", "text")
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    // name/type parity (nullability differs between literal-built and declared)
    assert(media.schema.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", ""))) ==
      Multimodal.mediaSchema.map(f => (f.name, f.dataType.sql)))
    val row = media.orderBy($"media_id").head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("imageMeta sniffs format and dimensions from real header bytes") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // genuine 640x480 PNG header: signature + IHDR length/type + w/h
    val png = bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* 640 be */ 0, 0, 0x01, 0xE0 /* 480 be */)
    // GIF89a, 320x200 little-endian logical screen
    val gif = "GIF89a".getBytes("US-ASCII") ++ bytes(0x40, 0x01 /* 320 le */, 0xC8, 0x00 /* 200 le */)
    // BMP: "BM" + 12 filler bytes + 4-byte header size + w/h u32 le
    val bmp = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      bytes(0x00, 0x04, 0, 0 /* 1024 le */, 0x00, 0x03, 0, 0 /* 768 le */)
    // top-down BMP: biHeight is SIGNED (-768 little-endian) — must report 768
    val bmpTopDown = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      bytes(0x00, 0x04, 0, 0, 0x00, 0xFD, 0xFF, 0xFF /* -768 le */)
    val jpeg = bytes(0xFF, 0xD8, 0xFF, 0xE0)
    val junk = "not an image".getBytes("US-ASCII")
    val df = Seq((1L, png), (2L, gif), (3L, bmp), (4L, jpeg), (5L, junk), (6L, bmpTopDown))
      .toDF("media_id", "payload")
      .select($"media_id", Multimodal.imageMeta($"payload").as("m"))
      .select($"media_id", $"m.format", $"m.width", $"m.height")
      .orderBy($"media_id")
      .as[(Long, String, Option[Long], Option[Long])].collect()
    assert(df sameElements Array(
      (1L, "png", Some(640L), Some(480L)),
      (2L, "gif", Some(320L), Some(200L)),
      (3L, "bmp", Some(1024L), Some(768L)),
      (4L, "jpeg", None, None), // SOF offset is data-dependent: codec stage
      (5L, "unknown", None, None),
      (6L, "bmp", Some(1024L), Some(768L))))
  }

  test("jpegDims walks the marker stream to SOF (variable APP segments)") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // SOI, APP0 (JFIF, 16-byte segment), COM (5 bytes), SOF0 640x480
    val jpeg = bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xFF, 0xFE, 0x00, 0x05, 'h', 'i', '!',
      0xFF, 0xC0, 0x00, 0x11, 8, 0x01, 0xE0 /*h=480*/, 0x02, 0x80 /*w=640*/,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(Multimodal.jpegDims(jpeg).contains((640, 480)))
    // progressive marker SOF2 also carries dims
    val sof2 = jpeg.updated(28, 0xC2.toByte)
    assert(Multimodal.jpegDims(sof2).contains((640, 480)))
    // truncated before SOF / not a JPEG / desynced -> None, no throw
    assert(Multimodal.jpegDims(jpeg.take(20)).isEmpty)
    assert(Multimodal.jpegDims("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.jpegDims(bytes(0xFF, 0xD8, 0x00, 0x00, 0x00)).isEmpty)
    // T.81 fill bytes: extra 0xFF before a marker is legal padding
    val padded = bytes(0xFF, 0xD8, 0xFF) ++ jpeg.drop(2)
    assert(Multimodal.jpegDims(padded).contains((640, 480)))
    // corrupt SOF with declared length < 7 must not read the next segment
    val shortSof = jpeg.updated(29, 0x00.toByte).updated(30, 0x04.toByte)
    assert(Multimodal.jpegDims(shortSof).isEmpty)
  }

  test("extractFeatures resolves real JPEG dimensions in the codec stage") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = bytes(0xFF, 0xD8,
      0xFF, 0xC0, 0x00, 0x11, 8, 0x01, 0xE0, 0x02, 0x80,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val media = Seq((1L, jpeg, ("image/jpeg", 0, 0, 0L)),
        (2L, "plain text".getBytes("US-ASCII"), ("fake/raw", 10, 1, 10L)))
      .toDF("media_id", "payload", "meta")
      .select($"media_id", $"payload", $"meta".cast(
        Multimodal.mediaSchema("meta").dataType).as("meta"))
    val got = Multimodal.extractFeatures(spark, media, framesPerItem = 2, parallelism = 2)
      .collect().sortBy(_.media_id)
    assert(got(0).width.contains(640) && got(0).height.contains(480)) // parsed
    assert(got(1).width.contains(10) && got(1).height.contains(1))    // declared fallback
  }

  test("feature extraction is deterministic and partition-count independent") {
    val docs = (1L to 50L).map(i => (i, s"document payload number $i " * 8)).toDF("doc_id", "text")
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(spark, media, framesPerItem = 4, parallelism = 2)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media, framesPerItem = 4, parallelism = 16)
      .collect().sortBy(_.media_id)
    assert(f1.length == 50)
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.byte_len == b.byte_len &&
        a.frames_sampled == b.frames_sampled && a.feature.sameElements(b.feature)
    })
    assert(f1.head.frames_sampled == 4 && f1.head.feature.length == 4)
  }

  test("ImageIoCodec: PNG encode→decode is an exact pixel round-trip (real JDK codec)") {
    import graft.operators.Multimodal.ImageIoCodec
    val (w, h) = (7, 5)
    // non-trivial pixels incl. channel extremes and asymmetry
    val px = Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) |
      ((255 - i * 11 % 256) << 8) | (i * 73) % 256)
    val png = ImageIoCodec.encodePng(w, h, px)
    // it really is a PNG (the imageMeta sniffer agrees on the header)
    assert(png.take(8).map(b => f"${b & 0xff}%02X").mkString == "89504E470D0A1A0A")
    val Some((dw, dh, dp)) = ImageIoCodec.decode(png)
    assert(dw == w && dh == h)
    assert(dp sameElements px, "lossless codec must reproduce every pixel")
  }

  test("ImageIoCodec: corrupt / non-image payloads decode to None, never throw") {
    import graft.operators.Multimodal.ImageIoCodec
    assert(ImageIoCodec.decode(Array.emptyByteArray).isEmpty)
    assert(ImageIoCodec.decode("not an image at all".getBytes("UTF-8")).isEmpty)
    // a PNG signature with garbage after it must not escape as a throw
    val broken = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2, 3)
    assert(ImageIoCodec.decode(broken).isEmpty)
  }

  test("aHash64: bits follow luma-vs-mean; one-pixel tweak moves at most one bit") {
    import graft.operators.Multimodal
    // half dark, half bright: bright half sets exactly bits 32..63
    val split = Array.tabulate(64)(i => if (i < 32) 0x101010 else 0xf0f0f0)
    assert(Multimodal.aHash64(split) == 0xffffffff00000000L)
    // a small single-pixel change flips at most that pixel's bit
    val tweaked = split.clone(); tweaked(0) = 0x151010
    val d = java.lang.Long.bitCount(Multimodal.aHash64(split) ^ Multimodal.aHash64(tweaked))
    assert(d <= 1, s"one-pixel tweak flipped $d bits")
  }

  test("hammingPairs64: pigeonhole banding finds exactly the true <=maxHamming pairs") {
    import graft.operators.Multimodal
    val spark2 = spark; import spark2.implicits._
    // hashes: 1~2 differ in 1 bit, 3 differs from 1 in 2 bits (excluded at
    // max 1, included at max 3), 4 is far from everything
    val hs = Seq(
      (1L, 0x00000000000000ffL), (2L, 0x00000000000000feL),
      (3L, 0x00000000000000fcL), (4L, 0x0f0f0f0f00000000L))
      .toDF("id", "h")
    val p1 = Multimodal.hammingPairs64(hs, "id", "h", maxHamming = 1)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    assert(p1 sameElements Array((1L, 2L, 1L), (2L, 3L, 1L)))
    val p3 = Multimodal.hammingPairs64(hs, "id", "h", maxHamming = 3)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    assert(p3 sameElements Array((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L)))
  }

  test("GifAnimCodec: multi-frame encode→decode is an exact per-frame round-trip") {
    import graft.operators.Multimodal.GifAnimCodec
    val (w, h) = (6, 4)
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((f * 83 + i * 13) % 256) * 0x010101))
    val gif = GifAnimCodec.encode(w, h, frames)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"))
    val Some(dec) = GifAnimCodec.decodeFrames(gif)
    assert(dec.length == 3)
    dec.zip(frames).foreach { case ((dw, dh, dp), src) =>
      assert(dw == w && dh == h)
      assert(dp sameElements src, "palettized frame must round-trip exactly")
    }
    // corrupt payloads: None, never a throw
    assert(GifAnimCodec.decodeFrames("not a gif".getBytes("UTF-8")).isEmpty)
    assert(GifAnimCodec.decodeFrames(Array.emptyByteArray).isEmpty)
  }

  test("WavCodec: PCM encode→decode is an exact sample round-trip (real JDK audio parser)") {
    import graft.operators.Multimodal.WavCodec
    val samples = Array.tabulate(300)(i =>
      ((i * 1103) % 65536 - 32768).toShort) // full signed range coverage
    val wav = WavCodec.encodePcm16(samples, 8000)
    // it really is a RIFF/WAVE container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((rate, dec)) = WavCodec.decode(wav)
    assert(rate == 8000)
    assert(dec sameElements samples, "lossless PCM must reproduce every sample")
  }

  test("WavCodec: corrupt / non-audio payloads decode to None, never throw") {
    import graft.operators.Multimodal.WavCodec
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("definitely not audio".getBytes("UTF-8")).isEmpty)
    val truncated = WavCodec.encodePcm16(Array[Short](1, 2, 3), 8000).take(20)
    assert(WavCodec.decode(truncated).isEmpty)
  }

  test("ImageIoCodec.resizeNearest: explicit grid sampling, deterministic") {
    import graft.operators.Multimodal.ImageIoCodec
    val (w, h) = (4, 4)
    val px = Array.tabulate(w * h)(identity)
    // downscale 4x4 -> 2x2: target (x,y) takes source (2x, 2y)
    val down = ImageIoCodec.resizeNearest(w, h, px, 2, 2)
    assert(down sameElements Array(0, 2, 8, 10))
    // upscale 2x2 -> 4x4: each source pixel becomes a 2x2 block
    val up = ImageIoCodec.resizeNearest(2, 2, Array(1, 2, 3, 4), 4, 4)
    assert(up sameElements Array(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }
}
