package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested; the actual media decode is a STUB — the image/audio codec
  * libraries are not in this container, so [[FakeCodec]] produces
  * deterministic features from the raw bytes. Swapping in a real codec means
  * replacing FakeCodec only; every dataflow stage stays identical.
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
                           frames_sampled: Int, feature: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("durationMs", LongType))))))

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder. Features are a function of the payload bytes only, so tests
    * are reproducible. Replace with a real decoder to go to production. */
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
          MediaFeatures(row.media_id, row.payload.length.toLong,
            row.meta.format, frames.length, pooled)
        }
      }
  }
}
