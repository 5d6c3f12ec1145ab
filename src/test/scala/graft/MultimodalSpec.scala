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
}
