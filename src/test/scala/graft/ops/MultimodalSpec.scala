package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: BinaryType payloads, typed metadata, batched
  * mapPartitions decode, binary frame slicing. The decode *content*
  * (header fields) is a documented deterministic stub; these tests pin
  * the parts that are real — bytes, batching, slicing, hashing. */
class MultimodalSpec extends SparkSpec {

  private val dir = sf // sf0.001

  test("payload bytes are the UTF-8 text bytes; md5 content address matches") {
    val row = Multimodal.media(spark, dir)
      .join(graft.io.Tables.load(spark, dir, "documents"), "doc_id")
      .select(col("doc_id"), col("payload"), col("text"))
      .orderBy("doc_id").head()
    val payload = row.getAs[Array[Byte]]("payload")
    val text = row.getAs[String]("text")
    assert(payload.sameElements(text.getBytes(StandardCharsets.UTF_8)))

    val md5Row = Multimodal.mmMetadata(spark, dir).orderBy("doc_id").head()
    val expected = MessageDigest.getInstance("MD5")
      .digest(text.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    assert(md5Row.getAs[String]("content_md5") == expected)
  }

  test("decode computes the true mean byte value, schema intact") {
    implicit val s = spark
    val decoded = Multimodal.decodeBatches(Multimodal.media(spark, dir))
    assert(decoded.schema.fieldNames.toSeq ==
      Seq("doc_id", "width", "height", "mean_byte", "n_bytes"))
    val d = decoded.orderBy("doc_id").head()
    val text = graft.io.Tables.load(spark, dir, "documents")
      .orderBy("doc_id").select("text").as[String](spark.implicits.newStringEncoder).head()
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val mean = bytes.map(_ & 0xff).sum.toDouble / bytes.length
    assert(d.n_bytes == bytes.length)
    assert(math.abs(d.mean_byte - math.floor(mean * 10000 + 0.5) / 10000) < 1e-12)
  }

  test("decode batch shape: partitions are processed in DecodeBatchSize groups") {
    import spark.implicits._
    // 150 rows in one partition → batches of 64, 64, 22
    val df = (0L until 150L).toDF("doc_id")
      .repartition(1)
      .select(col("doc_id"),
        encode(concat(lit("x"), col("doc_id")), "UTF-8").as("payload"),
        struct(lit("png").as("format"), lit(4).as("width"),
          lit(4).as("height")).as("meta"))
    val batchSizes = df
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(Multimodal.DecodeBatchSize).map(_.size))
      .collect().toSeq
    assert(batchSizes == Seq(64, 64, 22))
  }

  test("frame sampling slices the payload at 16-byte frames, every 4th") {
    val fs = Multimodal.mmFrameSample(spark, dir)
      .where(col("doc_id") === 0).collect()
    val text = graft.io.Tables.load(spark, dir, "documents")
      .where(col("doc_id") === 0).head().getAs[String]("text")
    val nFrames = math.ceil(text.length / 16.0).toInt
    val expectedIdx = (0 until nFrames by 4).toSeq
    assert(fs.map(_.getAs[Int]("frame_idx")).toSeq == expectedIdx)
    val first = fs.head.getAs[String]("frame_md5")
    val slice = text.substring(0, math.min(16, text.length))
    val expected = MessageDigest.getInstance("MD5")
      .digest(slice.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    assert(first == expected)
  }
}
