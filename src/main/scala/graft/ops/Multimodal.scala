package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal-column operations — image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, per the LLM-pipeline
  * north star (the reference has no binary data at all; its closest
  * analog is the pruned `album.images` URL structs, songs-etl
  * `cf_extract/main.py:265-271`).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub (a fake "header parse" computed
  * from doc_id arithmetic), while everything around it — BinaryType
  * payload column, typed metadata struct, batched mapPartitions decode
  * with an explicit batch shape, binary slicing for frame sampling,
  * md5 content addressing — is real Spark plumbing, tested and
  * DuckDB-differential-checked.
  *
  * Payloads derive deterministically from `documents.text` (UTF-8
  * bytes of ASCII text), which is what makes every query below
  * oracle-able: a byte slice of the payload equals the same VARCHAR
  * slice of the text, so DuckDB phrases the oracle over `text` while
  * Spark genuinely computes over binary.
  *
  * Scale notes: all per-payload work is embarrassingly parallel and
  * shuffle-free (narrow maps over the scan); frame explosion is a
  * `Generate` with no shuffle. At 100 TB the only knob needed is a
  * `repartition(n)` before decode when codec cost is skewed by media
  * size — the plan shape is otherwise unchanged.
  */
object Multimodal {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The media table: binary payload + typed metadata struct.
    * format/width/height model a parsed container header — the
    * deterministic stub (no codecs in the container); n_bytes and the
    * md5 content address are computed from the real bytes. */
  def media(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (lit(16) + pmod(col("doc_id"), lit(32))).cast("int").as("width"),
        (lit(16) + pmod(col("doc_id") * 7, lit(24))).cast("int").as("height"))
        .as("meta"))

  // ---------- Metadata extraction ----------

  /** Typed metadata + content addressing over the binary payload. */
  def mmMetadata(s: SparkSession, dir: String): DataFrame =
    media(s, dir).select(
      col("doc_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).cast("int").as("n_bytes"),
      md5(col("payload")).as("content_md5"))
      .orderBy("doc_id")

  val mmMetadataOracle: String =
    """SELECT doc_id,
      |  ['png','jpeg','wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
      |  CAST(16 + doc_id % 32 AS INT) AS width,
      |  CAST(16 + (doc_id * 7) % 24 AS INT) AS height,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------- Resize (stub decode, real arithmetic) ----------

  /** Aspect-ratio-preserving resize to a 16×16 bounding box — the
    * metadata side of an image resize, computed without a codec. */
  def mmResize(s: SparkSession, dir: String): DataFrame =
    media(s, dir).select(
      col("doc_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      greatest(col("meta.width"), col("meta.height")).as("long_side"))
      .withColumn("out_w",
        greatest(lit(1), floor(col("width") * 16 / col("long_side")))
          .cast("int"))
      .withColumn("out_h",
        greatest(lit(1), floor(col("height") * 16 / col("long_side")))
          .cast("int"))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
      .orderBy("doc_id")

  val mmResizeOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(16 + doc_id % 32 AS INT) AS width,
      |    CAST(16 + (doc_id * 7) % 24 AS INT) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  CAST(greatest(1, floor(width * 16 / greatest(width, height)))
      |       AS INT) AS out_w,
      |  CAST(greatest(1, floor(height * 16 / greatest(width, height)))
      |       AS INT) AS out_h
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------- Frame sampling (binary slicing) ----------

  /** Sample every 4th 16-byte "frame" of each payload — the video
    * frame-sample shape: sequence → Generate (no shuffle) → binary
    * substring → content hash. The last frame may be short, exactly
    * like a trailing partial frame in a real container. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val nFrames = ceil(length(col("payload")) / lit(16.0)).cast("int")
    media(s, dir)
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      // empty payload -> zero frames, matching the oracle's empty
      // range(0,0,4); without the guard sequence(0,-1,4) throws
      .where(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("payload").substr(col("frame_idx") * 16 + 1, lit(16)))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Frame-sample oracle: the byte slice of the UTF-8 payload equals
    * the VARCHAR slice of the ASCII text, so md5 agrees. */
  val mmFrameSampleOracle: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(unnest(range(0, CAST(ceil(length(text) / 16.0) AS INT), 4))
      |         AS INT) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, frame_idx,
      |  md5(substring(text, frame_idx * 16 + 1, 16)) AS frame_md5
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---------- Batched decode (mapPartitions, the mapInPandas shape) ----------

  /** One decoded media item: stubbed header fields + genuinely
    * computed byte statistics. */
  final case class Decoded(
      doc_id: Long, width: Int, height: Int,
      mean_byte: Double, n_bytes: Int)

  final case class MediaRow(
      doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Batch size for the vectorized-decode model. Real codec bindings
    * amortize per-call overhead over a batch; the iterator is grouped
    * the same way here so the plumbing (and its memory shape — one
    * batch of payloads resident per task, not the whole partition)
    * is what production code would run. */
  val DecodeBatchSize = 64

  /** Decode stub over batches: the Scala analog of `mapInPandas` —
    * `mapPartitions` with an explicit batch shape. Header fields pass
    * through from metadata (the stub); `mean_byte` is real arithmetic
    * over the payload bytes, which gives the DuckDB oracle something
    * content-derived to check. */
  def decodeBatches(media: DataFrame)(implicit s: SparkSession): Dataset[Decoded] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { m =>
        var sum = 0L
        var i = 0
        while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
        val mean =
          if (m.payload.length == 0) 0.0
          else sum.toDouble / m.payload.length
        // half-away-from-zero to match DuckDB/Spark round() (mean >= 0)
        Decoded(m.doc_id, m.width, m.height,
          math.floor(mean * 10000 + 0.5) / 10000, m.payload.length)
      }))
  }

  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    decodeBatches(media(s, dir)).toDF().orderBy("doc_id")
  }

  val mmDecodeOracle: String =
    """SELECT doc_id,
      |  CAST(16 + doc_id % 32 AS INT) AS width,
      |  CAST(16 + (doc_id * 7) % 24 AS INT) AS height,
      |  coalesce(round(list_sum(list_transform(range(1, length(text) + 1),
      |          i -> ord(substring(text, i, 1))))
      |        / CAST(length(text) AS DOUBLE), 4), 0.0) AS mean_byte,
      |  CAST(length(text) AS INT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------- Feature extraction (bytes -> embedding) ----------

  final case class Embedded(
      doc_id: Long,
      h0: Double, h1: Double, h2: Double, h3: Double,
      h4: Double, h5: Double, h6: Double, h7: Double)

  /** Feature-extract: an 8-bin byte histogram per payload, normalized
    * to frequencies — the embedding step of a multimodal pipeline
    * (a real model would emit a learned vector; the histogram is the
    * deterministic stand-in with the same shape: binary in, fixed-dim
    * vector out). Runs in the same batched mapPartitions harness as
    * [[decodeBatches]]; emitted as scalar columns so the DuckDB
    * differential can hash it. */
  def mmEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map {
        case (id, bytes) =>
          val bins = new Array[Long](8)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            if (b < 128) bins(b >> 4) += 1
            i += 1
          }
          val n = math.max(1, bytes.length).toDouble
          def f(b: Int): Double = math.floor(bins(b) / n * 10000 + 0.5) / 10000
          Embedded(id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
      }))
      .toDF()
      .orderBy("doc_id")
  }

  val mmEmbedOracle: String = {
    // coalesce: empty text -> 0/0 is NULL in DuckDB, 0.0 in the Scala
    // decode (n = max(1, len)); pin both to 0.0
    val bins = (0 until 8).map(b =>
      s"""  coalesce(round(len(list_filter(list_transform(range(1, length(text) + 1),
         |    i -> ord(substring(text, i, 1))), o -> o // 16 = $b))
         |    / CAST(length(text) AS DOUBLE), 4), 0.0) AS h$b""".stripMargin)
      .mkString(",\n")
    s"SELECT doc_id,\n$bins\nFROM documents ORDER BY doc_id"
  }

  // ---------- Registry ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> mmMetadata,
    "mm_resize" -> mmResize,
    "mm_frame_sample" -> mmFrameSample,
    "mm_decode" -> mmDecode,
    "mm_embed" -> mmEmbed,
  )

  def oracles: Map[String, String] = Map(
    "mm_metadata" -> mmMetadataOracle,
    "mm_resize" -> mmResizeOracle,
    "mm_frame_sample" -> mmFrameSampleOracle,
    "mm_decode" -> mmDecodeOracle,
    "mm_embed" -> mmEmbedOracle,
  )
}
