package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (driver mandate): treat image/audio/video as
  * opaque `binary` columns with typed metadata, and run decode / feature
  * extraction as a per-partition batch stage.
  *
  * The container has no image/audio codecs, so the DECODE step is a clearly
  * marked deterministic stub ([[StubDecoder]]); everything around it — binary
  * column handling, metadata struct schema, partition-batched extraction via
  * mapPartitions (the Scala analogue of mapInPandas batches), feature schema —
  * is real and tested. Swapping StubDecoder for a JNI/codec implementation
  * changes no plumbing.
  */
object Multimodal {

  /** Typed row for the extraction stage. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features: byte stats stand in for decoded-frame features. */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
    byte_sum: Long, first_byte: Int, n_frames: Long, format: String)

  /** Deterministic stand-in for the real decoder (no codecs in this
    * environment). Replace with a real implementation behind the same
    * signature; the dataflow does not change. */
  object StubDecoder {
    def decode(payload: Array[Byte], mediaType: String): MediaFeatures0 = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      // fake "frames": one frame per 1000 bytes, min 1
      MediaFeatures0(payload.length.toLong, sum,
        if (payload.length > 0) payload(0) & 0xff else -1,
        math.max(payload.length / 1000, 1).toLong, "stub/raw")
    }
  }
  case class MediaFeatures0(byteLen: Long, byteSum: Long, firstByte: Int,
    nFrames: Long, format: String)

  /** documents.text bytes stand in for media payloads: binary column + typed
    * metadata struct, exactly the shape a real image table would have. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lit("image/stub").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text")).cast("long").as("content_length"),
        col("source").as("origin"),
        col("lang").as("tag")).as("metadata"))

  /** Feature extraction via mapPartitions: the decoder is invoked once per
    * row inside a partition batch — at scale this is where a model/codec
    * would amortize per-batch initialization (the mapInPandas pattern). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (decoder/model handle)
        rows.map { r =>
          val f = StubDecoder.decode(r.payload, r.media_type)
          MediaFeatures(r.doc_id, r.media_type, f.byteLen, f.byteSum,
            f.firstByte, f.nFrames, f.format)
        }
      }
      .toDF()
  }

  /** Oracle-checkable slice of the multimodal pipeline: byte length and frame
    * count are reproducible from the text in SQL; byte_sum/first_byte are
    * covered by MultimodalSpec. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("n_frames"), col("format"))

  val queries: Map[String, Relational.Q] = Map(
    "mm_features" -> (mmFeatures _))

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id, 'image/stub' AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  greatest(CAST(strlen(text) // 1000 AS BIGINT), 1) AS n_frames,
        |  'stub/raw' AS format
        |FROM documents""".stripMargin)
}
