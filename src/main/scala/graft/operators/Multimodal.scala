package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, processed batch-wise with `mapPartitions`.
  *
  * The image/audio decode libraries are not in this container, so the
  * decode step is a clearly-marked deterministic STUB (byte histogram
  * + checksum standing in for pixel decoding / feature extraction).
  * Everything around it — the binary column, the metadata struct, the
  * partition-wise batch processing shape, the fixed-size feature
  * schema — is the real Spark plumbing a production pipeline needs:
  * swap `decodeStub` for an actual decoder and nothing else changes.
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end;
  * the decode pass is per-partition with no shuffle; feature output is
  * a flat schema so downstream similarity/dedup can run codegen'd.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte],
                         meta_len: Long, meta_lang: String)
  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Long, checksum: Long,
                           h0: Long, h1: Long, h2: Long, h3: Long,
                           fake_width: Int, fake_height: Int)

  /** STUB decoder: stands in for image/audio decode + feature extract.
    * Deterministic over payload bytes; replace with a real codec binding
    * in production. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bs = r.payload
    var checksum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xff
      checksum = checksum * 31 + b
      hist(b % 4) += 1
      i += 1
    }
    MediaFeatures(r.doc_id, r.kind, bs.length.toLong, checksum,
      hist(0), hist(1), hist(2), hist(3),
      fake_width = 64 + (math.abs(checksum) % 577).toInt,
      fake_height = 64 + (math.abs(checksum) % 433).toInt)
  }

  /** documents → media table: binary payload + metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir)).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("n_chars").as("len"), col("lang").as("lang")).as("meta"))

  /** Partition-wise decode/feature-extract over the binary column. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir).select(
        col("doc_id"), col("kind"), col("payload"),
        col("meta").getField("len").as("meta_len"),
        col("meta").getField("lang").as("meta_lang"))
      .as[MediaRecord]
    media.mapPartitions(_.map(decodeStub)).toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling shape: deterministic fixed-stride offsets into the
    * content (the video-frame analog), exploded to one row per sample.
    * The payload is ASCII here, so the sampled byte equals the sampled
    * character's code point — which keeps it oracle-checkable. */
  def frameSamples(spark: SparkSession, dir: String, stride: Int = 32): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        expr(s"CASE WHEN length(text) < $stride THEN array() ELSE " +
          s"transform(sequence(0, (length(text) div $stride) - 1), " +
          s"i -> struct(CAST(i AS BIGINT) AS frame_no, " +
          s"CAST(ascii(substring(text, i * $stride + 1, 1)) AS BIGINT) AS sample_byte)) END").as("frames"))
      .select(col("doc_id"), col("kind"), explode(col("frames")).as("f"))
      .select(col("doc_id"), col("kind"),
        col("f").getField("frame_no").as("frame_no"),
        col("f").getField("sample_byte").as("sample_byte"))
      .orderBy(col("doc_id"), col("frame_no"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> ((s, d) => mediaFeatures(s, d)),
    "mm_frame_samples" -> ((s, d) => frameSamples(s, d)))

  // decodeStub's checksum loop is not SQL-expressible -> rows-only for
  // mm_media_features; frame samples are byte lookups, oracle-able.
  val oracles: Map[String, String] = Map(
    "mm_frame_samples" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    [{'frame_no': CAST(i - 1 AS BIGINT),
        |      'sample_byte': CAST(ascii(substring(text, (i - 1) * 32 + 1, 1)) AS BIGINT)}
        |     FOR i IN range(1, (length(text) // 32) + 1)] AS frames
        |  FROM documents
        |), u AS (SELECT doc_id, kind, unnest(frames) AS f FROM s)
        |SELECT doc_id, kind, f.frame_no AS frame_no, f.sample_byte AS sample_byte
        |FROM u ORDER BY doc_id, frame_no""".stripMargin)
}
