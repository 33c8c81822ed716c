package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.GraftExpressions

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, probed at scan speed.
  *
  * The fixture has no real media files, so [[mediaTable]] synthesizes
  * payloads that carry REAL container headers — a valid PNG signature
  * + IHDR, a JPEG SOI/APP0/COM/SOF0 marker sequence, a RIFF/WAVE
  * `fmt ` chunk — with dimensions/channels/sample-rate derived
  * deterministically from `doc_id`, followed by the document text as
  * stand-in content bytes. [[mediaFeatures]] then recovers format and
  * geometry by PARSING THE BYTES with the codegen'd
  * [[graft.functions.MediaHeaderInfo]] probe (magic-byte detection,
  * IHDR/SOF0/fmt-chunk field extraction) — so the query proves the
  * header-parse path end to end, and the DuckDB oracle can rebuild
  * every output column from `doc_id` + text length alone. A full
  * pixel/sample decode still needs codec libraries this container
  * lacks; headers are the honest, library-free 90% of curation-time
  * media introspection (format routing, aspect filtering, bitrate
  * math).
  *
  * Scale notes: payloads stay columnar (parquet binary) end to end;
  * the probe reads a few dozen bytes per row inside whole-stage
  * codegen (no `mapPartitions`, no Encoder round trip, no shuffle);
  * feature output is a flat schema so downstream similarity/dedup
  * runs codegen'd too.
  */
object Multimodal {

  private def byteHex(v: Column, shift: Int): Column =
    lpad(hex(shiftright(v, shift).bitwiseAND(lit(255L))), 2, "0")
  private def le16Hex(v: Column): Column = concat(byteHex(v, 0), byteHex(v, 8))
  private def le32Hex(v: Column): Column =
    concat(byteHex(v, 0), byteHex(v, 8), byteHex(v, 16), byteHex(v, 24))

  // deterministic per-doc media parameters, mirrored by the oracle
  private def width: Column = (lit(64) + col("doc_id") % 577).cast("long")
  private def height: Column = (lit(64) + col("doc_id") % 433).cast("long")
  private def wavChannels: Column = (lit(1) + col("doc_id") % 2).cast("long")
  private def wavRate: Column = (lit(8000) + (col("doc_id") % 8) * 1000).cast("long")

  /** PNG signature + IHDR (33 bytes): bit depth 8, color type 6
    * (RGBA); the CRC is a placeholder — dimension probes don't
    * checksum. */
  private def pngHeaderHex: Column = concat(
    lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
    lpad(hex(width), 8, "0"), lpad(hex(height), 8, "0"),
    lit("0806000000" + "DEADBEEF"))

  /** JPEG SOI + APP0(JFIF) + COM + SOF0 (49 bytes) — the COM segment
    * makes the probe's marker scan actually skip variable-length
    * segments before it finds the frame header. */
  private def jpegHeaderHex: Column = concat(
    lit("FFD8" + "FFE000104A46494600010100000100010000" +
      "FFFE0008677261667400" + "FFC0" + "0011" + "08"),
    lpad(hex(height), 4, "0"), lpad(hex(width), 4, "0"),
    lit("03" + "012200" + "021101" + "031101"))

  /** RIFF/WAVE header + `fmt ` chunk + empty `data` chunk header
    * (44 bytes), 16-bit PCM; chunk sizes are placeholders. */
  private def wavHeaderHex: Column = concat(
    lit("52494646" + "00000000" + "57415645" + "666D7420" + "10000000" + "0100"),
    le16Hex(wavChannels), le32Hex(wavRate), le32Hex(wavRate * wavChannels * 2),
    le16Hex(wavChannels * 2), lit("1000" + "64617461" + "00000000"))

  /** documents → media table: binary payload (real container header +
    * text content bytes) + metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(spark, Tables.documents(spark, dir)).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      concat(
        unhex(when(col("doc_id") % 3 === 0, pngHeaderHex)
          .when(col("doc_id") % 3 === 1, wavHeaderHex)
          .otherwise(jpegHeaderHex)),
        encode(col("text"), "UTF-8")).as("payload"),
      struct(col("n_chars").as("len"), col("lang").as("lang")).as("meta"))

  /** Header probe over the binary column: one codegen'd expression
    * returns the packed info long; the per-field unpacks below are
    * plain bit ops in the same codegen span. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val info = GraftExpressions.mediaHeader(col("payload"))
    mediaTable(spark, dir)
      .select(col("doc_id"), col("kind"), info.as("info"),
        length(col("payload")).cast("long").as("byte_len"))
      .select(col("doc_id"), col("kind"),
        when(shiftright(col("info"), 60).bitwiseAND(lit(15L)) === 1, "png")
          .when(shiftright(col("info"), 60).bitwiseAND(lit(15L)) === 2, "jpeg")
          .when(shiftright(col("info"), 60).bitwiseAND(lit(15L)) === 3, "wav")
          .otherwise("unknown").as("format"),
        shiftright(col("info"), 40).bitwiseAND(lit(0xFFFFFL)).as("width"),
        shiftright(col("info"), 20).bitwiseAND(lit(0xFFFFFL)).as("height"),
        shiftright(col("info"), 16).bitwiseAND(lit(15L)).as("channels"),
        col("info").bitwiseAND(lit(0xFFFFL)).as("sample_rate"),
        col("byte_len"))
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

  /** Content-entropy QA over the media payloads: per asset, the byte
    * (= ASCII char, per the fixture contract) histogram entropy — the
    * standard blank/stuck-frame/corrupt-stream detector: constant or
    * near-constant content collapses to ~0, healthy content sits well
    * above. Reported in [[Search.detLn]] units (the shared
    * deterministic ln), summed with a sorted left-fold so the doubles
    * are bit-identical at any partition count and in DuckDB. One
    * explode + two keyed aggregations — content-sized, no shuffle
    * wider than the (asset, byte-value) histogram. */
  def contentEntropy(spark: SparkSession, dir: String): DataFrame =
    contentEntropyOn(Tables.spread(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("text")))

  private[graft] def contentEntropyOn(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("ct"))
    val totals = counts.groupBy(col("doc_id"))
      .agg(sum(col("ct")).as("n"), count(lit(1)).as("distinct_bytes"))
    counts.join(totals, Seq("doc_id"))
      .withColumn("p", col("ct").cast("double") / col("n").cast("double"))
      .withColumn("term", col("p") * Search.detLn(col("p")))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_bytes"),
        max(col("distinct_bytes")).as("distinct_bytes"),
        (lit(0.0) - expr(
          "aggregate(sort_array(collect_list(term)), cast(0.0 as double), (a, x) -> a + x)"))
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> ((s, d) => mediaFeatures(s, d)),
    "mm_content_entropy" -> ((s, d) => contentEntropy(s, d)),
    "mm_frame_samples" -> ((s, d) => frameSamples(s, d)))

  val oracles: Map[String, String] = Map(
    // char histogram → p·detLn(p) terms → sorted left-fold, negated
    "mm_content_entropy" ->
      s"""WITH counts AS (
         |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS ct FROM (
         |    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
         |  ) GROUP BY doc_id, ch
         |), totals AS (
         |  SELECT doc_id, CAST(SUM(ct) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS distinct_bytes
         |  FROM counts GROUP BY doc_id
         |), terms AS (
         |  SELECT c.doc_id, t.n, t.distinct_bytes,
         |    (CAST(c.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
         |      * ${Search.duckDetLn("(CAST(c.ct AS DOUBLE) / CAST(t.n AS DOUBLE))")} AS term
         |  FROM counts c JOIN totals t ON c.doc_id = t.doc_id
         |)
         |SELECT doc_id, MAX(n) AS n_bytes, MAX(distinct_bytes) AS distinct_bytes,
         |  0.0 - list_reduce(list_sort(list(term)), (a, x) -> a + x) AS entropy
         |FROM terms GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // every feature is header-derived, and the headers derive from
    // doc_id by the fixture rules — so DuckDB rebuilds the full row
    // (header sizes: PNG 33, WAV 44, JPEG 49 bytes; text is ASCII, so
    // content bytes = length(text))
    "mm_media_features" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 64 + doc_id % 577 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 64 + doc_id % 433 END AS BIGINT) AS height,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 4 WHEN 1 THEN 1 + doc_id % 2 ELSE 3 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000 ELSE 0 END AS BIGINT) AS sample_rate,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 33 WHEN 1 THEN 44 ELSE 49 END + length(text) AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,
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
