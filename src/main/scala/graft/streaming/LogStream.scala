package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest plumbing, the Structured Streaming form of the
  * reference's ODS layer. Every function here takes and returns a
  * `DataFrame` so it works identically on `spark.read` (batch tests)
  * and `spark.readStream` (production): batch-first,
  * streaming-compatible per SURVEY.md §7.1.
  *
  * Reference semantics reproduced (see SURVEY.md §2.1/§2.2):
  *  - P1  JSON parse with dirty-data side output
  *    (`app/dim/DimApp.java:39-55`, `app/dwd/log/BaseLogApp.java:41-62`)
  *  - S3  Maxwell CDC envelope table
  *    (`utils/MyKafkaUtil.java:91-100`)
  *  - P10 five-way log splitting with array explosion
  *    (`app/dwd/log/BaseLogApp.java:109-199`)
  *  - P3  CDC slice filter (`DwdTradeOrderDetail.java:48-51`)
  *  - P4  changed-column predicate (`DwdTradeCartAdd.java:56-59`)
  *
  * Scale notes: all of this is stateless row-at-a-time work — no
  * shuffle, fully inside whole-stage codegen. `from_json` returns null
  * on corrupt input, so the quarantine split is two filters over one
  * pass, not a try/catch per record.
  */
object LogStream {

  /** Page-log schema: the gmall `topic_log` JSON shape
    * (`BaseLogApp.java:117-172` probes exactly these fields). */
  val pageLogSchema: StructType = StructType(Seq(
    StructField("common", StructType(Seq(
      StructField("mid", StringType), StructField("uid", StringType),
      StructField("vc", StringType), StructField("ch", StringType),
      StructField("ar", StringType), StructField("is_new", StringType)))),
    StructField("page", StructType(Seq(
      StructField("page_id", StringType), StructField("last_page_id", StringType),
      StructField("item", StringType), StructField("item_type", StringType),
      StructField("during_time", LongType)))),
    StructField("start", StructType(Seq(
      StructField("entry", StringType), StructField("loading_time", LongType)))),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("display_type", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("pos_id", StringType))))),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("action_id", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("ts", LongType))))),
    StructField("err", StructType(Seq(
      StructField("error_code", StringType), StructField("msg", StringType)))),
    StructField("ts", LongType)))

  /** Maxwell CDC envelope: the gmall `topic_db` table shape
    * (`MyKafkaUtil.java:91-100`; `ts`+string-`old` variant at
    * `DwdTradeOrderRefund.java:46-54`). Defined by the native parser
    * (one definition — see [[graft.functions.MaxwellJson]]). */
  val maxwellSchema: StructType = graft.functions.MaxwellJson.schema

  /** P1: parse a raw string column; rows that fail to parse carry a
    * null (or, in PERMISSIVE mode, all-null) struct. Returns the
    * annotated frame; split with [[clean]] / [[dirty]] (two filters
    * over one pass — the side-output analog of `DimApp.java:39-55`).
    *
    * Schemas inside [[graft.functions.SchemaJson.supports]]'s type
    * surface (string/long leaves, nested structs, arrays, string
    * maps — which covers BOTH reference ingest shapes) parse through
    * the native codegen'd [[graft.functions.SchemaJsonParse]];
    * `from_json`'s CodegenFallback + per-row Reader stack was
    * measured 10× slower on the Maxwell path and `BaseLogApp.java`'s
    * `topic_log` is the reference's highest-volume ingest. Anything
    * outside that surface falls back to `from_json` (identical
    * semantics, spec-pinned parity — see PageLogParseSpec).
    *
    * The parse is wrapped in a one-element `explode` — a `Generate`
    * barrier. Without it, alias inlining (CollapseProject +
    * predicate pushdown) substitutes the parse expression into EVERY
    * downstream reference: the dirty-check's per-field null tests plus
    * the `parsed.*` projection re-parse the same line up to
    * 2+2×fields times per row (measured 208 parse copies in the CDC
    * envelope's optimized plan — the single dominant cost of the
    * whole build). `Generate` evaluates the generator once per row and
    * emits `parsed` as a real attribute, so field accesses downstream
    * are struct reads, not re-parses. `explode` of a 1-element array
    * never drops or adds rows and is streaming-safe. */
  def parse(raw: DataFrame, schema: StructType, column: String = "value"): DataFrame =
    parseWith(raw,
      if (graft.functions.SchemaJson.supports(schema))
        graft.functions.GraftExpressions.jsonParse(col(column), schema)
      else from_json(col(column), schema),
      column)

  /** Keeps EVERY input column (Kafka timestamp/partition metadata,
    * caller-added fields) alongside `parsed` — the Generate barrier
    * needs a projection, not a narrowing one. A pre-existing column
    * named `parsed` would make every downstream `col("parsed")`
    * ambiguous (AnalysisException), so it is an error here, loudly. */
  private def parseWith(raw: DataFrame, parser: Column, column: String): DataFrame = {
    require(!raw.columns.contains("parsed"),
      "input frame already has a column named 'parsed'; rename it before LogStream.parse")
    raw.select(raw.columns.map(col).toSeq :+ explode(array(parser)).as("parsed"): _*)
  }

  /** `from_json` in PERMISSIVE mode maps malformed input to a struct
    * whose every top-level field is null — indistinguishable from a
    * parse failure, so both shapes are quarantined. */
  private def isDirty(parsed: DataFrame): Column = {
    val schema = parsed.schema("parsed").dataType.asInstanceOf[StructType]
    col("parsed").isNull ||
      schema.fieldNames.map(f => col("parsed")(f).isNull).reduce(_ && _)
  }

  def clean(parsed: DataFrame): DataFrame =
    parsed.filter(!isDirty(parsed)).select(col("parsed.*"))

  /** Dirty side output: the raw line, for a quarantine sink. */
  def dirty(parsed: DataFrame, column: String = "value"): DataFrame =
    parsed.filter(isDirty(parsed)).select(col(column))

  /** S3: Maxwell envelope with the processing-time ingest column
    * (`pt AS PROCTIME()` ≈ `current_timestamp()`, semantic difference
    * documented in SURVEY.md §1.2). Parses via the native
    * [[graft.functions.MaxwellParse]] expression — `from_json` parity
    * (spec-pinned) with the whole projection kept in whole-stage
    * codegen; `from_json`'s CodegenFallback + per-row Reader stack
    * made envelope ingest the measured bottleneck of every CDC leg. */
  def maxwellEnvelope(raw: DataFrame, column: String = "value"): DataFrame =
    clean(parseWith(raw,
        graft.functions.GraftExpressions.maxwellParse(col(column)), column))
      .withColumn("pt", current_timestamp())

  /** P3: slice one table's change events out of the CDC firehose. */
  def cdcSlice(envelope: DataFrame, table: String, types: Seq[String]): DataFrame =
    envelope.filter(col("table") === table && col("type").isin(types: _*))

  /** P4: "column changed" predicate on the Maxwell `old` map. */
  def columnChanged(oldCol: Column, key: String): Column =
    array_contains(map_keys(oldCol), key)

  /** P10: five-way split of the parsed page log. One cached pass, five
    * filtered projections; `displays`/`actions` are exploded with the
    * parent fields pushed into each element, exactly as
    * `BaseLogApp.java:134-160` does by hand. */
  def splitLog(log: DataFrame): Map[String, DataFrame] = {
    val err = log.filter(col("err").isNotNull)
    val start = log.filter(col("err").isNull && col("start").isNotNull)
    val pages = log.filter(col("err").isNull && col("start").isNull)
    val display = pages.filter(col("displays").isNotNull)
      .select(col("common"), col("page.page_id").as("page_id"), col("ts"),
        explode(col("displays")).as("display"))
      .select(col("common"), col("page_id"), col("ts"), col("display.*"))
    val action = pages.filter(col("actions").isNotNull)
      .select(col("common"), col("page.page_id").as("page_id"),
        explode(col("actions")).as("action"))
      .select(col("common"), col("page_id"), col("action.*"))
    Map(
      "page" -> pages.drop("displays", "actions", "start", "err"),
      "start" -> start.drop("displays", "actions", "page", "err"),
      "display" -> display,
      "action" -> action,
      "err" -> err)
  }
}
