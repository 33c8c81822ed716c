package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Specialized Maxwell-envelope JSON parser behind [[MaxwellParse]] —
  * the S3 ingest hot path (`MyKafkaUtil.java:91-100` consumers parse
  * every `topic_db` record) re-expressed as a lean single-pass Jackson
  * parse over the UTF8String's bytes.
  *
  * Why not `from_json`: `JsonToStructs` is a `CodegenFallback`, so the
  * projection containing it (after ProjectCollapsing, typically the
  * WHOLE parse-and-project stage) drops out of whole-stage codegen
  * into per-row interpreted eval, and its generic `JacksonParser`
  * allocates an InputStreamReader + StreamDecoder + CharsetDecoder +
  * read-constrained TextBuffer PER ROW (`CreateJacksonParser.utf8String`)
  * — measured here as an allocation/GC storm that made the CDC
  * envelope build 10× slower than the scan it wraps. This parser
  * reads the bytes Jackson-native (no Reader, no charset decode pass —
  * JSON is already UTF-8), allocates only the output row, and the
  * expression's codegen keeps the surrounding projection fused.
  *
  * Semantics are `from_json(value, maxwellSchema)` PERMISSIVE parity,
  * spec-pinned in MaxwellParseSpec:
  *  - malformed input / non-object root → null row;
  *  - a field-TYPE mismatch (string `ts`, scalar `data`) nulls just
  *    that field and keeps the rest — Spark's partial-results
  *    PERMISSIVE behavior (`spark.sql.json.enablePartialResults`,
  *    default on since 3.4);
  *  - missing fields → null fields; unknown fields → skipped;
  *  - string fields and map values: string tokens as-is, scalar
  *    non-strings as their literal text, nested structures as their
  *    raw JSON (JacksonParser's StringType fallback), null as null.
  */
object MaxwellJson {
  /** The gmall `topic_db` Maxwell shape (also LogStream.maxwellSchema). */
  val schema: StructType = StructType(Seq(
    StructField("database", StringType), StructField("table", StringType),
    StructField("type", StringType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType)),
    StructField("ts", LongType)))

  private val factory = new JsonFactory() // thread-safe for createParser

  /** Record-level failure sentinel: cheaper than exceptions with
    * stack traces, and never escapes [[parse]]. */
  private object Fail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Parse one envelope line; null on any malformation (the caller's
    * dirty-quarantine contract). Called from generated code. */
  def parse(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    try {
      val p = factory.createParser(bytes, 0, bytes.length)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        var db: UTF8String = null
        var table: UTF8String = null
        var typ: UTF8String = null
        var data: MapData = null
        var old: MapData = null
        var ts: java.lang.Long = null
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          p.nextToken()
          name match {
            case "database" => db = stringValue(p)
            case "table" => table = stringValue(p)
            case "type" => typ = stringValue(p)
            case "data" => data = mapValue(p)
            case "old" => old = mapValue(p)
            case "ts" => ts = longValue(p)
            case _ => p.skipChildren()
          }
        }
        new GenericInternalRow(Array[Any](db, table, typ, data, old,
          if (ts == null) null else ts.longValue()))
      } finally p.close()
    } catch {
      // ONLY malformation escapes here: the Fail sentinel, Jackson's
      // own parse errors (JsonProcessingException covers truncation,
      // bad tokens, and the read-constraint violations —
      // StreamConstraintsException extends it), and
      // CharConversionException — Jackson's encoding auto-detect reads
      // leading NUL bytes as UTF-32/16 and its decoder throws
      // CharConversionException (an IOException, not a
      // JsonProcessingException); Spark's JacksonParser quarantines it
      // explicitly, so parity requires catching it or one garbage
      // Kafka record permanently fails the stream. A blanket
      // RuntimeException catch would convert genuine parser bugs into
      // silent dirty-data loss, so those still propagate.
      case Fail => null
      case _: com.fasterxml.jackson.core.JsonProcessingException => null
      case _: java.io.CharConversionException => null
    }
  }

  /** StringType conversion, JacksonParser-parity: strings as-is,
    * scalars as literal text, structures as raw JSON, null as null. */
  private def stringValue(p: JsonParser): UTF8String = p.currentToken() match {
    case JsonToken.VALUE_STRING => UTF8String.fromString(p.getText)
    case JsonToken.VALUE_NULL => null
    case JsonToken.VALUE_NUMBER_INT |
         JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
      UTF8String.fromString(p.getText)
    case JsonToken.VALUE_NUMBER_FLOAT |
         JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
      // floats re-render through the generator (→ double form, e.g.
      // 1.5e2 → "150.0") for JacksonParser StringType parity; getText
      // would keep the source spelling and silently diverge
      val out = new java.io.ByteArrayOutputStream()
      val g = factory.createGenerator(out)
      g.copyCurrentStructure(p)
      g.close()
      UTF8String.fromBytes(out.toByteArray)
    case _ => throw Fail
  }

  private def mapValue(p: JsonParser): MapData = p.currentToken() match {
    case JsonToken.VALUE_NULL => null
    case JsonToken.START_OBJECT =>
      val keys = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
      val values = new scala.collection.mutable.ArrayBuffer[AnyRef](16)
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        keys += UTF8String.fromString(p.currentName())
        p.nextToken()
        values += stringValue(p)
      }
      if (p.currentToken() != JsonToken.END_OBJECT) throw Fail
      new ArrayBasedMapData(
        new GenericArrayData(keys.toArray[AnyRef]),
        new GenericArrayData(values.toArray[AnyRef]))
    case _ => skipMismatch(p) // e.g. "data": "oops" — null field, record kept
  }

  private def longValue(p: JsonParser): java.lang.Long = p.currentToken() match {
    case JsonToken.VALUE_NUMBER_INT =>
      // numbers wider than 64 bits are a field-TYPE mismatch, not a
      // malformed record: null the field, keep the rest (from_json
      // partial-results parity — {"ts":1e20-as-int} keeps "table")
      try p.getLongValue
      catch { case _: com.fasterxml.jackson.core.exc.InputCoercionException => null }
    case JsonToken.VALUE_NULL => null
    case _ => skipMismatch(p) // e.g. "ts": "not-a-number"
  }

  /** Field-type mismatch: consume the value (descending into a
    * structure if that's what it is) and null just this field —
    * Spark's partial-results PERMISSIVE parity. The scalar case is
    * already fully consumed by currentToken. */
  private def skipMismatch(p: JsonParser): Null = {
    if (p.currentToken() == JsonToken.START_OBJECT ||
        p.currentToken() == JsonToken.START_ARRAY) p.skipChildren()
    null
  }
}
