package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Keyword tokenizer — offline-safe substitute for the reference's IK
  * Chinese analyzer (`utils/KeywordUtil.java:13-34`, used by the UDTF
  * `app/func/SplitFunction.java:12-28` via `LATERAL TABLE`).
  *
  * The IK jar needs a dictionary download (zero-egress here), so per
  * SURVEY.md §2.8: Latin/digit runs split on non-alphanumerics; CJK
  * runs emit overlapping bigrams (the classic dictionary-free CJK
  * segmentation), single CJK chars pass through. Deterministic, pure.
  *
  * Usage mirrors the reference's UDTF: `explode(tokenize(col))` —
  * Spark's Generator handles the one-to-many, no custom UDTF class
  * needed.
  */
object Tokenizer {

  private def isCjk(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
      b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
      b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS
  }

  /** Segment a string: alphanumeric runs as-is (lowercased), CJK runs
    * as overlapping bigrams (单字 runs pass through whole). */
  def segment(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    val out = Seq.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isLetterOrDigit(c) && !isCjk(c)) {
        val start = i
        while (i < n && Character.isLetterOrDigit(s.charAt(i)) && !isCjk(s.charAt(i))) i += 1
        out += s.substring(start, i).toLowerCase
      } else if (isCjk(c)) {
        val start = i
        while (i < n && isCjk(s.charAt(i))) i += 1
        val run = s.substring(start, i)
        if (run.length == 1) out += run
        else (0 until run.length - 1).foreach(j => out += run.substring(j, j + 2))
      } else i += 1
    }
    out.result()
  }

  /** Internal-row form for the codegen'd [[SegmentTokens]] expression:
    * generated code calls this static directly — tokenization runs
    * inside whole-stage codegen with no UDF boxing or Encoder
    * round-trip (the keyword DWS window tokenizes every page log
    * line; at 100 TB that difference is a scan-speed pass vs a
    * closure per row). */
  def segmentArrayData(u: UTF8String): ArrayData =
    new GenericArrayData(segment(u.toString).map(UTF8String.fromString).toArray[Any])

  /** Column form: `explode(Tokenizer.tokenize($"keyword"))` — the
    * reference's `LATERAL TABLE(SplitFunction(...))` shape
    * (`app/func/SplitFunction.java:12-28`). NULL input yields an empty
    * array (the historical UDF contract this wrapper preserves — so
    * `size(tokenize(c))` is 0, not NULL, on null text); the raw
    * `graft_segment_tokens` expression keeps standard SQL
    * null-in→null-out semantics. */
  val tokenize: Column => Column = (c: Column) =>
    org.apache.spark.sql.functions.coalesce(
      GraftExpressions.segmentTokens(c),
      org.apache.spark.sql.functions.array().cast("array<string>"))
}
