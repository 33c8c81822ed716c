package graft.operators

/** DuckDB SQL fragments mirroring the engine's custom hash
  * expressions, so hash-defined queries get full value oracles
  * instead of rows-only checks.
  *
  * FNV-1a must wrap at 64 bits; DuckDB integer arithmetic raises on
  * overflow instead of wrapping, so the byte reduction runs in
  * HUGEINT modulo 2^64 and maps back to signed two's complement at
  * the end. Bytes come from `unicode()` per character — exact for the
  * all-ASCII fixture (the same assumption the frame-sample oracle
  * makes); a multi-byte corpus would need DuckDB's blob functions.
  */
private[operators] object DuckSql {

  /** Unsigned (HUGEINT, 0..2^64) FNV-1a 64 of a string expression. */
  def fnvU(arg: String): String =
    s"""list_reduce(
       |  list_prepend(CAST('14695981039346656037' AS HUGEINT),
       |    list_transform(range(1, length($arg) + 1),
       |      i -> CAST(unicode(substring($arg, CAST(i AS INT), 1)) AS HUGEINT))),
       |  (acc, b) -> (xor(acc, b) * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))""".stripMargin

  /** HUGEINT in 0..2^64 → signed two's-complement BIGINT. */
  def signed64(arg: String): String =
    s"""CAST(CASE WHEN $arg >= CAST('9223372036854775808' AS HUGEINT)
       |  THEN $arg - CAST('18446744073709551616' AS HUGEINT) ELSE $arg END AS BIGINT)""".stripMargin

  /** Per-doc SimHash pipeline (mirrors [[graft.functions.SimHash64]]):
    * given `text`, emits CTE bodies `simdocs(doc_id, su, simhash)`
    * where `su` is the unsigned signature and `simhash` the signed
    * form. Vote rule: bit i set iff strictly more than half the
    * whitespace tokens have bit i set in their FNV-1a hash. */
  def simhashCtes(from: String): String =
    s"""simtoks AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '), tok -> ${fnvU("tok")}) AS hs,
       |    len(string_split(text, ' ')) AS n
       |  FROM $from
       |), simsig AS (
       |  SELECT doc_id, list_sum(list_transform(range(0, 64), i ->
       |    CASE WHEN 2 * len(list_filter(hs, x -> (x >> CAST(i AS INT)) % 2 = 1)) > n
       |      THEN CAST(1 AS HUGEINT) << CAST(i AS INT) ELSE CAST(0 AS HUGEINT) END)) AS su
       |  FROM simtoks
       |), simdocs AS (
       |  SELECT doc_id, su, ${signed64("su")} AS simhash FROM simsig
       |)""".stripMargin
}
