package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Per-byte media-content kernels ([[BlockHash64]],
  * [[ByteEntropyStats]]) — the scan-stage replacement for the
  * `posexplode(split(t, ''))` pipelines that used to feed
  * `Multimodal.blockHashesOn` / `contentEntropyOn`. Those pipelines
  * were correct and shuffle-bounded (map-side combine kept the
  * exchange at ≤64 rows/doc), but the SCAN stage paid one full row —
  * pos, copied length, sliced one-char string — per payload byte:
  * ~50× row-overhead amplification on content that is a few hundred
  * bytes of per-row state. Each kernel is one allocation-light pass
  * over the content inside whole-stage codegen (the
  * [[MediaHeaders.packedInfo]] pattern: plain static Scala the
  * generated Java calls directly).
  *
  * Bit-for-bit equivalence with the old pipelines (pinned by the
  * `GraftProps` blockhash property and the `mm_*` oracles):
  *  - positions/lengths count CODE POINTS, matching `split(t, '')` +
  *    `length(t)`/`ascii(…)` semantics (fixture content is ASCII, so
  *    code point == byte — the contract `Multimodal` documents);
  *  - entropy terms replay `p * detLn(p)` with the identical IEEE op
  *    order ([[detLn]] = the 2^20-sqrt deterministic ln of
  *    `Search.detLn`), then fold ASCENDING from 0.0 exactly like
  *    `aggregate(sort_array(collect_list(term)), 0.0, +)` — so the
  *    result is bit-identical at any partition count and in DuckDB.
  */
object MediaContent {

  /** 64-bit mean-threshold blockhash over code points: block of
    * position p = ⌊p·64/L⌋; bit b set iff block-sum·L > total·count —
    * all-integer cross-multiplied compare, no float enters the hash.
    * Contents shorter than 64 code points return 0L (callers gate on
    * `length(t) >= 64`, as [[graft.operators.Multimodal.blockHashesOn]]
    * always has; a 64-bit hash of <64 bytes is noise). */
  def blockHash64(s: UTF8String): Long = {
    val str = s.toString
    val l = str.codePointCount(0, str.length).toLong
    if (l < 64) return 0L
    val sums = new Array[Long](64)
    val cts = new Array[Long](64)
    var total = 0L
    var i = 0
    var p = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val b = (p * 64L / l).toInt
      sums(b) += cp
      cts(b) += 1L
      total += cp
      p += 1L
      i += Character.charCount(cp)
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) * l > total * cts(b)) h |= 1L << b
      b += 1
    }
    h
  }

  /** `Search.detLn` scalar twin: ln(x) ≈ 2^20·(x^(1/2^20) − 1) via 20
    * IEEE-exact sqrts — deterministic across JVM, Spark codegen, and
    * DuckDB (sqrt is correctly rounded everywhere; libm log is not). */
  private def detLn(x: Double): Double = {
    var c = x
    var i = 0
    while (i < 20) { c = Math.sqrt(c); i += 1 }
    (c - 1.0) * 1048576.0
  }

  /** (n_bytes, distinct_bytes, entropy) of the code-point histogram.
    * Entropy = −Σ p·detLn(p) with the terms summed in ASCENDING order
    * from 0.0 (the old `sort_array` fold), p = ct/n in one double
    * division per distinct value. */
  def entropyStats(s: UTF8String): InternalRow = {
    val str = s.toString
    // Empty content: the legacy explode pipeline (`split(t, '')` →
    // `['']`) saw ONE empty-string element → (1, 1, 0.0). The
    // histogram loop below would say (0, 0, 0.0) — replay the legacy
    // contract instead so "bit-identical by construction" (and the
    // mm_content_entropy oracle) holds for empty documents too, not
    // just the non-empty fixture docs.
    if (str.isEmpty) return new GenericInternalRow(Array[Any](1L, 1L, 0.0))
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    val terms = new Array[Double](counts.size)
    val it = counts.values().iterator()
    var j = 0
    while (it.hasNext) {
      val ct = it.next()(0)
      val p = ct.toDouble / n.toDouble
      terms(j) = p * detLn(p)
      j += 1
    }
    java.util.Arrays.sort(terms)
    var sum = 0.0
    var k = 0
    while (k < terms.length) { sum += terms(k); k += 1 }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, 0.0 - sum))
  }
}
