package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric determinism helpers.
  *
  * Floating-point SUMs are order-dependent, and Spark's partial
  * aggregation order differs run-to-run and engine-to-engine, so any
  * metric that must hash-match the DuckDB oracle is aggregated in
  * exact DECIMAL and only converted to DOUBLE at the very end. The
  * source data carries at most 2 decimal places, so DECIMAL(18,2)
  * is lossless; products widen to scale 4. The same casts appear in
  * the oracle SQL.
  */
object Num {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact sum of a 2-dp column, surfaced as DOUBLE. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Exact sum of an arbitrary-precision product, surfaced as DOUBLE. */
  def dsum(c: Column): Column = sum(c).cast(DoubleType)
}
