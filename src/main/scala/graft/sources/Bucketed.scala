package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing for co-located fact-fact joins — the 100 TB
  * lever SCALE.md's scan-layer notes rely on: two tables bucketed by
  * the same key into the same bucket count join WITHOUT an Exchange on
  * either side (Spark matches `HashPartitioning(key, n)` from the
  * bucket spec), and `sortBy` within buckets removes the merge-join
  * sort as well when each bucket holds one file.
  *
  * At cluster scale these are real catalog tables (`lineitem`/`orders`
  * bucketed by order key at load time — one-time shuffle at ingest,
  * zero per-query shuffles afterwards). Locally the same API writes
  * external parquet tables at an explicit path; BucketedSpec asserts
  * the no-Exchange plan and result equality against the plain join.
  */
object Bucketed {

  /** Write `df` as an external bucketed table (parquet at `path`,
    * registered as `name`), bucketed AND sorted by `key` into
    * `buckets` buckets, and return the readable table frame. */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    key: String, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(name)
    spark.table(name)
  }
}
