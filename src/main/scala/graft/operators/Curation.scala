package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond per-document scoring: cross-document block-level
  * dedup (the C4/Dolma "drop repeated paragraphs" pass), token-budget
  * sequence packing into training shards, PII scan/redaction, and
  * int8 embedding quantization.
  *
  * All four are declarative single-pass/single-shuffle plans:
  *  - block dedup: explode → one window shuffle on the block hash →
  *    one per-doc re-aggregation (no join-back, no self-join);
  *  - packing: a two-level prefix sum (per-bucket window + a tiny
  *    bucket-offset frame) — the classic scalable cumsum, no global
  *    single-partition window;
  *  - PII: stateless per-row regexes, whole-stage codegen;
  *  - quantization: per-row array math, no shuffle at all.
  */
object Curation {

  // ---------------------------------------------------------------
  // Block-level exact dedup (C4/Dolma-style repeated-span removal)
  // ---------------------------------------------------------------

  /** Words per dedup block. Small enough that boilerplate spans
    * collide, large enough that natural text rarely collides by
    * chance (16 words ≈ a sentence). */
  val BlockWords = 16

  /** Cross-document block dedup over (doc_id, text): split each doc
    * into non-overlapping [[BlockWords]]-word blocks, keep only the
    * globally FIRST occurrence of each distinct block (ordered by
    * (doc_id, block_idx)), and reassemble the surviving blocks in
    * document order.
    *
    * Scale shape: the only wide operation is ONE window shuffle
    * keyed on the 128-bit block hash — per-key groups are tiny (the
    * duplicate count of one block), so the sort inside each key is
    * O(dup_count log dup_count); a boilerplate block repeated 10⁶
    * times lands on one reducer as a single skewed key, which AQE
    * cannot split for a window — at that extreme, pre-aggregate
    * min(doc_id, block_idx) per hash (groupBy, map-side combined)
    * and join back instead; the window form is preferred here
    * because it is one shuffle instead of two and corpus block
    * frequencies are Zipf-bounded after the quality filter.
    * Reassembly is a per-doc groupBy whose state is the doc's own
    * surviving blocks. */
  private[graft] def blockDedupOn(docs: DataFrame, blockWords: Int = BlockWords): DataFrame = {
    val blocks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(ceil(size(toks) / ${blockWords}.0d) as int) - 1),
             |  i -> array_join(slice(toks, i * $blockWords + 1, $blockWords), ' '))""".stripMargin))
          .as(Seq("block_idx", "bstr")))
      .withColumn("block_idx", col("block_idx").cast(LongType))
    val ranked = blocks
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("bstr"))).orderBy(col("doc_id"), col("block_idx"))))
    // ONE aggregation produces both the total and the kept side:
    // conditional aggregates over the ranked frame, clean text from
    // the idx-sorted surviving blocks (collect_list order is
    // nondeterministic; array_sort on (block_idx, bstr) pins it).
    ranked
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("block_ct"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_ct"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") === 1, struct(col("block_idx"), col("bstr"))))),
            x => x.getField("bstr")),
          " ").as("clean_text"))
      .withColumn("dropped_ct", col("block_ct") - col("kept_ct"))
      .select(col("doc_id"), col("block_ct"), col("kept_ct"), col("dropped_ct"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def blockDedup(spark: SparkSession, dir: String): DataFrame =
    blockDedupOn(Tables.spread(spark, Tables.documents(spark, dir)))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------
  // Token-budget sequence packing (training-shard assignment)
  // ---------------------------------------------------------------

  /** Token capacity of one packed training shard. */
  val ShardTokens = 2048L

  /** Docs per prefix-sum bucket: inner cumsums run as a partitioned
    * window; only one row PER BUCKET reaches the bucket-offset
    * cumsum, so pick the bucket size so bucket count stays driver-
    * friendly (at 10¹⁰ docs, 4096-doc buckets → 2.4 M bucket rows —
    * still one small window; add a second level if that ever grows
    * past memory). */
  val PackBucketDocs = 64L

  /** Contiguous token-budget packing: order docs by doc_id, give each
    * doc its exclusive running-token offset, and assign it to shard
    * `offset div capacity`. This is the standard distributed prefix
    * sum: per-bucket windows compute local cumsums in parallel, the
    * per-bucket totals (a tiny frame) get their own cumsum, and a
    * broadcast join composes the global offset — no global
    * single-partition window anywhere. */
  private[graft] def packShardsOn(docs: DataFrame,
                                  capacity: Long = ShardTokens,
                                  bucketDocs: Long = PackBucketDocs): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("tok_ct"),
      expr(s"doc_id div $bucketDocs").as("bucket"))
    val inner = base.withColumn("inner_prev",
      coalesce(
        sum(col("tok_ct")).over(
          Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val bucketOffsets = base
      .groupBy(col("bucket")).agg(sum(col("tok_ct")).as("bt"))
      .withColumn("bucket_prev",
        coalesce(
          sum(col("bt")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("bucket_prev"))
    inner.join(broadcast(bucketOffsets), "bucket")
      .withColumn("tok_offset", col("bucket_prev") + col("inner_prev"))
      .select(col("doc_id"), col("tok_ct"), col("tok_offset"),
        expr(s"tok_offset div $capacity").as("shard_id"))
  }

  def packShards(spark: SparkSession, dir: String): DataFrame =
    Memo(spark, dir, "curation.packShards")(
      packShardsOn(Tables.spread(spark, Tables.documents(spark, dir))))
      .orderBy(col("doc_id"))

  /** Shard-level manifest over [[packShards]]: the frame a training
    * job reads to plan its data loading. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame =
    Memo(spark, dir, "curation.packShards")(
      packShardsOn(Tables.spread(spark, Tables.documents(spark, dir))))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("doc_ct"), sum(col("tok_ct")).as("token_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))

  // ---------------------------------------------------------------
  // PII scan + redaction
  // ---------------------------------------------------------------

  /** Patterns kept to the Java-regex ∩ RE2 common subset so the
    * engine (Java `regexp_*`) and the DuckDB oracle (RE2) agree
    * byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The synthetic word-salad corpus carries no PII, so the scan is
    * exercised on a deterministic augmentation: docs at doc_id ≡ 0
    * (mod 3/5/7) get a synthetic email / phone / IP appended. Both
    * the engine and the DuckDB oracle build the SAME augmented text,
    * so every regex path is verified with real positives AND real
    * negatives (docs with none appended). */
  private[graft] def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.withColumn("aug", concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" reach user"), col("doc_id").cast(StringType), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 415-555-"), lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10."), (col("doc_id") % 256).cast(StringType),
          lit(".0."), ((col("doc_id") * 7) % 256).cast(StringType)))
        .otherwise(lit(""))))

  private def reCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast(LongType)

  /** Per-document PII hit counts (before redaction). Stateless
    * per-row regexes — codegen'd, scan-bound, trivially streamable. */
  private[graft] def piiScanOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("aug"))
      .withColumn("email_ct", reCount(col("aug"), EmailRe))
      .withColumn("phone_ct", reCount(col("aug"), PhoneRe))
      .withColumn("ip_ct", reCount(col("aug"), IpRe))
      .withColumn("pii_ct", col("email_ct") + col("phone_ct") + col("ip_ct"))
      .withColumn("has_pii", (col("pii_ct") > 0).cast(LongType))
      .drop("aug")

  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanOn(withSyntheticPii(Tables.spread(spark, Tables.documents(spark, dir))))
      .orderBy(col("doc_id"))

  /** Redaction: replace each PII class with a typed placeholder, in a
    * fixed order (email → phone → ip; the classes cannot overlap, so
    * the order is cosmetic but pinned for the oracle). */
  private[graft] def piiRedactOn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("aug"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        IpRe, "[IP]").as("redacted"))

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOn(withSyntheticPii(Tables.spread(spark, Tables.documents(spark, dir))))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------
  // int8 embedding quantization
  // ---------------------------------------------------------------

  /** Symmetric per-vector int8 quantization (the standard ANN-index /
    * KV-cache compression step): scale = max |x|, q_i = round(x_i /
    * scale · 127). Output is exact-integer summaries plus the scale
    * (a float preserved bit-exactly through double), so the oracle
    * compares exactly — `floor(v + 0.5)` is used instead of
    * `round()` because Spark and DuckDB disagree on banker's vs
    * half-up rounding, while floor is IEEE-pinned in both. Per-row
    * array math only: no shuffle, fully codegen'd. */
  private[graft] def quantizeOn(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("dim", size(col("v")).cast(LongType))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("q", expr(
        """CASE WHEN scale > 0d
          |  THEN transform(v, x -> cast(floor(x / scale * 127.0d + 0.5d) as bigint))
          |  ELSE transform(v, x -> 0L) END""".stripMargin))
      .select(col("vec_id"), col("dim"), col("scale"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        expr("aggregate(q, 0L, (a, x) -> a + abs(x))").as("q_l1"),
        expr("cast(size(filter(q, x -> abs(x) = 127)) as bigint)").as("saturated_ct"))

  def quantize(spark: SparkSession, dir: String): DataFrame =
    quantizeOn(Tables.spread(spark, Tables.embeddings(spark, dir)))
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------
  // Registration
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_block_dedup" -> ((s, d) => blockDedup(s, d)),
    "text_pack_shards" -> ((s, d) => packShards(s, d)),
    "text_shard_manifest" -> ((s, d) => shardManifest(s, d)),
    "text_pii_scan" -> ((s, d) => piiScan(s, d)),
    "text_pii_redact" -> ((s, d) => piiRedact(s, d)),
    "sim_embedding_quantize" -> ((s, d) => quantize(s, d)))

  // Single-line on purpose: this fragment is interpolated into
  // stripMargin'd oracle strings, where a line starting with `||`
  // would lose its first pipe to the margin stripping.
  private val augSql: String =
    "SELECT doc_id, text" +
      " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END" +
      " || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END" +
      " AS aug FROM documents"

  val oracles: Map[String, String] = Map(
    "text_block_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |bl AS (
         |  SELECT doc_id,
         |    list_transform(range(0, CAST(ceil(len(toks) / $BlockWords.0) AS BIGINT)),
         |      i -> array_to_string(list_slice(toks, CAST($BlockWords*i+1 AS INT), CAST($BlockWords*i+$BlockWords AS INT)), ' ')) AS blocks
         |  FROM t
         |), b0 AS (
         |  SELECT doc_id, unnest(range(0, len(blocks))) AS bi, unnest(blocks) AS bstr FROM bl
         |), b AS (
         |  SELECT doc_id, CAST(bi AS BIGINT) AS block_idx, bstr FROM b0
         |), k AS (
         |  SELECT doc_id, block_idx, bstr,
         |    row_number() OVER (PARTITION BY md5(bstr) ORDER BY doc_id, block_idx) AS rn
         |  FROM b
         |), tot AS (
         |  SELECT doc_id, COUNT(*) AS block_ct FROM b GROUP BY doc_id
         |), kept AS (
         |  SELECT doc_id, COUNT(*) AS kept_ct,
         |    string_agg(bstr, ' ' ORDER BY block_idx) AS clean_text
         |  FROM k WHERE rn = 1 GROUP BY doc_id
         |)
         |SELECT tot.doc_id, CAST(tot.block_ct AS BIGINT) AS block_ct,
         |  CAST(COALESCE(kept.kept_ct, 0) AS BIGINT) AS kept_ct,
         |  CAST(tot.block_ct - COALESCE(kept.kept_ct, 0) AS BIGINT) AS dropped_ct,
         |  COALESCE(kept.clean_text, '') AS clean_text
         |FROM tot LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_pack_shards" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_ct,
         |    doc_id // $PackBucketDocs AS bucket
         |  FROM documents
         |), i AS (
         |  SELECT doc_id, tok_ct, bucket,
         |    COALESCE(SUM(tok_ct) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS inner_prev
         |  FROM t
         |), bt AS (
         |  SELECT bucket, SUM(tok_ct) AS bt FROM t GROUP BY bucket
         |), bo AS (
         |  SELECT bucket, COALESCE(SUM(bt) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_prev
         |  FROM bt
         |)
         |SELECT i.doc_id, i.tok_ct,
         |  CAST(bo.bucket_prev + i.inner_prev AS BIGINT) AS tok_offset,
         |  CAST((bo.bucket_prev + i.inner_prev) // $ShardTokens AS BIGINT) AS shard_id
         |FROM i JOIN bo USING (bucket) ORDER BY doc_id""".stripMargin,
    "text_shard_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_ct,
         |    doc_id // $PackBucketDocs AS bucket
         |  FROM documents
         |), i AS (
         |  SELECT doc_id, tok_ct, bucket,
         |    COALESCE(SUM(tok_ct) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS inner_prev
         |  FROM t
         |), bt AS (
         |  SELECT bucket, SUM(tok_ct) AS bt FROM t GROUP BY bucket
         |), bo AS (
         |  SELECT bucket, COALESCE(SUM(bt) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bucket_prev
         |  FROM bt
         |), p AS (
         |  SELECT i.doc_id, i.tok_ct,
         |    CAST((bo.bucket_prev + i.inner_prev) // $ShardTokens AS BIGINT) AS shard_id
         |  FROM i JOIN bo USING (bucket)
         |)
         |SELECT shard_id, COUNT(*) AS doc_ct, CAST(SUM(tok_ct) AS BIGINT) AS token_sum,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    "text_pii_scan" ->
      s"""WITH a AS ($augSql), c AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS email_ct,
         |    CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS phone_ct,
         |    CAST(len(regexp_extract_all(aug, '$IpRe')) AS BIGINT) AS ip_ct
         |  FROM a
         |)
         |SELECT doc_id, email_ct, phone_ct, ip_ct,
         |  email_ct + phone_ct + ip_ct AS pii_ct,
         |  CAST(CASE WHEN email_ct + phone_ct + ip_ct > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_pii
         |FROM c ORDER BY doc_id""".stripMargin,
    "text_pii_redact" ->
      s"""WITH a AS ($augSql)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '$EmailRe', '[EMAIL]', 'g'),
         |    '$PhoneRe', '[PHONE]', 'g'),
         |    '$IpRe', '[IP]', 'g') AS redacted
         |FROM a ORDER BY doc_id""".stripMargin,
    "sim_embedding_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
        |), s AS (
        |  SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
        |    list_max(list_transform(v, x -> abs(x))) AS scale, v
        |  FROM e
        |), q AS (
        |  SELECT vec_id, dim, scale,
        |    CASE WHEN scale > 0
        |      THEN list_transform(v, x -> CAST(floor(x / scale * 127.0 + 0.5) AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS qv
        |  FROM s
        |)
        |SELECT vec_id, dim, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS saturated_ct
        |FROM q ORDER BY vec_id""".stripMargin)
}
