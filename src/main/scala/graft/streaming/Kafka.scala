package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka wiring (SURVEY.md §2 S1/S2/K1/K2) — the Structured Streaming
  * form of the reference's `utils/MyKafkaUtil.java`.
  *
  * Everything here is plain `format("kafka")` configuration: it
  * compiles and constructs plans against any Spark distribution, and
  * runs wherever `spark-sql-kafka` is on the classpath (every real
  * cluster). This container is zero-egress WITHOUT the connector jar,
  * so `load()`/`start()` stop at the DataSource provider lookup —
  * KafkaWiringSpec pins that exact boundary, and every transform
  * between source and sink is DataFrame-in/out, proven through
  * MemoryStream/file sources (the same micro-batch engine) elsewhere.
  *
  * Reference mappings:
  *  - `getKafkaConsumer` (`MyKafkaUtil.java:24-50`): string consumer
  *    whose deserializer maps null-value records (tombstones) to ""
  *    rather than dropping or crashing — [[source]] reproduces that
  *    contract with a coalesce on the cast value.
  *  - `getKafkaDDL` (`MyKafkaUtil.java:66-73`): latest-offset startup,
  *    per-app consumer group — the option set of [[source]].
  *  - `getTopicDbDDL` (`MyKafkaUtil.java:93-104`): the Maxwell table
  *    with `pt AS PROCTIME()` — [[topicDb]] = source → parsed
  *    envelope + processing-time column (`LogStream.maxwellEnvelope`).
  *  - `getKafkaProducer` (`MyKafkaUtil.java:52-56`): plain string
  *    producer — [[sink]].
  *  - `getUpsertKafkaDDL` (`MyKafkaUtil.java:80-91`): upsert-kafka
  *    with JSON key/value — [[upsertSink]] emits (key = PK JSON,
  *    value = row JSON) records; Kafka itself stores a changelog, and
  *    the upsert semantics live at the consumer (latest-wins per key,
  *    D2 `Stateful.latestWins`) plus log compaction — the documented
  *    Spark-side divergence (SURVEY.md §1.2): same topic bytes, state
  *    at read time instead of a special connector.
  */
object Kafka {

  /** S1: the string-value stream of one topic. `startingOffsets` =
    * latest and an explicit consumer group mirror the reference DDL;
    * null-value records surface as "" (the deserializer contract at
    * `MyKafkaUtil.java:36-43`), which the downstream P1 parse then
    * quarantines like any other non-JSON line. */
  def source(spark: SparkSession, topic: String, servers: String,
             groupId: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("startingOffsets", "latest")
      .load()
      .select(coalesce(col("value").cast("string"), lit("")).as("value"))

  /** S2: the `topic_db` Maxwell table — source → schema'd envelope
    * with the processing-time column (`pt AS PROCTIME()`). */
  def topicDb(spark: SparkSession, servers: String, groupId: String): DataFrame =
    LogStream.maxwellEnvelope(source(spark, "topic_db", servers, groupId))

  /** K1: string producer. The input's `value` column (string or
    * binary) becomes the record value; unkeyed, like the reference's
    * `SimpleStringSchema` producer. */
  def sink(df: DataFrame, topic: String, servers: String,
           checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K2: upsert-kafka-shaped records — key = the PK as a JSON object,
    * value = the full row as JSON (null-safe: a lakehouse-style
    * delete would send a null value; streaming frames here always
    * carry live rows). Consumers reconstruct table state with D2
    * latest-wins per key; with topic compaction enabled the broker
    * converges to the same state. */
  def upsertSink(df: DataFrame, topic: String, servers: String,
                 checkpoint: String, pk: String): DataStreamWriter[Row] =
    sink(df.select(
        to_json(struct(col(pk))).as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value")),
      topic, servers, checkpoint)
}
