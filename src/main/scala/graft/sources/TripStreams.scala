package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Stream endpoints for the trip pipeline (SURVEY.md par.2.1 S2/S3).
  *
  * The pipeline itself is transport-agnostic: everything downstream of
  * [[rawFromFiles]]/[[rawFromKafka]] consumes a DataFrame with a string
  * `value` column (one JSON event per row) — the Kafka wire shape. The
  * reference's Kinesis boundary maps to Kafka in production (partition
  * key = trip_id, at-least-once, SURVEY.md par.2.1 S2); this container
  * has no broker or kafka connector jar, so [[rawFromKafka]] is the
  * documented builder while tests and local runs use file/memory
  * sources.
  */
object TripStreams {

  /** Testable file-based stream source: one JSON event per line under
    * `dir`; new files are discovered per micro-batch. `maxFilesPerTrigger`
    * bounds batch size (the replay-throttle analogue of
    * to_kinesis.py:38's 0.1 s sleep — rate is controlled by the source,
    * not a per-record sleep).
    */
  def rawFromFiles(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** S5, the LITERAL analogue (SURVEY par.2.1): a CHANGE FEED over a
    * parquet table directory — every newly-landed file's rows appear as
    * INSERT events on a stream, the DynamoDB-Streams NewImage trigger
    * shape (reference lambda2.py:183-201) without a vendor stream.
    * Spark's file source tracks per-file progress in the query
    * checkpoint, so each insert is delivered exactly once across
    * restarts; the reference's INSERT filter / unmarshal / key-prefix
    * steps are ordinary transforms downstream of this frame. The
    * pipeline consumes the validated stream directly by design (the
    * by-design substitution documented in SURVEY par.2.1); this feed is
    * for consumers of an already-LANDED table — react-to-what-was-
    * written, decoupled from the writer.
    *
    * At 100 TB: the file source lists only NEW files per trigger (the
    * checkpoint holds the seen-set), so feed cost tracks the write
    * rate, not the table size.
    */
  def tableChangeFeed(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 10,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .options(options)
      .parquet(dir)

  /** Production stream source: Kafka topic, `value` = JSON event bytes.
    * Requires the spark-sql-kafka connector on the classpath (not in
    * this container).
    */
  def rawFromKafka(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value").cast("string").as("value"))

  /** The exact (key, value) projection [[toKafka]] writes — split out so
    * the wire contract is testable in this broker-less container
    * (TripSourcesSpec): key = trip_id (Kafka's default partitioner then
    * gives per-trip partition affinity, hence per-trip ordering under
    * at-least-once — the reference's exact partition-key semantics,
    * to_kinesis.py:63-67,89-93), value = the full row as JSON, decodable
    * by the same schema [[TripSources.parseEvents]] applies on the read
    * side.
    */
  def kafkaPayload(events: DataFrame): DataFrame =
    events.select(col("trip_id").cast("string").as("key"),
      to_json(struct(col("*"))).as("value"))

  /** S2 producer sink: key by trip_id (per-trip ordering within a
    * partition, exactly the reference's partition-key choice,
    * to_kinesis.py:66) and JSON-serialize the row. Same jar caveat.
    */
  def toKafka(events: DataFrame, brokers: String, topic: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    kafkaPayload(events)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
