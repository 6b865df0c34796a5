package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.types._

/** A Kafka record header: ordered, duplicate keys legal.
  *
  * Mirrors the reference envelope's `headers` field
  * (reference: KafkaMessage.java:11) and Spark's Kafka source header
  * encoding `array<struct<key string, value binary>>`.
  */
final case class MessageHeader(key: String, value: Array[Byte])

/** The replication envelope — the engine's primary record type.
  *
  * Same six fields as the reference's POJO (reference:
  * KafkaMessage.java:5-12): topic, partition, timestamp (epoch millis
  * there, `java.sql.Timestamp` here — converted at the edge), nullable
  * key/value payload bytes (never parsed, reference:
  * KafkaMessageDeserializationSchema.java:14-22), and ordered headers.
  * `offset` is carried too because Spark's Kafka source exposes it and it
  * is the natural deterministic ordering column; the reference drops it.
  */
final case class KafkaMessage(
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    key: Array[Byte],
    value: Array[Byte],
    headers: Array[MessageHeader])

object KafkaMessage {
  implicit val encoder: Encoder[KafkaMessage] = Encoders.product[KafkaMessage]

  /** The Spark Kafka source schema (fixed; superset of the reference
    * envelope — SURVEY.md §1.3).
    */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** Envelope column names in canonical order (the D2 projection). */
  val columns: Seq[String] =
    Seq("topic", "partition", "offset", "timestamp", "key", "value", "headers")

  def toDS(df: DataFrame): Dataset[KafkaMessage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(columns.head, columns.tail: _*).as[KafkaMessage]
  }

  def toDF(spark: SparkSession, msgs: Seq[KafkaMessage]): DataFrame = {
    import spark.implicits._
    spark.createDataset(msgs).toDF()
  }
}
