package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2b): media as opaque `binary`
  * columns plus typed metadata, with decode/feature-extraction running
  * batch-wise over partitions.
  *
  * The decode step is STUBBED — this container has no image/audio codecs
  * — with a deterministic fake ([[FakeDecode]]) so the Spark-side
  * plumbing (schema, partitioning, batch iteration, feature schema) is
  * real and testable. Swapping in a real codec touches only
  * [[FakeDecode.decode]].
  *
  * Scale design: `mapPartitions` keeps the decode loop at one
  * JVM-boundary crossing per PARTITION (not per row) — the Scala analog
  * of `mapInPandas` batch semantics — and the work is embarrassingly
  * parallel: no shuffle anywhere; feature extraction runs where the
  * bytes already live.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features. Width/height come from the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, sha256: String, width: Int, height: Int)

  /** STUB decoder — deterministic fake in place of a real image/audio
    * codec (none available in this environment). Derives fake dimensions
    * from the first two payload bytes, mimicking a header parse.
    */
  object FakeDecode {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (16 * (1 + b0 % 64), 16 * (1 + b1 % 64)) // fake width × height
    }
  }

  /** The documents table as a media table: text bytes standing in for an
    * encoded media payload (UTF-8 — byte length is octet length).
    */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRecord]
  }

  /** EXT-M1 — batch feature extraction via `mapPartitions`: the iterator
    * is consumed lazily (no partition materialization), hashing and
    * "decoding" each payload once.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { rec =>
        val (w, h) = FakeDecode.decode(rec.payload)
        digest.reset()
        val hex = digest.digest(rec.payload).map("%02x".format(_)).mkString
        MediaFeatures(rec.doc_id, rec.payload.length.toLong, hex, w, h)
      }
    }
  }

  /** The oracle-checked query: features over the documents-as-media
    * table, ordered.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(asMedia(spark, dir)).toDF().orderBy("doc_id")
}
