package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Payload decoding and event-time windowing over the `events` stream
  * table (SURVEY.md §2b EXT-5/EXT-6). `events` stands in for a Kafka
  * topic (SURVEY.md §2.4): `props` is the opaque value payload the
  * reference never parses — decoding it is the first extension a real
  * pipeline needs.
  */
object Payload {

  /** EXT-P1 — JSON payload decoding with an explicit schema:
    * `from_json` runs inside codegen, and because the schema is declared
    * (not inferred) the plan needs no extra pass over the data — at
    * 100 TB schema inference is a full scan you don't get back.
    */
  def jsonDecode(spark: SparkSession, dir: String): DataFrame =
    Replication.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("p"))
      .select(col("event_id"), col("p.k").as("k"))
      .orderBy("event_id")

  /** EXT-P2 — event-time tumbling windows (10 min) per event_type with
    * order-insensitive aggregates (count/min/max — deterministic under
    * any partitioning; a double `sum` would be FP-order-dependent).
    * Window start is exposed as epoch seconds so the oracle states the
    * same integer arithmetic. Streaming twin:
    * [[graft.streaming.StreamOps.windowedCounts]].
    */
  def eventWindows(spark: SparkSession, dir: String, windowSec: Int = 600): DataFrame =
    Replication.events(spark, dir)
      .groupBy(
        (floor(unix_timestamp(col("ts")) / windowSec) * windowSec).as("window_start_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), min("value").as("min_v"), max("value").as("max_v"))
      .orderBy("window_start_s", "event_type")
}
