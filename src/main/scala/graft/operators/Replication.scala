package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-parity analogs of the reference's dataflow operators (SURVEY.md
  * §2.4), phrased over the `events` table, which stands in for a Kafka
  * topic: `event_type` ↔ topic, `user_id` ↔ key, `props` ↔ value,
  * `ts` ↔ timestamp, `event_id` ↔ offset.
  *
  * Each method is a declarative DataFrame plan: filters and projections
  * reach the parquet scan via Catalyst pushdown (verified with
  * `.explain("formatted")` — `PushedFilters` / pruned `ReadSchema`), so the
  * same plan over a 100 TB partitioned table scans only what it must.
  */
object Replication {

  /** The `events` table, with `ts` normalized to a session-TZ TIMESTAMP
    * regardless of the fixture generation's physical type. Two shapes
    * exist in the wild:
    *  - parquet TIMESTAMP(NANOS) (fixtures through r8), which Spark 4
    *    refuses by default — read as long (legacy conf) and truncate to
    *    microseconds, the same ns→µs truncation DuckDB applies;
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) (r9 fixtures),
    *    which Spark loads as TIMESTAMP_NTZ — cast to TIMESTAMP (an
    *    identity on the wall-clock under the UTC session TZ every graft
    *    entrypoint sets), so downstream `unix_millis`/window arithmetic
    *    keeps one type to reason about.
    * Downstream operators and DuckDB oracles agree bit-for-bit on both.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // SESSION-WIDE side effect, deliberate: this legacy flag has no
    // per-read form, and every TIMESTAMP(NANOS) parquet in this harness
    // wants the same treatment. Any reader of ns-timestamp parquet in the
    // same session sees longs — go through this function, which converts.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** D1/C1 — regex topic subscription (reference:
    * FlinkKafkaReplicator.java:110-113 subscribes by `Pattern`). The regex
    * filter is pushed as a data filter; on Kafka it is the
    * `subscribePattern` option.
    */
  def regexSubscribe(spark: SparkSession, dir: String, pattern: String = "^[^_].*"): DataFrame =
    events(spark, dir)
      .filter(col("event_type").rlike(pattern))
      .orderBy("event_id")

  /** D2 — envelope projection (reference:
    * KafkaMessageDeserializationSchema.java:14-22 copies exactly the
    * envelope fields). Explicit column pruning: a parquet reader only
    * materializes these columns.
    */
  def envelopeProjection(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id")

  /** D3 — offset reset = earliest: the full scan (reference:
    * FlinkKafkaReplicator.java:114-118 `setStartFromEarliest`).
    */
  def offsetResetEarliest(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(count(lit(1)).as("n"))

  /** D3 — offset reset = latest: the empty prefix (reference:
    * FlinkKafkaReplicator.java:115 `setStartFromLatest`). Catalyst folds
    * `WHERE false` to an empty LocalRelation — no scan at any scale.
    */
  def offsetResetLatest(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).filter(lit(false)).agg(count(lit(1)).as("n"))

  /** D4 — identity transform, the reference's entire "query"
    * (FlinkKafkaReplicator.java:126-134: source → sink unchanged).
    */
  def identity(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).orderBy("event_id")

  /** D5 — partition routing, checked structurally: routing each record by
    * Kafka's DefaultPartitioner (murmur2 of the key bytes — see
    * [[graft.functions.KafkaMurmur2]]) must send every occurrence of a key
    * to exactly one partition. Output: one row per key with its distinct
    * partition count (always 1), which a SQL oracle can state without
    * reproducing murmur2 (reference: KafkaMessageSerializationSchema.java:19).
    */
  def partitionRouting(spark: SparkSession, dir: String, numPartitions: Int = 8): DataFrame = {
    import graft.functions.functions.kafka_partition
    events(spark, dir)
      .select(col("user_id"),
        kafka_partition(col("user_id").cast("string").cast("binary"),
          lit(numPartitions)).as("part"))
      .groupBy("user_id")
      .agg(countDistinct("part").as("n_parts"))
      .orderBy("user_id")
  }

  /** C2/C6 — the control-plane config diff as a relation: full outer join
    * of source/target (key, value) config sets, keeping rows where the
    * values differ under null-aware comparison — exactly the three-case
    * test at reference FlinkKafkaReplicator.java:250-252. The classification
    * column mirrors the reconciliation decision (create/warn/alter paths).
    */
  def configDiff(src: DataFrame, dst: DataFrame): DataFrame = {
    val a = src.select(col("k"), col("v").as("src_v"))
    val b = dst.select(col("k"), col("v").as("dst_v"))
    a.join(b, Seq("k"), "full_outer")
      .filter(not(col("src_v") <=> col("dst_v")))
      .withColumn("action",
        when(col("src_v").isNull, lit("target_only"))
          .when(col("dst_v").isNull, lit("source_only"))
          .otherwise(lit("differs")))
      .orderBy("k")
  }

  /** The canonical FIXTURES.md §3 config fixtures, as DataFrames. */
  def configFixtures(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val src = Seq(
      ("retention.ms", "100"),
      ("cleanup.policy", "compact"),
      ("segment.bytes", "1048576")).toDF("k", "v")
    val dst = Seq(
      ("retention.ms", "200"),
      ("max.message.bytes", "1048576"),
      ("segment.bytes", "1048576")).toDF("k", "v")
    (src, dst)
  }
}
