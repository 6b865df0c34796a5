package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Replication

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or §2b), and
  * each `oracleSql` entry is the ANSI SQL DuckDB runs over the same parquet
  * tables to hash-check it. Column names/aliases match pairwise — the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Replication.identity(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- §2.4 parity queries (reference dataflow + control plane) ---
    "d1_regex_subscribe" -> ((s, dir) => Replication.regexSubscribe(s, dir)),
    "d2_envelope_projection" -> ((s, dir) => Replication.envelopeProjection(s, dir)),
    "d3_offset_earliest" -> ((s, dir) => Replication.offsetResetEarliest(s, dir)),
    "d3_offset_latest" -> ((s, dir) => Replication.offsetResetLatest(s, dir)),
    "d4_identity" -> ((s, dir) => Replication.identity(s, dir)),
    "d5_partition_routing" -> ((s, dir) => Replication.partitionRouting(s, dir)),
    "c2_config_diff" -> ((s, _) => {
      val (src, dst) = Replication.configFixtures(s)
      Replication.configDiff(src, dst)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "d1_regex_subscribe" ->
      "SELECT * FROM events WHERE regexp_matches(event_type, '^[^_].*') ORDER BY event_id",
    "d2_envelope_projection" ->
      "SELECT event_id, ts, user_id, event_type, value, props FROM events ORDER BY event_id",
    "d3_offset_earliest" ->
      "SELECT count(*) AS n FROM events",
    "d3_offset_latest" ->
      "SELECT count(*) AS n FROM events WHERE false",
    "d4_identity" ->
      "SELECT * FROM events ORDER BY event_id",
    "d5_partition_routing" ->
      "SELECT user_id, CAST(1 AS BIGINT) AS n_parts FROM events GROUP BY user_id ORDER BY user_id",
    "c2_config_diff" ->
      """WITH src(k, v) AS (VALUES ('retention.ms','100'), ('cleanup.policy','compact'), ('segment.bytes','1048576')),
        |     dst(k, v) AS (VALUES ('retention.ms','200'), ('max.message.bytes','1048576'), ('segment.bytes','1048576'))
        |SELECT coalesce(a.k, b.k) AS k, a.v AS src_v, b.v AS dst_v,
        |       CASE WHEN a.v IS NULL THEN 'target_only' WHEN b.v IS NULL THEN 'source_only' ELSE 'differs' END AS action
        |FROM src a FULL OUTER JOIN dst b ON a.k = b.k
        |WHERE a.v IS DISTINCT FROM b.v ORDER BY k""".stripMargin,
  )
}
