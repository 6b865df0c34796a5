package graft.entries

/** Oracle SQL for the SURVEY §2.4 reference-parity keys (the d-series
  * and c2) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait ParityOracles {
  import OracleCtes._

  protected def parityOracles: Map[String, String] = Map(
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
