package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Similarity, Temporal}

/** Physical-plan assertions for the scale-critical properties claimed in
  * SURVEY.md §2b — broadcast choices, shuffle counts, column pruning.
  * These are the "would it survive 100×" invariants; a regression here
  * usually means an accidental extra shuffle or a lost broadcast, which
  * small-data correctness tests would never catch.
  */
class PlanSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countShuffles(p: String): Int =
    "Exchange (hash|range|SinglePartition)".r.findAllIn(p).length

  test("exact dedup: one hash shuffle (partial agg) + the presentation sort only") {
    val p = plan(Dedup.exact(spark, dir))
    assert(countShuffles(p) == 2, s"unexpected shuffle count in:\n$p")
    // partial aggregation: map-side and final HashAggregate around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("exact dedup: scan prunes to (doc_id, text)") {
    val p = plan(Dedup.exact(spark, dir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("stratified sample: narrow filter — no shuffle before the presentation sort") {
    val p = plan(Curation.stratifiedSample(spark, dir))
    assert(countShuffles(p) == 1, s"expected only the final range exchange:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  test("brute-force top-k: query side broadcast, corpus side never shuffled pre-join") {
    val p = plan(Similarity.bruteForceTopK(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the only hash shuffle partitions the scored stream for the per-query
    // window top-k; the corpus scan itself must feed the join directly
    assert(!p.contains("Exchange hashpartitioning(vec_id"), p)
  }

  test("decontamination: benchmark gram set is the broadcast side") {
    val p = plan(Curation.decontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join: one user_id shuffle feeds the single-pass merge window") {
    val p = plan(Temporal.asofJoin(spark, dir))
    // user_id window exchange + final presentation sort — nothing else
    assert(countShuffles(p) == 2, s"unexpected shuffle count in:\n$p")
    assert("Window".r.findAllIn(p).length >= 1)
  }

  test("incremental dedup: anti-join against the digest set, corpus scanned narrowly") {
    val p = plan(Curation.incrementalDedup(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("length histogram: one partial-agg shuffle + the presentation sort") {
    val p = plan(Curation.lengthHistogram(spark, dir))
    assert(countShuffles(p) == 2, s"unexpected shuffle count in:\n$p")
    assert(p.contains("ReadSchema: struct<n_chars:bigint>"), p)
  }

  test("sessionize: both windows and the session agg share one user_id partitioning") {
    val p = plan(Temporal.sessionize(spark, dir))
    // lag window, running-sum window, and groupBy(user_id, session_id)
    // must all reuse the user_id exchange: expect user shuffle + final sort
    assert(countShuffles(p) == 2, s"unexpected shuffle count in:\n$p")
  }
}
