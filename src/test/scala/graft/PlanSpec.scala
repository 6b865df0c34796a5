package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Packing, Similarity, Temporal, TextAnalysis}

/** Physical-plan assertions for the scale-critical properties claimed in
  * SURVEY.md §2b — broadcast choices, shuffle counts, column pruning.
  * These are the "would it survive 100×" invariants; a regression here
  * usually means an accidental extra shuffle or a lost broadcast, which
  * small-data correctness tests would never catch.
  *
  * Robustness rules: match plan NODE CLASSES via `plan.collect`, never
  * `toString` rendering (which drifts across Spark minors), and assert
  * shuffle counts as UPPER bounds — fewer exchanges (e.g. from exchange
  * reuse) is an improvement, not a failure.
  */
class PlanSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Physical plan with AQE disabled for this one query's planning:
    * adaptive execution wraps the plan in AdaptiveSparkPlanExec, whose
    * final shape depends on runtime statistics — exactly the brittleness
    * these structural assertions must not inherit. The production plans
    * still run WITH AQE (it only ever removes/rewrites exchanges these
    * bounds already allow).
    */
  private def plan(df: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def shuffles(p: SparkPlan): Int =
    p.collect { case e: ShuffleExchangeExec => e }.length

  /** Shuffles minus the deliberate round-robin spreads: a REPARTITION
    * that exists only to widen a single-task scan before a broadcast
    * expansion ([[Similarity]]'s expansionPartitioned, the r13
    * parallelism fix) repartitions the pre-join corpus rows once and is
    * a scale FIX, not a data-keyed exchange of derived rows.
    */
  private def keyedShuffles(p: SparkPlan): Int =
    p.collect {
      case e: ShuffleExchangeExec
        if !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
    }.length

  /** Scan-level column pruning — ReadSchema is scan metadata, stable in
    * string form (and has no class-level accessor across v1/v2 scans).
    */
  private def prunesTo(p: SparkPlan, schema: String): Boolean =
    p.toString.contains(s"ReadSchema: struct<$schema>")

  test("exact dedup: at most one hash shuffle (partial agg) + the presentation sort") {
    val p = plan(Dedup.exact(spark, dir))
    assert(shuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
    // partial aggregation: map-side and final HashAggregate around the exchange
    assert(p.collect { case a: HashAggregateExec => a }.length >= 2, p.toString)
  }

  test("exact dedup: scan prunes to (doc_id, text)") {
    val p = plan(Dedup.exact(spark, dir))
    assert(prunesTo(p, "doc_id:bigint,text:string"), p.toString)
  }

  test("stratified sample: narrow filter — no shuffle before the presentation sort") {
    val p = plan(Curation.stratifiedSample(spark, dir))
    assert(shuffles(p) <= 1, s"expected only the final range exchange:\n$p")
    assert(prunesTo(p, "doc_id:bigint,lang:string"), p.toString)
  }

  /** The repo-wide broadcast rule ([[Temporal.funnel]], r5/r7):
    * `broadcast()` is reserved for relations BOUNDED — by construction,
    * or by an actual driver-side measurement taken before the hint is
    * applied ([[Similarity]]'s measured-size guard). A corpus-
    * proportional side may therefore carry a hint only when its measured
    * footprint is under the guard's byte bound, and the SAME call with
    * the bound disabled must analyze to a hint-free plan — proving the
    * 100× fallback path exists and is reachable, not just prose.
    */
  private def countHints(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.length

  test("brute-force top-k: broadcast only under the measured-size guard; top-k folded map-side before the exchange") {
    // eval scale measures under the 64 MiB bound -> the hint is applied
    assert(countHints(Similarity.bruteForceTopK(spark, dir)) == 1,
      "measured-small query side should be hint-broadcast")
    // bound disabled -> the un-hinted 100 TB fallback plan, no hint
    assert(countHints(Similarity.bruteForceTopK(spark, dir, maxBroadcastBytes = 0)) == 0,
      "guard disabled must yield the hint-free fallback plan")
    val p = plan(Similarity.bruteForceTopK(spark, dir))
    // the scale invariant: a partial ObjectHashAggregate (the bounded
    // top-k buffer) must sit BELOW a shuffle, so the exchange carries
    // |queries|·k rows per partition, not the n·m scored stream
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
  }

  test("bucketed ANN top-k: same map-side partial top-k shape") {
    val p = plan(Similarity.bucketedTopK(spark, dir))
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
  }

  test("decontamination: benchmark gram set is the broadcast side") {
    val p = plan(Curation.decontaminate(spark, dir))
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty, p.toString)
  }

  test("as-of join: one user_id shuffle feeds the single-pass merge window") {
    val p = plan(Temporal.asofJoin(spark, dir))
    // user_id window exchange + final presentation sort — nothing more
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
    assert(p.collect { case w: WindowExec => w }.nonEmpty, p.toString)
  }

  test("incremental dedup: anti-join against the digest set, corpus scanned narrowly") {
    val p = plan(Curation.incrementalDedup(spark, dir))
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }.nonEmpty, p.toString)
    assert(prunesTo(p, "doc_id:bigint,text:string"), p.toString)
  }

  test("length histogram: at most one partial-agg shuffle + the presentation sort") {
    val p = plan(Curation.lengthHistogram(spark, dir))
    assert(shuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
    assert(prunesTo(p, "n_chars:bigint"), p.toString)
  }

  test("PII redaction: pure row-local projection — zero shuffles") {
    val p = plan(TextAnalysis.redactPii(
      graft.operators.Tables.documents(spark, dir)))
    assert(shuffles(p) == 0, s"redaction must never cost more than the scan:\n$p")
    assert(prunesTo(p, "doc_id:bigint,text:string"), p.toString)
  }

  test("chunking: the ~n/stride row explosion stays narrow") {
    val p = plan(Packing.chunkDocuments(spark, dir))
    assert(shuffles(p) <= 1, s"expected only the presentation sort:\n$p")
    assert(prunesTo(p, "doc_id:bigint,text:string"), p.toString)
  }

  test("packing: the bin aggregation reuses the per-lang window partitioning") {
    val p = plan(Packing.packSequences(spark, dir))
    // hash(lang) satisfies the (lang, bin_id) clustering, so the groupBy
    // must NOT add its own exchange: window shuffle + presentation sort
    assert(shuffles(p) <= 2, s"bin agg re-shuffled despite lang partitioning:\n$p")
  }

  test("sessionize: both windows and the session agg share one user_id partitioning") {
    val p = plan(Temporal.sessionize(spark, dir))
    // lag window, running-sum window, and groupBy(user_id, session_id)
    // must all reuse the user_id exchange: user shuffle + final sort only
    assert(shuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
  }

  test("bloom prefilter: the bounded position set is the broadcast probe side") {
    val p = plan(Curation.bloomPrefilter(spark, dir))
    // the probe join (fresh positions ⋉ bloom set) must be a broadcast
    // hash join — the bloom relation is ≤ m rows BY CONSTRUCTION, so at
    // no corpus size may it become the shuffled side
    assert(p.collect { case b: BroadcastHashJoinExec => b }.nonEmpty, p.toString)
  }

  test("hard negatives: same shape as brute force — measured-guard broadcast, corpus never shuffles pre-join") {
    assert(countHints(Similarity.hardNegatives(spark, dir)) == 1,
      "measured-small query side should be hint-broadcast")
    assert(countHints(Similarity.hardNegatives(spark, dir, maxBroadcastBytes = 0)) == 0,
      "guard disabled must yield the hint-free fallback plan")
    val p = plan(Similarity.hardNegatives(spark, dir))
    // the label filter must not break the map-side bounded top-k: a
    // partial ObjectHashAggregate still sits below the one exchange
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
  }

  test("source similarity: sketch is a partial-agg min — map partitions collapse pre-shuffle") {
    val p = plan(Dedup.sourceSimilarity(spark, dir))
    // per-slice sketch: partial + final HashAggregate around its exchange
    assert(p.collect { case a: HashAggregateExec => a }.length >= 2, p.toString)
    // sketch agg + pair join + pair agg + presentation sort
    assert(shuffles(p) <= 4, s"unexpected shuffle count in:\n$p")
  }

  test("fixed sample: per-stratum budget folded map-side before the exchange") {
    val p = plan(Curation.fixedSample(spark, dir))
    // the scale invariant that distinguishes this from the row_number
    // spelling: a partial bounded top-k below the stratum shuffle
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
  }

  test("top docs per lang: per-stratum top-k folded map-side before the exchange") {
    val p = plan(Curation.topDocsPerLang(spark, dir))
    // the same scale invariant as fixedSample: a partial bounded top-k
    // below the stratum shuffle, never a whole-corpus rank window
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    // doc_id join (2 sides) + stratum agg + presentation sort
    assert(shuffles(p) <= 4, s"unexpected shuffle count in:\n$p")
  }

  test("weighted sample: row-local gate — no shuffle before the presentation sort") {
    val p = plan(Curation.weightedSample(spark, dir))
    assert(shuffles(p) <= 1, s"unexpected shuffle count in:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("mixture sample: rate relation broadcast into a row-local gate — no window, no SMJ") {
    val p = plan(Curation.mixtureSample(spark, dir))
    // the |sources|-row rate relation must ride a broadcast; the corpus
    // side shuffles only inside the rate aggregation legs + final sort
    assert(p.collect { case b: BroadcastHashJoinExec => b }.nonEmpty, p.toString)
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    assert(shuffles(p) <= 4, s"unexpected shuffle count in:\n$p")
  }

  test("bm25: probes broadcast; per-term top-k folded map-side; no rank window") {
    val p = plan(TextAnalysis.bm25TopK(spark, dir))
    // the driver-bounded probe list joins the tf relation by broadcast —
    // the corpus-sized side never shuffles to meet 10 rows
    assert(p.collect { case b: BroadcastHashJoinExec => b }.nonEmpty, p.toString)
    // scale invariant shared with fixedSample/topDocsPerLang: a partial
    // bounded top-k below the term exchange, never a row_number window
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("rarity score: partial aggs around every exchange; no window anywhere") {
    val p = plan(TextAnalysis.rarityScore(spark, dir))
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    // tf, df and the per-doc sums are all partial-agg HashAggregates
    assert(p.collect { case a: HashAggregateExec => a }.length >= 4, p.toString)
  }

  test("tfidf: rank window runs over the aggregated term relation, not the token stream") {
    val p = plan(TextAnalysis.tfidfTerms(spark, dir))
    // every window input must already be an aggregate/join output: no
    // Generate (the token explode) may appear under a window — the
    // explode happens before the materialized tf relation only
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, p.toString)
    windows.foreach { w =>
      assert(w.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty,
        s"token explode under the rank window:\n$w")
    }
    // tf⋈df join (tf side cached): df agg, join shuffles, rank window, sort
    assert(shuffles(p) <= 5, s"unexpected shuffle count in:\n$p")
  }

  test("funnel: every stage join is a user_id equi-join — never a nested loop or cross product") {
    // the per-user stage side is NOT constant-bounded, so no broadcast
    // is forced (AQE promotes at runtime when it measures small); the
    // structural invariant is that the plan degrades to an equi-join,
    // never to a nested loop, and each stage is materialized so its
    // subtree cannot re-execute per later branch
    val p = plan(Temporal.funnel(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, p.toString)
    // stage relations are checkpointed: the events scan appears at most
    // once per stage join in the final plan, not once per downstream
    // branch of every earlier stage
    val scans = p.toString.split("\n").count(_.contains("events.parquet"))
    assert(scans <= 2, s"stage subtrees re-executed ($scans event scans):\n$p")
  }

  test("retention cohorts: one event scan, cohort derivation reuses the distinct relation") {
    val p = plan(Temporal.retentionCohorts(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, p.toString)
    // the events source is scanned exactly once (the materialized
    // distinct relation feeds both the cohort agg and the offset join)
    assert(!p.toString.contains("events.parquet"), p.toString)
    // cohort agg + join sides + final rollup + presentation sort
    assert(shuffles(p) <= 6, s"unexpected shuffle count in:\n$p")
  }

  test("centroid prototypicality: row-local scoring — only the presentation sort exchanges") {
    val p = plan(Similarity.centroidSim(spark, dir))
    assert(shuffles(p) <= 1, s"unexpected shuffle count in:\n$p")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.isEmpty, p.toString)
  }

  test("Lloyd update: the DEFAULT mean spelling never materializes a cell in one aggregation buffer") {
    import spark.implicits._
    val asg = Seq((0L, Seq(1.0, 2.0), 0), (1L, Seq(3.0, 4.0), 0), (2L, Seq(5.0, 6.0), 1))
      .toDF("vec_id", "ed", "cell")
    val prod = Similarity.cellMeans(asg, dim = 2, exactMeans = false)
    val exact = Similarity.cellMeans(asg, dim = 2, exactMeans = true)
    // the whole-cell fold is a collect_list over the embedding column —
    // one cluster's vectors in ONE buffer, the eval-scale-only shape
    def wholeCellCollect(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("collect_list(struct(vec_id")
    assert(wholeCellCollect(exact), "control: the explicit oracle mode IS the whole-cell fold")
    assert(!wholeCellCollect(prod),
      "a default-path caller must get the per-(cell, dim) sum, never a whole cell in one buffer")
    // the production sums are plain declarative aggregates — map-side
    // combinable HashAggregates (partial + final), not object aggregation
    // buffers over the embedding arrays
    val sumAggs = plan(Similarity.cellMeans(asg, dim = 2, exactMeans = false)).collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if h.aggregateExpressions.exists(_.aggregateFunction.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.Sum]) => h
    }
    assert(sumAggs.length >= 2, // partial on the map side, final after the exchange
      s"per-dim sums must map-side combine:\n${prod.queryExecution.executedPlan}")
    // both spellings compute the same means on integer-exact data
    val p = prod.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val e = exact.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(p == e)
  }

  test("semantic dedup: pair search is an equi-join on the cell id — never a cross product") {
    val p = plan(Similarity.semanticDedup(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, p.toString)
    // cell-key pair join (2 sides) + dup-count agg + verdict join + sort
    assert(shuffles(p) <= 6, s"unexpected shuffle count in:\n$p")
  }

  test("bucketed digest tables: co-located join runs with zero exchanges") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.functions.{col, sha2}
    // a table can leak a warehouse DIRECTORY without catalog metadata
    // (e.g. a prior JVM died mid-write): drop both, or saveAsTable
    // refuses with LOCATION_ALREADY_EXISTS even under Overwrite
    Seq("plan_spec_corpus", "plan_spec_index").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(s"/tmp/graft-test-warehouse/$t")
      loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
    }
    val docs = graft.operators.Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    graft.sources.Sources.writeBucketed(
      docs, "plan_spec_corpus", Seq("digest"), buckets = 4, mode = SaveMode.Overwrite)
    graft.sources.Sources.writeBucketed(
      docs.select(col("digest")), "plan_spec_index", Seq("digest"), buckets = 4,
      mode = SaveMode.Overwrite)
    // force the join DOWN the sort-merge path: at eval scale the tables
    // would broadcast, which makes "no exchange" vacuous — the bucketing
    // claim is that SMJ itself needs neither an exchange nor a sort,
    // because the one-file-per-bucket sorted layout already satisfies
    // both requirements. That is the 100 TB contract (broadcast is off
    // the table there anyway).
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(spark.table("plan_spec_corpus")
        .join(spark.table("plan_spec_index"), "digest"))
      assert(p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.nonEmpty, s"expected a sort-merge join:\n$p")
      assert(shuffles(p) == 0, s"bucketed join must not exchange:\n$p")
      // NOT asserted: sort elision. Spark 4 ignores bucket sort metadata
      // for scan output ordering by default (the legacy
      // bucketedTableScan.outputOrdering propagation was retired as
      // error-prone), so SortExec stays in-plan — but it runs per
      // single-bucket partition over per-bucket-sorted files, which is
      // the cheap case. The exchange elision above is the bucketing win.
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("hot keys: one key shuffle with partial agg, totals broadcast, TakeOrdered top-N") {
    val p = plan(graft.operators.Skew.hotKeys(spark, dir))
    // partial + final HashAggregate around the key exchange — the
    // map-side combine is what keeps the exchange at |keys|, not |events|
    assert(p.collect { case a: HashAggregateExec => a }.length >= 2, p.toString)
    // key agg + totals agg feed; never a sort exchange (top-N folds map-side)
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
    assert(p.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"expected a TakeOrdered top-N in:\n$p")
  }

  test("hamming ANN: no cartesian anywhere; re-rank probes vectors via equi-joins; no rank window") {
    val p = plan(Similarity.hammingTopK(spark, dir))
    // the signature pass may BroadcastNestedLoopJoin under the measured
    // guard (16-byte rows — the guard fires at any realistic query
    // count), but a CartesianProduct would mean the guard failed open
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"hamming first pass must not cross-product:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    // the re-rank touches full vectors only through broadcast id probes
    assert(p.collect { case b: BroadcastHashJoinExec => b }.length >= 2, p.toString)
  }

  test("rank fusion: no cartesian; both legs and the fusion fold map-side — no rank window") {
    val p = plan(Similarity.rankFusion(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"fusion must not cross-product:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    // three bounded TopK aggregates (two legs + fused) run partial-mode
    assert(p.collect { case o: ObjectHashAggregateExec => o }.length >= 3, p.toString)
  }

  test("split leakage: both split lookups are equi-joins — never a nested loop") {
    val p = plan(Curation.splitLeakage(spark, dir))
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec        => c
    }.isEmpty, s"leakage audit must not cross-product:\n$p")
    // scan prunes: the split side reads (doc_id), pairs side (doc_id, text)
    assert(prunesTo(p, "doc_id:bigint"), p.toString)
  }

  test("leakage repair: drop-set derivation and split join stay equi — never a nested loop") {
    val p = plan(Curation.leakageRepair(spark, dir))
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec        => c
    }.isEmpty, s"repair must not cross-product:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("gram novelty: anti-join stays equi — never a nested loop, no window") {
    val p = plan(Curation.gramNovelty(spark, dir))
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec        => c
    }.isEmpty, s"novelty must not cross-product:\n$p")
  }

  test("crossmodal curation: the 1:1 id join stays equi — never a nested loop") {
    val p = plan(Curation.crossmodalCuration(spark, dir))
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec        => c
    }.isEmpty, s"crossmodal must not cross-product:\n$p")
  }

  test("trending keys: per-window top-k folded map-side; no rank window") {
    val p = plan(Temporal.trendingKeys(spark, dir))
    val partialBelowExchange = p.collect {
      case e: ShuffleExchangeExec
          if e.child.collect { case o: ObjectHashAggregateExec => o }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty, s"no map-side partial top-k in:\n$p")
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
    // (window,key) agg + window top-k agg + presentation sort
    assert(shuffles(p) <= 3, s"unexpected shuffle count in:\n$p")
  }

  test("curriculum shards: one shard shuffle feeds the rank window + presentation sort") {
    val p = plan(Curation.curriculumShards(spark, dir))
    // quality + shard are row-local: the only exchanges are the window's
    // shard partitioning and the final sort
    // <= 2 DATA-KEYED shuffles; the round-robin spread on the corpus
    // side is the r13 single-task-expansion fix (expansionPartitioned)
    // and is allowed - it carries the pre-join corpus rows once, never
    // the n*m scored stream
    assert(keyedShuffles(p) <= 2, s"unexpected shuffle count in:\n$p")
    assert(p.collect { case w: WindowExec => w }.nonEmpty, p.toString)
  }

  test("budget allocation: rank window sees the |sources| aggregate, never the corpus scan") {
    val p = plan(Curation.budgetAllocation(spark, dir))
    val windows = p.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, p.toString)
    // the window input is the localCheckpoint-materialized source
    // relation (an RDD scan) — a documents file scan under the window
    // would mean the corpus is being globally sorted
    windows.foreach { w =>
      assert(w.collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.isEmpty,
        s"documents scan under the rank window:\n$w")
    }
  }

  test("quantile audit: window and final agg share one stratum shuffle") {
    val p = plan(Curation.quantileAudit(spark, dir))
    // the rank window partitions by source; the groupBy(source) after it
    // must REUSE that partitioning — one stratum exchange + presentation
    // sort, never a second hash exchange for the aggregation
    assert(shuffles(p) <= 2, s"expected window+agg to share the exchange:\n$p")
    assert(p.collect { case w: WindowExec => w }.nonEmpty, p.toString)
    assert(prunesTo(p, "doc_id:bigint,source:string,n_chars:bigint"), p.toString)
  }

  test("event transitions: one user window shuffle; marginal re-aggregates the matrix, not the stream") {
    val p = plan(Temporal.transitions(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, p.toString)
    // exactly one WindowExec (the per-user lead); a second would mean the
    // marginal went back to the event stream instead of the count matrix
    assert(p.collect { case w: WindowExec => w }.length == 1, p.toString)
    // the fixture's ts physical type varies by generation (TIMESTAMP
    // NANOS loads as bigint under nanosAsLong; MICROS as timestamp_ntz
    // — Replication.events normalizes both): accept either pruned form
    assert(prunesTo(p, "event_id:bigint,ts:bigint,user_id:bigint,event_type:string") ||
      prunesTo(p, "event_id:bigint,ts:timestamp_ntz,user_id:bigint,event_type:string"),
      p.toString)
  }

  test("collocations: equi-joins only, 1-row N broadcast, bounded top-k — no rank window") {
    val p = plan(TextAnalysis.collocations(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"count joins must stay equi:\n$p")
    // the only nested-loop is the 1-row corpus-total broadcast
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 1, p.toString)
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("segment repair: census + rebuild keyed shuffles only; anti-join stays equi") {
    val p = plan(Dedup.segmentRepair(spark, dir))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, s"nothing may pair documents:\n$p")
    // (no prunesTo here: the segment stream is localCheckpoint'd, so this
    // plan starts at Scan ExistingRDD — the parquet scan lives upstream)
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("perplexity buckets: calibration windows see only the sample; corpus pass is a broadcast compare") {
    val p = plan(TextAnalysis.perplexityBuckets(spark, dir))
    // the 5-row cutoff table joins the corpus by broadcast, never shuffled
    assert(p.collect { case b: BroadcastHashJoinExec => b }.nonEmpty, p.toString)
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // row_number/count windows exist for calibration only — they hang off
    // the sample filter, not the full scored relation: every WindowExec
    // descendant must carry the sample's draw filter
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, p.toString)
    wins.foreach { w =>
      assert(w.toString.contains("ppl:"),
        s"calibration window must sort the SAMPLE (draw filter below it):\n$w")
    }
  }
}
