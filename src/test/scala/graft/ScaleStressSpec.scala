package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** 10×-bench-scale stress for the skew/dedup families (r7 task 5): the
  * plan shapes PlanSpec pins at eval scale must SURVIVE a size jump —
  * stats-driven planning can flip a join strategy or add an exchange
  * when file sizes grow, which is exactly the class of regression a
  * small-SF suite cannot see.
  *
  * The slice is generated ONCE into /tmp/graft-scale10 (idempotent,
  * marker-gated) from sf0.1:
  *  - `events` ×60 → 6M rows, user_id UNCHANGED (the hot keys get 60×
  *    hotter — skew intensifies with scale, as in production);
  *  - `documents` ×10 → 50k docs, replica tokens PREFIXED (`r<k>tok`)
  *    so replica shingle spaces are disjoint: the corpus statistics
  *    (near-dup structure, df distribution) replicate instead of
  *    collapsing into one giant 10-clique per document, which would
  *    benchmark a pathology, not scale.
  *
  * Execution here runs the linear-cost families only (hot keys,
  * saltedJoin — aggregates/joins over 6M rows finish in seconds at
  * local[4]); the quadratic-candidate families (x3 PPJoin, x22
  * cluster pairs) are asserted at the PLAN level (their connected-
  * components loop executes eagerly via localCheckpoint, so running
  * them belongs in the bench JVM — BASELINE.md's 10× section records
  * their measured scaling exponents).
  */
class ScaleStressSpec extends AnyFunSuite with SparkSuite {

  private def plan(df: => DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def noNestedLoops(p: org.apache.spark.sql.execution.SparkPlan): Unit =
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.isEmpty, p.toString)

  private lazy val dir10 = ScaleStress.ensure(spark)

  test("10x slice: generated scale is 6M events / 50k documents / 60k embeddings") {
    assert(graft.operators.Replication.events(spark, dir10).count() == 6000000L)
    assert(graft.operators.Tables.documents(spark, dir10).count() == 50000L)
    assert(graft.operators.Tables.embeddings(spark, dir10).count() == 60000L)
  }

  test("x65 hot keys at 10x: plan shape holds and the report is scale-invariant") {
    val p = plan(graft.operators.Skew.hotKeys(spark, dir10))
    // the eval-scale shape, verbatim: partial+final agg around one key
    // exchange, totals broadcast, top-N as TakeOrdered — no sort exchange
    assert(p.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.length >= 2, p.toString)
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 2, p.toString)
    assert(p.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, p.toString)
    // (the one BroadcastNestedLoopJoin is the INTENTIONAL 1-row totals
    // broadcast — bounded by construction; no cartesian of relations)
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // executes under AQE; replication preserves each key's SHARE, so the
    // report must agree with sf0.1's rows at 60x the counts — a
    // correctness-at-scale pin, not just "it ran"
    val at10 = graft.operators.Skew.hotKeys(spark, dir10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val at1 = graft.operators.Skew.hotKeys(spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(at10.map(_._1).toSeq == at1.map(_._1).toSeq, "hot-key identity must survive scale")
    at10.zip(at1).foreach { case ((_, n10, s10), (_, n1, s1)) =>
      assert(n10 == 60L * n1, "counts scale exactly with replication")
      assert(math.abs(s10 - s1) < 1e-9, "skew_ratio is scale-free")
    }
  }

  test("saltedJoin at 10x: stays an equi-join (no nested loops) and agrees with the plain join") {
    val big = graft.operators.Replication.events(spark, dir10)
      .select(col("user_id").as("k"), col("event_id"))
    val dim = graft.operators.Replication.events(spark, dir10)
      .select(col("user_id").as("k")).distinct()
      .withColumn("tag", col("k") % 7)
    val salted = graft.operators.Skew.saltedJoin(big, dim, "k", salts = 8)
    val p = plan(salted)
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, s"salted join must plan as an equi-join:\n$p")
    // 6M-row execution under AQE: same cardinality as the unsalted join
    assert(salted.count() == big.join(dim, "k").count())
  }

  test("x3 PPJoin at 10x: inverted-index shape survives — no cartesian, no corpus broadcast flip") {
    val p = plan(graft.operators.Dedup.ngramJaccard(spark, dir10))
    noNestedLoops(p)
    // candidate generation stays posting-list based: every join in the
    // plan is an equi-join (prefix⋈freq, verify⋈arrays) — a stats-driven
    // flip to a broadcast of the 10x corpus side would show up here as
    // a nested-loop or an exploded broadcast relation
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }
    assert(joins.nonEmpty && joins.forall(identity), p.toString)
  }

  test("x5 family at 10x: the measured broadcast guard holds on BOTH sides of the wall") {
    // the r6 regression class, pinned at 60k vectors: the pmod query
    // side has no selectivity estimate, so Catalyst alone would fall to
    // the cartesian even when the measured side is broadcastable
    val under = plan(graft.operators.Similarity.bruteForceTopK(spark, dir10))
    assert(under.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty,
      s"measured-under-threshold query side must broadcast, not cartesian:\n$under")
    assert(under.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, under.toString)
    // past the wall (threshold 1 byte) the guard's HINT must be off: any
    // remaining broadcast is Catalyst's own stats-bounded choice (here
    // the ~24 MB corpus side under the planner's threshold — itself a
    // bounded side, so still scale-safe), never the guard hinting the
    // query side it measured as too big
    val over = plan(graft.operators.Similarity.bruteForceTopK(
      spark, dir10, maxBroadcastBytes = 1L))
    over.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.foreach { b =>
      val buildPlan = (if (b.buildSide.toString.contains("Right")) b.right else b.left).toString
      assert(!buildPlan.contains("pmod"),
        s"the guard must not hint the measured-too-big query side:\n$over")
    }
    // and with stats-based broadcast ALSO off (the true 100 TB regime,
    // where no side fits), the same code degrades to the partitioned
    // cartesian — the correct fallback that replicates neither side whole
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val atScale = plan(graft.operators.Similarity.bruteForceTopK(
        spark, dir10, maxBroadcastBytes = 1L))
      assert(atScale.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.nonEmpty, s"with no broadcastable side the plan must be the cartesian:\n$atScale")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("x80 hamming ANN at 10x: signature pass broadcasts under the guard; re-rank stays equi") {
    val p = plan(graft.operators.Similarity.hammingTopK(spark, dir10))
    // 60k signatures: the 6k-query side measures ~0.5 MB — the guard
    // must broadcast it (a cartesian here would mean it failed open)
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"signature pass fell to a cartesian at 10x:\n$p")
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.nonEmpty, p.toString)
    // full vectors are still only probed by id — the 10x corpus must
    // not flip the re-rank to anything non-equi
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.length >= 2, p.toString)
  }

  test("x79 rank fusion at 10x: shingle leg stays an inverted-index equi-join; no rank window") {
    val p = plan(graft.operators.Similarity.rankFusion(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"fusion must not cross-product at 10x:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x81 winnowing at 10x: match pairs arise only from fingerprint equi-joins; no window on the match side") {
    val p = plan(graft.operators.Dedup.winnowMatches(spark, dir10))
    noNestedLoops(p)
    // the winnow selection runs two window functions per doc (count +
    // frame min) BEFORE the distinct; the match join itself must carry
    // none — pairs come from the hash equi-join, never a ranked sweep
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, s"expected an equi-join for the fingerprint match:\n$p")
  }

  test("x82 bigram LM at 10x: linear token pipeline — no cartesian, no per-doc window, equi-joins only") {
    val p = plan(graft.operators.TextAnalysis.bigramLm(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"bigram scoring must not sort-window the position stream:\n$p")
  }

  test("persisted cluster index at 10x: membership probe prunes label FILES by bucket") {
    import spark.implicits._
    val indexPath = s"$dir10/cluster-index"
    // rebuild unconditionally (the IVF test's staleness argument): the
    // 50k-doc pair generation + contraction is the ONE expensive pass
    // the index exists to amortize — paid here once, in-suite
    graft.operators.Curation.writeClusterIndex(spark, dir10, indexPath, nBuckets = 16)
    def parquetFilesUnder(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(parquetFilesUnder).sum
    }
    val total = parquetFilesUnder(new java.io.File(s"$indexPath/labels"))
    assert(total >= 16, s"expected at least one file per bucket, saw $total")
    // a probe batch confined to ONE bucket (doc_id ≡ 3 mod 16): the
    // static prune must touch only that bucket's files
    val members = graft.operators.Curation.clustersFromIndex(spark, indexPath, dir10)
      .filter(col("doc_id") % 16 === 3).limit(50).localCheckpoint()
    val want = members.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty)
    val probe = graft.operators.Curation.lookupClustersFromIndex(
      spark, indexPath, members.select("doc_id"))
    val got = probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.forall(_._3) && got.map(t => t._1 -> t._2).toMap == want,
      "probe answers must match the full label relation")
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        fileScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val bucketFiles = parquetFilesUnder(new java.io.File(s"$indexPath/labels/bucket=3"))
    val scanned = fileScans(probe.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("labels")))
      .map(_.metrics("numFiles").value).sum
    assert(scanned > 0 && scanned <= bucketFiles && scanned < total,
      s"probe scanned $scanned of $total label files for a 1-bucket batch " +
        s"(bucket=3 holds $bucketFiles) — the literal bucket filter must prune by the PLANNER")
  }

  test("persisted IVF index at 10x: probe scans a strict minority of the 60k-vector index files") {
    import spark.implicits._
    val indexPath = s"$dir10/ivf-index"
    // rebuild unconditionally: tying the index to a cells-dir existence
    // check would let a regenerated slice (marker version bump) be
    // probed against a stale index, or a crashed half-write pass as
    // built; the 60k-vector build is one corpus pass, seconds here
    graft.operators.Similarity.writeIvfIndex(spark, dir10, indexPath, nCentroids = 16)
    def parquetFilesUnder(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(parquetFilesUnder).sum
    }
    val total = parquetFilesUnder(new java.io.File(s"$indexPath/cells"))
    assert(total >= 16)
    val queries = graft.operators.Tables.embeddings(spark, dir10)
      .filter(col("vec_id") % 9973 === 0).select("vec_id", "embedding")
    val probe = graft.operators.Similarity.ivfTopKFromIndex(
      spark, indexPath, queries, k = 3, nprobe = 1)
    assert(probe.collect().nonEmpty)
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScans(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        fileScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val scanned = fileScans(probe.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("cells")))
      .map(_.metrics("numFiles").value).sum
    // the principled bound: at nprobe=1 the probe touches at most one
    // CELL per query — in files, ≤ #queries × the widest cell's file
    // count (partitionBy emits one file per input-split per cell, so
    // one-file-per-cell must not be assumed) — and always a strict
    // minority of the index
    val filesPerCellMax = Option(new java.io.File(s"$indexPath/cells").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(parquetFilesUnder).max
    val nQueries = queries.count()
    assert(scanned > 0 && scanned <= nQueries * filesPerCellMax && scanned < total,
      s"probe scanned $scanned of $total index files for $nQueries queries " +
        s"(≤$filesPerCellMax files/cell) — pruning must survive the scale-up")
  }

  test("x83 collocations at 10x: count joins stay equi; only the 1-row N broadcast nests; no window") {
    val p = plan(graft.operators.TextAnalysis.collocations(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"marginal-count joins must stay equi at 10x:\n$p")
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 1, s"only the 1-row corpus total may nest:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x84 segment repair at 10x: nothing pairs documents; census anti-join stays equi") {
    val p = plan(graft.operators.Dedup.segmentRepair(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x85 ppl buckets at 10x: calibration windows stay on the sample; corpus join stays broadcast") {
    val p = plan(graft.operators.TextAnalysis.perplexityBuckets(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // 10x more documents must NOT flip the 5-row cutoff table off the
    // broadcast path (that flip would shuffle the whole scored corpus)
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"cutoff join must stay broadcast at 10x:\n$p")
    p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .foreach(w => assert(w.toString.contains("ppl:"),
        s"calibration window must sit above the sample filter:\n$w"))
  }

  test("x86 transitions at 10x: one per-user window; matrix joins never touch the event stream again") {
    val p = plan(graft.operators.Temporal.transitions(spark, dir10))
    noNestedLoops(p)
    // the ONLY window is the per-user lead() — 10x events must not grow
    // a second event-stream pass (the marginal re-aggregates the tiny
    // |types|^2 matrix, never the stream)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.length == 1, p.toString)
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.length == 1, s"events must be scanned exactly once:\n$p")
  }

  test("x87 importance weights at 10x: count joins stay equi; only the 1-row totals broadcast nests") {
    val p = plan(graft.operators.Curation.importanceWeights(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"bucket-count joins must stay equi at 10x:\n$p")
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 1, s"only the 1-row totals row may nest:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x88 journey scores at 10x: matrix stays broadcast; nothing re-scans events") {
    // journeyScores materializes the pair stream ONCE (localCheckpoint —
    // the per-user window executes here, over 6M events) and the final
    // plan consumes only that checkpoint: the |types|^2 matrix must stay
    // on the broadcast side of the scoring join at 60x-hotter users, and
    // no file scan (= no second event-stream pass) may appear above it
    val p = plan(graft.operators.Temporal.journeyScores(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"matrix join must stay broadcast at 10x:\n$p")
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"the scored plan must read only the checkpointed pairs:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x89 budget sweep at 10x: one scan, one per-lang window; the sweep explode never joins the corpus") {
    val p = plan(graft.operators.Packing.budgetSweep(spark, dir10))
    noNestedLoops(p)
    // the |budgets| multiplier is a row-local explode of a literal
    // array — 10x more documents must not surface it as a join, and the
    // running-sum window must stay the single per-lang pass
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.length == 1, s"documents must be scanned exactly once:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.length == 1, p.toString)
  }

  test("x90 bpe pairs at 10x: join-free agg pipeline; top-N stays TakeOrdered, never a global sort") {
    val p = plan(graft.operators.TextAnalysis.bpePairStats(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"the vocab-collapse pipeline must not join:\n$p")
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.length == 1, s"documents must be scanned exactly once:\n$p")
    assert(p.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty, s"top-N must be TakeOrdered at 10x, not a sort exchange:\n$p")
  }

  test("x91 quantized recall at 10x: int leg under the same guard; no rank window on either leg") {
    // the quantized candidate leg inherits the x5-family guard contract:
    // at 60k vectors the measured int64-code query side still broadcasts
    // (never a cartesian), and both top-k legs stay the map-side bounded
    // aggregate — a rank window here would shuffle the full n·m relation.
    // queryMod = 1000: the exact leg EXECUTES during plan build (its
    // localCheckpoint), so the sparser sample keeps this a plan-shape
    // test (~60 queries), not a 13-minute brute-force benchmark — the
    // pmod filter and guard path are identical at any mod
    val p = plan(graft.operators.Similarity.quantizedRecall(spark, dir10, queryMod = 1000))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"guarded query sides must broadcast at 10x:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x92 dup-gram coverage at 10x: a pure projection — no join, no agg exchange, no window") {
    val p = plan(graft.operators.Curation.dupGramCoverage(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, p.toString)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
    // the only exchange the score may pay is the presentation sort
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 1, p.toString)
  }

  test("x93 corpus diff at 10x: digest equi-join survives; statuses cover the union exactly") {
    val p = plan(graft.operators.Curation.corpusDiff(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, s"snapshot compare must stay a doc_id equi-join:\n$p")
    // executes under AQE: every doc_id lands in exactly one status
    // (mod-3 partition of the id space: 0→added, 1→removed, 2→same or
    // changed), so the per-(source, status) counts must sum to 50k
    val rows = graft.operators.Curation.corpusDiff(spark, dir10).collect()
    assert(rows.map(_.getLong(2)).sum == 50000L)
    assert(rows.map(_.getString(1)).toSet == Set("added", "removed", "changed", "same"))
  }

  test("x94 dim audit at 10x: dim-bounded partial agg — one agg exchange + the presentation sort") {
    val p = plan(graft.operators.Similarity.dimAudit(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.length >= 2, s"per-dim stats must partial-aggregate map-side:\n$p")
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 2, p.toString)
    // executes: 64 dims × 60k vectors — n_vals is exact at scale
    val rows = graft.operators.Similarity.dimAudit(spark, dir10).collect()
    assert(rows.length == 64 && rows.forall(_.getLong(1) == 60000L))
  }

  test("x96 distinct n-grams at 10x: disjoint replica token spaces scale BOTH counts exactly 10x") {
    val p = plan(graft.operators.TextAnalysis.distinctNgrams(spark, dir10))
    noNestedLoops(p)
    // replica tokens are r<k>-prefixed, so replica gram spaces are
    // disjoint from the base and each other: totals AND distincts must
    // both come back exactly 10× their sf0.1 values — a correctness-at-
    // scale pin on the aggregation, not just "it ran"
    val at1 = graft.operators.TextAnalysis.distinctNgrams(spark, "/root/testdata/sf0.1")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val at10 = graft.operators.TextAnalysis.distinctNgrams(spark, dir10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (k, (tot1, dist1)) =>
      val (tot10, dist10) = at10(k)
      assert(tot10 == 10L * tot1, s"$k totals")
      assert(dist10 == 10L * dist1, s"$k distincts")
    }
  }

  test("x97 domain caps at 10x: windowless thresholded sample keeps ~sqrt(n) per source") {
    val p = plan(graft.operators.Curation.domainCaps(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the cap must never rank per source:\n$p")
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"the |sources| count relation must broadcast:\n$p")
    // executes: per-source kept counts concentrate around sqrt(n) —
    // deterministic fixture, generous binomial bounds, can never flake
    val kept = graft.operators.Curation.domainCaps(spark, dir10).collect()
      .groupBy(_.getString(1)).map { case (s, g) => s -> (g.length.toLong, g.head.getLong(2)) }
    kept.foreach { case (src, (nKept, nSource)) =>
      val expect = math.sqrt(nSource.toDouble)
      assert(nKept >= (expect / 3).floor.toLong && nKept <= (expect * 3).ceil.toLong,
        s"$src kept $nKept of $nSource (expected ~$expect)")
    }
  }

  test("x101 disorder audit at 10x: one user-window shuffle, types-bounded agg, no nested loops") {
    val p = plan(graft.operators.Temporal.disorderAudit(spark, dir10))
    noNestedLoops(p)
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.length == 1 && wins.forall(_.partitionSpec.nonEmpty),
      s"the running max must window per user, never globally:\n$p")
    // executes over 6M events: output stays |event types|-bounded and
    // every bucket column reconciles with the row count
    val rows = graft.operators.Temporal.disorderAudit(spark, dir10).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    rows.foreach { r =>
      val n = r.getLong(1)
      val parts = (2 to 6).map(r.getLong).sum
      assert(parts == n, s"${r.getString(0)}: buckets $parts must cover all $n events")
    }
  }

  test("x100 semantic packing at 10x: cells equi-join + per-cell window survive; pack arithmetic exact") {
    val df = graft.operators.Packing.semanticPacking(spark, dir10, exactMeans = true)
    val p = plan(graft.operators.Packing.semanticPacking(spark, dir10, exactMeans = true))
    noNestedLoops(p)
    // centroid assignment is row-local (collected k·dim table folded
    // into literal expressions — x54's shape), so the ONLY join is the
    // narrow tokens ⋈ cells doc_id equi-join
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, s"tokens must reach cells via a doc_id equi-join:\n$p")
    // the running sum windows per CELL, never globally — a global sort
    // at 100 TB is the failure mode this spelling exists to avoid
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.length == 1 && wins.forall(_.partitionSpec.nonEmpty),
      s"pack running sum must window per cell:\n$p")
    // executes over the 50k-doc / 60k-vector slice: bins partition the
    // joined corpus exactly — doc and token totals reconcile
    val rows = df.collect()
    val joined = graft.operators.Tables.documents(spark, dir10)
      .select(col("doc_id"),
        size(graft.operators.Tables.tokens(col("text"))).cast("long").as("tok"))
      .join(graft.operators.Similarity.centroidSimProjection(spark, dir10, exactMeans = true)
        .select(col("vec_id").as("doc_id")), "doc_id")
    assert(rows.map(_.getLong(2)).sum == joined.count(), "every joined doc lands in exactly one bin")
    assert(rows.map(_.getLong(3)).sum ==
      joined.agg(sum("tok")).head.getLong(0), "token mass is conserved across bins")
    assert(rows.forall(_.getLong(1) >= 0L), "bin ids are offsets, never negative")
  }

  test("x102 schema drift at 10x: keys-bounded partial agg + 1-row totals broadcast; no rate NaNs") {
    // the SparkEntry binding's deterministic drift, applied to the 6M slice
    def drifted = graft.operators.Replication.events(spark, dir10)
      .selectExpr("event_id",
        """CASE WHEN event_id % 2 = 0 AND event_id % 7 = 0
          |       THEN '{"k": 1, "legacy": true}'
          |     WHEN event_id % 2 = 1 AND event_id % 3 = 0
          |       THEN '{"v": 1}'
          |     ELSE props END AS props""".stripMargin)
    val p = plan(graft.operators.Payload.schemaDrift(drifted))
    // the ONE BroadcastNestedLoopJoin is the INTENTIONAL 1-row totals
    // broadcast (bounded by construction); a cartesian of relations is
    // the regression this pin exists to catch
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    assert(p.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.length >= 2, s"the key census must partial-aggregate map-side:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
    // executes over 6M events: output stays |keys|-bounded; both parity
    // halves are non-empty so the ANSI zero-denominator guard must never
    // fire — every rate present, in [0,1], and shift = new − old exactly
    val rows = graft.operators.Payload.schemaDrift(drifted).collect()
    assert(rows.nonEmpty && rows.length <= 16, s"key census must stay bounded, got ${rows.length}")
    assert(rows.map(_.getString(3)).toSet.subsetOf(Set("new", "gone", "stable")))
    rows.foreach { r =>
      assert(!r.isNullAt(4) && !r.isNullAt(5), s"${r.getString(0)}: non-empty halves must have rates")
      val (ro, rn) = (r.getDouble(4), r.getDouble(5))
      assert(ro >= 0.0 && ro <= 1.0 && rn >= 0.0 && rn <= 1.0)
      assert(math.abs(r.getDouble(6) - (rn - ro)) < 1e-15)
    }
  }

  test("x103/x79 retrieval legs at 10x: lexical stays an inverted-index equi-join, no cartesian, no rank window") {
    // rankFusion shares the ONE retrieval-leg builder with
    // retrieverAgreement (r10 refactor), and unlike x103 it builds
    // lazily (no localCheckpoint), so pinning ITS plan at 10x pins the
    // legs of both consumers by construction
    val p = plan(graft.operators.Similarity.rankFusion(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no leg may fall to a cartesian at 10x:\n$p")
    // lexical candidates come from shared shingles (equi-join), never
    // all pairs; the 6k-query vector side rides the measured broadcast
    // guard (its non-equi BNLJ is the x5 family's pinned measured-under
    // regime, bounded by the measured query-side bytes)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }.exists(identity), s"the lexical leg must join on shingle:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"top-k must stay the bounded map-side agg, never a rank window:\n$p")
    // executes at 10x corpus (600 queries x 60k vectors via a sparser
    // queryMod — the agreement stage itself is |queries|·k-bounded):
    // every query reports a full dense top-k and a lawful overlap
    val rows = graft.operators.Similarity
      .retrieverAgreement(spark, dir10, queryMod = 100).collect()
    assert(rows.length == 600, s"one row per query, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(2) == 5L, "dense leg always retrieves k on a 60k corpus")
      val common = r.getLong(3)
      assert(common >= 0L && common <= 5L && common <= r.getLong(1).max(common))
      assert(math.abs(r.getDouble(4) - common / 5.0) < 1e-15)
    }
  }

  test("x22 pair generation at 10x: banded equi-join shape survives (plan level)") {
    // dedupClusters' connected-components loop EXECUTES per round
    // (localCheckpoint), so the suite asserts the scale-sensitive part —
    // the near-dup PAIR relation the loop consumes — at plan level; the
    // loop itself is measured in the bench JVM (BASELINE.md 10x section)
    val p = plan(graft.operators.Dedup.simhashNearDupPairs(spark, dir10)
      .select(col("d1"), col("d2")))
    noNestedLoops(p)
    // pair generation is posting-list expansion (group by band bucket,
    // explode ordered pairs within each list) — stronger than an
    // equi-join: NO join node may appear, and the bucket-saturation
    // guard must still be in-plan at the larger size
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, s"pair generation must not become a self-join:\n$p")
    assert(p.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, p.toString)
    assert(p.toString.contains("bucket saturated"),
      "the posting-list saturation guard must survive the scale-up")
  }

  test("x104 pq codes at 10x: row-local encode — no join, one presentation exchange; executes") {
    val p = plan(graft.operators.Similarity.pqCodes(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"literal-codebook encode must never join:\n$p")
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 1, p.toString)
    // executes at 60k vectors: every code in range, errors non-negative
    val rows = graft.operators.Similarity.pqCodes(spark, dir10).limit(2000).collect()
    assert(rows.length == 2000)
    rows.foreach { r =>
      assert(r.getString(1).split(",").length == 8 &&
        r.getString(1).split(",").forall(c => c.toInt >= 0 && c.toInt < 16))
      assert(r.getLong(2) >= 0L)
    }
  }

  test("x105 pq ADC at 10x: guarded query side broadcasts; no cartesian, no rank window") {
    // queryMod = 1000 for the same reason as the x91 pin: the float
    // truth leg executes during plan build; the guard path and ADC
    // join shape are mod-invariant
    val p = plan(graft.operators.Similarity.pqRecall(spark, dir10, queryMod = 1000))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"guarded query sides must broadcast at 10x:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("x106 unimax at 10x: windows order |sources| rows — no file scan under any window") {
    val p = plan(graft.operators.Curation.unimaxBudget(spark, dir10))
    // the scalar probes (bad index, remainder) broadcast as 1-row
    // relations — the x87 allowance; nothing corpus-sized may nest
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.foreach { n =>
      assert(n.collectLeaves().forall(l =>
        !l.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        s"a corpus-sized side must never nest:\n$p")
    }
    p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(w.collectLeaves().forall(l =>
        !l.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
        s"a corpus scan under the rank window would sort documents, not sources:\n$p")
    }
    // executes: the allocation law holds at 50k docs
    val rows = graft.operators.Curation.unimaxBudget(spark, dir10).collect()
    val totalCap = rows.map(_.getLong(2)).sum
    assert(rows.map(_.getLong(4)).sum == math.min(50000L, totalCap))
  }

  test("x107 blocklist at 10x: a pure projection — no join, no agg, one presentation exchange") {
    val p = plan(graft.operators.Curation.blocklistFilter(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, p.toString)
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 1, p.toString)
  }

  test("x108 contamination spans at 10x: hits prune via broadcast BEFORE the one doc shuffle") {
    val p = plan(graft.operators.Curation.contaminationSpans(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // the benchmark-gram membership join must stay broadcast (the gram
    // stream never shuffles for it) …
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"benchmark set must broadcast:\n$p")
    // … and the sessionize trick shares ONE doc-keyed exchange across
    // both windows and both aggregations (+ the benchmark distinct pair
    // and the presentation sort)
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 4, p.toString)
  }

  test("x109 dim correlation at 10x: the wire carries partition-bounded Gram triangles; executes") {
    val p = plan(graft.operators.Similarity.dimCorrelation(spark, dir10))
    noNestedLoops(p)
    // no Generate (explode) anywhere: the declarative spelling would put
    // 2 080 rows PER VECTOR on the wire — the kernel must emit per
    // partition instead
    assert(p.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, s"dim² explode would not survive 100×:\n$p")
    // executes at 60k vectors: s12 of the 10 disjoint replicas is 10×
    // the sf0.1 corpus value only if accumulation is exact — assert
    // basic sanity instead (pairs well-formed, r² in [0, 1])
    val rows = graft.operators.Similarity.dimCorrelation(spark, dir10).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      if (!r.isNullAt(5)) assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("x110 burstiness at 10x: one keyed window + types-bounded agg; cv2 finite everywhere") {
    val p = plan(graft.operators.Temporal.burstiness(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.length == 1, p.toString)
    // executes over 6M events: per-type moments stay exact (no NaN/Inf
    // from the guarded divisions)
    val rows = graft.operators.Temporal.burstiness(spark, dir10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(5)) {
        val cv2 = r.getDouble(5)
        assert(!cv2.isNaN && !cv2.isInfinite && cv2 >= 0.0)
      }
    }
  }

  test("x111 edit dedup at 10x: banded candidates + equi-joins only; guard survives") {
    // plan-level pin (the Levenshtein verify over the 10x candidate
    // stream belongs in the bench JVM — BASELINE.md's 10x section
    // records its measured time, x3's convention for verify families)
    val p = plan(graft.operators.Dedup.editNearDup(spark, dir10))
    noNestedLoops(p)
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }
    assert(joins.nonEmpty && joins.forall(identity),
      s"candidate generation and text join-back must stay equi-joins:\n$p")
    assert(p.toString.contains("bucket saturated"),
      "the banded-bucket saturation guard must survive the scale-up")
  }

  test("x112 semantic contamination at 10x: bench slice broadcasts; no cartesian, no window") {
    val p = plan(graft.operators.Similarity.semanticContamination(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"the guarded bench slice must broadcast at 60k vectors:\n$p")
    // the max-sim fold is the presentTopK struct-max aggregate — a rank
    // window here would sort the scored pairs instead of folding them
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
    // executes at benchMod 1000 (the x105 queryMod convention: the
    // guard path and fold shape are mod-invariant; the full 3k-vector
    // bench slice belongs to the bench JVM): every non-bench vector is
    // scored exactly once, sims stay in [-1, 1]
    val rows = graft.operators.Similarity
      .semanticContamination(spark, dir10, benchMod = 1000).collect()
    assert(rows.length == 60000 - 60)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("x113 oov rate at 10x: vocab fold bounded; token counts scale exactly with replication") {
    val p = plan(graft.operators.TextAnalysis.oovRate(spark, dir10))
    noNestedLoops(p)
    // executes: disjoint replica token spaces leave every document's
    // token COUNT unchanged, so per-source instance mass must be
    // exactly 10x sf0.1's — a correctness-at-scale pin (x65's style)
    val at10 = graft.operators.TextAnalysis.oovRate(spark, dir10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val at1 = graft.operators.TextAnalysis.oovRate(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at10.keySet == at1.keySet, "source identity must survive scale")
    at1.foreach { case (src, n) => assert(at10(src) == 10L * n,
      s"$src: token instances must scale exactly with replication") }
  }

  test("x114 cell outliers at 10x: one cell-keyed exchange; the integer cut holds exactly") {
    val p = plan(graft.operators.Similarity.cellOutliers(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"trained centroids ride as literals — the projection must never join:\n$p")
    // both windows (rank, cell count) share the one cell-keyed exchange
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 2, p.toString)
    // executes at 60k vectors: the exact-integer bottom-5% law —
    // outliers per cell == floor(n_cell / 20), no float percentile drift
    val rows = graft.operators.Similarity.cellOutliers(spark, dir10).collect()
    assert(rows.map(_.getLong(1)).distinct.length >= 2, "training must keep >= 2 live cells")
    val perCell = rows.groupBy(_.getLong(1))
    perCell.foreach { case (_, rs) =>
      val n = rs.head.getLong(4)
      assert(rs.count(_.getBoolean(5)) == n / 20)
    }
  }

  test("x115 signal agreement at 10x: source-keyed ranks; rho stays a valid correlation") {
    val p = plan(graft.operators.Curation.signalAgreement(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // no rank window may sort the raw corpus — both windows key by
    // source over the already-joined signal relation
    val rows = graft.operators.Curation.signalAgreement(spark, dir10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val rho = r.getDouble(3)
        assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho out of range: $rho")
      }
    }
  }

  test("x116 containment at 10x: posting-list shape survives — equi-joins, guard, no flip") {
    // plan-level pin (the exact IntersectSize verify over the 10x
    // candidate stream runs in the bench JVM — x3's convention)
    val p = plan(graft.operators.Dedup.containmentJoin(spark, dir10))
    noNestedLoops(p)
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }
    assert(joins.nonEmpty && joins.forall(identity),
      s"prefix probe and array join-back must stay equi-joins:\n$p")
    assert(p.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.nonEmpty, "the grouped posting-list explode must survive")
    assert(p.toString.contains("posting list this hot"),
      "the posting-list saturation guard must survive the scale-up")
  }

  test("x117 pack bleed at 10x: one packing window; doc and token mass scale exactly") {
    val p = plan(graft.operators.Packing.packBleed(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.length == 1, s"the sweep must reuse the ONE per-lang running-sum window:\n$p")
    // executes: replication multiplies per-(win, lang) doc and token
    // mass exactly 10x (prefixing never changes a token count), and the
    // bleed law bounds positions by (W-1) per bleeding doc
    val at10 = graft.operators.Packing.packBleed(spark, dir10).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(5), r.getLong(3), r.getLong(4))).toMap
    val at1 = graft.operators.Packing.packBleed(spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(5))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (k, (nd, nt)) =>
      val (nd10, nt10, nBleed10, bleedPos10) = at10(k)
      assert(nd10 == 10L * nd && nt10 == 10L * nt,
        s"$k: doc/token mass must scale exactly with replication")
      assert(bleedPos10 <= (k._1 - 1L) * nBleed10,
        s"$k: bleed positions must respect the per-doc (W-1) bound")
    }
  }

  test("x118 entity resolution at sf0.1: blocked equi-join, struct-max fold — no window, no cartesian") {
    // the part catalog is not in the 10x slice (it scales with SF, not
    // with the replicated tables); the plan contract is pinned at the
    // largest available catalog (20k parts, ~16 records/block)
    val p = plan(graft.operators.Linkage.entityResolution(spark, "/root/testdata/sf0.1"))
    noNestedLoops(p)
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }
    assert(joins.nonEmpty && joins.forall(identity),
      s"the blocking self-join and the left join-back must stay equi-joins:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the best-match argmax must fold map-side, never rank the pair stream:\n$p")
  }

  test("x133 entity clusters at sf0.1: blocked edges, contraction labels; fold reads the checkpoint") {
    // same catalog note as x118 (part scales with SF, not the slice);
    // the contraction loop executes at plan build — its cost is x22's
    // BASELINE column. The pin: edges come from the blocked equi-join
    // (never a window over pairs), and the purity fold consumes the ONE
    // checkpointed membership relation — zero parquet re-scans.
    val p = plan(graft.operators.Linkage.entityClusters(spark, "/root/testdata/sf0.1"))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"majority pick must stay a partial-agg max(struct), never a window:\n$p")
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"the purity fold must consume the checkpointed members, not re-scan the catalog:\n$p")
  }

  test("x119 vocab coverage at 10x: the class window never sorts the corpus; mass scales exactly") {
    val p = plan(graft.operators.TextAnalysis.vocabCoverage(spark, dir10))
    // the cumulative window orders the CLASS relation: both count folds
    // (token counts, then count-of-counts) must sit between any window
    // and the corpus scan — a window fed raw scan rows would be the
    // naive |vocab|-row (or worse) single-task sort
    p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.length >= 2,
        s"the cumulative window must order aggregated count CLASSES, not the token stream:\n$p")
    }
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // executes: disjoint replica token spaces multiply instance mass
    // exactly 10x and every target stays covered
    val at10 = graft.operators.TextAnalysis.vocabCoverage(spark, dir10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val at1 = graft.operators.TextAnalysis.vocabCoverage(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (pct, (r1, _, t1, _)) =>
      val (r10, c10, t10, cov10) = at10(pct)
      assert(t10 == 10L * t1, s"$pct: total mass must scale exactly")
      assert(r10 <= 10L * r1, s"$pct: replicated classes can only tighten the rank")
      assert(cov10 >= pct / 100.0 - 5e-5, s"$pct: the target stays covered")
      assert(c10 * 100L >= pct.toLong * t10, s"$pct: exact-integer coverage law at 10x")
    }
  }

  test("x120 zipf profile at 10x: lang-keyed rank window only; head frequency is scale-invariant") {
    val p = plan(graft.operators.TextAnalysis.zipfProfile(spark, dir10))
    noNestedLoops(p)
    // executes: the rank-1 token of each lang keeps its ORIGINAL count
    // (replica spaces are disjoint — the head token replicates as 10
    // same-count tokens, it does not merge), so freq(rank 1) is
    // invariant while lang mass scales 10x
    val head10 = graft.operators.TextAnalysis.zipfProfile(spark, dir10).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getString(0) -> r.getLong(3)).toMap
    val head1 = graft.operators.TextAnalysis.zipfProfile(spark, "/root/testdata/sf0.1").collect()
      .filter(_.getLong(1) == 1L).map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(head10 == head1, "rank-1 frequency must survive replication unchanged")
  }

  test("x122 cusum drift at 10x: grid is calendar-bounded; peaks scale exactly 60x, hours invariant") {
    val p = plan(graft.operators.Temporal.cusumDrift(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // executes over 6M events: replication multiplies every hourly count
    // 60x on the SAME hour grid (replica ts offsets are micros), so
    // dev/cusum/peak scale exactly 60x and the change-point HOUR — the
    // estimate itself — is scale-invariant
    val at60 = graft.operators.Temporal.cusumDrift(spark, dir10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val at1 = graft.operators.Temporal.cusumDrift(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(at60.keySet == at1.keySet)
    at1.foreach { case (t, (h1, n1, ph1, pc1, pa1)) =>
      val (h60, n60, ph60, pc60, pa60) = at60(t)
      assert(h60 == h1 && n60 == 60L * n1, s"$t: same grid, 60x the events")
      assert(ph60 == ph1, s"$t: the change-point hour is scale-invariant")
      assert(pc60 == 60L * pc1 && pa60 == 60L * pa1, s"$t: excursions scale exactly")
    }
  }

  test("x123/x124 at 10x: per-cell folds scale exactly; verdicts follow the k law") {
    val pur10 = graft.operators.Curation.langPurity(spark, dir10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getDouble(5)))).toMap
    val pur1 = graft.operators.Curation.langPurity(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(pur10.keySet == pur1.keySet)
    pur1.foreach { case (src, (n1, l1, mj1, sh1, g1)) =>
      val (n10, l10, mj10, sh10, g10) = pur10(src)
      assert(n10 == 10L * n1 && l10 == l1 && mj10 == mj1,
        s"$src: language structure is replication-invariant")
      assert(sh10 == sh1 && g10 == g1,
        s"$src: shares and Gini are scale-free (rounded exact rationals)")
    }
    val k = 25L
    val sup = graft.operators.Curation.rareCellSuppression(spark, dir10, k).collect()
    assert(sup.nonEmpty)
    sup.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) < k), "the verdict IS the k law")
      assert(r.getLong(4) == (if (r.getBoolean(3)) 0L else r.getLong(2)))
    }
  }

  test("x125 containment estimate at 10x: banded candidates + equi-joins; guard survives") {
    val p = plan(graft.operators.Dedup.containmentEstimate(spark, dir10))
    noNestedLoops(p)
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.nonEmpty
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.nonEmpty
    }
    assert(joins.nonEmpty && joins.forall(identity),
      s"candidate generation and array join-back must stay equi-joins:\n$p")
    assert(p.toString.contains("bucket saturated"),
      "the banded-bucket saturation guard must survive the scale-up")
  }

  test("x96 sketch at 10x: the HLL++ production path holds the 4-rsd law at the stress slice") {
    // exact(10x) = 10 * exact(sf0.1) is ALREADY pinned (the x96 10x
    // test: disjoint replica token spaces scale both counts exactly),
    // so the sketch certifies against the derived exact relation
    // without paying the 10x countDistinct twice
    val rsd = 0.05
    val exact1 = graft.operators.TextAnalysis.distinctNgrams(spark, "/root/testdata/sf0.1")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val t0 = System.nanoTime()
    val approx = graft.operators.TextAnalysis.distinctNgramsSketch(spark, dir10, rsd)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    info(f"sketch at 10x executed in ${(System.nanoTime() - t0) / 1e9}%.2f s (local[4])")
    assert(approx.keySet == exact1.keySet)
    exact1.foreach { case (k, (tot1, dist1)) =>
      val (atot, adist) = approx(k)
      assert(atot == 10L * tot1, s"$k: totals stay exact in the sketch spelling")
      assert(math.abs(adist - 10L * dist1).toDouble <= 4 * rsd * math.max(10L * dist1, 1L),
        s"$k: sketch $adist vs exact ${10L * dist1} breaks the 4-rsd law at 10x")
    }
  }

  test("x127 quantile drift at 10x: replica halves are identical distributions — every shift zero") {
    // the 10x id remap (doc_id*10 + rep) moves the snapshot parity onto
    // the REPLICA index: each side becomes 5 full copies of the same
    // per-source length distribution, so the exact order statistics
    // must agree side-for-side and every shift must be exactly 0 — a
    // correctness-at-scale pin the operator can only pass if the rank
    // arithmetic is exact at 25k rows per side
    val rows = graft.operators.Curation.quantileDrift(spark, dir10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)}: equal halves")
      assert(r.getLong(9) == 0L && r.getLong(11) == 0L && r.getLong(13) == 0L,
        s"${r.getString(0)}: identical distributions must show zero shift")
      assert(r.getDouble(10) == 0.0 && r.getDouble(12) == 0.0 && r.getDouble(14) == 0.0)
    }
  }

  test("EXT-6ac vs x127 at 10x: the live sketch and the batch exact quantiles agree per window") {
    // the r10 verdict's twin-agreement ask at stress scale: route the
    // 10x corpus through the STREAMING monitor with x127's own snapshot
    // binding as the window key (even doc_id -> window 0 = old, odd ->
    // window 1 = new), seal both windows, and hold three laws per
    // (side, source) cell at 25k rows/side:
    //  1. counts exact: the sealed cell's n_docs == x127's n_old/n_new;
    //  2. the batch EXACT quantiles re-derive from the raw slice (the
    //     rank spelling `min(n, max(1, ceil(p*n)))`, independently);
    //  3. the sketch value lies in the exact ±eps rank bracket — so
    //     stream and batch quantiles are within 2*eps rank error of
    //     each other BY the shared bracket, the x59/x67 contract at a
    //     size where the KLL/GK buffer actually compacts.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.operators.Tables.documents(spark, dir10)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val base = 1700000400000L - (1700000400000L % 600000L)
    def sideTs(docId: Long) = new java.sql.Timestamp(base + (docId % 2L) * 600000L)
    val stream = MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = StreamOps.lengthQuantileMonitorStream(
        stream.toDF().toDF("ts", "source", "n_chars"))
      .writeStream.format("memory").queryName("quant10_out").outputMode("append").start()
    try {
      docs.grouped(10000).foreach { batch =>
        stream.addData(batch.map { case (id, src, n) => (sideTs(id), src, n) }.toSeq)
        q.processAllAvailable()
      }
      stream.addData(Seq((new java.sql.Timestamp(base + 10 * 600000L), "flush", 1L)))
      q.processAllAvailable()
      stream.addData(Seq((new java.sql.Timestamp(base + 10 * 600000L + 1L), "flush", 1L)))
      q.processAllAvailable()
      val sealedBySide = spark.table("quant10_out").collect()
        .filter(_.getString(1) != "flush")
        .map(r => ((r.getTimestamp(0).getTime - base) / 600000L, r.getString(1)) ->
          ((r.getLong(2), Seq(r.getLong(5), r.getLong(6), r.getLong(7))))).toMap
      val batchRows = graft.operators.Curation.quantileDrift(spark, dir10).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Seq(r.getLong(3), r.getLong(5), r.getLong(7)),   // old p50/p90/p99
            Seq(r.getLong(4), r.getLong(6), r.getLong(8))))).toMap // new
      val bySideSrc = docs.groupBy { case (id, src, _) => (id % 2L, src) }
        .map { case (k, vs) => k -> vs.map(_._3).sorted.toIndexedSeq }
      assert(sealedBySide.keySet == bySideSrc.keySet.map { case (s, src) => (s, src) })
      val eps = 1.0 / 100
      for (((side, src), sorted) <- bySideSrc) {
        val n = sorted.length
        def at(r: Double): Long =
          sorted(math.min(n.toLong, math.max(1L, math.ceil(r * n).toLong)).toInt - 1)
        val (nStream, sketchQs) = sealedBySide((side, src))
        val (nOld, nNew, oldQs, newQs) = batchRows(src)
        val (nBatch, exactQs) = if (side == 0L) (nOld, oldQs) else (nNew, newQs)
        assert(nStream == n && nBatch == n, s"($side, $src): counts must be exact on both faces")
        Seq(0.5, 0.9, 0.99).zip(exactQs).foreach { case (p, v) =>
          assert(v == at(p), s"($side, $src): batch p$p=$v must re-derive from the raw slice")
        }
        Seq(0.5, 0.9, 0.99).zip(sketchQs).foreach { case (p, v) =>
          assert(v >= at(p - eps) && v <= at(p + eps),
            s"($side, $src): sketch p$p=$v outside the exact rank bracket at n=$n")
        }
      }
    } finally q.stop()
  }

  test("x128 source overlap at 10x: digest-bounded pairing — no flip; replica-0 edges survive") {
    val p = plan(graft.operators.Dedup.sourceOverlap(spark, dir10))
    noNestedLoops(p)
    // executes. Replica prefixes reshape chunk BOUNDARIES per replica
    // (hashes differ), so counts don't scale exactly — but replica 0 is
    // the unprefixed original, so every sf0.1 overlap edge exists
    // verbatim inside the 10x corpus: the edge set is a superset, each
    // shared edge's intersection can only grow, and vocabularies stay
    // in the ~10x regime
    val at10 = graft.operators.Dedup.sourceOverlap(spark, dir10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(4)))).toMap
    val at1 = graft.operators.Dedup.sourceOverlap(spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(4)))).toMap
    assert(at1.keySet.subsetOf(at10.keySet), "replica-0 carries every sf0.1 edge into 10x")
    at1.foreach { case (k, (na1, i1)) =>
      val (na10, i10) = at10(k)
      assert(i10 >= i1, s"$k: replica-0's shared chunks are still shared")
      assert(na10 >= 5L * na1 && na10 <= 20L * na1,
        s"$k: per-source chunk vocabulary stays in the ~10x regime ($na1 -> $na10)")
    }
  }

  test("x132 repair at 10x: benchmark broadcast prunes before the doc shuffle; mass conserved") {
    val p = plan(graft.operators.Curation.decontaminationRepair(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    assert(p.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"the benchmark gram membership must broadcast:\n$p")
    // executes at 50k docs: every non-benchmark doc visible, token
    // accounting exact (n_removed + kept tokens == n_tokens; repaired
    // text token count == n_tokens - n_removed), and the replica-0
    // slice must reproduce sf0.1's repairs verbatim (disjoint replica
    // token spaces keep each replica's quote structure intact)
    val at10 = graft.operators.Curation.decontaminationRepair(spark, dir10).collect()
    assert(at10.length == 50000 - 50000 / 20)
    at10.foreach { r =>
      val expected = r.getLong(1) - r.getLong(2)
      if (r.getString(5).isEmpty)
        // "" is a fully-repaired doc (0 survivors) or a single-empty-token doc
        assert(expected <= 1L, s"doc ${r.getLong(0)}: empty repair with $expected survivors")
      else
        assert(r.getString(5).split(" ").length.toLong == expected,
          s"doc ${r.getLong(0)}: repaired text must carry exactly the surviving tokens")
    }
    val rep0 = at10.filter(r => r.getLong(0) % 10 == 0) // replica 0 = original ids x10
      .map(r => r.getLong(0) / 10 -> ((r.getLong(2), r.getLong(3)))).toMap
    val at1 = graft.operators.Curation.decontaminationRepair(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // replica 0 keeps original tokens BUT the 10x benchmark slice is a
    // different id set (id*10 + rep ≡ 0 mod 20), so only the doc set
    // overlap law is asserted: docs clean at sf0.1 with unchanged text
    // can only stay clean or become contaminated via the new slice —
    // sanity: the clean fraction stays overwhelming at both scales
    assert(at1.values.count(_._1 == 0L).toDouble / at1.size > 0.9)
    assert(rep0.values.count(_._1 == 0L).toDouble / rep0.size > 0.9)
  }

  test("x130 chunk novelty at 10x: digest membership stays a hash join; the disjoint-space law holds") {
    val p = plan(graft.operators.Dedup.chunkNovelty(spark, dir10))
    noNestedLoops(p)
    // executes at 50k docs. The 10x id remap (doc_id*10 + rep) moves the
    // snapshot parity onto the REPLICA index, and replica token spaces
    // are disjoint BY CONSTRUCTION — so no odd-replica (new) chunk can
    // exist in the even-replica (corpus) side: every new doc scores
    // known_frac exactly 0. A degenerate corpus for the OPERATOR is the
    // exact fixture law for the SLICE — any nonzero n_known would mean
    // a digest collision across disjoint token spaces, i.e. a chunker
    // or census bug the eval-scale spec cannot see
    val rows = graft.operators.Dedup.chunkNovelty(spark, dir10).collect()
    assert(rows.length == 25000, "every odd-replica doc stays visible")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0,
        s"doc ${r.getLong(0)}: disjoint replica spaces admit no known chunk")
    }
  }

  test("x126 cdc chunks at 10x: row-local chunker — token mass exact, chunk geometry sane") {
    // the chunk relation localCheckpoints at plan build (row-local, one
    // compiled hash pass) — execute directly and pin the mass law
    val at10 = graft.operators.Dedup.cdcChunkDedup(spark, dir10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val at1 = graft.operators.Dedup.cdcChunkDedup(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (src, (_, t1, _)) =>
      val (n10, t10, _) = at10(src)
      // prefixed replica tokens reshape boundaries (hashes differ), so
      // chunk COUNTS drift — but token mass is conserved exactly, and
      // the mean chunk length stays in the divisor's regime
      assert(t10 == 10L * t1, s"$src: token mass is conserved under chunking")
      val mean = t10.toDouble / n10
      assert(mean > 2.0 && mean < 64.0, s"$src: mean chunk length $mean off the ~divisor regime")
    }
  }

  test("x139 deletion blast at 10x: five keyed folds, only the pack window; doc law exact") {
    // the cluster + chunker legs execute at plan build (their 10x cost
    // is the x22 / x126 BASELINE columns); the pin: no cartesian, and
    // the ONLY window in the plan is x39's per-lang pack cumsum — every
    // other leg is a keyed fold
    val p = plan(graft.operators.Curation.deletionBlastRadius(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.length <= 1, s"only the pack cumsum may window:\n$p")
    val rows = graft.operators.Curation.deletionBlastRadius(spark, dir10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // the id remap (orig*10 + rep) intersects the %50 takedown sample
    // at exactly (orig%5 == 0, rep == 0): 1000 of 50000 docs
    assert(rows("doc") == ((1000L, 50000L, 0.02)))
    rows.values.foreach { case (a, t, f) =>
      assert(a >= 0L && a <= t && f >= 0.0 && f <= 1.0)
    }
  }

  test("x136/x138 at 10x: the guarded query side holds on the embedding audits (plan level)") {
    // queryMod = 1000 for the x91/x105 reason: the brute-force leg
    // would execute at 60k x 60 vectors during collect; the guard path
    // and fold shapes are mod-invariant, and the quadratic cost itself
    // is x5's BASELINE column
    val hub = plan(graft.operators.Similarity.hubness(spark, dir10, queryMod = 1000))
    assert(hub.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"the measured query side must broadcast, never cartesian:\n$hub")
    assert(hub.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the census is a count-of-counts fold, never a rank window:\n$hub")
    val nm = plan(graft.operators.Similarity.negativeMargin(spark, dir10, queryMod = 1000))
    assert(nm.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, nm.toString)
    assert(nm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"both conditional maxes fold in ONE partial agg, no window:\n$nm")
    val div = plan(graft.operators.Similarity.topkDiversity(spark, dir10, queryMod = 1000))
    assert(div.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, div.toString)
    assert(div.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the label census is two keyed folds, never a window:\n$div")
  }

  test("x137 windowed burstiness at 10x: one window shuffle; CV² stays finite on 6M events") {
    val p = plan(graft.operators.Temporal.windowedBurstinessAudit(spark, dir10))
    noNestedLoops(p)
    // executes at 6M events: the replica µs offsets manufacture dense
    // same-window gap streams (60 replicas 1 µs apart), which is
    // exactly the stress the NULL-guard and decimal Σg² path must
    // survive — no NaN/Infinity may ever reach the relation
    val rows = graft.operators.Temporal.windowedBurstinessAudit(spark, dir10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(3) >= 0L)
      assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
      if (!r.isNullAt(6))
        assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite,
          s"cv2 must be finite or NULL, got ${r.getDouble(6)}")
      assert(BigInt(r.getString(4)) >= 0, "the digit-string Σg² parses exactly")
    }
  }

  test("x135 periodicity at 10x: grid stays calendar-bounded; correlation is scale-invariant") {
    // events ×60 with identical timestamps-per-window: every hourly
    // count scales EXACTLY 60x, so each moment scales by a fixed power
    // (sums 60x, squares 3600x), the Pearson ratio cancels, and corr4
    // must be BIT-identical to sf0.1's — while num/var scale exactly
    // 3600x. n_terms is the calendar, untouched by volume.
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getLong(1))
    val at10 = graft.operators.Temporal.periodicity(spark, dir10).collect()
      .map(r => key(r) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val at1 = graft.operators.Temporal.periodicity(spark, "/root/testdata/sf0.1").collect()
      .map(r => key(r) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    assert(at10.keySet == at1.keySet && at1.nonEmpty)
    at1.foreach { case (k, (n1, num1, vx1, vy1, c1)) =>
      val (n10, num10, vx10, vy10, c10) = at10(k)
      assert(n10 == n1, s"$k: the grid is the calendar, not the volume")
      assert(num10 == 3600L * num1 && vx10 == 3600L * vx1 && vy10 == 3600L * vy1,
        s"$k: exact moments must scale as 60^2")
      assert(c10 == c1, s"$k: correlation is scale-invariant ($c1 -> $c10)")
    }
  }

  test("x134 pagerank at 10x: rank is component-local — replica 0 reproduces sf0.1 bit-for-bit") {
    // PageRank here has no global normalization: a node's rank depends
    // ONLY on its connected component (constant base + neighbor flow),
    // and replica components are disjoint (no cross-replica simhash
    // pair survives band + Hamming verification, the x129 argument) —
    // so the unprefixed replica 0 must reproduce every sf0.1 (degree,
    // rank_scaled) under the id*10 remap, exactly: any float anywhere
    // in the rank path would break this bit-equality at 5 iterations
    val p = plan(graft.operators.Curation.dupPageRank(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"rank folds are keyed aggs, never windows:\n$p")
    val rep0 = graft.operators.Curation.dupPageRank(spark, dir10).collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1), r.getLong(2)))).toMap
    val at1 = graft.operators.Curation.dupPageRank(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(at1.nonEmpty, "sf0.1 must have a near-dup graph for this law to bite")
    assert(rep0 == at1, "replica-0 ranks must reproduce sf0.1 verbatim under the id*10 remap")
  }

  test("x131 threshold sweep at 10x: one pair pass, |pcts|-bounded sweep; counts scale exactly 10x") {
    // min(pcts) = 80 for the same reason as the x105 queryMod pin: the
    // PPJoin pair pass executes during plan build (localCheckpoint), and
    // its 10x cost is x3's measured column (BASELINE 10x section); the
    // SWEEP structure downstream — explode, two pct-keyed folds, the
    // 1-row totals broadcast — is pcts-invariant, which is what this
    // test pins. The default Seq(60,...) sweep's own 10x time is the
    // x131 BASELINE row, measured in the bench JVM.
    val pcts = Seq(80, 90)
    val p = plan(graft.operators.Dedup.thresholdSweep(spark, dir10, pcts))
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the sweep folds must never become a window over pairs:\n$p")
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    // ONE pair pass: the only parquet scan left in the final plan is the
    // corpus total (1-row count). A per-pct re-verify would re-enter the
    // document pipeline and show up here as extra file scans.
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.length <= 1, s"the sweep must consume the materialized pairs, not re-scan the corpus:\n$p")
    // executes. Replica token prefixes are a per-replica bijection on
    // n-gram space: within-replica Jaccard equals the original corpus's
    // pair for pair, and cross-replica intersections are empty — so the
    // 10x pair relation is exactly 10 disjoint copies, the id remap
    // (doc_id*10 + rep) preserves within-replica order, and every count
    // scales EXACTLY 10x with drop_frac4 bit-identical
    val at10 = graft.operators.Dedup.thresholdSweep(spark, dir10, pcts).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val at1 = graft.operators.Dedup.thresholdSweep(spark, "/root/testdata/sf0.1", pcts).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(at10.keySet == pcts.toSet && at1.keySet == pcts.toSet)
    pcts.foreach { pct =>
      val (p10, d10, k10, f10) = at10(pct)
      val (p1, d1, k1, f1) = at1(pct)
      assert(p10 == 10L * p1, s"pct $pct: pair count must scale exactly ($p1 -> $p10)")
      assert(d10 == 10L * d1, s"pct $pct: docs-paired must scale exactly ($d1 -> $d10)")
      assert(k10 == 10L * k1, s"pct $pct: dropped count must scale exactly ($k1 -> $k10)")
      assert(f10 == f1, s"pct $pct: drop fraction is scale-invariant ($f1 -> $f10)")
    }
  }

  test("x129 cluster purity at 10x: fold reads materialized labels only; replica-0 reproduces sf0.1") {
    // dedupClusters' contraction loop executes at plan build (the x22
    // pin's argument — its 10x cost is BASELINE's x22 column); what this
    // test pins is the PURITY composition: the fold + majority sub-fold
    // must consume the ONE checkpointed (doc_id, cluster, source, lang)
    // relation — zero parquet re-scans, no window over the membership
    // stream, no cartesian
    val p = plan(graft.operators.Curation.clusterPurity(spark, dir10))
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"majority pick must stay a partial-agg max(struct), never a window:\n$p")
    noNestedLoops(p)
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"the purity fold must consume the checkpointed labels, not re-scan the corpus:\n$p")
    // executes. Replica token spaces are disjoint (no cross-replica
    // simhash pair survives band + Hamming verification), replica 0 is
    // the unprefixed original, and star contraction labels components by
    // their MIN id — so every sf0.1 cluster c reappears at 10x as
    // cluster 10c with identical membership stats: (source, lang) are
    // replica-invariant columns, hence n_members / n_sources / n_langs /
    // majority_source / majority_share4 / both flags reproduce verbatim
    val rep0 = graft.operators.Curation.clusterPurity(spark, dir10).collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    val at1 = graft.operators.Curation.clusterPurity(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(at1.nonEmpty, "sf0.1 must have near-dup clusters for this law to bite")
    assert(rep0 == at1, "replica-0 purity rows must reproduce sf0.1 verbatim under the id*10 remap")
  }

  test("x141 cluster stability at 10x: cells-bounded fold off the checkpoint; containment law holds") {
    // both contractions execute at plan build (x22's BASELINE column,
    // paid twice — the self-contained-query note); the pin: the
    // contingency fold consumes the ONE checkpointed cells relation
    // (zero parquet re-scans), never windows, and the only join nodes
    // are the two deliberate 1-row-broadcast marginal attachments
    val p = plan(graft.operators.Curation.clusterStability(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian anywhere:\n$p")
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 2, s"only the two 1-row marginal broadcasts may nest:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"pair counting is pure partial aggs, never a window:\n$p")
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"the fold must consume the checkpointed cells, not re-scan the corpus:\n$p")
    // executes: the containment law survives the id remap — per-doc
    // simhash is corpus-independent, so evens-only edges are a subset
    // of full-corpus edges restricted to evens: split_by_new ≡ 0, the
    // universe is every even doc (rep parity decides: 25000 of 50000),
    // and the Rand cells tile all_pairs exactly
    val r = graft.operators.Curation.clusterStability(spark, dir10).collect().head
    assert(r.getLong(0) == 25000L && r.getLong(3) == 0L)
    assert(r.getLong(2) + r.getLong(4) + r.getLong(5) + r.getLong(3) == r.getLong(1),
      "the four cells must partition all_pairs")
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
  }

  test("x142 detector agreement at 10x: two banded legs, one keyed full-outer, 1-row fold") {
    // both pair generations are the pinned banded builders (their 10x
    // cost is the x2/x16 BASELINE columns); the pin: the set algebra
    // adds ONE (d1,d2)-keyed equi-join and a single fold — no cartesian,
    // no window, no re-sort of either pair stream
    val p = plan(graft.operators.Dedup.detectorAgreement(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"set algebra is count FILTERs, never a window:\n$p")
    // executes: identities + the replica law. Disjoint replica token
    // spaces mean every pair is intra-replica on BOTH detectors, and
    // replica 0 is the unprefixed original — so each count is >= its
    // sf0.1 value and the identities hold exactly
    val r = graft.operators.Dedup.detectorAgreement(spark, dir10).collect().head
    val r1 = graft.operators.Dedup.detectorAgreement(spark, "/root/testdata/sf0.1").collect().head
    assert(r.getLong(5) == r.getLong(2) + r.getLong(3) + r.getLong(4))
    assert(r.getLong(0) == r.getLong(2) + r.getLong(3) && r.getLong(1) == r.getLong(2) + r.getLong(4))
    assert(r.getLong(0) >= r1.getLong(0) && r.getLong(1) >= r1.getLong(1),
      "replica 0 alone reproduces the sf0.1 pair sets under the id remap")
  }

  test("x143 band sweep at 10x: one signature pass feeds every banding; nesting law survives") {
    // the signature checkpoint + PPJoin truth execute at plan build
    // (x2/x3's BASELINE columns); the pin: no cartesian beyond the
    // 1-row truth broadcast, no window, and the nesting monotonicity —
    // the law that makes the sweep trustworthy as a tuning table —
    // holds at 10x, where a banding saturation would break it loudly
    val p = plan(graft.operators.Dedup.bandSweep(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n$p")
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 1, s"only the 1-row truth broadcast may nest:\n$p")
    // the ONLY windows are the truth leg's PPJoin prefix ranks — always
    // doc_id-partitioned (x3's pinned discipline), never a global sort;
    // the sweep itself adds none
    p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"a global (unpartitioned) window appeared in the sweep:\n$p"))
    val rows = graft.operators.Dedup.bandSweep(spark, dir10).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 4, 8))
    val cands = rows.map(_.getLong(1)).toSeq
    val vers = rows.map(_.getLong(2)).toSeq
    assert(cands == cands.sorted && vers == vers.sorted,
      "nested band boundaries keep candidates monotone at 10x")
    val true1 = graft.operators.Dedup.ngramJaccard(spark, "/root/testdata/sf0.1").count()
    assert(rows.head.getLong(3) == 10L * true1,
      "disjoint replica spaces scale the exact pair truth exactly 10x")
  }

  test("x144 cell drift at 10x: centroid-literal assignment, k-bounded fold, totals broadcast") {
    // training is the bounded driver loop (centroids are k x dim plan
    // literals); the pin: the census is ONE cell-keyed partial agg over
    // the checkpointed embedding relation — no join except the 1-row
    // totals broadcast, no window, never a per-vector shuffle by cell
    val p = plan(graft.operators.Similarity.cellDrift(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n$p")
    assert(p.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
    }.length <= 1, s"only the 1-row totals broadcast may nest:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the census is a partial agg, never a window:\n$p")
    // executes: the census partitions all 60k vectors at 30x the
    // eval vector count, shares sum to ~1 on both sides
    val rows = graft.operators.Similarity.cellDrift(spark, dir10).collect()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == 60000L)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) <= 8 * 5e-5)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) <= 8 * 5e-5)
  }

  test("x145 triangle census at 10x: oriented wedge join only; replica-0 reproduces sf0.1") {
    // the pin: every join is an equi-join (orientation lookups, the
    // src-keyed wedge join, the (b,c) closure probe) — no cartesian, no
    // window, and the wedge join runs on the ORIENTED relation whose
    // out-degree is O(sqrt(m)) by construction
    val p = plan(graft.operators.Curation.dupTriangles(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"triangle counting is joins + folds, never a window:\n$p")
    // executes: triangles are component-local and per-doc simhash is
    // corpus-independent, so replica 0 reproduces sf0.1's census
    // verbatim under the id*10 remap — degree, triangle count, cc4
    val rep0 = graft.operators.Curation.dupTriangles(spark, dir10).collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    val at1 = graft.operators.Curation.dupTriangles(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._2 > 0L),
      "sf0.1 must have triangles for this law to bite")
    assert(rep0.size == at1.size &&
      rep0.forall { case (k, (d, t, c)) =>
        val (d1, t1, c1) = at1(k); d == d1 && t == t1 && (c == c1 || (c.isNaN && c1.isNaN)) },
      "replica-0 triangle rows must reproduce sf0.1 verbatim under the id remap")
  }

  test("x146 edge support at 10x: per-edge fold off the shared triangle core; replica-0 verbatim") {
    val p = plan(graft.operators.Curation.dupEdgeSupport(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"support is a canonical-edge fold, never a window:\n$p")
    // executes: same component-local argument as x145, per EDGE
    val rep0 = graft.operators.Curation.dupEdgeSupport(spark, dir10).collect()
      .filter(r => r.getLong(0) % 10L == 0L && r.getLong(1) % 10L == 0L)
      .map(r => (r.getLong(0) / 10L, r.getLong(1) / 10L) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val at1 = graft.operators.Curation.dupEdgeSupport(spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._1 > 0L))
    assert(rep0 == at1, "replica-0 edge rows must reproduce sf0.1 verbatim under the id remap")
  }

  test("x154 k-truss at 10x: peel rounds hold the oriented bound; replica-0 verbatim") {
    // the loop executes at build time (localCheckpoint rounds), so the
    // pin is the RESULT plan (final report join of materialized
    // relations) plus the law: the k-truss of a disjoint union is the
    // union of k-trusses, so replica 0 must reproduce sf0.1's verdicts
    // verbatim under the id remap — any cross-replica wedge would break it
    val df = graft.operators.Curation.dupTruss(spark, dir10)
    noNestedLoops(plan(df))
    val rep0 = df.collect()
      .filter(r => r.getLong(0) % 10L == 0L && r.getLong(1) % 10L == 0L)
      .map(r => (r.getLong(0) / 10L, r.getLong(1) / 10L) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val at1 = graft.operators.Curation.dupTruss(spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._2), "sf0.1 must carry a truss core")
    assert(at1.values.exists(!_._2), "and at least one peeled edge, or the test is vacuous")
    assert(rep0 == at1, "replica-0 truss verdicts must reproduce sf0.1 verbatim under the id remap")
  }

  test("x155 incremental clusters at 10x: the merge law holds against the one-shot batch answer") {
    // the pin IS the law: star(tight) ∪ delta re-contracted must equal
    // x22's one-shot clustering at 50k docs — any scale-dependent
    // divergence (a dropped delta pair, a star edge miscast) breaks it
    val got = graft.operators.Curation.incrementalClusters(spark, dir10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val full = graft.operators.Curation.dedupClusters(spark, dir10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.toSeq == full.toSeq)
  }

  test("x156 k-core at 10x: degree-fold peel only (no wedge join); replica-0 verbatim") {
    val df = graft.operators.Curation.dupKCore(spark, dir10)
    noNestedLoops(plan(df))
    val rep0 = df.collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val at1 = graft.operators.Curation.dupKCore(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(at1.nonEmpty, "sf0.1 must carry near-dup nodes")
    assert(rep0 == at1, "replica-0 core verdicts must reproduce sf0.1 verbatim under the id remap")
  }

  test("x157 canonical distance at 10x: frontier rounds settle; replica-0 verbatim") {
    val df = graft.operators.Curation.canonicalDistance(spark, dir10)
    noNestedLoops(plan(df))
    val rep0 = df.collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1) / 10L, r.getLong(2)))).toMap
    val at1 = graft.operators.Curation.canonicalDistance(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._2 >= 2L),
      "sf0.1 must carry a chain-stitched member or the depth audit is vacuous")
    assert(rep0 == at1, "replica-0 hop distances must reproduce sf0.1 verbatim under the id remap")
  }

  test("x158 MMR at 10x: one corpus pass then bounded rounds; structure laws hold") {
    // plan: the only corpus-sized cost is the brute relevance pass (the
    // x5 shape); every greedy round is equi-joins over m-bounded
    // relations — no cartesian, no window anywhere (TopK agg + struct-max)
    val df = graft.operators.Similarity.mmrRerank(spark, dir10)
    val p = plan(df)
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian at 60k vectors:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"top-m is the bounded TopK fold, never a corpus window:\n$p")
    // executes at 60k vectors / 1200 queries; the greedy structure laws
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, picks) =>
      assert(picks.map(_._2).sorted.toSeq == (1 to 4), s"query $q ranks")
      assert(picks.map(_._3).distinct.length == 4, s"query $q picks distinct neighbors")
      val first = picks.find(_._2 == 1).get
      assert(picks.forall(_._4 <= first._4), s"query $q: rank 1 is the relevance argmax")
      // (no score-monotonicity assertion: with signed cosines the
      // diversity term can RAISE a later pick's score — a far-from-
      // everything candidate earns a negative-msim bonus, legitimately)
    }
  }

  test("x159 trust rank at 10x: the x134 step shape; replica-0 verbatim") {
    val df = graft.operators.Curation.trustRank(spark, dir10)
    noNestedLoops(plan(df))
    val rep0 = df.collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    val at1 = graft.operators.Curation.trustRank(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._3 > 0L) && at1.values.exists(_._3 == 0L),
      "sf0.1 must carry both trusted and trustless regions or the audit is vacuous")
    assert(rep0 == at1, "replica-0 trust ranks must reproduce sf0.1 verbatim under the id remap")
  }

  test("x160 cluster split at 10x: one pair pass; cluster rows leak zero") {
    // the pin: pairs are paid once (checkpointed) then contracted and
    // probed — equi-joins throughout, the report is 6 rows
    val df = graft.operators.Curation.clusterSplit(spark, dir10)
    noNestedLoops(plan(df))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.size == 6, "both policies cover all three splits at 10x")
    rows.filter(_._1._1 == "cluster").foreach { case ((_, s), (_, _, leaks)) =>
      assert(leaks == 0L, s"cluster policy leaks in split $s at 10x")
    }
    Seq("doc", "cluster").foreach { p =>
      assert(rows.filter(_._1._1 == p).values.map(_._1).sum == 50000L, s"$p covers the corpus")
    }
    assert(rows.filter(_._1._1 == "doc").values.map(_._3).sum > 0L,
      "the 10x corpus must exercise the doc-policy leak path")
  }

  test("x161 source communities at 10x: fixed vote rounds; replica-0 verbatim") {
    val df = graft.operators.Curation.sourceCommunities(spark, dir10)
    noNestedLoops(plan(df))
    val rep0 = df.collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    val at1 = graft.operators.Curation.sourceCommunities(spark, "/root/testdata/sf0.1")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(at1.nonEmpty && at1.values.exists(_._3),
      "sf0.1 must carry at least one community flip or the audit is vacuous")
    assert(rep0 == at1, "replica-0 communities must reproduce sf0.1 verbatim under the id remap")
  }

  test("x162 semantic clusters at 10x: replica projection law — roots, labels, fracs") {
    // block id remap (vec_id + rep·|base|) copies the base pair graph
    // into each replica verbatim; cross-replica edges only link replica
    // copies of the SAME base component (a cross pair (i, j+r·n) needs
    // the same bucket + cosine that the base pair (i, j) needs), so the
    // 10x components project exactly onto the sf0.1 components with
    // replica-0 holding the smallest ids: every cluster root is a base
    // root, members arrive in whole replica copies (multiples of the
    // base size), and the label census is replica-invariant
    val df = graft.operators.Curation.semanticClusters(spark, dir10)
    noNestedLoops(plan(df))
    val at10 = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4))))
      .toMap
    val at1 = graft.operators.Curation.semanticClusters(spark, "/root/testdata/sf0.1")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4))))
      .toMap
    assert(at1.nonEmpty)
    assert(at1.keySet.subsetOf(at10.keySet), "every base root survives as a 10x root")
    at1.foreach { case (root, (n1, nl1, maj1, frac1)) =>
      val (n10, nl10, maj10, frac10) = at10(root)
      assert(n10 >= n1 && n10 % n1 == 0L && n10 <= 30L * n1,
        s"cluster $root members arrive in whole replica copies: $n10 vs base $n1")
      assert(nl10 == nl1 && maj10 == maj1 && frac10 == frac1,
        s"cluster $root label census must be replica-invariant")
    }
    // roots NEW at 10x are base SINGLETONS whose identical replica
    // copies self-pair (dot(v, v) = |v|² ≥ τ): a full 30-clique of one
    // vector — 30 members, one label, purity 1. Two distinct base
    // singletons cannot merge (their cross pair would have been a base
    // pair). This is the slice's designed self-similarity, and a useful
    // canary: semantic dedup MUST catch exact replicas.
    val newRoots = at10.keySet -- at1.keySet
    assert(newRoots.nonEmpty, "the slice must surface replica self-cliques")
    newRoots.foreach { root =>
      val (n10, nl10, _, frac10) = at10(root)
      assert(n10 == 30L && nl10 == 1L && frac10 == 1.0,
        s"new root $root must be one base singleton's 30-replica clique, got ($n10, $nl10, $frac10)")
    }
  }

  test("x163 curation funnel at 10x: raw mass exact; stages only shed") {
    // the pin: one corpus scan into a 1-row fold — no window, no
    // cartesian; raw doc/token mass is exact under the id remap (the
    // replica prefix changes token LENGTHS, so later gate stages are
    // legitimately replica-dependent — only ordering laws bind there)
    val df = graft.operators.Curation.curationFunnel(spark, dir10)
    noNestedLoops(plan(df))
    assert(plan(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "the funnel fold carries no window")
    val rows10 = df.collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    val rows1 = graft.operators.Curation.curationFunnel(spark, "/root/testdata/sf0.1")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(rows10.head._2 == 50000L && rows10.head._2 == 10L * rows1.head._2)
    assert(rows10.head._3 == 10L * rows1.head._3, "raw token mass is exactly x10")
    rows10.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"stage ${b._1} must not grow at 10x")
    }
    assert(rows10.last._2 > 0L, "the 10x train stage must be non-empty")
  }

  test("x164 mixture temperature at 10x: census x10 exact; weights bit-invariant") {
    // the replica prefix changes token LENGTHS, never counts, and the
    // source column replicates — so the census scales exactly x10 and
    // share = (10·nt)/(10·tot) rounds to the IDENTICAL double (same
    // real quotient), making every float column bit-equal to sf0.1
    val df = graft.operators.Curation.mixtureTemperature(spark, dir10)
    // the deliberate 1-row totals crossJoin is a BroadcastNestedLoop by
    // construction (x147's convention) — pin only the partitioned form
    assert(plan(df).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n${plan(df)}")
    val at10 = df.collect().map(r => (r.getInt(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val at1 = graft.operators.Curation.mixtureTemperature(spark, "/root/testdata/sf0.1")
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (k, (nd, nt, sh, w, b)) =>
      assert(at10(k) == ((10L * nd, 10L * nt, sh, w, b)),
        s"$k: 10x row must be the base row with the census x10")
    }
  }

  test("x165 source pair matrix at 10x: replica-0 cells survive as lower bounds") {
    // the pin: no partitioned cartesian (the totals crossJoin is the
    // 1-row broadcast convention); replica token spaces are disjoint so
    // the 10x cells aggregate per-replica evidence — replica 0
    // contributes exactly the sf0.1 cells, making them lower bounds
    val df = graft.operators.Curation.sourcePairMatrix(spark, dir10)
    assert(plan(df).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n${plan(df)}")
    val at10 = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val at1 = graft.operators.Curation.sourcePairMatrix(spark, "/root/testdata/sf0.1")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(at1.nonEmpty && at1.keySet.subsetOf(at10.keySet))
    at1.foreach { case (k, n1) =>
      assert(at10(k) >= n1, s"cell $k lost replica-0 evidence at 10x")
    }
  }

  test("x166 threshold sweep at 10x: exact replica-combinatorics law per tau") {
    // block remap ⇒ every base pair (i, j) yields 30·30 = 900 distinct
    // unordered replica pairs with the IDENTICAL sim, and each base
    // vector v with |v|² ≥ τ yields C(30,2) = 435 self pairs — so
    // n10(τ) = 900·n1(τ) + 435·|{v : |v|² ≥ τ}| EXACTLY (same-label
    // mass follows the same algebra: self pairs share labels)
    val df = graft.operators.Curation.semanticThresholdSweep(spark, dir10)
    assert(plan(df).collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n${plan(df)}")
    val at10 = df.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val at1 = graft.operators.Curation
      .semanticThresholdSweep(spark, "/root/testdata/sf0.1")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val norms = graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .collect().map { r =>
        val e = r.getSeq[Float](1); e.map(x => x.toDouble * x.toDouble).sum
      }
    Seq(40, 50, 60, 70).foreach { t =>
      val selfable = norms.count(_ >= t / 100.0).toLong
      assert(at10(t)._1 == 900L * at1(t)._1 + 435L * selfable, s"tau $t pair law")
      assert(at10(t)._2 == 900L * at1(t)._2 + 435L * selfable, s"tau $t same-label law")
    }
    assert(at1(40)._1 > 0L, "the base corpus must carry pairs at the loosest threshold")
  }

  test("x147 dedup savings at 10x: three keyed folds; doc layer and denominator exact") {
    // the pin: the summary assembly is 1-row broadcasts only (no
    // partitioned cartesian, no window beyond the chunker's row-local
    // machinery — cdc chunking windows per doc_id, never globally)
    val p = plan(graft.operators.Curation.dedupSavings(spark, dir10))
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"no partitioned cartesian:\n$p")
    p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"an unpartitioned window appeared in the savings plan:\n$p"))
    // executes. The doc layer is exactly replica-invariant (the prefix
    // map is injective per replica: texts are identical iff their
    // originals were), so it scales exactly 10x with a bit-identical
    // fraction. Chunk and cluster layers re-roll their HASHES under the
    // prefixed tokens (boundaries and simhash pairs move slightly), so
    // they get the band law: counts within 5% of 10x, fractions within
    // 0.01 — plus the exact dominance laws at 10x.
    val at10 = graft.operators.Curation.dedupSavings(spark, dir10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val at1 = graft.operators.Curation.dedupSavings(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(at10.keySet == at1.keySet)
    val (du, dd, dt, dtd, df) = at1("doc")
    assert(at10("doc") == ((10L * du, 10L * dd, 10L * dt, 10L * dtd, df)),
      "the doc layer must scale exactly 10x with an identical fraction")
    // chunk boundaries re-roll under the prefixed tokens but stay
    // distributionally stable (expected chunk length is content-free):
    // tight band. Cluster structure does NOT extrapolate — 12-bit
    // simhash bands pick up MORE collisions as the corpus grows (the
    // x22 saturation note), which is exactly why this table is a
    // measurement, not a formula: pin the denominator and sanity only.
    val (cu1, _, ct1, ctd1, cf1) = at1("chunk")
    val (cu10, _, ct10, ctd10, cf10) = at10("chunk")
    assert(ct10 == 10L * ct1, "chunk: the token denominator is exact")
    assert(math.abs(cu10 - 10L * cu1) <= cu1 / 2 && math.abs(ctd10 - 10L * ctd1) <= ctd1 / 2 + 5L,
      s"chunk: units/tokens within the re-hash band of 10x ($cu10 vs ${10 * cu1}, $ctd10 vs ${10 * ctd1})")
    assert(math.abs(cf10 - cf1) <= 0.01, s"chunk: fraction $cf10 vs $cf1")
    val (_, cld1, clt1, cltd1, _) = at1("cluster")
    val (_, cld10, clt10, cltd10, clf10) = at10("cluster")
    assert(clt10 == 10L * clt1, "cluster: the token denominator is exact")
    assert(cld10 >= cld1 && cltd10 >= cltd1,
      "cluster: the grown corpus cannot reclaim less than the base slice")
    assert(clf10 >= 0.0 && clf10 <= 1.0)
    assert(at10("doc")._4 <= at10("chunk")._4 && at10("doc")._4 <= at10("cluster")._4,
      "dominance laws hold at 10x exactly")
  }

  test("x148 peak concurrency at 60x events: the only global window orders the days relation") {
    // the pin IS the scan decomposition: the delta stream sorts only
    // inside (day, hour) partitions; the one unpartitioned window (the
    // cross-day carry) must sit above at least two aggregations — it
    // orders |days| rows, never the event stream (x119's contraction
    // discipline). A naive spelling would be one global ORDER BY over
    // 12M boundary rows.
    val p = plan(graft.operators.Temporal.peakConcurrency(spark, dir10))
    val globals = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.length == 1, s"exactly one global window (the day carry):\n$p")
    globals.foreach { w =>
      assert(w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.length >= 2,
        s"the global window must order aggregated DAY rows, not the delta stream:\n$p")
    }
    noNestedLoops(p)
    // executes at 6M events: conservation + chain laws
    val rows = graft.operators.Temporal.peakConcurrency(spark, dir10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.head._4 == 0L && rows.last._5 == 0L,
      "nothing is open before the first day or after the last")
    assert(rows.map(_._2).sum == rows.map(_._3).sum, "every session that starts also ends")
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 == b._4, "each day opens with the previous day's standing count")
      case _ =>
    }
    rows.foreach { case (_, ns, _, openS, openE, peak) =>
      assert(peak >= openE && peak <= openS + ns)
    }
  }

  test("x149 token gini at 10x: the window orders frequency classes; exact x100 numerator law") {
    // the pin: every window is lang-partitioned AND fed by >= 2
    // aggregations (the count-of-counts contraction — it orders
    // frequency CLASSES, never the vocabulary or the token stream)
    val p = plan(graft.operators.TextAnalysis.tokenGini(spark, dir10))
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"gini must never sort globally:\n$p")
      assert(w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }.length >= 2, s"the window must order count CLASSES, not tokens:\n$p")
    }
    noNestedLoops(p)
    // executes: disjoint replica token spaces scale every class
    // (c, m) -> (c, 10m), under which s and n scale by 10 — so the
    // numerator scales EXACTLY x100, types/tokens x10, and gini4 is
    // bit-identical. Any error in the closed-form class contribution
    // would break the x100 law loudly.
    val at10 = graft.operators.TextAnalysis.tokenGini(spark, dir10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val at1 = graft.operators.TextAnalysis.tokenGini(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (lang, (n, tot, num, g)) =>
      assert(at10(lang) == ((10L * n, 10L * tot, 100L * num, g)),
        s"$lang: class scaling must carry the numerator exactly x100 with gini4 invariant")
    }
  }

  test("x150 quality AUC at 10x: one global window over bucket rows; universe conserved") {
    // the pin: the x148 scan discipline on a VALUE axis — the only
    // unpartitioned window prefixes per-bucket negative counts (<= B
    // aggregated rows off the checkpointed class relation, never the
    // document stream); the in-bucket rank window stays partitioned
    val p = plan(graft.operators.Curation.qualityAuc(spark, dir10))
    val globals = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.length == 1, s"exactly one global window (the bucket prefix):\n$p")
    globals.foreach(w => assert(w.child.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty, s"the global window must order aggregated BUCKET rows:\n$p"))
    assert(p.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"both scan levels must consume the checkpointed classes, not parquet:\n$p")
    noNestedLoops(p)
    // executes at 50k docs: every doc is labeled exactly once and the
    // rank-sum stays inside its algebraic range
    val r = graft.operators.Curation.qualityAuc(spark, dir10).collect().head
    assert(r.getLong(0) + r.getLong(1) == 50000L, "pos + neg must partition the corpus")
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 2L * r.getLong(0) * r.getLong(1))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("x151 media dedup at 10x: digest fold only; partition + byte-mass bound laws") {
    // the pin: x1's shape on binary digests — two partial aggs, no
    // window, no cartesian; payload bytes never join or shuffle (the
    // sha256 runs in the mapPartitions loop, only digests move)
    val p = plan(graft.operators.Multimodal.mediaDedupCensus(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the census is a keyed fold, never a window:\n$p")
    // executes: the id remap (orig*10 + rep) RESHUFFLES doc_id % 3
    // typing across replicas and the replica token PREFIXES add bytes,
    // so neither per-type rows nor byte mass scale exactly — the pinned
    // laws are the partition (every doc typed once), the lower bound
    // (prefixes only ADD bytes over 10x the original mass), and the
    // per-row census identity
    val at10 = graft.operators.Multimodal.mediaDedupCensus(spark, dir10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val at1 = graft.operators.Multimodal.mediaDedupCensus(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(4))
    assert(at10.map(_._1).sum == 50000L, "types partition all docs")
    assert(at10.map(_._4).sum >= 10L * at1.sum, "replica prefixes only add bytes")
    at10.foreach { case (files, distinct, dups, _) => assert(files - dups == distinct) }
  }

  test("x152 rep divergence at 10x: argmax stays a partial-agg struct-max off the checkpoint") {
    // the contraction executes at plan build (x22's column); the pin:
    // the policy comparison adds only the windowless struct-max + two
    // narrow doc_id equi-joins against the checkpointed quality relation
    val p = plan(graft.operators.Curation.repPolicyDivergence(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the pick must fold map-side, never rank the membership stream:\n$p")
    // executes: the q_gap law is structural and the id remap preserves
    // within-replica order, so replica 0 reproduces sf0.1's divergence
    // rows verbatim (quality and token counts are content functions of
    // the UNPREFIXED replica-0 texts)
    val rep0 = graft.operators.Curation.repPolicyDivergence(spark, dir10).collect()
      .filter(_.getLong(0) % 10L == 0L)
      .map(r => r.getLong(0) / 10L -> ((r.getLong(1), r.getLong(2) / 10L, r.getBoolean(3),
        r.getDouble(4), r.getLong(5)))).toMap
    val at1 = graft.operators.Curation.repPolicyDivergence(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(at1.nonEmpty)
    assert(rep0 == at1, "replica-0 divergence rows must reproduce sf0.1 under the id remap")
  }

  test("x153 json envelope at 60x events: pure row-local codegen before the presentation sort") {
    val p = plan(graft.operators.Payload.jsonEnvelope(spark, dir10))
    noNestedLoops(p)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"serialization is a narrow projection — no join, no window:\n$p")
    // executes at 6M events: the roundtrip is lossless for every row
    val bad = graft.operators.Payload.jsonEnvelope(spark, dir10)
      .filter(col("id_rt") =!= col("event_id") || col("type_rt").isNull)
      .count()
    assert(bad == 0L, "roundtrip must be exact across all 6M envelopes")
  }
}

/** One-time 10× slice generator (marker-gated; safe across suites and
  * reruns — /tmp persists within a session, and regeneration is cheap).
  */
object ScaleStress {
  val root = "/tmp/graft-scale10"

  def ensure(spark: SparkSession): String = synchronized {
    // versioned marker: adding a table to the slice must regenerate it
    // on machines that carry an older generation in /tmp
    val marker = new java.io.File(root, "_READY_V4")
    if (!marker.exists()) {
      // events ×60 (6M rows): go through Replication.events, which
      // normalizes the fixture's physical ts type (ns-as-long through
      // r8, µs TIMESTAMP_NTZ from r9) to a session-TZ TIMESTAMP; each
      // replica is offset by `rep` microseconds so timestamps stay
      // near-distinct without changing any window bucketing
      val ev = graft.operators.Replication.events(spark, "/root/testdata/sf0.1")
      ev.crossJoin(spark.range(60).select(col("id").as("rep")))
        .withColumn("event_id", col("event_id") * 60 + col("rep"))
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + col("rep")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$root/events.parquet")
      // documents ×10 (50k docs): replica-PREFIXED tokens keep replica
      // shingle spaces disjoint — statistics replicate, they don't collapse
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      docs.crossJoin(spark.range(10).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") * 10 + col("rep"))
        .withColumn("text",
          when(col("rep") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), " "),
                t => concat(lit("r"), col("rep"), t)), " ")))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$root/documents.parquet")
      // embeddings ×30 (60k vectors): BLOCK id remap (id + rep·|base|)
      // keeps vec_id 0..k-1 the ORIGINAL distinct base vectors — an
      // interleaved remap would make every centroid seed a replica of
      // base vector 0 and collapse the whole corpus into one cell
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val nBase = emb.count()
      emb.crossJoin(spark.range(30).select(col("id").as("rep")))
        .withColumn("vec_id", col("vec_id") + col("rep") * nBase)
        .select("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
      marker.createNewFile()
      ()
    }
    root
  }
}
