package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines (SURVEY.md
  * §2b): benchmark decontamination, Gopher-style quality rules, repetition
  * measurement, deterministic train/val/test splitting, duplicate-cluster
  * resolution, and dataset-card aggregates.
  *
  * Same oracle ground rules as the rest of §2b: every hash is md5 over an
  * explicit seeded string, every float is a single IEEE division, every
  * tie-break is an explicit deterministic key — so DuckDB reproduces each
  * result bit-for-bit.
  *
  * Scale design (the 100 TB story):
  *  - decontamination joins the corpus n-gram stream against a benchmark
  *    gram set that is tiny by construction (benchmarks are MBs, corpora
  *    are TBs) — a broadcast join; the corpus side is one narrow pass;
  *  - the quality / repetition / split operators are pure row-local
  *    projections (zero shuffles, whole-stage codegen end to end);
  *  - cluster resolution is iterative min-label propagation with a
  *    monotone convergence metric — O(component diameter) rounds, each a
  *    self-free join keyed by doc id (production would swap in
  *    large-star/small-star for O(log n) rounds; the operator contract —
  *    pairs in, (doc, canonical) out — is the same);
  *  - corpus stats is one partial-agg-friendly groupBy over low-cardinality
  *    keys.
  */
object Curation {

  /** EXT-C1 — benchmark decontamination: flag training documents sharing
    * any k-token n-gram (default k=5) with a held-out benchmark set —
    * the standard train/test-overlap scrub (e.g. the 13-gram checks used
    * for GPT-3/PaLM eval decontamination, shrunk to k=5 for the harness
    * corpus' 10–99-token documents).
    *
    * The benchmark here is the deterministic subset `doc_id % 20 == 0`
    * (stand-in for an external eval set). Its distinct gram set is
    * DISTINCT-aggregated and broadcast; the corpus side is one narrow
    * scan + explode, so the expensive relation never shuffles. Returns
    * (doc_id, n_shared) per contaminated non-benchmark document.
    */
  def decontaminate(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val (corpus, benchGrams) = contaminationRelations(spark, dir, k)
    corpus
      .join(broadcast(benchGrams), "gram")
      .groupBy("doc_id")
      // grams are distinct per doc (Shingles dedups), so plain count is
      // the distinct shared-gram count — no count(distinct) shuffle pair
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** THE decontamination inputs — (corpus gram stream, distinct benchmark
    * gram set) — shared by [[decontaminate]] and [[contaminationScore]]:
    * the gram derivation and the benchmark-membership rule (`doc_id % 20
    * == 0`, the stand-in for an external eval set) must never drift
    * between the detector and the scorer. The underlying gram stream is
    * materialized once: both returned relations (and both of the
    * scorer's aggregations) derive from it, and Spark shares no common
    * subtree across plan branches.
    */
  private def contaminationRelations(
      spark: SparkSession, dir: String, k: Int): (DataFrame, DataFrame) = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Tables.shingles(col("toks"), k)).as("gram"))
      .localCheckpoint()
    (grams.filter(col("doc_id") % 20 =!= 0),
      grams.filter(col("doc_id") % 20 === 0).select("gram").distinct())
  }

  /** EXT-C19 — contamination SCORING: the measurement refinement of
    * [[decontaminate]] — for every non-benchmark document with at least
    * one k-gram, its distinct-gram count, how many of those grams appear
    * in the benchmark set, the shared fraction (one IEEE division), and
    * the `drop` verdict at `threshold`. Where [[decontaminate]] answers
    * "which docs overlap at all", this grades HOW MUCH — the knob a real
    * pipeline tunes (an eval-set quote of 1 gram is noise; 40% is a
    * leak). Same plan shape: one materialized gram stream, broadcast
    * benchmark set, zero-overlap docs come back via the left join.
    */
  def contaminationScore(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      threshold: Double = 0.1): DataFrame = {
    val (corpus, benchGrams) = contaminationRelations(spark, dir, k)
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val shared = corpus.join(broadcast(benchGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    sizes
      .join(shared, Seq("doc_id"), "left_outer")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("shared_frac", col("n_shared").cast("double") / col("n_grams"))
      .withColumn("drop", col("shared_frac") >= threshold)
      .select("doc_id", "n_grams", "n_shared", "shared_frac", "drop")
      .orderBy("doc_id")
  }

  /** EXT-C39 (x108) — contamination SPAN detection: per contaminated
    * document, the longest CONSECUTIVE run of benchmark-shared k-gram
    * positions — the PaLM-style "contiguous overlap" refinement of
    * [[contaminationScore]]'s set-overlap count. Ten scattered shared
    * grams are usually vocabulary coincidence; ten CONSECUTIVE positions
    * are a verbatim quote of the eval set (a run of r k-gram positions
    * is a copied span of r+k−1 tokens). Output per contaminated
    * non-benchmark doc: hit-position count, run count, longest run, and
    * its token-span length — the relation a graded quarantine policy
    * reads (clean docs are absent: this is the drop-list shape, the
    * complement of x49's everyone-scored view).
    *
    * Spelling: a POSITION-PRESERVING gram stream (the distinct-shingle
    * relation x18/x49 share cannot carry positions) against the same
    * benchmark membership rule (`doc_id % 20 == 0`) and gram text; hit
    * positions then collapse to runs with the sessionize trick — gap
    * flag → running sum → per-run agg — sharing ONE doc_id shuffle
    * across both window functions and both aggregations
    * ([[Temporal.sessionize]]'s plan: hash-partitioning by doc_id
    * satisfies the (doc_id, run_id) clustering, so no second exchange).
    *
    * Scale: the positioned stream is linear in corpus tokens and never
    * shuffles — the broadcast benchmark join prunes it to HIT positions
    * (tiny by construction: benchmarks are MBs) before the one keyed
    * shuffle; nothing is pairwise.
    */
  def contaminationSpans(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
    // positions 1..len−k+1; the when-guard keeps ANSI's descending
    // sequence(1, 0) from firing on short docs (posexplode drops empties)
    val positioned = docs.select(col("doc_id"),
      posexplode(when(size(col("toks")) >= k,
        expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $k)))"))
        .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("gram"))
    val bench = positioned.filter(col("doc_id") % 20 === 0)
      .select("gram").distinct()
    val hits = positioned.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(bench), "gram")
      .select("doc_id", "p")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("brk",
        when(col("p") - lag("p", 1).over(w) === 1L, 0L).otherwise(1L))
      .withColumn("run_id", sum("brk").over(cum))
      .groupBy("doc_id", "run_id")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("doc_id")
      .agg(
        sum("run_len").as("n_hit_positions"),
        count(lit(1)).as("n_runs"),
        max("run_len").as("max_run"))
      .withColumn("max_span_tokens", col("max_run") + lit(k - 1).cast("long"))
      .orderBy("doc_id")
  }

  /** EXT-C18 — dataset-mixture planning: per-source token counts, the
    * natural mixture share, and the deterministic sampling rate that
    * moves the corpus toward a UNIFORM target mixture (`rate =
    * min(1, target_share / natural_share)` — under-represented sources
    * keep everything, over-represented ones downsample). The arithmetic
    * every mixture config ("20% code, 40% web, …") starts from; the
    * uniform target keeps the oracle parameter-free while exercising the
    * identical plan. Two partial-agg-friendly aggregations and a 1-row
    * broadcast of the corpus totals — nothing scales with document count.
    */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame =
    mixtureRates(spark, dir)
      .select("source", "n_docs", "src_tokens", "natural_share", "rate")
      .orderBy("source")

  /** The |sources|-row rate relation behind [[mixturePlan]] and
    * [[mixtureSample]] — the plan WITHOUT its presentation sort, so the
    * sampler's broadcast join never inherits an unnecessary sort
    * exchange. The rate formula lives here exactly once: the plan a
    * user audits and the gate the sampler applies can never drift.
    */
  private def mixtureRates(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), size(Tables.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("src_tokens"))
    val totals = perSource.agg(
      sum("src_tokens").as("total"), count(lit(1)).as("n_sources"))
    perSource
      .crossJoin(broadcast(totals))
      .withColumn("natural_share", col("src_tokens").cast("double") / col("total"))
      .withColumn("rate",
        least(lit(1.0), (lit(1.0) / col("n_sources")) / col("natural_share")))
  }

  /** EXT-C25 — mixture-plan EXECUTION: materialize the sampled corpus
    * [[mixturePlan]] (x48) prescribes. A document keeps iff its
    * content-stable draw clears its source's planned rate — `u <
    * ⌊rate·2³²⌋`, [[weightedSample]]'s threshold spelling (one IEEE
    * multiply + floor, bit-reproducible; rate = 1 keeps everything
    * because u < 2³² always). No `rand()`: reruns and incremental
    * ingests keep exactly the same rows, which is what makes the
    * mixture auditable and the op idempotent under replay.
    *
    * Scale: the rate relation is |sources| rows BROADCAST into a
    * row-local gate over one corpus scan — the corpus never shuffles;
    * the expected output mass per source is `rate·src_tokens ≈
    * total/n_sources`, i.e. the uniform target by construction.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureGate(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      mixtureRates(spark, dir).select("source", "rate"))
      .select("doc_id", "source", "u")
      .orderBy("doc_id")

  /** EXT-C27 — per-source budget apportionment by largest remainder
    * (Hamilton's method): split a document budget `B` across sources
    * proportionally to their sizes, in EXACT integer arithmetic —
    * `base = ⌊B·n_src/total⌋`, then the `B − Σbase` leftover seats go to
    * the largest division remainders (ties to the lexicographically
    * first source). The count-based complement of [[mixturePlan]]'s
    * rates: "how many documents from each source", with `Σquota = B`
    * EXACTLY — the invariant rate-rounding cannot give. Quotas are
    * apportionment targets: the classic method assumes `B ≤ total`
    * (callers clamp per-source at `n_docs` only if they over-budget).
    *
    * Scale: one corpus scan folds to the |sources|-row relation
    * (partial-agg count), materialized once (`localCheckpoint`) and
    * reused by the totals/leftover broadcasts; the rank window and the
    * presentation sort order |sources| rows, not documents — nothing
    * downstream of the first aggregation scales with the corpus.
    */
  def budgetAllocation(spark: SparkSession, dir: String, budget: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val totals = perSource.agg(sum("n_docs").as("total"))
    val based = perSource.crossJoin(broadcast(totals))
      .withColumn("base", expr(s"($budget * n_docs) div total"))
      .withColumn("rem", expr(s"($budget * n_docs) % total"))
      .localCheckpoint()
    val leftover = based.agg((lit(budget) - sum("base")).as("leftover"))
    val w = Window.orderBy(col("rem").desc, col("source"))
    based
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(leftover))
      .withColumn("quota", col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select("source", "n_docs", "base", "rem", "quota")
      .orderBy("source")
  }

  /** EXT-C38 (x106) — UniMax budget allocation (Chung et al., 2023):
    * apportion a total token budget across sources so every source gets
    * an EQUAL share except where that would repeat its data more than
    * `maxEpochs` times — small sources are capped at `maxEpochs ·
    * n_tokens`, the freed budget waterfills the rest. This is the
    * modern multilingual-sampling answer to [[budgetAllocation]]'s
    * proportional split (which starves tail languages) and
    * [[mixturePlan]]'s uniform target (which over-epochs them): the cap
    * is exactly the "max N epochs" rule mT5-class mixtures train with.
    *
    * Closed-form waterfilling, not a driver loop: sorted by (cap asc,
    * source asc), a prefix of cap-sorted sources is capped — source i is
    * capped iff `cap_i · left_i ≤ B − cum_{i−1}` (its cap fits under an
    * equal split of what remains after capping everything smaller); the
    * first failing index freezes the prefix, and the remainder splits
    * `⌊rem/u⌋` with the `rem mod u` leftover units going to the first
    * uncapped sources in the same order ([[budgetAllocation]]'s
    * largest-remainder determinism). All BIGINT — `Σ alloc = min(B,
    * Σ cap)` EXACTLY (under-subscribed corpora allocate every cap and
    * report the slack honestly); `epochs` is the one IEEE division.
    *
    * Scale: one corpus scan folds to the |sources| token relation
    * (partial-agg sum, `localCheckpoint`ed for its four consumers); the
    * rank/cum windows order |sources| rows, never documents, and the
    * three scalar aggregates broadcast — nothing in the plan grows with
    * the corpus. Overflow note: `cap·left` is BIGINT-safe to ~10¹⁵
    * tokens per source; past that the same spelling runs in
    * DECIMAL(38,0).
    */
  def unimaxBudget(
      spark: SparkSession,
      dir: String,
      budget: Long = 50000L,
      maxEpochs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), size(Tables.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("source").agg(sum("n_toks").as("n_tokens"))
      .withColumn("cap_tokens", col("n_tokens") * maxEpochs)
      .localCheckpoint()
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val ranked = perSource
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cap_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(perSource.agg(count(lit(1)).as("n_src"))))
      .withColumn("left_n", col("n_src") - col("i") + 1L)
      .withColumn("flag",
        col("cap_tokens") * col("left_n") <= lit(budget) - (col("cum") - col("cap_tokens")))
      .localCheckpoint() // consumed by the bad-index probe AND the result
    val bad = ranked.agg(min(when(!col("flag"), col("i"))).as("bad"))
    val g = ranked.crossJoin(broadcast(bad))
      .withColumn("capped", col("bad").isNull || col("i") < col("bad"))
      .localCheckpoint() // consumed by the remainder aggregate AND the result
    val rem = g.agg(
      (lit(budget) - coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L)))
        .as("rem_budget"),
      sum(when(!col("capped"), 1L).otherwise(0L)).as("u"))
    g.crossJoin(broadcast(rem))
      .withColumn("alloc",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("rem_budget div u") +
            when(col("i") - col("bad") + 1L <= expr("rem_budget % u"), 1L).otherwise(0L)))
      .select(col("source"), col("n_tokens"), col("cap_tokens"), col("capped"),
        col("alloc"), (col("alloc").cast("double") / col("n_tokens")).as("epochs"))
      .orderBy("source")
  }

  /** EXT-C30 — n-gram novelty between snapshots: per source, the
    * fraction of the NEW snapshot's distinct k-gram set unseen in the
    * previous one (even doc_ids = previous, odd = new — the x60 parity
    * convention). The "how much of this crawl is actually new" signal:
    * [[tokenDrift]] measures frequency SHIFT and EXT-D7 measures
    * near-dup overlap pairwise; novelty measures set NEWNESS, which
    * forecasts the dedup rate and the marginal value of ingesting the
    * snapshot at all. Exact integer counts, one IEEE division. Sources
    * with no new-snapshot grams do not appear (novelty of nothing is
    * not a signal — the compressionRatio null philosophy).
    *
    * Scale: one gram stream materialized once (`localCheckpoint` — both
    * sides and both aggregations read it), distinct-ed on
    * (source, parity, gram) in one partial-agg shuffle; the LEFT ANTI
    * probe and both counts are (source[, gram])-keyed partial aggs —
    * nothing is ever pairwise and nothing scales past the distinct-gram
    * relation.
    */
  def gramNovelty(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("source"), (col("doc_id") % 2).as("parity"),
        explode(Tables.shingles(Tables.tokens(col("text")), k)).as("gram"))
      .distinct()
      .localCheckpoint()
    val prev = grams.filter(col("parity") === 0).select("source", "gram")
    val fresh = grams.filter(col("parity") === 1).select("source", "gram")
    val totals = fresh.groupBy("source").agg(count(lit(1)).as("n_grams_b"))
    val novel = fresh.join(prev, Seq("source", "gram"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq("source"), "left_outer")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams_b"))
      .select("source", "n_grams_b", "n_novel", "novelty")
      .orderBy("source")
  }

  /** EXT-C28 — curriculum shard assignment: the deterministic pack
    * order a training run consumes. Every document lands in a
    * content-stable shard (`md5('shard:'||doc_id) mod nShards` — the
    * split/sampler derivation, so reruns and incremental ingests place
    * documents identically) and takes its within-shard position by
    * DESCENDING quality (ties to doc_id): each shard reads best-first,
    * the quality-curriculum ordering, while the hash sharding keeps
    * every shard an unbiased sample of the corpus (sequential shard
    * consumption never drifts the mixture the way a single global
    * quality sort would — the end of a global sort is all dregs).
    *
    * Scale: quality and shard are row-local; the ONE shuffle is the
    * shard partitioning, and the per-shard rank sort is work a shard
    * writer does anyway to emit its file in pack order. `nShards` is
    * sized so a shard fits a writer task (corpus / target shard bytes)
    * — it GROWS with the corpus, so per-shard sort volume stays
    * constant at any scale; the harness default is small only because
    * the eval corpus is.
    */
  def curriculumShards(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy("shard").orderBy(col("quality").desc, col("doc_id"))
    TextAnalysis.statsProjection(spark, dir)
      .select(col("doc_id"), col("quality"))
      .withColumn("shard", pmod(md5Draw("shard:"), lit(nShards.toLong)))
      .withColumn("position", row_number().over(w))
      .select("doc_id", "shard", "position", "quality")
      .orderBy("shard", "position")
  }

  /** EXT-C29 — cross-modal curation verdict: the text-quality gate and
    * the embedding-prototypicality gate composed into one keep decision
    * per document — `quality ≥ minQuality AND cent_sim4 ≥ minProto`.
    * The joint filter of the SemDeDup/SSL-prototypes + Gopher-rules
    * line: lexical quality alone keeps well-formed boilerplate, and
    * embedding centrality alone keeps fluent off-distribution noise;
    * the intersection is the trainable core. Thresholds tuned to the
    * harness corpus (≈ the two medians); production values are config.
    *
    * Scale: both legs are row-local projections over their own single
    * pass (the x7 stats projection; the x57 centroid projection over
    * the SAME materialized relation its training loop consumed), read
    * sort-free, composed by ONE 1:1 equi-join on the id — AQE sizes
    * the exchange; nothing here is quadratic or corpus-shuffling
    * beyond that join.
    */
  def crossmodalCuration(
      spark: SparkSession,
      dir: String,
      minQuality: Double = 0.63,
      minProto: Double = 0.25,
      exactMeans: Boolean = false): DataFrame =
    TextAnalysis.statsProjection(spark, dir)
      .select(col("doc_id"), col("quality"))
      .join(
        Similarity.centroidSimProjection(spark, dir, exactMeans = exactMeans)
          .select(col("vec_id").as("doc_id"), col("cell"), col("cent_sim4")),
        "doc_id")
      .withColumn("keep",
        col("quality") >= minQuality && col("cent_sim4") >= minProto)
      .select("doc_id", "quality", "cell", "cent_sim4", "keep")
      .orderBy("doc_id")

  /** The mixture gate as a relation-to-relation transform over any input
    * with (doc_id, source): the bounded per-source rate relation joins by
    * broadcast, and a row keeps iff its content-stable draw clears the
    * source's threshold. Row-local apart from the broadcast, so THE SAME
    * definition runs on a streaming DataFrame
    * ([[graft.streaming.StreamOps.mixtureGateStream]]) — ingest-time
    * enforcement and corpus-rebuild sampling can never drift.
    */
  def mixtureGate(docs: DataFrame, rates: DataFrame): DataFrame =
    docs
      .withColumn("u", md5Draw("mix:"))
      // LEFT join, defaulting an unplanned source to rate 1.0: a gate
      // must FAIL OPEN — in the streaming deployment a source that
      // appears after planning has no rate row, and silently discarding
      // 100% of it would be an invisible data loss; it passes whole
      // until the next re-plan prices it. (In batch the rates derive
      // from the same corpus, so the default never fires.)
      .join(broadcast(rates), Seq("source"), "left_outer")
      .filter(col("u") <
        floor(coalesce(col("rate"), lit(1.0)) * lit(4294967296.0)).cast("long"))

  /** English stopword list used by the quality gate's stop-hit rule —
    * THE canonical list from [[TextAnalysis.stopwords]], never a copy
    * (the two operators and their oracles must agree on it forever).
    */
  private val enStop: Seq[String] =
    TextAnalysis.stopwords.find(_._1 == "en").get._2

  /** Content-stable bucket in [0, 100): the first 8 hex chars of
    * `md5(prefix + doc_id)` mod 100. One definition shared by the split
    * and sampling operators — the seed prefix is the only difference, and
    * the formula must never drift between them (the oracles spell the
    * identical derivation).
    */
  private def md5Bucket(prefix: String): Column = pmod(md5Draw(prefix), lit(100L))

  /** [[md5Bucket]] over an arbitrary id column — the identical
    * derivation keyed by something other than the row's own `doc_id`
    * ([[clusterSplit]] keys it by the cluster canonical, so every
    * member of a near-dup family draws the same bucket).
    */
  private def md5BucketOf(prefix: String, id: Column): Column =
    pmod(conv(substring(md5(concat(lit(prefix), id.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(100L))

  /** Full-width 32-bit content-stable draw in [0, 2³²): the first 8 hex
    * chars of `md5(prefix + doc_id)` unsigned — the ONE spelling of the
    * derivation ([[md5Bucket]] is this mod 100), for samplers that
    * compare the draw against a computed threshold or order by it.
    */
  private def md5Draw(prefix: String): Column =
    conv(substring(md5(concat(lit(prefix), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** EXT-C2 — Gopher-style quality gate: per-document boolean rules +
    * the aggregate keep flag. Rules (thresholds tuned to the harness
    * corpus; production values are config):
    *  - `r_len`: 20 ≤ n_tokens ≤ 80
    *  - `r_avg`: 3.0 ≤ mean token length ≤ 8.0
    *  - `r_stop`: ≥ 2 stopword hits (duplicates counted)
    *  - `r_rep`: most-frequent-token fraction ≤ 0.125
    * Pure row-local projection — no shuffle, codegen end to end.
    */
  def qualityGate(spark: SparkSession, dir: String): DataFrame =
    qualityProjection(Tables.documents(spark, dir)).orderBy("doc_id")

  /** The quality gate as a relation-to-relation transform over any input
    * with (doc_id, text) — row-local, so THE SAME definition runs on the
    * batch table and on an unbounded document stream
    * (structured streaming executes it per microbatch unchanged; see
    * the streaming spec). One definition means the batch gate, the
    * streaming gate, and the oracle can never drift apart.
    */
  def qualityProjection(docs: DataFrame): DataFrame =
    qualityAnnotated(docs).select("doc_id", "n_tokens", "avg_len", "stop_hits",
      "top_tok_frac", "r_len", "r_avg", "r_stop", "r_rep", "keep")

  /** [[qualityProjection]]'s measurements APPENDED to the input relation
    * (every input column preserved) — the form a linear streaming
    * pipeline needs, where a later stage still wants `text` and joining
    * the stream back to itself is not an option (stream-stream
    * self-joins are unsupported). Row-local, same single compiled
    * hash-count pass.
    *
    * The measurement names are RESERVED: `withColumn` would silently
    * overwrite a same-named input column (plausible for upstream ingest
    * metadata like `keep`), so collisions are rejected loudly instead.
    */
  def qualityAnnotated(docs: DataFrame): DataFrame = {
    val reserved = Seq("__toks", "__st", "n_tokens", "avg_len", "stop_hits",
      "top_tok_frac", "r_len", "r_avg", "r_stop", "r_rep", "keep")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"qualityAnnotated: input columns ${clash.mkString(", ")} collide with " +
        "reserved measurement names — rename them upstream")
    val toks = col("__toks")
    val nTok = size(toks).cast("long")
    // splitting on single spaces removes exactly (n_tokens − 1)
    // separators, so the token-length sum is arithmetic on lengths
    val sumLen = length(col("text")).cast("long") - (nTok - 1)
    docs
      .withColumn("__toks", Tables.tokens(col("text")))
      // one compiled hash-count pass for the mode; the declarative
      // distinct×filter spelling is O(n²)-ish interpreted lambdas
      .withColumn("__st", graft.functions.NgramStats.ngramStats(toks, 1))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_len", sumLen.cast("double") / nTok)
      .withColumn("stop_hits", graft.functions.CountIn.countIn(toks, enStop))
      .withColumn("top_tok_frac", col("__st.max_count").cast("double") / nTok)
      .withColumn("r_len", col("n_tokens") >= 20 && col("n_tokens") <= 80)
      .withColumn("r_avg", col("avg_len") >= 3.0 && col("avg_len") <= 8.0)
      .withColumn("r_stop", col("stop_hits") >= 2)
      .withColumn("r_rep", col("top_tok_frac") <= 0.125)
      .withColumn("keep", col("r_len") && col("r_avg") && col("r_stop") && col("r_rep"))
      .drop("__toks", "__st")
  }

  /** EXT-C37 — blocklist filter (the C4-style "bad words" gate): per
    * document, token-instance hit counts against two externally-supplied
    * word categories — `severe` (zero tolerance: one hit blocks) and
    * `mild` (rate-thresholded: blocked only past `mildMaxRate` of the
    * document's tokens) — plus the keep verdict. Real pipelines run
    * exactly this two-tier shape (hard slurs vs contextual terms); the
    * harness binding passes corpus-vocabulary stand-in lists the same
    * way x18's benchmark subset stands in for an external eval set.
    *
    * Both counts are one compiled hash-set pass each
    * ([[graft.functions.CountInExpression]] — the word set is hashed at
    * plan time, O(1) per token); `mild_rate` is a single IEEE division;
    * the threshold default 1/16 is exactly representable so the
    * comparison is unambiguous in both engines. Pure row-local
    * projection: zero shuffles at any corpus size beyond the
    * presentation sort — the same cost class as the quality gate it
    * composes with ([[qualityGate]] ∧ keep).
    */
  def blocklistFilter(
      spark: SparkSession,
      dir: String,
      severe: Seq[String] = Seq("dup"),
      mild: Seq[String] = Seq("slow", "big"),
      mildMaxRate: Double = 0.0625): DataFrame =
    blocklistProjection(Tables.documents(spark, dir), severe, mild, mildMaxRate)
      .orderBy("doc_id")

  /** [[blocklistFilter]] as a relation-to-relation transform over any
    * input with (doc_id, text) — row-local, so THE SAME definition runs
    * on the batch table and on an unbounded document stream (the
    * [[qualityProjection]] contract: batch gate, streaming gate, and
    * oracle share one definition and can never drift).
    */
  def blocklistProjection(
      docs: DataFrame,
      severe: Seq[String],
      mild: Seq[String],
      mildMaxRate: Double): DataFrame = {
    val toks = Tables.tokens(col("text"))
    docs
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.CountIn.countIn(toks, severe).as("severe_hits"),
        graft.functions.CountIn.countIn(toks, mild).as("mild_hits"))
      .withColumn("mild_rate", col("mild_hits").cast("double") / col("n_tokens"))
      .withColumn("keep",
        col("severe_hits") === 0L && col("mild_rate") <= lit(mildMaxRate))
  }

  /** EXT-C3 — repetition measurement: distinct-bigram ratio and the
    * most-frequent-bigram fraction (the "duplicate n-gram fraction"
    * family of repetition filters). Row-local and shuffle-free: one
    * compiled hash-count pass over each document's bigram multiset
    * ([[graft.functions.NgramStatsExpression]]; the declarative
    * distinct×filter spelling was ~10× slower, see its docs). Documents
    * with < 2 tokens have no bigrams and are excluded.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionAssign(spark, dir).orderBy("doc_id")

  /** The repetition relation WITHOUT the presentation sort — consumers
    * that JOIN it downstream ([[signalAgreement]]) skip the global sort
    * exchange (the `splitAssign` convention).
    */
  private[graft] def repetitionAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
      .select(col("doc_id"), graft.functions.NgramStats.ngramStats(col("toks"), 2).as("st"))
      .filter(col("st.n_grams") > 0)
      .select(
        col("doc_id"),
        col("st.n_grams").as("n_bigrams"),
        (col("st.n_distinct").cast("double") / col("st.n_grams")).as("distinct_ratio"),
        (col("st.max_count").cast("double") / col("st.n_grams")).as("top_bigram_frac"))

  /** EXT-C31 — duplicated-n-gram coverage (Gopher/MassiveText, Rae et
    * al. 2021 §A1.1): per document, the fraction of token POSITIONS
    * lying inside some trigram that repeats within the same document —
    * the positional repetition filter [[repetition]]'s multiset ratios
    * cannot express (ten scattered repeats of one gram vs one ten-fold
    * run score identically there, very differently here). The published
    * filter drops docs past a coverage threshold; this emits the score
    * so thresholds stay a downstream `filter`.
    *
    * One compiled row-local pass
    * ([[graft.functions.DupGramCoverageExpression]]: hash-count the
    * gram multiset, mark covered slots) — zero shuffle at any corpus
    * size except the presentation sort; exact integer `n_cov`, one IEEE
    * division.
    */
  def dupGramCoverage(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        graft.functions.DupGramCoverage.dupGramCov(col("toks"), n).as("n_cov"))
      .withColumn("cov_frac", col("n_cov").cast("double") / col("n_tokens"))
      .orderBy("doc_id")

  /** EXT-C4 — deterministic train/val/test split: bucket = the first 8
    * hex chars of `md5("split:" + doc_id)` mod 100; train < 80, val < 90,
    * test otherwise. Content-stable hashing is THE way to split at 100 TB
    * — no global sort, no sampling pass, no coordination; reruns and
    * incremental ingests land every document in the same split. Pure
    * row-local projection.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    splitAssign(spark, dir).orderBy("doc_id")

  /** The split assignment WITHOUT the presentation sort — consumers that
    * JOIN the splits ([[splitLeakage]]) skip the global sort exchange.
    */
  private def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5Bucket("split:").as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))

  /** The x21 split verdict as a COLUMN over an arbitrary id — the ONE
    * derivation (`md5("split:"+id)` bucket, 80/10/10) shared with the
    * streaming funnel gauge so the two faces cannot drift.
    */
  private[graft] def splitVerdict(id: Column): Column = {
    val b = md5BucketOf("split:", id)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** EXT-C23 — split-leakage audit: near-duplicate pairs that STRADDLE
    * the [[hashSplit]] boundary. A held-out document with a near-dup in
    * train is not held out — its eval loss is memorization, not
    * generalization — so this relation must be EMPTY (or consumed as a
    * held-out-side drop list) before the split ships. Pairs come from
    * the same exact banded-SimHash relation the cluster resolver
    * consumes ([[Dedup.simhashNearDup]]: candidates only from band
    * collisions, Hamming ≤ 4 exact by pigeonhole).
    *
    * Scale: the pair relation is vanishingly small next to the corpus
    * (it is the near-dup evidence, not the cross product), so both split
    * lookups are doc_id equi-joins with a tiny probe side — AQE
    * broadcasts the pairs; the split relation is a row-local projection
    * of the corpus that is never shuffled. Deterministic presentation
    * order (d1, d2).
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    leakPairs(spark, dir)
      .select(col("d1"), col("d2"), col("split_1"), col("split_2"), col("hamming"))
      .orderBy("d1", "d2")

  /** The cross-split near-dup pair relation behind [[splitLeakage]] and
    * [[leakageRepair]] — the audit view minus its presentation sort, so
    * the repair's drop-set derivation never inherits a sort exchange.
    */
  private def leakPairs(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, dir)
    val splits = splitAssign(spark, dir).select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("split_1")), "d1")
      .join(splits.select(col("doc_id").as("d2"), col("split").as("split_2")), "d2")
      .filter(col("split_1") =!= col("split_2"))
  }

  /** EXT-C26 — split-leakage REPAIR: the fixed split assignment after
    * [[splitLeakage]]'s audit. For every cross-split near-dup pair the
    * lower-priority member is dropped under the fixed precedence
    * train > val > test — train keeps its document (dropping train
    * rows would shrink the corpus to protect an eval set that is being
    * discarded anyway), and a val↔test pair drops the test copy, so
    * eval sets never share near-dups with ANY other split. The rule is
    * well-defined because a leaking pair's splits differ by
    * construction and the precedence is injective per split. Output is
    * the full assignment with a `kept` verdict per document — the
    * auditable form; `filter(kept)` is the shippable split.
    *
    * Scale: the drop set is a projection of the (tiny) leak-pair
    * relation, distinct-ed at |drops| cost, then LEFT-joined to the
    * row-local split projection — AQE broadcasts it; the corpus is
    * scanned once and never shuffled (the presentation sort is the
    * only corpus-sized exchange).
    */
  def leakageRepair(spark: SparkSession, dir: String): DataFrame = {
    def prio(s: Column): Column =
      when(s === "train", 2).when(s === "val", 1).otherwise(0)
    val drops = leakPairs(spark, dir)
      .select(when(prio(col("split_1")) < prio(col("split_2")), col("d1"))
        .otherwise(col("d2")).as("doc_id"))
      .distinct()
      .withColumn("leaked", lit(true))
    splitAssign(spark, dir)
      .select(col("doc_id"), col("split"))
      .join(drops, Seq("doc_id"), "left_outer")
      .withColumn("kept", coalesce(col("leaked"), lit(false)) === lit(false))
      .select("doc_id", "split", "kept")
      .orderBy("doc_id")
  }

  /** EXT-C5 — duplicate-cluster resolution: given the near-dup pair
    * stream (here: [[Dedup.simhashNearDup]]'s exact Hamming pairs),
    * assign every clustered document its connected component's minimum
    * doc_id as the canonical id — the step that turns pairwise near-dup
    * evidence into "keep one per cluster".
    *
    * Min-label contraction with pointer jumping: each round (1) rewrites
    * the ORIGINAL edge list through the current labels and drops
    * intra-label self-loops — emptiness of this contracted relation is
    * the exact convergence test; (2) takes, per label, the min over its
    * contracted neighborhood (`f`); (3) composes the min-step and the
    * pointer jump into ONE label-level map `g(a) = f(labels(f(a)))`
    * (each hop falling back to identity where undefined) and relabels
    * every node through it. The node-level `labels` lookup in the middle
    * of `g` is what preserves hop DOUBLING — on a chain the covered
    * distance follows D ← 2·D + 2, so chain-shaped components converge
    * in O(log n) rounds where star steps alone advance one hop per
    * round, O(diameter) (a simulated 32-doc near-dup chain: 31 rounds
    * without the jump, 5 with it; dense components like sf0.1's 639-node
    * cluster converge in ≤4 either way). Because `g` is built on the
    * tiny label-level relation (broadcast-joined through `labels`), each
    * round materializes only TWO big relations — the contracted edges
    * and the new labels — via eager `localCheckpoint`: lineage stays
    * O(1) across iterations and every consumer branch reads
    * materialized data instead of recomputing its plan.
    *
    * Correctness: every hop of `g` maps a label to a value that is ≤ it
    * and still a member of the same component (`f(a) ≤ a` by
    * construction, `labels(y) ≤ y` by induction from the seeding), so
    * labels are monotonically non-increasing and bounded by the
    * component minimum — which is a fixpoint of every hop. An
    * inter-label edge forces `f` to strictly decrease the larger
    * endpoint's label, so progress is guaranteed while any exists; at
    * convergence (contracted relation empty) all labels in a component
    * equal some member id L with L = labels(min) ≤ min, hence L IS the
    * minimum — the oracle's recursive-CTE closure exactly. If
    * `maxRounds` is ever hit first (pathological beyond ~2^maxRounds-
    * node components), it THROWS rather than returning silently wrong
    * canonical ids.
    */
  def dedupClusters(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame =
    Graph.connectedComponents(
      Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")), maxRounds)

  /** EXT-C17 — cluster-representative selection: keep the highest-QUALITY
    * member of each near-dup cluster (ties to the lowest doc_id), rather
    * than the lowest-id canonical [[curatedCorpus]] keeps — the curation
    * policy that retains the best copy of duplicated content instead of
    * an arbitrary one. One narrow doc_id join (cluster labels ⋈ quality)
    * and one aggregation; the argmax is a partial-agg-friendly
    * `max(struct(quality, −doc_id))`, so map partitions collapse to one
    * candidate per cluster BEFORE the shuffle — no window over the
    * membership stream.
    */
  def clusterRepresentatives(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame =
    representativesOf(dedupClusters(spark, dir, maxRounds), spark, dir)

  /** The x47 argmax over an arbitrary `(doc_id, cluster)` label relation
    * — shared by the in-memory path and [[clusterRepresentativesFromIndex]]
    * so the persisted form is the SAME aggregation by construction.
    */
  private def representativesOf(labels: DataFrame, spark: SparkSession, dir: String): DataFrame =
    labels
      .join(TextAnalysis.statsProjection(spark, dir).select("doc_id", "quality"), "doc_id")
      .groupBy("cluster")
      .agg(
        max(struct(col("quality"), negate(col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), negate(col("best.nid")).as("rep_doc_id"),
        col("best.quality").as("rep_quality"), col("n_members"))
      .orderBy("cluster")

  /** EXT-C55 — persist the near-dup cluster labels: the x22 contraction
    * run ONCE and written as an index, closing the one place the repo
    * documented the 100 TB materialize-once pattern instead of shipping
    * it (nine queries re-pay the contraction per run as self-contained
    * oracles — production consumers read THIS). Follows the IVF/sign/
    * PQ/BM25 layout exactly: `labels/` is the (doc_id, cluster) relation
    * partitioned by a doc_id bucket so membership probes prune FILES,
    * `meta/` is one stamp row carrying the full parameter bundle
    * (SimHash banding geometry) plus the corpus identity (doc count AND
    * the order-insensitive doc_id XOR) — labels from a different banding
    * or a drifted corpus are not comparable, so the probes REFUSE a
    * mismatched stamp instead of silently answering from stale clusters
    * (the [[Dedup.bandSignatures]] bundling contract).
    */
  def writeClusterIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      maxHamming: Int = 4,
      bands: Int = 5,
      bits: Int = 60,
      nBuckets: Int = 16,
      maxRounds: Int = 30): Unit = {
    import spark.implicits._
    require(nBuckets >= 1, s"nBuckets ($nBuckets) must be positive")
    val (nDocs, docXor) = corpusStamp(spark, dir)
    Graph.connectedComponents(
        Dedup.simhashNearDupPairs(spark, dir, maxHamming, bands, bits), maxRounds)
      .withColumn("bucket", pmod(col("doc_id"), lit(nBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/labels")
    Seq((maxHamming, bands, bits, nBuckets, nDocs, docXor))
      .toDF("max_hamming", "bands", "bits", "n_buckets", "n_docs", "doc_xor")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Corpus identity for the stamp: count + order-insensitive doc_id
    * XOR — one single-column scan; any add/remove/substitute of a doc
    * flips it (up to XOR collisions, which the count also guards).
    */
  private def corpusStamp(spark: SparkSession, dir: String): (Long, Long) = {
    val r = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n"), expr("bit_xor(doc_id)").as("x")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Validated stamp read: refuses a parameter-bundle mismatch. Returns
    * (labels relation UNSORTED, nBuckets, stamped nDocs, stamped docXor).
    */
  private def readClusterIndex(
      spark: SparkSession,
      indexPath: String,
      maxHamming: Int,
      bands: Int,
      bits: Int): (DataFrame, Int, Long, Long) = {
    val rows = spark.read.parquet(s"$indexPath/meta")
      .select("max_hamming", "bands", "bits", "n_buckets", "n_docs", "doc_xor").collect()
    require(rows.length == 1, s"corrupt cluster index: ${rows.length} meta rows")
    val m = rows(0)
    require(m.getInt(0) == maxHamming && m.getInt(1) == bands && m.getInt(2) == bits,
      s"cluster index stamped (maxHamming=${m.getInt(0)}, bands=${m.getInt(1)}, " +
        s"bits=${m.getInt(2)}) but probed with ($maxHamming, $bands, $bits) — " +
        "labels from a different banding are not comparable; rebuild the index")
    (spark.read.parquet(s"$indexPath/labels").select("doc_id", "cluster"),
      m.getInt(3), m.getLong(4), m.getLong(5))
  }

  /** EXT-C55 probe: the full label relation from the PERSISTED index —
    * bit-equal to [[dedupClusters]] over the same corpus (spec-asserted)
    * with the contraction loop replaced by one pruned-column read. The
    * corpus-identity stamp is re-derived from `dir` and must match:
    * clusters answered from an index built on a DIFFERENT corpus are
    * wrong silently, so this refuses loudly instead.
    */
  def clustersFromIndex(
      spark: SparkSession,
      indexPath: String,
      dir: String,
      maxHamming: Int = 4,
      bands: Int = 5,
      bits: Int = 60): DataFrame = {
    val (labels, _, nDocs, docXor) = readClusterIndex(spark, indexPath, maxHamming, bands, bits)
    val (curN, curX) = corpusStamp(spark, dir)
    require(curN == nDocs && curX == docXor,
      s"cluster index stamped for a corpus of $nDocs docs (xor=$docXor) but " +
        s"$dir holds $curN (xor=$curX) — corpus drifted since the build; rebuild the index")
    labels.orderBy("doc_id")
  }

  /** EXT-C55 membership probe: canonical cluster id for an arbitrary
    * `doc_id` query relation — `cluster` falls back to the doc's own id
    * (a never-clustered doc is its own canonical), `clustered` says
    * which. The 100 TB point, [[Similarity.ivfTopKFromIndex]]'s
    * staticPrune discipline verbatim: the batch's DISTINCT buckets — at
    * most `n_buckets` values by construction, the legitimate bounded
    * collect — pin a LITERAL partition filter on the label read, so the
    * probe touches buckets/n_buckets of the index FILES by the PLANNER,
    * not the pruning heuristic.
    */
  def lookupClustersFromIndex(
      spark: SparkSession,
      indexPath: String,
      docIds: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$indexPath/meta").select("n_buckets").collect()
    require(rows.length == 1, s"corrupt cluster index: ${rows.length} meta rows")
    val nBuckets = rows(0).getInt(0)
    val q = docIds.select(col("doc_id")).distinct()
      .withColumn("bucket", pmod(col("doc_id"), lit(nBuckets.toLong)).cast("int"))
      .localCheckpoint() // consumed by the bucket collect AND the join
    val buckets = q.select("bucket").distinct().as[Int].collect().toSeq
    val labels = spark.read.parquet(s"$indexPath/labels")
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .select(col("doc_id"), col("cluster"))
    q.select("doc_id").join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"),
        col("cluster").isNotNull.as("clustered"))
      .orderBy("doc_id")
  }

  /** EXT-C55 heavy consumer: x47's representative pick served from the
    * persisted labels — the SAME argmax aggregation as
    * [[clusterRepresentatives]] by construction ([[representativesOf]]),
    * with the contraction loop replaced by the index read (stamp- and
    * corpus-validated via [[clustersFromIndex]]).
    */
  def clusterRepresentativesFromIndex(
      spark: SparkSession,
      indexPath: String,
      dir: String,
      maxHamming: Int = 4,
      bands: Int = 5,
      bits: Int = 60): DataFrame = {
    val (labels, _, nDocs, docXor) = readClusterIndex(spark, indexPath, maxHamming, bands, bits)
    val (curN, curX) = corpusStamp(spark, dir)
    require(curN == nDocs && curX == docXor,
      s"cluster index stamped for a corpus of $nDocs docs (xor=$docXor) but " +
        s"$dir holds $curN (xor=$curX) — corpus drifted since the build; rebuild the index")
    representativesOf(labels, spark, dir)
  }

  /** EXT-C54 (`x152_rep_divergence`) — representative-POLICY divergence
    * audit: per multi-policy-relevant cluster, the lowest-id canonical
    * (x29's keep rule — the cluster label itself) against x47's
    * highest-quality pick, with the exact consequence of choosing one
    * over the other: whether they agree, the quality the id policy
    * leaves on the table (`q_gap4 ≥ 0` by the argmax), and the signed
    * token-mass delta a switch would move. The A/B table behind a real
    * pipeline decision: the id policy is replay-stable (a re-crawl
    * never flips it) while the quality policy maximizes kept value but
    * flips whenever quality scores drift — this relation prices the
    * difference cluster by cluster instead of arguing it in the
    * abstract.
    *
    * Scale: the one checkpointed (cluster, quality, tokens) membership
    * relation feeds the partial-agg struct-max (x47's windowless
    * argmax); both rep attribute lookups are narrow doc_id equi-joins;
    * |clusters| rows out, nothing pairwise past x22's banded pairs.
    */
  def repPolicyDivergence(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame = {
    val q = TextAnalysis.statsProjection(spark, dir)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
      .localCheckpoint() // consumed by the member join and both rep lookups
    val picks = dedupClusters(spark, dir, maxRounds)
      .join(q.select("doc_id", "quality"), "doc_id")
      .groupBy("cluster")
      .agg(
        max(struct(col("quality"), negate(col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("n_members"),
        negate(col("best.nid")).as("rep_quality_pick"),
        col("best.quality").as("q_pick"))
    picks
      .join(q.select(col("doc_id").as("cluster"),
        col("quality").as("q_low"), col("n_tokens").as("tok_low")), "cluster")
      .join(q.select(col("doc_id").as("rep_quality_pick"),
        col("n_tokens").as("tok_pick")), "rep_quality_pick")
      .select(col("cluster"), col("n_members"), col("rep_quality_pick"),
        (col("rep_quality_pick") === col("cluster")).as("same"),
        round(col("q_pick") - col("q_low"), 4).as("q_gap4"),
        (col("tok_pick") - col("tok_low")).as("tok_delta"))
      .orderBy("cluster")
  }

  /** EXT-C47 (`x134_dup_pagerank`) — template centrality: [[Graph.pageRank]]
    * over the SimHash near-dup pair graph (x22's edges). Where x22
    * answers "which docs are one template family" and x129 "what is in
    * each family", this ranks WITHIN and ACROSS families: the highest-
    * rank nodes are the template CENTERS (the page everything else is a
    * near-copy of — rank flows toward high-degree hubs), which is the
    * principled pick for x47's cluster-representative policy when
    * quality scores tie, and a round-over-round rank4 jump for a doc
    * flags a template newly spreading through the crawl (a mirror farm
    * lighting up) before cluster counts move.
    */
  def dupPageRank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame =
    Graph.pageRank(Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")), iters)

  /** EXT-C51 (`x146_edge_support`) — near-dup pair TRUST audit:
    * [[Graph.edgeSupport]] over x22's SimHash pair graph. The edge-level
    * reading of x145: a pair corroborated by many common near-dup
    * neighbors is template-family INTERIOR (safe to act on), while an
    * unsupported pair inside a larger component is exactly the stitch
    * x141's merged_by_new warns about — the single borderline collision
    * holding two families together, and the cheapest re-verify queue
    * (re-score |unsupported| pairs, not |pairs|) before x22's clusters
    * feed x47's representative picks.
    */
  def dupEdgeSupport(spark: SparkSession, dir: String): DataFrame =
    Graph.edgeSupport(Dedup.simhashNearDupPairs(spark, dir))

  /** EXT-C56 (`x154_k_truss`) — the peeling fixpoint x146 is one loop
    * short of: [[Graph.kTruss]] over x22's SimHash pair graph. x146
    * reports raw per-edge support; this peels CASCADES — an edge with
    * healthy support can still fall when the borderline edges propping
    * up its triangles are peeled first, so the k-truss, not the raw
    * support threshold, is the principled "clique-like core" verdict.
    * The surviving edges are the cluster-trust core (x145/x146's story
    * completed); the peeled ones are the re-verify queue before x22's
    * clusters feed x47's representative picks.
    */
  def dupTruss(spark: SparkSession, dir: String, k: Int = 4, maxRounds: Int = 6): DataFrame =
    Graph.kTruss(Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")),
      k, maxRounds)

  /** EXT-C58 (`x156_k_core`) — [[Graph.kCore]] over x22's SimHash pair
    * graph: the hub/periphery split of the near-dup graph at node
    * granularity. Where x154's truss asks "which EDGES are clique-like
    * evidence", the core asks "which DOCS sit densely inside template
    * families" — core members are the families' interiors (safe bulk
    * drops), peripheral nodes are the one-or-two-collision attachments
    * worth re-verifying before x47 picks representatives. Cheaper than
    * the truss by construction (degree folds, no triangle enumeration),
    * so it is the first-pass screen at 100 TB; the truss refines the
    * edges inside the surviving core.
    */
  def dupKCore(spark: SparkSession, dir: String, k: Int = 3, maxRounds: Int = 12): DataFrame =
    Graph.kCore(Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")),
      k, maxRounds)

  /** EXT-C60 (`x159_trust_rank`) — TrustRank over the near-dup graph:
    * [[Graph.personalizedPageRank]] seeded at the x19 quality-gate
    * KEEPERS. Where x134 ranks template centrality blind to content,
    * this reads off how much vetted-content proximity reaches each
    * member: a non-seed with high trust rank is a near-copy of quality
    * content (keep-adjacent — likely a mirror of something good), while
    * a whole cluster at rank ≈ 0 is a template family with no vetted
    * member anywhere — the spam-farm signature, and a better bulk-drop
    * signal than per-doc quality alone because the JOINT structure
    * (quality × graph) decides. Seeds confined to graph nodes; the
    * quality predicate is x19's exact gate, so both engines classify
    * every seed identically.
    */
  def trustRank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame =
    Graph.personalizedPageRank(
      Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")),
      qualityProjection(Tables.documents(spark, dir))
        .filter(col("keep")).select(col("doc_id").as("node")),
      iters)

  /** EXT-C61 (`x160_cluster_split`) — cluster-keyed train/val/test
    * split, audited against the per-document policy: assignment keys
    * the [[hashSplit]] bucket derivation by the near-dup CLUSTER
    * canonical (`coalesce(cluster, doc_id)` — unclustered documents
    * draw exactly their x21 bucket), so a whole near-dup family lands
    * in one split and cross-split leakage is zero BY CONSTRUCTION —
    * prevention, where [[leakageRepair]] is the cure (drop documents
    * after the fact). Output: one row per (policy, split) with the doc
    * and char mass, `moved_docs` (documents whose split differs under
    * the other policy — the price of co-assignment), and `leak_pairs`
    * (near-dup pairs straddling OUT of this split under this policy; a
    * straddling pair counts once at each end, so the global leak count
    * is the column sum halved). The audited law, visible in the
    * output: every `cluster`-policy row has `leak_pairs = 0`.
    *
    * Scale: the banded pair relation is paid ONCE (checkpointed, then
    * contracted for labels and probed for leaks — not the
    * self-contained double-pay); the assignment is a row-local
    * projection after one left join to the (tiny) label relation, and
    * both policy audits are doc_id equi-joins with the pair relation
    * as the probe side. The report is 6 rows.
    */
  def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.simhashNearDupPairs(spark, dir)
      .select(col("d1"), col("d2")).localCheckpoint()
    val labels = Graph.connectedComponents(pairs, maxRounds = 30)
    val assign = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        splitVerdict(col("doc_id")).as("doc_split"),
        splitVerdict(coalesce(col("cluster"), col("doc_id"))).as("clu_split"))
      .localCheckpoint() // consumed by both policy views and both leak probes
    def policyView(policy: String, mine: String, other: String): DataFrame = {
      val per = assign.groupBy(col(mine).as("split"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
          sum(when(col(mine) =!= col(other), 1L).otherwise(0L)).as("moved_docs"))
      val straddle = pairs
        .join(assign.select(col("doc_id").as("d1"), col(mine).as("s1")), "d1")
        .join(assign.select(col("doc_id").as("d2"), col(mine).as("s2")), "d2")
        .filter(col("s1") =!= col("s2"))
      val leaks = straddle.select(col("s1").as("split"))
        .unionAll(straddle.select(col("s2").as("split")))
        .groupBy("split").agg(count(lit(1)).as("leak_pairs"))
      per.join(leaks, Seq("split"), "left")
        .select(lit(policy).as("policy"), col("split"), col("n_docs"), col("n_chars"),
          col("moved_docs"), coalesce(col("leak_pairs"), lit(0L)).as("leak_pairs"))
    }
    policyView("doc", "doc_split", "clu_split")
      .unionByName(policyView("cluster", "clu_split", "doc_split"))
      .orderBy("policy", "split")
  }

  /** EXT-C62 (`x161_source_communities`) — source-community detection
    * over the near-dup graph: [[Graph.labelPropagation]] seeded with
    * each document's SOURCE. After the fixed synchronous rounds, a
    * node's community is the source whose content dominates its graph
    * neighborhood — `changed` marks documents whose near-dup evidence
    * pulls them into ANOTHER source's family (a mirror or scrape: the
    * content's provenance, by graph vote, is not the ingest label). A
    * cluster that converges to one community across sources is a
    * cross-source template family — x128 measures that overlap by
    * token mass; this reads it off the pair evidence itself, per doc.
    */
  def sourceCommunities(spark: SparkSession, dir: String, iters: Int = 4): DataFrame =
    Graph.labelPropagation(
      Dedup.simhashNearDupPairs(spark, dir).select(col("d1"), col("d2")),
      Tables.documents(spark, dir)
        .select(col("doc_id").as("node"), col("source").as("label")),
      iters)

  /** EXT-C63 (`x162_semantic_clusters`) — SEMANTIC near-dup clusters:
    * [[Graph.connectedComponents]] over the embedding-cosine pair
    * relation (x14's LSH-bucketed evidence — sign-bucket collision then
    * exact cosine ≥ τ), where x22 contracts the LEXICAL (SimHash)
    * graph. Text dedup misses paraphrases and translations; the
    * embedding graph is the standard second layer that catches them.
    * Per cluster: member count, how many distinct training LABELS it
    * spans, and the majority label with its fraction (ties to the
    * smallest label) — a semantic cluster straddling labels is either a
    * labeling error or a genuinely ambiguous family; both are exactly
    * what a training-data audit wants surfaced before sampling weights
    * are assigned.
    *
    * Scale: pair generation is x14's bucketed shape (never all-pairs),
    * the contraction x22's O(log n) pointer-halving engine; the census
    * is two keyed partial aggs on the (tiny) label relation — the
    * struct-argmin collapses map-side, no window over members.
    */
  def semanticClusters(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val labels = Graph.connectedComponents(
      Similarity.cosineNearDupPairs(spark, dir, threshold)
        .select(col("v1").as("d1"), col("v2").as("d2")))
    val byLabel = labels
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("label")), "doc_id")
      .groupBy(col("cluster"), col("label")).agg(count(lit(1)).as("c"))
    byLabel.groupBy("cluster")
      .agg(sum("c").as("n_members"), count(lit(1)).as("n_labels"),
        min(struct(negate(col("c")).as("nc"), col("label").as("l"))).as("b"))
      .select(col("cluster"), col("n_members"), col("n_labels"),
        col("b.l").as("maj_label"),
        round(negate(col("b.nc")).cast("double") / col("n_members"), 4).as("maj_frac4"))
      .orderBy("cluster")
  }

  /** EXT-C67 (`x166_semantic_threshold_sweep`) — semantic-dedup
    * threshold CALIBRATION by label coherence: the cosine pair relation
    * is generated ONCE at the loosest candidate threshold (x143's
    * sweep convention — never one pass per τ), tagged with whether the
    * endpoints share a training label, then re-thresholded ROW-LOCALLY
    * per τ. Per τ: surviving pairs, same-label pairs, and coherence
    * (the fraction of "duplicates" that are at least label-consistent).
    * Coherence rising with τ says tighter thresholds trade recall for
    * precision exactly as intended; a FLAT curve says the similarity
    * axis is not capturing the label structure and no threshold is
    * safe — the calibration question answered from one relation.
    * τ rides as an integer percent; both engines spell the cut as
    * `sim >= τ/100.0` — the identical IEEE division and comparison.
    *
    * Scale: ONE salted-LSH pairing pass at min(τ) (the x14/x162
    * machinery), two vec_id equi-joins for labels, then a
    * |pairs|·|τ| row-local explode into a |τ|-bounded fold. The τ list
    * join keeps zero-pair thresholds visible (NULL coherence, never a
    * dropped row).
    */
  def semanticThresholdSweep(
      spark: SparkSession,
      dir: String,
      tauPcts: Seq[Int] = Seq(40, 50, 60, 70)): DataFrame = {
    require(tauPcts.nonEmpty && tauPcts.forall(t => t >= 1 && t <= 100),
      s"tauPcts (${tauPcts.mkString(",")}) must be percents in [1, 100]")
    import spark.implicits._
    val lab = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    val pairs = Similarity
      .cosineNearDupPairs(spark, dir, threshold = tauPcts.min / 100.0)
      .join(lab.select(col("vec_id").as("v1"), col("label").as("l1")), "v1")
      .join(lab.select(col("vec_id").as("v2"), col("label").as("l2")), "v2")
      .select(col("sim"), (col("l1") === col("l2")).as("same"))
      .localCheckpoint() // one pairing pass feeds every threshold
    val taus = tauPcts.sorted.toDF("tau_pct")
    val folded = pairs.crossJoin(broadcast(taus)) // |taus|-row broadcast
      .filter(col("sim") >= col("tau_pct").cast("double") / lit(100.0))
      .groupBy("tau_pct")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("same"), 1L).otherwise(0L)).as("n_same"))
    broadcast(taus).join(folded, Seq("tau_pct"), "left")
      .select(col("tau_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_same"), lit(0L)).as("n_same"),
        round(col("n_same").cast("double") / col("n_pairs"), 4).as("coherence4"))
      .orderBy("tau_pct")
  }

  /** EXT-C66 (`x165_source_pair_matrix`) — the near-dup SOURCE matrix:
    * banded-SimHash pair evidence folded to unordered (source, source)
    * cells — which ingests mirror which, counted in PAIRS (x128
    * measures the same phenomenon in shared token mass via chunk
    * digests; this is the direct pair-evidence view, with exact Hamming
    * mass per cell). The diagonal is within-source duplication (crawl
    * revisit s, boilerplate); off-diagonal cells are cross-source
    * mirrors — the cells a dedup-aware sampler has to treat as ONE
    * provenance pool. `pair_share4` situates each cell against the
    * corpus-wide pair total.
    *
    * Scale: the pair relation is the (tiny) banded evidence, never a
    * cross product; two doc_id equi-joins tag sources (AQE broadcasts
    * the pair side), one |sources|²-bounded fold, one 1-row totals
    * broadcast. The report is ≤ |sources|² rows.
    */
  def sourcePairMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val tagged = Dedup.simhashNearDupPairs(spark, dir)
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"), col("hamming"))
    val cells = tagged.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), sum("hamming").as("sum_hamming"))
    val total = cells.agg(sum("n_pairs").as("tot"))
    cells.crossJoin(broadcast(total)) // 1-row totals join
      .select(col("source_a"), col("source_b"), col("n_pairs"), col("sum_hamming"),
        round(col("n_pairs").cast("double") / col("tot"), 4).as("pair_share4"))
      .orderBy("source_a", "source_b")
  }

  /** EXT-C65 (`x164_mixture_temperature`) — training-mixture
    * temperature sweep: per source, the sampling weight under
    * `w_s ∝ share_s^α` for α ∈ {1, ½, ¼} — the standard knob that
    * flattens a web-dominated mixture toward rare-but-valuable sources
    * (α=1 is natural proportions; smaller α boosts the tail). α is
    * restricted to the halving ladder so the power spells as NESTED
    * `sqrt` on both faces — IEEE-754 requires sqrt correctly rounded,
    * so the un-normalized weights are BIT-identical across engines (a
    * `pow(x, 0.25)` spelling would be library-dependent). Output per
    * (α%, source): the census, natural share, normalized weight, and
    * the boost factor weight/share — the number a sampler multiplies
    * into its per-source rate.
    *
    * Scale: ONE corpus scan collapses to the |sources|-row census via
    * a partial agg; everything after (shares, powers, the per-α
    * normalizer) runs on |sources|·|α| rows — invisible at any corpus
    * size. The report is |sources|·|α| rows.
    */
  def mixtureTemperature(
      spark: SparkSession,
      dir: String,
      alphaPcts: Seq[Int] = Seq(100, 50, 25)): DataFrame = {
    require(alphaPcts.nonEmpty && alphaPcts.forall(Set(100, 50, 25)),
      s"alphaPcts (${alphaPcts.mkString(",")}) must come from {100, 50, 25} — " +
        "the exact nested-sqrt spellings")
    val census = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Tables.tokens(col("text"))).cast("long")).as("n_tokens"))
      .localCheckpoint() // |sources| rows, consumed once per alpha
    val total = census.agg(sum("n_tokens").as("tot"))
    val shares = census.crossJoin(broadcast(total)) // 1-row totals join
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot")).as("share"))
    val perAlpha = alphaPcts.map { a =>
      val w = a match {
        case 100 => col("share")
        case 50  => sqrt(col("share"))
        case 25  => sqrt(sqrt(col("share")))
      }
      shares.select(lit(a).as("alpha_pct"), col("source"), col("n_docs"),
        col("n_tokens"), col("share"), w.as("w_raw"))
    }.reduce(_ unionByName _)
    val norm = perAlpha.groupBy("alpha_pct").agg(sum("w_raw").as("z"))
    perAlpha.join(norm, Seq("alpha_pct"))
      .select(col("alpha_pct").cast("int").as("alpha_pct"), col("source"),
        col("n_docs"), col("n_tokens"),
        round(col("share"), 4).as("share4"),
        round(col("w_raw") / col("z"), 4).as("weight4"),
        round(col("w_raw") / col("z") / col("share"), 4).as("boost4"))
      .orderBy("alpha_pct", "source")
  }

  /** EXT-C64 (`x163_curation_funnel`) — the pipeline FUNNEL: doc and
    * token mass surviving each cumulative curation stage —
    * 1 raw → 2 quality keepers (x19's exact gate) → 3 dedup survivors
    * (drop non-canonical cluster members, x29's rule) → 4 the train
    * split (x21's bucket) — with each stage's fraction of raw. x29 IS
    * stage 4 as a per-doc relation; this is the capacity-planning
    * summary over the identical predicates (spec-pinned: the stage-4
    * doc count equals `curatedCorpus.count()`), answering the question
    * every 100 TB ingest starts with: how many training tokens does
    * this crawl actually yield, and which stage eats them.
    *
    * Scale: ONE corpus scan computes tokens + the quality flags
    * row-locally; the cluster labels (tiny) and split flag join on
    * doc_id; everything then collapses through a SINGLE 1-row partial
    * agg (8 conditional sums) exploded to the 4-row report — no
    * window, no second scan, shuffle carries one row per partition.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nonCanon = dedupClusters(spark, dir)
      .filter(col("cluster") =!= col("doc_id"))
      .select(col("doc_id"), lit(true).as("dup"))
    val flags = qualityProjection(docs)
      .select(col("doc_id"), col("keep"), col("n_tokens"))
      .join(nonCanon, Seq("doc_id"), "left")
      .join(splitAssign(spark, dir).select(col("doc_id"), col("split")), "doc_id")
      .select(col("n_tokens"), col("keep"),
        (col("keep") && col("dup").isNull).as("s3"),
        (col("keep") && col("dup").isNull && col("split") === "train").as("s4"))
    flags.agg(
        count(lit(1)).as("d1"), sum("n_tokens").as("t1"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("s3"), col("n_tokens")).otherwise(0L)).as("t3"),
        sum(when(col("s4"), 1L).otherwise(0L)).as("d4"),
        sum(when(col("s4"), col("n_tokens")).otherwise(0L)).as("t4"))
      .select(expr(
        "stack(4, 1, 'raw', d1, t1, 2, 'quality', d2, t2, " +
          "3, 'dedup', d3, t3, 4, 'train', d4, t4) AS (stage_ord, stage, n_docs, n_tokens)"),
        col("d1").as("rd"), col("t1").as("rt"))
      .select(col("stage_ord").cast("int").as("stage_ord"), col("stage"),
        col("n_docs"), col("n_tokens"),
        round(col("n_docs").cast("double") / col("rd"), 4).as("doc_frac4"),
        round(col("n_tokens").cast("double") / col("rt"), 4).as("tok_frac4"))
      .orderBy("stage_ord")
  }

  /** EXT-C59 (`x157_canonical_distance`) — per clustered doc, the BFS
    * hop distance to its cluster's canonical (the component-min doc)
    * through the near-dup graph: [[Graph.hopsFrom]] seeded with the
    * cluster labels themselves. Hops 1 = directly near-dup to the
    * canonical (safe drop); hops ≥ 2 = CHAIN-stitched into the family —
    * the member is a near-dup of a near-dup, the transitive-closure risk
    * x141's merge audit and x154's truss flag at cluster/edge level, now
    * priced per MEMBER (the re-verify queue ordered by how indirect the
    * duplication evidence is). Every clustered doc is reachable from its
    * own canonical by construction, so the report is total over x22's
    * membership.
    *
    * Scale: the pair relation is computed ONCE and shared by the
    * contraction and the BFS; rounds = the family eccentricity (the
    * O(log n)-ish handful every contraction round count already
    * demonstrates), each round one edge-keyed join + anti-join.
    */
  def canonicalDistance(spark: SparkSession, dir: String, maxHops: Int = 24): DataFrame = {
    val pairs = Dedup.simhashNearDupPairs(spark, dir)
      .select(col("d1"), col("d2")).localCheckpoint()
    val labels = Graph.connectedComponents(pairs).localCheckpoint()
    val hops = Graph.hopsFrom(pairs, labels.select(col("cluster").as("node")), maxHops)
    labels.join(hops, labels("doc_id") === hops("node"))
      .select(col("doc_id"), col("cluster"), col("hops"))
      .orderBy("doc_id")
  }

  /** EXT-C57 (`x155_incremental_clusters`) — incremental cluster MERGE:
    * fold a DELTA of new near-dup evidence into already-resolved labels
    * without re-clustering the corpus — the nightly-maintenance pattern
    * behind [[writeClusterIndex]]'s persisted labels. The delta here is
    * the threshold WIDENING from `tightHamming` to x22's 4: the tight
    * pass clusters the obvious near-identicals, then the borderline
    * pairs (hamming in (tight, 4]) merge in over the tight labels' STAR
    * EDGES — `CC(star(labels_tight) ∪ delta) == CC(pairs ≤ 4)` EXACTLY,
    * because each tight component's star edges connect exactly its
    * vertex set, so connectivity (and the min label) is preserved. The
    * oracle computes the ONE-SHOT ≤4 clustering, so every run proves the
    * incremental path reproduces the batch answer bit-for-bit.
    *
    * Output per doc clustered at ≤4: the merged label (≡ x22's), the
    * tight label (NULL if invisible at the tight threshold), and the two
    * flags a production merge reports — docs entering clustering for the
    * first time and docs whose canonical id changed.
    *
    * Scale: ONE banded pair pass feeds both thresholds (the split is a
    * row-local filter on the pair relation's hamming column); the merge
    * contraction runs over a star FOREST plus the delta — |clustered
    * docs| + |new pairs| edges, not a corpus re-pairing, which is the
    * entire point at a nightly cadence.
    */
  def incrementalClusters(
      spark: SparkSession,
      dir: String,
      tightHamming: Int = 2,
      maxRounds: Int = 30): DataFrame = {
    require(tightHamming >= 0 && tightHamming < 4,
      s"tightHamming ($tightHamming) must sit strictly inside [0, 4) to leave a delta")
    val pairs = Dedup.simhashNearDupPairs(spark, dir).localCheckpoint()
    val tight = Graph.connectedComponents(
      pairs.filter(col("hamming") <= tightHamming).select("d1", "d2"), maxRounds)
      .localCheckpoint() // consumed as star edges AND the report join
    val delta = pairs.filter(col("hamming") > tightHamming).select("d1", "d2")
    val merged = Graph.connectedComponents(
      tight.filter(col("doc_id") =!= col("cluster"))
        .select(col("cluster").as("d1"), col("doc_id").as("d2"))
        .union(delta), maxRounds)
    merged
      .join(tight.select(col("doc_id"), col("cluster").as("cluster_tight")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster"), col("cluster_tight"),
        col("cluster_tight").isNull.as("newly_clustered"),
        (coalesce(col("cluster_tight"), col("doc_id")) =!= col("cluster")).as("relabeled"))
      .orderBy("doc_id")
  }

  /** EXT-C53 (`x150_quality_auc`) — quality-signal DISCRIMINATION audit:
    * the exact tie-aware Mann–Whitney AUC of x7's quality score
    * separating near-duplicated documents (x50's dup-degree set) from
    * clean ones. AUC 0.5 = the score is blind to duplication; far from
    * 0.5 = the gate and the deduper are entangled — x19's threshold is
    * silently ALSO a dedup policy (it preferentially drops one class),
    * which decides whether quality filtering before or after dedup
    * changes the corpus. x115 asks whether two quality signals agree;
    * this asks whether one signal PREDICTS the dedup label, in the
    * single number a pipeline review thresholds.
    *
    * Exactness: `2U = Σ_pos (2·|neg below| + |neg tied|)` is an exact
    * BIGINT (ties at identical doubles — both engines compute the x7
    * quality spelling bit-identically); AUC is one guarded division.
    * The oracle spells the NAIVE |pos|×|neg| comparison, so every run
    * differentially proves the scan below.
    *
    * Scale (the x148 two-level discipline on a VALUE axis): quality is
    * bounded in [0, 1], so deltas bucket by `floor(q·B)`; level 1 ranks
    * (bucket, quality) CLASSES inside each bucket partition, level 2
    * prefixes per-bucket negative counts in the ONE global window —
    * over ≤ B aggregated rows, never the document stream. A naive
    * spelling would globally sort every distinct quality value.
    */
  def qualityAuc(spark: SparkSession, dir: String, buckets: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"buckets ($buckets) must be positive")
    val pos = Dedup.dupDegree(spark, dir).select(col("doc_id")).withColumn("is_dup", lit(true))
    val classes = TextAnalysis.statsProjection(spark, dir).select("doc_id", "quality")
      .join(pos, Seq("doc_id"), "left")
      .select(col("quality"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"),
        least(floor(col("quality") * buckets), lit(buckets - 1)).cast("long").as("bkt"))
      .groupBy("bkt", "quality")
      .agg(sum(when(col("is_dup"), 1L).otherwise(0L)).as("p"),
        sum(when(!col("is_dup"), 1L).otherwise(0L)).as("g"))
      .localCheckpoint() // consumed by both scan levels and the fold
    val wB = Window.partitionBy("bkt").orderBy("quality")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wG = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bktPrefix = classes.groupBy("bkt").agg(sum("g").as("gb"))
      .withColumn("neg_before", coalesce(sum("gb").over(wG), lit(0L)))
      .select("bkt", "neg_before")
    classes
      .withColumn("neg_below_in", coalesce(sum("g").over(wB), lit(0L)))
      .join(bktPrefix, Seq("bkt"))
      .agg(
        coalesce(sum("p"), lit(0L)).as("n_pos"),
        coalesce(sum("g"), lit(0L)).as("n_neg"),
        coalesce(sum(col("p") *
          (lit(2L) * (col("neg_before") + col("neg_below_in")) + col("g"))), lit(0L)).as("u2"))
      .withColumn("auc4",
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(round(col("u2").cast("double")
            / (lit(2.0) * (col("n_pos") * col("n_neg")).cast("double")), 4)))
  }

  /** EXT-C52 (`x147_dedup_savings`) — dedup ECONOMICS: the exact tokens
    * each dedup layer would reclaim, on one shared denominator. Three
    * rows — `doc` (x1's identical-text groups: every copy beyond the
    * keeper), `chunk` (x126's CDC digest census: every chunk instance
    * beyond the first — edit-stable partial duplication), `cluster`
    * (x22's near-dup components under keep-lowest-id: whole documents
    * beyond each canonical) — each with its unit count, dropped units,
    * dropped tokens, and the savings fraction of total corpus tokens.
    * The CDC chunker PARTITIONS each document's token stream, so the
    * chunk layer shares the doc layers' denominator exactly, and the
    * three fractions are directly comparable: this is the table that
    * decides WHICH dedup a corpus pays for (storage-dedup economics
    * read against training-data reality: `chunk − doc` is boilerplate
    * buried in distinct pages, `cluster − doc` is whole-page
    * templating).
    *
    * Laws (spec-pinned): identical texts share all chunks and collide
    * in SimHash, so `doc ≤ chunk` and `doc ≤ cluster` savings, exactly.
    *
    * Scale: three independent keyed folds (text digest / chunk digest /
    * cluster label) over the shared machinery — x1's, x126's and x22's
    * own shapes — collapsed to 1-row summaries joined to a 1-row
    * totals broadcast; nothing pairwise beyond x22's banded pairs.
    */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val withToks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        size(Tables.tokens(col("text"))).cast("long").as("n_toks"))
      .localCheckpoint() // consumed by all three layers + the totals
    val totals = withToks.agg(count(lit(1)).as("n_docs"), sum("n_toks").as("tok_total"))
    def summarize(layer: String, units: DataFrame, dropped: DataFrame): DataFrame =
      units.crossJoin(broadcast(dropped)).crossJoin(broadcast(totals))
        .select(lit(layer).as("layer"), col("n_units"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          col("tok_total"),
          coalesce(col("toks_dropped"), lit(0L)).as("toks_dropped"))
        .withColumn("savings_frac4",
          when(col("tok_total") === 0L, lit(null).cast("double"))
            .otherwise(round(coalesce(col("toks_dropped"), lit(0L)).cast("double")
              / col("tok_total"), 4)))
    // doc: identical-text groups — copies beyond the keeper, at the
    // group's (shared) token count
    val docLayer = summarize("doc",
      totals.select(col("n_docs").as("n_units")),
      withToks.groupBy(sha2(col("text"), 256))
        .agg(count(lit(1)).as("c"), min("n_toks").as("nt"))
        .agg(sum(col("c") - 1L).as("n_dropped"),
          sum((col("c") - 1L) * col("nt")).as("toks_dropped")))
    // chunk: digest census over CDC chunk instances
    val chunks = Dedup.cdcChunks(Tables.documents(spark, dir))
      .select("digest", "n_tokens").localCheckpoint()
    val chunkLayer = summarize("chunk",
      chunks.agg(count(lit(1)).as("n_units")),
      chunks.groupBy("digest")
        .agg(count(lit(1)).as("c"), min("n_tokens").as("nt"))
        .agg(sum(col("c") - 1L).as("n_dropped"),
          sum((col("c") - 1L) * col("nt")).as("toks_dropped")))
    // cluster: keep-lowest-id per x22 component — non-canonical members
    // drop at their OWN token counts (near-copies differ in length)
    val clusterLayer = summarize("cluster",
      totals.select(col("n_docs").as("n_units")),
      dedupClusters(spark, dir)
        .filter(col("doc_id") =!= col("cluster"))
        .join(withToks.select("doc_id", "n_toks"), "doc_id")
        .agg(count(lit(1)).as("n_dropped"), sum("n_toks").as("toks_dropped")))
    docLayer.unionByName(chunkLayer).unionByName(clusterLayer).orderBy("layer")
  }

  /** EXT-C50 (`x145_triangle_census`) — near-dup graph COHESION audit:
    * [[Graph.triangleCensus]] over x22's SimHash pair graph. The "should I
    * trust this cluster" signal the size histogram (x121) and purity
    * fold (x129) cannot see: a true template family is clique-like
    * (every copy pairs with every copy — cc ≈ 1), while a cluster
    * STITCHED by chains of borderline pairs (the x141 merge hazard, an
    * LSH banding artifact) has cc ≈ 0 at the junction nodes — exactly
    * the docs whose removal splits the cluster, and the principled
    * place to re-verify before x47 picks one representative for what
    * is actually two families.
    */
  def dupTriangles(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleCensus(Dedup.simhashNearDupPairs(spark, dir))

  /** EXT-C49 (`x141_cluster_stability`) — near-dup clustering STABILITY
    * between snapshots: the even-doc half (x93/x102's snapshot binding)
    * clustered ALONE vs the full corpus's clustering restricted to the
    * same docs, compared by exact pair-counting — together-in-both,
    * split-by-new, merged-by-new, apart-in-both, and the Rand index.
    * The drift family's clustering leg: x60 sees token drift, x127
    * length drift, x93 content churn — none of them sees "the new
    * crawl STITCHED my dedup clusters together" (a template family
    * spreading across previously-separate sites), which changes every
    * cluster-rep decision (x47) and drop count (x1/x131) before any
    * frequency moves. `merged_by_new` is that signal, exactly.
    *
    * The containment law (spec-pinned): a doc's SimHash does not
    * depend on other docs, so the old corpus's candidate pairs are
    * EXACTLY `nd_pairs` with both endpoints even — the new edge set is
    * a superset over the shared docs, components can only MERGE, and
    * `split_by_new` is provably 0. The operator still reports the cell
    * (it is generic over snapshot pairs; a genuinely re-crawled corpus
    * with CHANGED text would populate it) — a nonzero value under this
    * binding is a connected-components bug, which is precisely why the
    * oracle computes it too.
    *
    * Exactness: contingency pair-counting — `a = Σ C(n_ij, 2)` over
    * (old, new) label cells, marginals likewise, all BIGINT (`n·(n−1)`
    * is even, so the `div 2` is exact; safe to ~4e9 docs), Rand one
    * rounded division. Docs in no pair are their own singleton cluster
    * (labels coalesce to the doc id), so the universe is every shared
    * doc, not just the paired ones.
    *
    * Scale: ONE pair generation (checkpointed, consumed by both
    * contractions), two x22 contractions, then |cells|-bounded folds —
    * the contingency relation is bounded by cluster counts, never
    * pairwise.
    */
  def clusterStability(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame = {
    val pairs = Dedup.simhashNearDupPairs(spark, dir)
      .select(col("d1"), col("d2")).localCheckpoint()
    val newC = Graph.connectedComponents(pairs, maxRounds)
      .withColumnRenamed("cluster", "c_new")
    val oldC = Graph.connectedComponents(
        pairs.filter(pmod(col("d1"), lit(2)) === 0 && pmod(col("d2"), lit(2)) === 0),
        maxRounds)
      .withColumnRenamed("cluster", "c_old")
    val asg = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id")
      .join(oldC, Seq("doc_id"), "left")
      .join(newC, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("c_old"), col("doc_id")).as("c_old"),
        coalesce(col("c_new"), col("doc_id")).as("c_new"))
    pairCountingStability(asg)
  }

  /** The exact contingency pair-count over a `(doc_id, c_old, c_new)`
    * assignment relation — x141's fold, factored out so the Rand cell
    * algebra is spec-pinned on hand fixtures independently of the
    * SimHash pipeline that feeds it. |cells| rows after the first
    * groupBy; every downstream relation is 1-row. */
  def pairCountingStability(asg: DataFrame): DataFrame = {
    val cells = asg.groupBy("c_old", "c_new").agg(count(lit(1)).as("nij"))
      .localCheckpoint() // consumed by the cell fold and both marginals
    val a = cells.agg(sum(expr("nij * (nij - 1) div 2")).as("together_both"),
      sum("nij").as("n_docs"))
    val rowsTog = cells.groupBy("c_old").agg(sum("nij").as("ni"))
      .agg(sum(expr("ni * (ni - 1) div 2")).as("old_together"))
    val colsTog = cells.groupBy("c_new").agg(sum("nij").as("nj"))
      .agg(sum(expr("nj * (nj - 1) div 2")).as("new_together"))
    a.crossJoin(broadcast(rowsTog)).crossJoin(broadcast(colsTog))
      .select(col("n_docs"),
        expr("n_docs * (n_docs - 1) div 2").as("all_pairs"),
        col("together_both"),
        (col("old_together") - col("together_both")).as("split_by_new"),
        (col("new_together") - col("together_both")).as("merged_by_new"),
        (expr("n_docs * (n_docs - 1) div 2") - col("old_together")
          - col("new_together") + col("together_both")).as("apart_both"))
      .withColumn("rand4",
        when(col("all_pairs") === 0L, lit(null).cast("double"))
          .otherwise(round((col("together_both") + col("apart_both")).cast("double")
            / col("all_pairs"), 4)))
  }

  /** EXT-C48 (`x139_deletion_blast`) — right-to-be-forgotten BLAST
    * RADIUS: given a deletion set (the `doc_id % delMod = 0` sample —
    * the takedown batch), the exact count of derived artifacts each
    * curation layer must touch to honor it, one row per artifact class:
    *
    *  - `doc` — the deletion set itself over the corpus;
    *  - `chunk_digest` — CDC chunk digests whose ONLY provenance is
    *    deleted docs (they must be purged from every chunk index;
    *    digests shared with surviving docs stay — content the corpus
    *    still legitimately holds);
    *  - `cluster` — x22 near-dup clusters losing ≥ 1 member (their
    *    canonical representative may change);
    *  - `co_clustered_doc` — SURVIVING docs sharing a cluster with a
    *    deleted one (each needs re-canonicalization — deletion's reach
    *    beyond the deleted rows themselves, the number governance
    *    reviews actually ask for);
    *  - `pack_bin` — concat-cut bins (x39's geometry) at or after each
    *    language's first deleted doc: deleting a doc shifts every
    *    later doc in the lang, so the honest repack cost is the whole
    *    downstream tail, not one bin.
    *
    * Every count is an exact integer fold; `affected_frac4` is one
    * guarded IEEE division. The point of the relation is the ORDER of
    * magnitudes: chunk purges are narrow, repacking is broad — which
    * is why production layouts shard packs by ingest date (bounding
    * the tail) and key indexes by digest (making purges point lookups).
    *
    * Scale: five independent keyed folds (digest / cluster / lang),
    * each collapsing map-side; the cluster legs re-run the x22
    * contraction (the self-contained-query convention, x129's note);
    * nothing pairwise beyond it, output is 5 rows.
    */
  def deletionBlastRadius(
      spark: SparkSession,
      dir: String,
      delMod: Long = 50L,
      k: Int = 4,
      divisor: Long = 16L,
      budgetTokens: Long = 512L,
      maxRounds: Int = 30): DataFrame = {
    require(delMod >= 2, s"delMod ($delMod) must be >= 2")
    def isDel(c: Column): Column = pmod(c, lit(delMod)) === 0
    val docs = Tables.documents(spark, dir)
    val docAgg = docs.agg(
        sum(when(isDel(col("doc_id")), 1L).otherwise(0L)).as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("doc").as("artifact"), col("n_affected"), col("n_total"))
    val chunkAgg = Dedup.cdcChunks(docs, k, divisor)
      .groupBy("digest")
      .agg(
        max(when(isDel(col("doc_id")), 1L).otherwise(0L)).as("has_del"),
        max(when(!isDel(col("doc_id")), 1L).otherwise(0L)).as("has_kept"))
      .agg(
        sum(when(col("has_del") === 1L && col("has_kept") === 0L, 1L).otherwise(0L))
          .as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("chunk_digest").as("artifact"), col("n_affected"), col("n_total"))
    val clusters = dedupClusters(spark, dir, maxRounds)
      .localCheckpoint() // consumed by the cluster fold AND the co-member fold
    val perCluster = clusters.groupBy("cluster")
      .agg(
        max(when(isDel(col("doc_id")), 1L).otherwise(0L)).as("has_del"),
        count(lit(1)).as("n_members"),
        sum(when(!isDel(col("doc_id")), 1L).otherwise(0L)).as("n_kept"))
    val clusterAgg = perCluster.agg(
        sum(when(col("has_del") === 1L, 1L).otherwise(0L)).as("n_affected"),
        count(lit(1)).as("n_total"))
      .select(lit("cluster").as("artifact"), col("n_affected"), col("n_total"))
    val coAgg = perCluster.agg(
        sum(when(col("has_del") === 1L, col("n_kept")).otherwise(0L)).as("n_affected"),
        sum("n_members").as("n_total"))
      .select(lit("co_clustered_doc").as("artifact"), col("n_affected"), col("n_total"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packAgg = docs
      .select(col("lang"), col("doc_id"),
        size(Tables.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      .withColumn("bin", expr(s"(cum - tok) div $budgetTokens"))
      .groupBy("lang")
      .agg(max("bin").as("max_bin"),
        min(when(isDel(col("doc_id")), col("bin"))).as("min_del_bin"))
      .agg(
        sum(when(col("min_del_bin").isNull, 0L)
          .otherwise(col("max_bin") - col("min_del_bin") + 1L)).as("n_affected"),
        sum(col("max_bin") + 1L).as("n_total"))
      .select(lit("pack_bin").as("artifact"), col("n_affected"), col("n_total"))
    docAgg.unionAll(chunkAgg).unionAll(clusterAgg).unionAll(coAgg).unionAll(packAgg)
      .withColumn("affected_frac4",
        when(col("n_total") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_affected").cast("double") / col("n_total"), 4)))
      .orderBy("artifact")
  }

  /** EXT-C7 — incremental (cross-batch) exact dedup: treat odd doc_ids as
    * the newly-ingested batch and even doc_ids as the existing corpus;
    * keep only new documents whose content digest does not already exist
    * — the production shape for deduping a fresh crawl against an
    * accumulated corpus. One LEFT ANTI join on a 32-byte digest; the
    * existing-corpus side reduces to its distinct digests (map-side
    * partial agg), and at 100 TB the join shuffles by digest — or goes
    * broadcast/bloom when the digest set fits.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    val corpus = docs.filter(col("doc_id") % 2 === 0).select("digest").distinct()
    docs.filter(col("doc_id") % 2 === 1)
      .join(corpus, Seq("digest"), "left_anti")
      .select("doc_id", "digest")
      .orderBy("doc_id")
  }

  /** EXT-C8 — stratified deterministic sampling: per-language keep rates
    * (en 10%, everything else 25%) decided by a content-stable hash
    * bucket, never by `rand()` — reruns select the same rows, and the
    * sample composition is auditable. One narrow filter over the scan
    * (predicate reaches the parquet scan; no shuffle).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), md5Bucket("samp:").as("bucket"))
      .filter(col("bucket") < when(col("lang") === "en", 10L).otherwise(25L))
      .orderBy("doc_id")
  }

  /** EXT-C9 — the end-to-end curated corpus: the composition a training
    * run actually consumes. A document survives iff it (1) passes the
    * quality gate, (2) is its near-dup cluster's canonical representative
    * (or is unclustered), and (3) hashes into the train split. Each leg
    * is the operator defined above; the composition is three joins on
    * doc_id — quality and split semi-joins, cluster anti-join — all
    * narrow-keyed and AQE-broadcastable, so the corpus is scanned once
    * per leg and never self-joined.
    */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = qualityGate(spark, dir).filter(col("keep")).select("doc_id")
    val nonCanonical = dedupClusters(spark, dir)
      .filter(col("cluster") =!= col("doc_id")).select("doc_id")
    val train = hashSplit(spark, dir).filter(col("split") === "train").select("doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .join(quality, "doc_id")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .join(train, "doc_id")
      .orderBy("doc_id")
  }

  /** EXT-C10 — document-length histogram: counts per fixed-width
    * `n_chars` bucket. The scalable shape for distribution analysis at
    * corpus scale — one partial-agg groupBy on a derived integer key
    * (an exact-quantile sort would be a global sort; a histogram gives
    * the same curation signal for a shuffle of |buckets| rows).
    */
  def lengthHistogram(spark: SparkSession, dir: String, bucketWidth: Long = 50): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(expr(s"n_chars div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .withColumn("bucket_lo", col("bucket") * bucketWidth)
      .select("bucket", "bucket_lo", "n_docs", "min_chars", "max_chars")
      .orderBy("bucket")

  /** EXT-C11 — grouped top-k: the `k` highest-quality documents per
    * language (quality = the x19 measurements' score formula from
    * [[TextAnalysis.stats]]) — the standard "best examples per stratum"
    * shape for curriculum/eval-set selection.
    *
    * Spelled as a map-side bounded top-k aggregate
    * ([[graft.functions.TopKAggregator]]), NOT a `row_number` window —
    * the same argument as [[fixedSample]]: the window spelling shuffles
    * the ENTIRE scored corpus by lang before discarding all but k rows
    * per language; the aggregate folds each map partition down to ≤ k
    * candidates per stratum first, so the one exchange carries
    * ≤ |strata|·k rows per partition at any corpus size. The tie-break
    * (quality desc, doc_id asc) is exactly the aggregator's
    * (sim desc, cid asc) contract, and ranks fall out of the sorted
    * buffer by position.
    */
  def topDocsPerLang(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val agg = graft.functions.TopK.topk(k)
    TextAnalysis.statsProjection(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(agg(col("quality"), col("doc_id")).as("sel"))
      .select(col("lang"), posexplode(col("sel.entries")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.cid").as("doc_id"), col("col.sim").as("quality"))
      .orderBy("lang", "rank")
  }

  /** EXT-C12 — exact per-language median document length (lower median
    * for even counts, ties broken by doc_id): windowed rank + count over
    * the stratum key, keep the middle row. Exact order statistics on a
    * grouped relation — the shuffle is by the low-cardinality stratum
    * key, and each group sorts only its own rows (contrast the
    * histogram, which avoids even that when approximation suffices).
    */
  def medianChars(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    val cw = Window.partitionBy("lang")
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      // Column `/` is double division — cast back to the integer rank
      // ((cnt+1)/2 truncated = lower median, same as the oracle's `//`)
      .filter(col("rn") === ((col("cnt") + 1) / 2).cast("int"))
      .select(col("lang"), col("n_chars").as("median_chars"), col("cnt").as("n_docs"))
      .orderBy("lang")
  }

  /** EXT-C24 — quantile-sketch audit: per source, the EXACT discrete
    * p50/p90/p99 of document length next to a verdict that
    * `approx_percentile`'s answer respects its rank-error contract
    * (a KLL/GK-style sketch with accuracy `a` returns a value whose
    * RANK is within ±n/a of the target — so the verdict brackets the
    * sketch value between the exact order statistics at ranks
    * `⌈(p−ε)·n⌉` and `⌈(p+ε)·n⌉`, ε = 1/a, clamped to [1, n]; every
    * comparison is on integer n_chars, so the law is float-free).
    * Same audit contract as [[cardinalityAudit]]: the oracle recomputes
    * the exact columns and asserts the verdicts TRUE — a broken sketch
    * fails the hash check; the sketch's own (implementation-defined)
    * value never appears in the output.
    *
    * Exact quantile spelling: one (source)-window rank + count pass,
    * then `max(n_chars) WHERE rn ≤ r` per target rank folded in ONE
    * aggregation (rows are rank-ordered by n_chars, so the running max
    * at rank r IS the order statistic) — the same one-sort shape as
    * [[medianChars]], generalized to any rank set. The sketch runs in
    * the same aggregation over the same rows. Shuffle is by the
    * low-cardinality stratum key only.
    *
    * Scale: the exact leg is the audit's price (per-group sort), run at
    * eval scale to certify the sketch; production monitors run the
    * sketch alone — a fixed-size buffer per (partition, source) folded
    * map-side, the exchange carries |sources| sketches.
    */
  def quantileAudit(spark: SparkSession, dir: String, accuracy: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eps = 1.0 / accuracy
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val cw = Window.partitionBy("source")
    val ranked = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(cw))
    def rankAt(p: Double): Column =
      least(col("cnt"), greatest(lit(1L), ceil(lit(p) * col("cnt")).cast("long")))
    def valueAt(p: Double): Column = max(when(col("rn") <= rankAt(p), col("n_chars")))
    def ok(p: Double, approx: Column): Column =
      approx.between(valueAt(p - eps), valueAt(p + eps))
    val ps = Seq(0.5, 0.9, 0.99)
    val sketch = percentile_approx(
      col("n_chars"), array(ps.map(lit): _*), lit(accuracy))
    val aggCols =
      max(col("cnt")).as("n_docs") +:
        (ps.map(p => valueAt(p).as(s"exact_p${(p * 100).toInt}")) ++
          ps.zipWithIndex.map { case (p, i) =>
            ok(p, sketch.getItem(i)).as(s"ok_p${(p * 100).toInt}")
          })
    ranked.groupBy("source")
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy("source")
  }

  /** EXT-C13 — boilerplate n-gram measurement (the CCNet-style
    * repeated-content signal, at shingle granularity since the corpus
    * is single-line): flag, per document, how many of its distinct
    * 3-token shingles occur in at least `minDf` documents corpus-wide,
    * and the fraction of the document they cover. High fractions mean
    * templated/boilerplate content that survives near-dup detection
    * (shared headers, navigation, license blocks).
    *
    * Shape: one partial-agg document-frequency pass over the shingle
    * postings + one join back keyed by the shingle — both partial-agg
    * friendly; the per-doc fraction is a single IEEE division. Returns
    * only documents containing ≥ 1 hot shingle.
    */
  def boilerplateNgrams(
      spark: SparkSession,
      dir: String,
      minDf: Int = 3): DataFrame = {
    val arr = Dedup.shingleArrays(spark, dir)
    val sh = arr.select(col("doc_id"), col("n"), explode(col("shs")).as("gram"))
    val hot = sh.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("gram")
    sh.join(hot, "gram")
      .groupBy("doc_id", "n")
      .agg(count(lit(1)).as("n_boiler"))
      .select(col("doc_id"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n")).as("boiler_frac"))
      .orderBy("doc_id")
  }

  /** EXT-C6 — dataset-card aggregates: per (lang, source) document count,
    * total characters, total whitespace tokens, and mean characters per
    * document (one IEEE division over exact integer sums). One
    * partial-agg-friendly groupBy on low-cardinality keys — the shuffle
    * carries |lang|×|source| rows regardless of corpus size.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(Tables.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("n_toks").as("total_tokens"))
      .withColumn("mean_chars", col("total_chars").cast("double") / col("n_docs"))
      .orderBy("lang", "source")

  /** EXT-C20 — vocabulary-cardinality sketch per source: the DISTINCT
    * token count via HyperLogLog++ (`approx_count_distinct`) next to the
    * exact total. At 100 TB the exact distinct is a shuffle of every
    * unique token; the sketch is a partial aggregate — each map
    * partition folds to one fixed-size HLL register set per source, the
    * exchange carries |sources| sketches, and the relative error is the
    * configured `rsd`. The spec pins the error law against the exact
    * count at test scale (Spark's HLL++ is deterministic for a fixed
    * input set, so the bound is a stable assertion, but the VALUE is
    * implementation-defined — deliberately not oracle-compared, the
    * driver records the rows-only check).
    */
  def cardinalitySketch(spark: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(Tables.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(
        approx_count_distinct(col("tok"), rsd).as("approx_distinct_tokens"),
        count(lit(1)).as("n_tokens"))
      .orderBy("source")

  /** Driver-checkable AUDIT view of [[cardinalitySketch]]: the
    * deterministic measurements (exact `n_tokens`, exact distinct) plus
    * `sketch_ok` — whether the HLL++ estimate is within the 4·rsd error
    * law of the exact count (the same bound the spec pins; HLL++ is
    * deterministic for a fixed input, so the verdict is rerun-stable).
    * The sketch VALUE stays out of the output because it is
    * implementation-defined; the LAW is what an oracle can hold both
    * engines to — DuckDB recomputes the exact side independently and
    * asserts the verdict is TRUE, so a broken sketch fails the driver's
    * hash check rather than hiding behind a rows-only record.
    *
    * The exact-distinct leg is the audit's price: one distinct-token
    * shuffle that [[cardinalitySketch]] exists to avoid. That is the
    * point — the audit runs at eval scale to certify the sketch;
    * production runs the sketch alone.
    */
  def cardinalityAudit(spark: SparkSession, dir: String, rsd: Double = 0.05): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(Tables.tokens(col("text"))).as("tok"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("exact_distinct"),
        approx_count_distinct(col("tok"), rsd).as("approx"))
      .select(col("source"), col("n_tokens"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")).cast("double") <=
          lit(4 * rsd) * col("exact_distinct")).as("sketch_ok"))
      .orderBy("source")

  /** The per-token count relation behind [[tokenDrift]] and
    * [[topMovers]]: (tok, count_a, count_b) across the even/odd snapshot
    * split, with each side's total carried on every row via a 1-row
    * broadcast cross join. One partial-agg token shuffle; tokens absent
    * from one side count 0 there (the conditional sum, not an outer
    * join).
    */
  private def driftCounts(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select((col("doc_id") % 2).as("parity"), explode(Tables.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").agg(
      sum(when(col("parity") === 0, 1L).otherwise(0L)).as("count_a"),
      sum(when(col("parity") === 1, 1L).otherwise(0L)).as("count_b"))
    val totals = counts.agg(sum("count_a").as("na"), sum("count_b").as("nb"))
    counts.crossJoin(broadcast(totals))
  }

  /** EXT-C21 — corpus drift between two snapshots (even doc_ids = A,
    * odd = B): total-variation distance between the token frequency
    * distributions, computed in EXACT integer arithmetic —
    * `Σ|count_a·N_B − count_b·N_A|` over tokens, one IEEE division by
    * `2·N_A·N_B` at the end — so the oracle reproduces it bit-for-bit
    * (Σ|p−q| summed as floats would be order-sensitive). The
    * distribution-shift monitor a pipeline runs between crawls / before
    * a mixture change; TV = 0 iff identical relative frequencies,
    * 1 = disjoint vocabularies.
    *
    * Scale: one token-shuffle partial agg + a 1-row totals broadcast +
    * one grouped sum — nothing scales beyond the distinct-token relation.
    * The integer products bound: counts·N fit BIGINT up to ~3·10⁹ tokens
    * per side; beyond that, move the numerator to DECIMAL(38,0) —
    * the shape is unchanged.
    *
    * The final sum GROUPS BY the (constant-per-row) totals rather than
    * aggregating globally: an empty corpus then yields ZERO rows — the
    * oracle's `GROUP BY na, nb` contract — instead of Spark's one
    * all-null global-aggregate row, and no null-total "drift" ever
    * reaches a monitor.
    */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame =
    driftCounts(spark, dir)
      .groupBy(col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"))
      .agg(sum(abs(col("count_a") * col("nb") - col("count_b") * col("na"))).as("tv_numer"))
      .select(col("n_tokens_a"), col("n_tokens_b"), col("tv_numer"),
        (col("tv_numer").cast("double") /
          (lit(2.0) * col("n_tokens_a") * col("n_tokens_b"))).as("tv_distance"))

  /** EXT-C22 — the tokens DRIVING the drift: top-N by the exact
    * integer shift numerator `|count_a·N_B − count_b·N_A|` (ties to the
    * token, so the cut is deterministic). The diagnostic view read
    * next to [[tokenDrift]]'s single number — which vocabulary moved.
    * Top-N via sort-limit over the aggregated token relation only
    * (TakeOrdered folds map-side; the token stream never re-shuffles).
    */
  def topMovers(spark: SparkSession, dir: String, n: Int = 15): DataFrame =
    driftCounts(spark, dir)
      .select(col("tok"), col("count_a"), col("count_b"),
        abs(col("count_a") * col("nb") - col("count_b") * col("na")).as("shift_numer"))
      .orderBy(col("shift_numer").desc, col("tok"))
      .limit(n)

  /** One Bloom-filter probe position: bits [0, m) derived from the first
    * 8 hex chars (32 bits — exact through the string→long conv) of
    * `md5("bf" + i + ":" + digest)`. The oracle spells the identical
    * derivation; the per-operator seed prefix rule is the same as
    * [[md5Bucket]]'s.
    */
  private def bloomPos(digest: Column, i: Int, m: Int): Column = pmod(
    conv(substring(md5(concat(lit(s"bf$i:"), digest)), 1, 8), 16, 10).cast("long"),
    lit(m.toLong))

  /** JVM twin of [[bloomPos]] for the STREAMING probe (a broadcast
    * bit-set has no declarative spelling): first 8 hex chars of
    * `md5("bf" + i + ":" + digest)` = the digest's first 4 bytes
    * big-endian, unsigned, mod m. The batch/stream equivalence is
    * asserted in the streaming spec — the two derivations must never
    * drift.
    */
  private[graft] object BloomHash {
    private val digests: ThreadLocal[java.security.MessageDigest] =
      ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

    def pos(digest: String, i: Int, m: Int): Int = {
      val md = digests.get()
      md.reset()
      val d = md.digest(s"bf$i:$digest".getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (v % m).toInt
    }
  }

  /** A built Bloom filter: the bit-set TOGETHER with the (m, k) it was
    * built under. The parameters travel with the bits because probing
    * with a different m or k silently re-derives different positions —
    * a true duplicate could then miss a probe and the filter's central
    * no-false-negative guarantee would break without anything failing.
    */
  final case class BloomIndex(bits: Array[Long], m: Int, k: Int) {
    /** Row-local JVM probe: all k positions set? Null digests (null
      * document text) are never "maybe duplicates" — matching
      * [[bloomPrefilter]], where a null digest derives null positions,
      * matches nothing, and lands at n_hits = 0.
      */
    def mightContain(digest: String): Boolean = {
      if (digest == null) return false
      var i = 0
      var all = true
      while (all && i < k) {
        val p = BloomHash.pos(digest, i, m)
        all = ((bits(p >> 6) >>> (p & 63)) & 1L) == 1L
        i += 1
      }
      all
    }
  }

  /** Driver-side Bloom index build from a corpus digest relation — the
    * persisted-index step of the streaming ingest pipeline. The collect
    * is BOUNDED BY m bits by construction (the distinct position
    * relation, not the digests), so it is legitimate at any corpus size —
    * the same constant-size-broadcast argument as the IVF centroids.
    * Null digests (null document text) derive null positions and are
    * dropped here, matching both probe paths ([[BloomIndex.mightContain]]
    * and [[bloomPrefilter]]), which treat null as never-duplicate.
    */
  def buildBloomIndex(corpusDigests: DataFrame, m: Int = 65536, k: Int = 4): BloomIndex = {
    val bits = new Array[Long]((m + 63) / 64)
    corpusDigests
      .filter(col("digest").isNotNull)
      .select(explode(array((0 until k).map(bloomPos(col("digest"), _, m)): _*)).as("pos"))
      .distinct().collect()
      .foreach { r => val p = r.getLong(0).toInt; bits(p >> 6) |= 1L << (p & 63) }
    BloomIndex(bits, m, k)
  }

  /** EXT-C14 — Bloom-filter prefilter for incremental dedup: the scale
    * path BEFORE the exact anti-join of [[incrementalDedup]]. The corpus
    * digests are folded into a bit-set of at most `m` positions (`k`
    * hashes per digest); a new document is a *possible* duplicate only
    * if all `k` of its positions are set. At 100 TB the corpus digest
    * set is far too large to broadcast, but the Bloom relation is
    * BOUNDED BY `m` regardless of corpus size — so the cheap broadcast
    * probe discards the (typically vast) non-duplicate majority and only
    * `maybe_dup` survivors pay the shuffled exact anti-join.
    *
    * Output keeps both verdicts per new document — `maybe_dup` (Bloom)
    * and `is_dup` (exact) — so the false-positive behavior is itself
    * under test: Bloom guarantees `is_dup ⇒ maybe_dup`, never the
    * converse (also asserted as a law in the spec).
    */
  def bloomPrefilter(
      spark: SparkSession,
      dir: String,
      m: Int = 65536,
      k: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    val corpus = docs.filter(col("doc_id") % 2 === 0).select("digest").distinct()
      .localCheckpoint() // consumed twice: Bloom build + exact check
    // the "bit-set" as a relation of distinct set positions: ≤ m rows of
    // one long each — constant-bounded, hence always broadcastable
    val bloom = corpus
      .select(explode(array((0 until k).map(bloomPos(col("digest"), _, m)): _*)).as("pos"))
      .distinct()
    // consumed by two branches (probe hits + exact-verdict join): without
    // the materialization the fresh scan and its sha256 run twice
    val fresh = docs.filter(col("doc_id") % 2 === 1).localCheckpoint()
    val hits = fresh
      .select(col("doc_id"),
        explode(array((0 until k).map(bloomPos(col("digest"), _, m)): _*)).as("pos"))
      .join(broadcast(bloom), Seq("pos"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    fresh
      .join(hits, Seq("doc_id"), "left_outer")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("maybe_dup", col("n_hits") === k)
      // the exact verdict — at scale this join would run over the
      // maybe_dup survivors only; both verdicts are kept here so the
      // oracle checks the Bloom semantics themselves
      .join(corpus.withColumn("in_corpus", lit(true)), Seq("digest"), "left_outer")
      .withColumn("is_dup", coalesce(col("in_corpus"), lit(false)))
      .select("doc_id", "n_hits", "maybe_dup", "is_dup")
      .orderBy("doc_id")
  }

  /** EXT-C16 — fixed-BUDGET deterministic sample: exactly `k` documents
    * per stratum (language), chosen by content-stable hash order — the
    * complement of the rate-based [[stratifiedSample]] for when the
    * contract is "give me 10k eval docs per language", not a percentage.
    *
    * Spelled as a map-side bounded top-k aggregate
    * ([[graft.functions.TopKAggregator]] over the NEGATED hash — smallest
    * draws win), NOT a `row_number` window: the window spelling shuffles
    * the ENTIRE corpus by stratum before discarding all but k rows per
    * language; the aggregate folds each map partition down to ≤ k
    * candidates per stratum first, so the one exchange carries
    * ≤ |strata|·k rows per partition at any corpus size. The 32-bit draw
    * is exact through the double negation (and ties break toward the
    * lower doc_id, mirroring the oracle's `ORDER BY u, doc_id`).
    */
  def fixedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val agg = graft.functions.TopK.topk(k)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), md5Draw("fsamp:").as("u"))
      .groupBy("lang")
      .agg(agg(negate(col("u").cast("double")), col("doc_id")).as("sel"))
      .select(col("lang"), posexplode(col("sel.entries")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.cid").as("doc_id"), negate(col("col.sim")).cast("long").as("u"))
      .orderBy("lang", "rank")
  }

  /** EXT-C15 — quality-weighted deterministic sampling: keep probability
    * proportional to the document's quality score (`rate · quality`),
    * decided by the same content-stable md5 bucketing as
    * [[stratifiedSample]] — never `rand()`. The comparison is spelled in
    * exact integer space: a 32-bit hash draw `u` against
    * `floor((rate · quality) · 2³²)` — two IEEE multiplies (the second by
    * a power of two, hence exact) and a floor, bit-reproducible in the
    * oracle. The shape every "sample high-quality data more" curriculum
    * pass uses; one narrow row-local filter, no shuffle.
    */
  def weightedSample(spark: SparkSession, dir: String, rate: Double = 0.3): DataFrame = {
    TextAnalysis.statsProjection(spark, dir)
      .select(col("doc_id"), col("quality"))
      .withColumn("u", md5Draw("wsamp:"))
      .withColumn("threshold",
        floor((lit(rate) * col("quality")) * lit(4294967296.0)).cast("long"))
      .withColumn("keep", col("u") < col("threshold"))
      .select("doc_id", "quality", "u", "threshold", "keep")
      .orderBy("doc_id")
  }

  /** EXT-C28 — DSIR-style hashed importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how much its token distribution looks
    * like a designated TARGET slice (here the `targetSource` documents —
    * the stand-in for "quality domain we want more of"), using hashed
    * unigram BUCKETS so the feature space is fixed-width no matter the
    * vocabulary — DSIR's actual trick, and the 100 TB one: `numBuckets`
    * bounds both count relations regardless of corpus size.
    *
    * Exact-arithmetic cousin of DSIR's log-likelihood ratio, the same
    * substitution [[TextAnalysis.bigramLm]] makes for KenLM perplexity:
    * instead of `Σ log(p_target(b)/p_raw(b))` (order-sensitive float
    * sum, libm-dependent), each document pools BIGINT count masses —
    * `t_mass = Σ tc(b)`, `r_mass = Σ rc(b)` over its token positions —
    * and `importance = (t_mass · N_raw) / (r_mass · N_target)` is two
    * IEEE multiplies and one division on exact integers, > 1 iff the
    * document's buckets are disproportionately target-mass. Downstream
    * resampling composes with the house samplers (x45's weighted gate,
    * x46's budgeted top-k) rather than being baked in here.
    *
    * Plan: ONE hashed-token stream (compiled
    * [[graft.functions.WindowHashes]] k=1, bucketed by `pmod`),
    * materialized once and consumed four ways: the two bucket-count
    * aggregations (partial-agg groupBys, output ≤ numBuckets rows — AQE
    * broadcasts them back), the two scalar totals (one row), and the
    * scoring join + one doc_id partial agg. Linear in corpus tokens;
    * nothing pairs documents; no global sort (presentation `orderBy`
    * aside). A bucket absent from the target LEFT-joins to tc=0 —
    * smoothing is the caller's choice via the importance floor, not
    * hidden arithmetic.
    */
  def importanceWeights(
      spark: SparkSession,
      dir: String,
      targetSource: String = "src0",
      numBuckets: Long = 65536L): DataFrame = {
    require(numBuckets > 0, "numBuckets must be positive")
    val isTarget = col("source") === targetSource
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.WindowHashes.windowHashes(
          Tables.tokens(col("text")), 1)).as("h"))
      .select(col("doc_id"), col("source"),
        pmod(col("h"), lit(numBuckets)).as("b"))
      .localCheckpoint() // four consumers of one linear token pass
    val rc = s.groupBy("b").agg(count(lit(1)).as("rc"))
    val tc = s.filter(isTarget).groupBy("b").agg(count(lit(1)).as("tc"))
    val tot = s.agg(
      count(lit(1)).as("nr"),
      sum(when(isTarget, 1L).otherwise(0L)).as("nt"))
    s.join(rc, "b")
      .join(tc, Seq("b"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        sum(coalesce(col("tc"), lit(0L))).as("t_mass"),
        sum(col("rc")).as("r_mass"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_toks"), col("t_mass"), col("r_mass"),
        ((col("t_mass").cast("double") * col("nr")) /
          (col("r_mass").cast("double") * col("nt"))).as("importance"))
      .orderBy("doc_id")
  }

  /** The trained artifact of [[importanceWeights]], packaged for the
    * streaming ingest gate ([[graft.streaming.StreamOps.importanceGateStream]])
    * — the same train-batch/serve-stream contract as the k-means
    * centroids (EXT-6i): the model is fitted once on the batch corpus
    * and shipped to executors as a broadcast. Both count maps are
    * bounded by `numBuckets` REGARDLESS of corpus size (DSIR's hashing
    * trick is exactly what makes the model broadcastable), so the
    * driver-side collect is bounded by construction, not by data.
    */
  case class ImportanceModel(
      targetSource: String,
      numBuckets: Long,
      nRaw: Long,
      nTarget: Long,
      rawCounts: Map[Long, Long],
      targetCounts: Map[Long, Long]) {
    require(numBuckets > 0, "numBuckets must be positive")

    /** Score one document's bucket ids — the exact arithmetic of
      * [[importanceWeights]] (pooled BIGINT masses, one IEEE ratio).
      * Buckets the training corpus never saw contribute no mass; a
      * document with zero raw mass (entirely unseen vocabulary) scores
      * 0.0 — the training distribution offers no evidence for it.
      */
    def score(buckets: Seq[Long]): (Long, Long, Double) = {
      var t = 0L
      var r = 0L
      buckets.foreach { b =>
        t += targetCounts.getOrElse(b, 0L)
        r += rawCounts.getOrElse(b, 0L)
      }
      val imp =
        if (r == 0L) 0.0 else (t.toDouble * nRaw) / (r.toDouble * nTarget)
      (t, r, imp)
    }
  }

  /** EXT-C32 (x93) — corpus snapshot diff: the incremental-pipeline
    * audit "what changed between yesterday's corpus and today's?". Two
    * snapshots (derived deterministically from the harness corpus: OLD
    * drops doc_id ≡ 0 (mod 3), NEW drops ≡ 1 (mod 3) and rewrites every
    * doc_id ≡ 0 (mod 5) — so all four statuses occur) are compared by
    * content digest under a full-outer doc_id join and folded to
    * per-(source, status) counts with total affected chars.
    *
    * Scale: doc_id is unique on both sides, so the full-outer join is a
    * skew-free equi-shuffle — at 100 TB both snapshots co-partition on
    * doc_id (bucketed layouts make it shuffle-free) and the comparison
    * carries only (doc_id, digest, source, n_chars), never text: the
    * sha2 digest folds each document to 32 bytes AT THE SCAN, so the
    * exchange is ~50 B/row regardless of document size. Output is
    * |sources| × 4 rows. The digest-compare beats a text-compare by the
    * mean document length (~KB → 32 B) and is what a production CDC diff
    * ships anyway.
    */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = docs.where(pmod(col("doc_id"), lit(3L)) =!= 0L)
      .select(col("doc_id"), col("source"), col("n_chars"),
        sha2(col("text"), 256).as("digest"))
    val neu = docs.where(pmod(col("doc_id"), lit(3L)) =!= 1L)
      .select(col("doc_id"), col("source"), col("n_chars"),
        sha2(when(pmod(col("doc_id"), lit(5L)) === 0L,
          concat(col("text"), lit(" v2"))).otherwise(col("text")), 256).as("digest"))
    old.as("o").join(neu.as("n"), col("o.doc_id") === col("n.doc_id"), "full_outer")
      .select(
        coalesce(col("o.source"), col("n.source")).as("source"),
        when(col("o.doc_id").isNull, "added")
          .when(col("n.doc_id").isNull, "removed")
          .when(col("o.digest") =!= col("n.digest"), "changed")
          .otherwise("same").as("status"),
        coalesce(col("n.n_chars"), col("o.n_chars")).as("chars"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("total_chars"))
      .orderBy("source", "status")
  }

  /** EXT-C33 (x95) — gate-attrition funnel: the curation-pipeline audit
    * that says WHICH quality gate is doing the filtering. For the four
    * [[qualityProjection]] rules applied in their documented order
    * (len → avg → stop → rep), each output row reports the docs entering
    * that gate (survivors of the earlier ones), dropped at it, and
    * surviving it — plus `n_sole_blocker`: docs failing ONLY that gate,
    * the count that tells a curator "relaxing this one threshold
    * recovers exactly N documents" (the funnel drop alone can't, because
    * a doc dropped at gate 2 may also fail gate 4).
    *
    * Scale: one row-local measurement pass (the same compiled
    * hash-count pass x19 runs) folded by conditional partial aggregation
    * into ONE driver row, restacked to 4 gate rows — no shuffle wider
    * than a single-row exchange, no second corpus pass, at any corpus
    * size. This is the cheapest possible spelling: the funnel is
    * arithmetic over 9 conditional counts.
    */
  def gateAttrition(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityProjection(Tables.documents(spark, dir))
    val agg = q.agg(
      count(lit(1)).as("n0"),
      sum(when(col("r_len"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("r_len") && col("r_avg"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("r_len") && col("r_avg") && col("r_stop"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("s4"),
      sum(when(!col("r_len") && col("r_avg") && col("r_stop") && col("r_rep"), 1L)
        .otherwise(0L)).as("b1"),
      sum(when(col("r_len") && !col("r_avg") && col("r_stop") && col("r_rep"), 1L)
        .otherwise(0L)).as("b2"),
      sum(when(col("r_len") && col("r_avg") && !col("r_stop") && col("r_rep"), 1L)
        .otherwise(0L)).as("b3"),
      sum(when(col("r_len") && col("r_avg") && col("r_stop") && !col("r_rep"), 1L)
        .otherwise(0L)).as("b4"))
    agg.select(expr(
      """stack(4,
        |  1L, 'len',  n0, s1, b1,
        |  2L, 'avg',  s1, s2, b2,
        |  3L, 'stop', s2, s3, b3,
        |  4L, 'rep',  s3, s4, b4
        |) AS (gate, rule, n_in, n_out, n_sole_blocker)""".stripMargin))
      .select(col("gate"), col("rule"), col("n_in"), (col("n_in") - col("n_out")).as("n_dropped"),
        col("n_out"), col("n_sole_blocker"))
      .orderBy("gate")
  }

  /** EXT-C34 (x97) — sublinear per-source caps: web-corpus domain
    * balancing, where a source with n documents keeps only ~√n of them
    * so no single crawl domain dominates the mixture (the √-law is the
    * standard web-dedup pick; any concave law slots in).
    *
    * The SCALE trick is that the cap needs no per-source ranking: keep
    * doc iff its content-stable 32-bit draw < ⌊2³² / √n⌋ — an expected
    * √n survivors per source with zero windows, zero per-source sorts,
    * and zero skew sensitivity (a 10⁹-doc domain and a 10-doc domain
    * cost the same row-local compare). The |sources|-row count relation
    * broadcasts; the corpus side is one filter pass. The exact-quota
    * spelling (row_number ≤ √n per source) needs a full shuffle+sort by
    * source — the Zipf-skewed web makes that one hot partition per
    * mega-domain; the thresholded spelling is how it ships at 100 TB.
    * Deterministic: the draw is md5 of a seeded doc_id, so replays and
    * both engines agree exactly.
    */
  def domainCaps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_source"))
    docs.select(col("doc_id"), col("source"), md5Draw("cap:").as("draw"))
      .join(broadcast(counts), "source")
      .where(col("draw") < floor(lit(4294967296.0) / sqrt(col("n_source").cast("double"))))
      .select(col("doc_id"), col("source"), col("n_source"))
      .orderBy("doc_id")
  }

  /** EXT-C35 (x98) — dedup survivor-bias audit: does near-dup removal
    * (x22's cluster resolution keeping the lowest-id canonical) shift
    * the quality profile of what remains? Compares kept vs removed
    * cohorts on exact counts and integer sums (docs, chars, tokens,
    * quality-gate pass rate) — the audit a curation pipeline runs before
    * trusting that dedup didn't silently discard its best documents
    * (duplicated content is often HIGH quality — boilerplate licenses,
    * canonical references — so the removed cohort's profile matters).
    *
    * Scale: the cluster relation is bounded by the near-dup evidence
    * (vanishingly small next to the corpus), so the membership join is
    * a broadcast; the cohort fold is a 2-row aggregate over one
    * row-local measurement pass. Means are single IEEE divisions of
    * exact integer sums — oracle-stable.
    */
  def survivorBias(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir)
      .where(col("cluster") =!= col("doc_id"))
      .select(col("doc_id"), lit(true).as("removed"))
    // qualityAnnotated keeps n_chars alongside the measurements — one
    // corpus pass, no self-join back for the metadata column
    qualityAnnotated(Tables.documents(spark, dir))
      .join(broadcast(clusters), Seq("doc_id"), "left_outer")
      .select(
        when(coalesce(col("removed"), lit(false)), "removed").otherwise("kept").as("cohort"),
        col("n_chars"), col("n_tokens"), col("keep"))
      .groupBy("cohort")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_pass"))
      .select(col("cohort"), col("n_docs"), col("total_chars"), col("total_tokens"),
        (col("total_chars").cast("double") / col("n_docs")).as("mean_chars"),
        (col("total_tokens").cast("double") / col("n_docs")).as("mean_tokens"),
        (col("n_quality_pass").cast("double") / col("n_docs")).as("quality_pass_rate"))
      .orderBy("cohort")
  }

  /** EXT-C36 (x99) — Bloom false-positive-rate audit: the measured-FPR
    * leg that completes the sketch-audit family (HLL x59, quantiles
    * x67, CMS x73, SpaceSaving x78 — the Bloom prefilter x42 was the
    * one sketch without an audit row). Aggregates the x42 relation to
    * ONE row of exact counts: probes, flagged, true duplicates, false
    * positives, false NEGATIVES (which the Bloom theorem says must be
    * zero — emitted so the oracle holds both engines to the law, not
    * just to each other), and the measured FPR over true negatives as
    * a single IEEE division. The theoretical (1−e^{−kn/m})^k bound is
    * deliberately NOT computed here — transcendentals are not
    * oracle-exact across engines; the spec checks the bound in Scala,
    * the relation carries the exact measurements.
    *
    * Scale: everything the audit adds over x42 is a 1-row conditional
    * aggregate; the underlying relation keeps x42's shape (≤ m-row
    * broadcast bit-set relation, never a corpus-side shuffle wider
    * than the digest agg). Production sizes (m, k) off this audit at
    * eval scale, then runs the prefilter alone.
    */
  def bloomFprAudit(
      spark: SparkSession,
      dir: String,
      m: Int = 65536,
      k: Int = 4): DataFrame =
    bloomPrefilter(spark, dir, m, k)
      .agg(
        count(lit(1)).as("n_probes"),
        sum(when(col("maybe_dup"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_dups"),
        sum(when(col("maybe_dup") && !col("is_dup"), 1L).otherwise(0L)).as("n_false_pos"),
        sum(when(col("is_dup") && !col("maybe_dup"), 1L).otherwise(0L)).as("n_false_neg"))
      .select(
        col("n_probes"), col("n_flagged"), col("n_true_dups"),
        col("n_false_pos"), col("n_false_neg"),
        when(col("n_probes") === col("n_true_dups"), lit(0.0))
          .otherwise(col("n_false_pos").cast("double") /
            (col("n_probes") - col("n_true_dups"))).as("fpr"),
        (col("n_false_neg") === 0L).as("no_false_negatives"))

  /** Fit the [[ImportanceModel]] on the batch corpus: ONE hashed-token
    * pass folded to the ≤ `numBuckets`-row (bucket, rc, tc) relation by
    * partial agg, collected driver-side (bounded by `numBuckets` — see
    * the ImportanceModel scaladoc for why that bound is structural).
    * Same hash, same bucketing, same counts as [[importanceWeights]] —
    * exact integers, so the two spellings cannot drift.
    */
  def trainImportanceModel(
      spark: SparkSession,
      dir: String,
      targetSource: String = "src0",
      numBuckets: Long = 65536L): ImportanceModel = {
    require(numBuckets > 0, "numBuckets must be positive")
    val isTarget = col("source") === targetSource
    val rows = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.WindowHashes.windowHashes(
          Tables.tokens(col("text")), 1)).as("h"))
      .select(col("source"), pmod(col("h"), lit(numBuckets)).as("b"))
      .groupBy("b")
      .agg(
        count(lit(1)).as("rc"),
        sum(when(isTarget, 1L).otherwise(0L)).as("tc"))
      .collect() // ≤ numBuckets rows by construction
    val rc = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tc = rows.collect {
      case r if r.getLong(2) > 0L => r.getLong(0) -> r.getLong(2)
    }.toMap
    ImportanceModel(targetSource, numBuckets,
      rc.values.sum, tc.values.sum, rc, tc)
  }

  /** EXT-C40 (`x115_signal_agreement`) — quality-signal agreement audit:
    * per source, the Spearman rank correlation between two INDEPENDENT
    * quality signals — idf-mass rarity (x70's `mean_rarity`, the
    * vocabulary-level signal) and distinct-bigram ratio (x20's
    * `distinct_ratio`, the word-order-level signal). The audit a
    * pipeline reads before swapping a cheap gate for an expensive one
    * (or before stacking both): high agreement means the second signal
    * is redundant; low agreement means the gates prune DIFFERENT
    * documents and the funnel (x95) will show compounding attrition.
    *
    * Exactness spelling: both signals are ranked on their ROUNDED
    * 4-decimal values with the doc_id tie-break (x114's convention —
    * both engines rank the identical doubles identically, and the
    * tie-break makes each rank a permutation, so the classical
    * `rho = 1 − 6·Σd² / (n·(n²−1))` applies with Σd² an exact BIGINT;
    * the denominator is evaluated in double with a fixed association
    * `n·(n·n − 1)` so both engines run the identical IEEE expression).
    * Sources with n < 2 report rho NULL (zero denominator), never NaN.
    *
    * Plan: the two signal relations are the unsorted `*Assign` variants
    * (no presentation sorts under the join); the domain is their INNER
    * join (docs with ≥ 2 tokens — where both signals are defined);
    * then ONE shuffle keyed by source carries the two rank windows
    * (same partition key, two in-partition sorts) and the final fold is
    * |sources| rows. The signal relations are themselves one corpus
    * pass each (x70's integer backbone, x20's compiled row-local
    * expression) — nothing in the agreement layer grows past |corpus|
    * rows, and the rank window keys by source, not globally.
    */
  def signalAgreement(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select("doc_id", "source")
    val a = graft.operators.TextAnalysis.rarityAssign(spark, dir)
      .select(col("doc_id"), round(col("mean_rarity"), 4).as("a4"))
    val b = repetitionAssign(spark, dir)
      .select(col("doc_id"), round(col("distinct_ratio"), 4).as("b4"))
    val wA = Window.partitionBy("source").orderBy(col("a4"), col("doc_id"))
    val wB = Window.partitionBy("source").orderBy(col("b4"), col("doc_id"))
    val nd = col("n").cast("double")
    docs.join(a, "doc_id").join(b, "doc_id")
      .withColumn("ra", row_number().over(wA).cast("long"))
      .withColumn("rb", row_number().over(wB).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("sum_d2"))
      .withColumn("rho",
        when(col("n") < 2L, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            lit(6.0) * col("sum_d2").cast("double") / (nd * (nd * nd - lit(1.0)))))
      .select("source", "n", "sum_d2", "rho")
      .orderBy("source")
  }

  /** EXT-C41 (`x121_cluster_sizes`) — near-dup cluster DEMOGRAPHICS: the
    * size histogram of x22's connected components, singletons included
    * (every document outside any component is its own size-1 cluster —
    * the left-anti complement, so the histogram's doc mass covers the
    * corpus exactly). What x22's per-document labels can't show at a
    * glance: whether duplication lives in a long tail of pairs (benign
    * — the LEFT-ANTI dedup families handle it linearly) or in a few
    * giant clusters (the boilerplate/mirror signature — where the
    * star-contraction round count and the per-cluster rep selection
    * (x47) start to matter, and where a bucket-saturation guard will
    * fire first). Published dedup reports lead with exactly this
    * distribution because its head shape decides the dedup strategy.
    *
    * Output: `(cluster_size, n_clusters, n_docs, docs_share4)` ordered
    * by size; `docs_share4` is one IEEE division of exact BIGINTs.
    *
    * Plan: the component labels are x22's (star contraction, plan
    * contract pinned there); on top of them the histogram is two
    * |clusters|-bounded folds plus the 1-row corpus total broadcast and
    * the singleton count derived by difference — nothing here re-scans
    * text or grows past |clusters| rows.
    */
  def clusterSizes(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame = {
    val labels = dedupClusters(spark, dir, maxRounds)
    val sizes = labels.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    val hist = sizes.groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_total")).select("n_total")
    val nClustered = labels.agg(count(lit(1)).as("n_clustered"))
    // components have >= 2 members by construction (every member has an
    // edge), so the size-1 bucket is exactly the unpaired complement
    val singles = nDocs.crossJoin(nClustered)
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_clustered")).as("n_clusters"))
      .filter(col("n_clusters") > 0L)
    hist.unionByName(singles)
      .crossJoin(broadcast(nDocs))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        round((col("cluster_size") * col("n_clusters")).cast("double") /
          col("n_total"), 4).as("docs_share4"))
      .orderBy("cluster_size")
  }

  /** EXT-C42 (`x123_lang_purity`) — per-source language-mix purity: the
    * document count, distinct languages, the majority language and its
    * share, and the GINI impurity `1 − Σ (n_l/n)²` — spelled as the
    * exact rational `(n² − Σ n_l²) / n²` so both engines evaluate one
    * IEEE division of exact BIGINTs (the repo-wide exactness
    * convention; the entropy spelling would need `ln`, an
    * engine-specific libm call). The mislabeled-scrape detector: a
    * "source" is usually one crawl pipeline with one dominant language,
    * so high impurity either flags boilerplate-heavy multilingual spam
    * or a language-ID model drifting on that domain (x8/x17's output
    * feeding back) — and the mixture weights x48/x68 plan with are only
    * as good as the per-source language labels this audits.
    *
    * Plan: one (source, lang) fold — the wire carries |sources|·|langs|
    * rows, never documents — then a |sources|-row fold where the
    * majority pick is the partial-agg-friendly `max(struct(n_l, lang))`
    * (ties to the LEXICALLY GREATER language — struct-max's natural
    * order, mirrored exactly in the oracle's arg-max spelling).
    */
  def langPurity(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("n_l"))
    cells.groupBy("source")
      .agg(
        sum("n_l").as("n_docs"),
        count(lit(1)).as("n_langs"),
        max(struct(col("n_l"), col("lang"))).as("m"),
        sum(col("n_l") * col("n_l")).as("sum_sq"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("m.lang").as("majority_lang"),
        round(col("m.n_l").cast("double") / col("n_docs"), 4).as("majority_share4"),
        round((col("n_docs") * col("n_docs") - col("sum_sq")).cast("double") /
          (col("n_docs") * col("n_docs")), 4).as("gini4"))
      .orderBy("source")
  }

  /** EXT-C43 (`x124_rare_cell_suppression`) — k-anonymity-style rare-
    * combination suppression: every `(lang, source)` cell with its
    * population and a `suppress` verdict for cells below `k`, plus the
    * kept-document count the release would ship. The privacy-adjacent
    * curation gate: a cell rare enough to fingerprint its members
    * (the quasi-identifier argument) is also rare enough to be noise
    * for mixture planning — so the suppression list doubles as the
    * "domains too thin to weight" report feeding x48/x72. Generalizes
    * by key composition: any quasi-identifier tuple in place of
    * (lang, source), same one-fold plan.
    *
    * Plan: ONE (lang, source) fold — |cells| rows on the wire, the
    * verdict and kept count are row-local arithmetic on the cell
    * relation. Nothing grows with the corpus past the first partial
    * aggregation.
    */
  def rareCellSuppression(spark: SparkSession, dir: String, k: Long = 25L): DataFrame = {
    require(k >= 1L, s"k ($k) must be positive")
    Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
      .withColumn("suppress", col("n_docs") < k)
      .withColumn("kept_docs",
        when(col("suppress"), 0L).otherwise(col("n_docs")))
      .orderBy("lang", "source")
  }

  /** EXT-C46 (`x132_decontamination_repair`) — span-level
    * decontamination REPAIR: instead of dropping every document that
    * quotes the benchmark (x18's verdict), excise exactly the quoted
    * SPANS — x108's consecutive benchmark-k-gram runs of length ≥
    * `minRun` (a run of r gram positions covers r+k−1 tokens) — and
    * rebuild the document from its surviving tokens. The repair x84
    * performs for boilerplate, applied to eval contamination: a
    * 10k-token page quoting one GSM8K problem keeps its 9.9k clean
    * tokens instead of dying whole, which at corpus scale is the
    * difference between decontamination costing ~0% and ~x18's drop
    * rate of usable text. `minRun` = 2 means a quote must span ≥ k+1
    * tokens — a single isolated shared k-gram is vocabulary
    * coincidence (x49's graded-overlap argument), not a quote.
    *
    * Output per NON-benchmark document: token count, removed tokens,
    * excised runs, a `clean` verdict, and the repaired text (empty when
    * everything was quoted — x84's convention; documents absent from a
    * snapshot never are: every non-benchmark doc stays visible).
    *
    * Plan: x108's positioned gram stream and run detection verbatim
    * (broadcast benchmark membership prunes to hit positions BEFORE
    * the one doc-keyed shuffle); covered token positions expand
    * row-locally from the |runs| relation (runs closer than k overlap
    * in token space — the DISTINCT absorbs it); the rebuild is x84's
    * shape — LEFT ANTI against covered positions, one doc-keyed
    * `collect_list` bounded by tokens-per-document, `array_sort` for
    * shuffle-independent order. Linear end to end, nothing pairwise.
    */
  def decontaminationRepair(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      benchMod: Int = 20,
      minRun: Int = 2): DataFrame = {
    require(k >= 1 && benchMod >= 2 && minRun >= 1,
      s"bad parameters (k=$k, benchMod=$benchMod, minRun=$minRun)")
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
    val positioned = docs.select(col("doc_id"),
      posexplode(when(size(col("toks")) >= k,
        expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $k)))"))
        .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"), col("col").as("gram"))
    val bench = positioned.filter(pmod(col("doc_id"), lit(benchMod)) === 0)
      .select("gram").distinct()
    val hits = positioned.filter(pmod(col("doc_id"), lit(benchMod)) =!= 0)
      .join(broadcast(bench), "gram")
      .select("doc_id", "p")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = hits
      .withColumn("brk",
        when(col("p") - lag("p", 1).over(w) === 1L, 0L).otherwise(1L))
      .withColumn("run_id", sum("brk").over(cum))
      .groupBy("doc_id", "run_id")
      .agg(min("p").as("p0"), count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minRun)
      .localCheckpoint() // consumed by the coverage expansion AND the run count
    val covered = runs
      .select(col("doc_id"),
        explode(sequence(col("p0"), col("p0") + col("run_len") - 1L + lit(k - 1).cast("long")))
          .as("tp"))
      .distinct()
    val toks = docs.filter(pmod(col("doc_id"), lit(benchMod)) =!= 0)
      .select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("tp"), col("col").as("token"))
    val kept = toks.join(covered, Seq("doc_id", "tp"), "left_anti")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("tp"), col("token")))),
            x => x.getField("token")),
          " ").as("text_repaired"))
    docs.filter(pmod(col("doc_id"), lit(benchMod)) =!= 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(runs.groupBy("doc_id").agg(count(lit(1)).as("n_runs_excised")),
        Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("n_runs_excised"), lit(0L)).as("n_runs_excised"),
        (col("n_tokens") === coalesce(col("n_kept"), lit(0L))).as("clean"),
        coalesce(col("text_repaired"), lit("")).as("text_repaired"))
      .orderBy("doc_id")
  }

  /** Row-local span-repair over ANY (doc_id, text, ...) relation —
    * batch or unbounded stream — against a FIXED benchmark k-gram set
    * riding as plan literals (the contamination/vocab literal contract:
    * eval sets are MBs against corpus TBs; a set too big for literals
    * belongs to [[decontaminationRepair]]'s broadcast regime). This is
    * the ONE shared definition the streaming repair gate (EXT-6ad)
    * runs, spec-pinned equal to the batch operator on a shared corpus.
    *
    * Exact-locality argument (why no window/state is needed): token
    * `tp` is covered iff some gram position `p ∈ [tp−k+1, tp]` starts a
    * quote-run hit. Run membership is itself LOCAL for the practical
    * `minRun` values — a hit `p` is part of a run ≥ 2 iff `hit(p−1) ∨
    * hit(p+1)`, and any hit is a run ≥ 1 — so the whole repair is one
    * `exists` over a k-token neighborhood per position: zero shuffles,
    * zero state, identical verdicts to the batch window spelling
    * (`require`d to those minRun values; larger minimums need the
    * run-length window and belong to the batch operator).
    */
  def repairProjection(
      docs: DataFrame,
      benchGrams: Seq[String],
      k: Int = 5,
      minRun: Int = 2): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    require(minRun == 1 || minRun == 2,
      s"minRun ($minRun) must be 1 or 2 — the row-local run test is exact only there")
    require(benchGrams.nonEmpty, "benchmark gram set is empty — nothing to repair against")
    val set = typedlit(benchGrams.sorted)
    def hitAt(p: Column): Column = element_at(col("hits"), p.cast("int"))
    def inQuoteRun(p: Column): Column =
      if (minRun == 1) hitAt(p)
      else hitAt(p) && (
        (p > 1L && hitAt(p - 1L)) ||
          (p < size(col("hits")).cast("long") && hitAt(p + 1L)))
    val nHits = size(col("hits")).cast("long")
    docs
      .withColumn("toks", Tables.tokens(col("text")))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      // hit(p) for gram positions 1..n-k+1 (empty for sub-k docs)
      .withColumn("hits",
        when(size(col("toks")) >= k,
          transform(
            expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
              s"i -> concat_ws(' ', slice(toks, i, $k)))"),
            g => array_contains(set, g)))
          .otherwise(array().cast("array<boolean>")))
      .withColumn("kept",
        when(nHits === 0L, sequence(lit(1L), col("n_toks")))
          .otherwise(filter(
            sequence(lit(1L), col("n_toks")),
            tp => !exists(
              sequence(greatest(lit(1L), tp - (k - 1).toLong), least(tp, nHits)),
              p => inQuoteRun(p)))))
      .withColumn("n_kept", size(col("kept")).cast("long"))
      .withColumn("n_removed", col("n_toks") - col("n_kept"))
      .withColumn("clean", col("n_removed") === 0L)
      .withColumn("text_repaired",
        array_join(transform(col("kept"),
          tp => element_at(col("toks"), tp.cast("int"))), " "))
      .drop("toks", "hits", "kept")
  }

  /** The benchmark k-gram set collected for the streaming gate
    * (EXT-6ad): the EXACT membership relation the batch operator
    * derives in-plan. Bounded by construction — eval sets are MBs
    * against corpus TBs (the trained-centroid/contamination-literal
    * boundedness argument).
    */
  def benchmarkGrams(
      spark: SparkSession, dir: String, k: Int = 5, benchMod: Int = 20): Seq[String] = {
    val docs = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(benchMod)) === 0)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
    docs.select(explode(when(size(col("toks")) >= k,
        expr(s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $k)))"))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
  }

  /** EXT-C45 (`x129_cluster_purity`) — near-dup cluster COMPOSITION
    * audit: every x22 component with its membership count, distinct
    * sources, distinct languages, the majority source and its share,
    * and cross-source / cross-lang verdicts. The question x121's size
    * histogram cannot answer: a size-50 cluster of ONE source is site
    * boilerplate (drop 49, keep the site), a size-50 cluster spanning
    * 20 sources is syndication (x128's directed matrix says who feeds
    * whom) — and a cross-LANG cluster under a same-lang fingerprint is
    * a mislabel alarm for x8/x17, since near-identical text should not
    * carry two language labels. Published dedup post-mortems read
    * exactly this split before deciding cluster-rep policy (x47).
    *
    * Plan: x22's labels (plan contract pinned there) under ONE narrow
    * doc_id join to (source, lang), then one cluster-keyed fold; the
    * majority pick is the partial-agg `max(struct(n, source))` over the
    * (cluster, source) sub-fold — |clusters| rows out, nothing pairwise.
    */
  def clusterPurity(spark: SparkSession, dir: String, maxRounds: Int = 30): DataFrame = {
    val labeled = dedupClusters(spark, dir, maxRounds)
      .join(Tables.documents(spark, dir).select("doc_id", "source", "lang"), "doc_id")
      .localCheckpoint() // consumed by the member fold AND the majority sub-fold
    val bySource = labeled.groupBy("cluster", "source").agg(count(lit(1)).as("n_s"))
      .groupBy("cluster")
      .agg(max(struct(col("n_s"), col("source"))).as("mj"))
    labeled.groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"))
      .join(bySource, "cluster")
      .select(col("cluster"), col("n_members"), col("n_sources"), col("n_langs"),
        col("mj.source").as("majority_source"),
        round(col("mj.n_s").cast("double") / col("n_members"), 4).as("majority_share4"),
        (col("n_sources") > 1L).as("cross_source"),
        (col("n_langs") > 1L).as("cross_lang"))
      .orderBy("cluster")
  }

  /** EXT-C44 (`x127_quantile_drift`) — length-DISTRIBUTION drift between
    * snapshots: per source, the exact discrete p50/p90/p99 of document
    * length on each side (old = even doc_id, new = odd — x93/x102's
    * deterministic snapshot-pair binding) with the absolute and relative
    * shift per quantile. The drift family's missing distributional leg:
    * x60 sees token-frequency shift, x93 content churn, x102 schema
    * churn — none of them sees "the new crawl's documents are half the
    * length", which moves chunking (x38), packing (x39/x89), and
    * quality-gate calibration (x19) before any of those audits fire.
    * Quantile shifts, not mean shift, because length distributions are
    * heavy-tailed: a mean can hide a collapsed median under a fatter
    * tail — the p50/p99 PAIR separates those.
    *
    * Exactness: x67's order-statistic spelling verbatim (rank
    * `min(cnt, max(1, ⌈p·cnt⌉))` per (side, source) partition; the
    * running `max(n_chars) WHERE rn ≤ r` IS the order statistic), all
    * integer comparisons; `shift = new − old` exact BIGINT;
    * `rel_shift4` one guarded IEEE division per quantile. A source
    * present on one side only keeps NULL columns for the other (the
    * left-join convention — absence from a snapshot is a finding).
    *
    * Plan: ONE shuffle keyed by (side, source) carries the rank window
    * and the count; the fold is |sources| rows with all six quantiles
    * and three shifts folded in ONE aggregation (conditional on side —
    * no self-join of snapshot halves). Scale is x67's argument: the
    * per-group sort is the exact leg's price at eval scale; production
    * monitors run the sketch (x67's audit certifies it) with this exact
    * spelling as the law.
    */
  def quantileDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("side", "source").orderBy(col("n_chars"), col("doc_id"))
    val cw = Window.partitionBy("side", "source")
    val ranked = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        when(pmod(col("doc_id"), lit(2)) === 0, "old").otherwise("new").as("side"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(cw))
    def rankAt(p: Double): Column =
      least(col("cnt"), greatest(lit(1L), ceil(lit(p) * col("cnt")).cast("long")))
    def valueAt(side: String, p: Double): Column =
      max(when(col("side") === side && col("rn") <= rankAt(p), col("n_chars")))
    val ps = Seq(0.5, 0.9, 0.99)
    val qCols = ps.flatMap { p =>
      val tag = (p * 100).toInt
      Seq(valueAt("old", p).as(s"old_p$tag"), valueAt("new", p).as(s"new_p$tag"))
    }
    val nCols = Seq(
      max(when(col("side") === "old", col("cnt"))).as("n_old"),
      max(when(col("side") === "new", col("cnt"))).as("n_new"))
    val agg = ranked.groupBy("source").agg((nCols ++ qCols).head, (nCols ++ qCols).tail: _*)
    val shiftCols = ps.flatMap { p =>
      val tag = (p * 100).toInt
      val old = col(s"old_p$tag"); val nw = col(s"new_p$tag")
      Seq((nw - old).as(s"shift_p$tag"),
        when(old.isNull || nw.isNull || old === 0L, lit(null).cast("double"))
          .otherwise(round((nw - old).cast("double") / old, 4)).as(s"rel_shift4_p$tag"))
    }
    agg.select(col("source") +: col("n_old") +: col("n_new") +:
        (ps.flatMap { p =>
          val tag = (p * 100).toInt
          Seq(col(s"old_p$tag"), col(s"new_p$tag"))
        } ++ shiftCols): _*)
      .orderBy("source")
  }
}
