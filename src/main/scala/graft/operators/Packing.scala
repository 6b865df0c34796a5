package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation for LLM training (SURVEY.md §2b): chunking
  * documents into overlapping token windows, and packing documents into
  * fixed-token-budget training sequences.
  *
  * Same oracle ground rules as the rest of §2b: integer arithmetic
  * end-to-end (starts, lengths, running sums, bin ids), digests as md5
  * over explicit joined strings, deterministic ordering keys everywhere.
  */
object Packing {

  /** EXT-P3 — overlapping token chunks: one row per (doc, window) with
    * the window start (1-based), its token count, and a digest of the
    * joined chunk text. Starts advance by `stride` while they remain
    * ≤ n_tokens, so a 25-token doc at (20, 10) yields windows at 1, 11,
    * 21 — the standard 50%-overlap sliding window when stride = size/2.
    *
    * Row-local: `sequence` + `explode` + `slice` — the narrow pass that
    * feeds tokenization/packing; no shuffle except the presentation
    * sort. At 100 TB chunking is embarrassingly parallel and the explode
    * multiplies rows by ~n/stride, which is why it must NOT shuffle.
    */
  def chunkDocuments(
      spark: SparkSession,
      dir: String,
      chunkSize: Int = 20,
      stride: Int = 10): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    Tables.documents(spark, dir)
      .select(col("doc_id"), Tables.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"), col("toks"))
      .select(col("doc_id"), col("n"), col("toks"),
        explode(sequence(lit(1L), col("n"), lit(stride.toLong))).as("chunk_start"))
      .select(
        col("doc_id"),
        col("chunk_start"),
        least(lit(chunkSize.toLong), col("n") - col("chunk_start") + 1).as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("chunk_start"), lit(chunkSize))))
          .as("chunk_digest"))
      .orderBy("doc_id", "chunk_start")
  }

  /** EXT-P4 — deterministic sequence packing: documents are concatenated
    * per language in doc_id order and cut every `budgetTokens` tokens;
    * a document belongs to the bin where its START offset lands (the
    * greedy concatenate-and-cut packing used to build training
    * sequences). Returns per-(lang, bin) document counts and token
    * totals.
    *
    * Shape: ONE running-sum window per language partition (the stratum
    * key, low cardinality) + a partial-agg groupBy — the same
    * single-shuffle story as sessionize. At 100 TB exact GLOBAL packing
    * would be a global sort; per-language (or per-shard) packing is the
    * shape that parallelizes, and is what this computes.
    */
  def packSequences(
      spark: SparkSession,
      dir: String,
      budgetTokens: Long = 512L): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(Tables.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      // integer division on the doc's start offset — exact in both engines
      .withColumn("bin_id", expr(s"(cum - tok) div $budgetTokens"))
      .groupBy("lang", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("bin_tokens"))
      .orderBy("lang", "bin_id")
  }

  /** EXT-P6 — context-budget sweep: for each candidate sequence length,
    * the exact cost of BOTH packing regimes at once — the relation a
    * team reads to pick a training context length. Per budget L:
    *  - one-doc-per-sequence (pad-to-L, truncate overlong): `pad_waste`
    *    = Σ max(L − tok, 0), `trunc_tokens` = Σ max(tok − L, 0), and
    *    `util_1doc` = Σ min(tok, L) / (n_docs · L);
    *  - greedy concat-and-cut (= [[packSequences]]' regime, per lang):
    *    `n_split_docs` = docs whose span crosses a bin boundary (each
    *    becomes ≥2 training fragments), `n_bins` = Σ_lang ⌈Σtok_l / L⌉,
    *    `tail_waste` = the final partial bin's padding per lang, and
    *    `util_packed` = Σtok / (n_bins · L).
    * All counts are BIGINT arithmetic (`greatest`/`least`/`div` on
    * exact running sums); the two utilizations are single IEEE
    * divisions of BIGINT aggregates — bit-exact in both engines.
    *
    * Plan: ONE corpus scan, ONE per-lang running-sum window (the
    * packSequences shuffle, reused for the boundary test), then a
    * row-local `explode` of the |budgets| literal array — no join
    * multiplies the corpus. Every metric flows through a SINGLE
    * aggregation tree keyed (budget, lang) — collapsing map-side to
    * |budgets|·|langs| rows — then re-aggregated to |budgets| rows (a
    * two-branch doc-agg/lang-agg spelling would re-scan the corpus:
    * Catalyst does not share subtrees across join inputs). At 100 TB
    * the sweep costs one token-count pass regardless of how many
    * candidate lengths are swept.
    */
  def budgetSweep(
      spark: SparkSession,
      dir: String,
      budgets: Seq[Long] = Seq(32L, 64L, 128L, 256L)): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ > 0), "budgets must be positive")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(Tables.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      .select(col("lang"), col("tok"), col("cum"),
        explode(array(budgets.map(lit): _*)).as("budget"))
    swept.groupBy("budget", "lang").agg(
      count(lit(1)).as("l_docs"),
      sum(greatest(col("budget") - col("tok"), lit(0L))).as("l_pad"),
      sum(greatest(col("tok") - col("budget"), lit(0L))).as("l_trunc"),
      sum(least(col("tok"), col("budget"))).as("l_used"),
      sum(when(expr("(cum - tok) div budget") =!= expr("(cum - 1) div budget"), 1L)
        .otherwise(0L)).as("l_split"),
      sum("tok").as("tot"))
      .withColumn("bins", expr("(tot + budget - 1) div budget"))
      .groupBy("budget").agg(
        sum("l_docs").as("n_docs"),
        sum("l_pad").as("pad_waste"),
        sum("l_trunc").as("trunc_tokens"),
        sum("l_used").as("used"),
        sum("l_split").as("n_split_docs"),
        sum("bins").as("n_bins"),
        sum(col("bins") * col("budget") - col("tot")).as("tail_waste"),
        sum("tot").as("tot_all"))
      .select(col("budget"), col("n_docs"), col("pad_waste"), col("trunc_tokens"),
        (col("used").cast("double") / (col("n_docs") * col("budget")).cast("double"))
          .as("util_1doc"),
        col("n_split_docs"), col("n_bins"), col("tail_waste"),
        (col("tot_all").cast("double") / (col("n_bins") * col("budget")).cast("double"))
          .as("util_packed"))
      .orderBy("budget")
  }

  /** EXT-P7 (x100) — semantic packing: [[packSequences]] partitioned by
    * the document's trained k-means cell instead of its language, so
    * every packed context window carries TOPICALLY-COHERENT documents
    * (in-context-pretraining/retrieval-ordered packing: related
    * documents in one window let the model attend across them; a
    * lang-or-random pack wastes the window's cross-document attention
    * on unrelated text). Cells come from the ONE trained-centroid
    * projection x54/x57/x75 share (embedding joined by the corpus's
    * doc_id = vec_id convention); the pack arithmetic — running token
    * sum, integer bin ids off the start offset — is [[packSequences]]'s
    * exactly, per cell.
    *
    * Scale: one narrow doc_id equi-join (tokens ⋈ cells), then the
    * per-cell running-sum window. k bounds the partition count, so a
    * giant cell is the hot-partition hazard — production composes the
    * cell key with x74's content-stable shard (`PARTITION BY cell,
    * shard`), which caps any single sort while keeping windows
    * topic-pure; the eval spelling keeps the bare cell key so the
    * oracle can mirror the window exactly. The same trade, documented,
    * as x39's per-lang window.
    */
  def semanticPacking(
      spark: SparkSession,
      dir: String,
      budgetTokens: Long = 512L,
      exactMeans: Boolean = false): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val cells = Similarity.centroidSimProjection(spark, dir, exactMeans = exactMeans)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val w = Window.partitionBy("cell").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(Tables.tokens(col("text"))).cast("long").as("tok"))
      .join(cells, "doc_id")
      .withColumn("cum", sum("tok").over(w))
      .withColumn("bin_id", expr(s"(cum - tok) div $budgetTokens"))
      .groupBy("cell", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("bin_tokens"))
      .orderBy("cell", "bin_id")
  }

  /** EXT-P7 (`x117_pack_bleed`) — cross-document attention-bleed audit
    * of the concat-and-cut packing ([[packSequences]]' regime): for each
    * candidate attention window W, the exact number of token positions
    * that can attend to a FOREIGN document's tokens inside their packed
    * sequence — the contamination that doc-boundary attention masking
    * (attention resets / block-diagonal masks) exists to remove. The
    * relation a team reads to decide whether masking is worth the
    * kernel complexity at its W: bleed under full in-sequence causal
    * attention is the W = L column; tiny W (sliding-window attention)
    * shrinks bleed linearly.
    *
    * Geometry (all BIGINT): per language, a document's tokens start at
    * global offset `st = cum − tok`; inside its first bin its in-bin
    * start is `s_b = st mod L`. Foreign tokens occupy in-bin positions
    * `[0, s_b)`, so the document's positions `p ∈ [s_b, s_b + len_1)`
    * see foreign context iff `p < s_b + W − 1` — i.e. exactly
    * `min(len_1, W−1)` positions when `s_b > 0` and ZERO when the doc
    * starts a fresh bin (`s_b = 0`; continuation segments in later bins
    * also start at 0, so only the first segment ever bleeds —
    * `len_1 = min(tok, L − s_b)`). No pair of documents is ever
    * materialized: bleed is closed-form per document.
    *
    * Plan: ONE corpus token-count pass, ONE per-lang running-sum window
    * (the packSequences shuffle, reused), then a row-local explode of
    * the |windows| literal array and a (window, lang) partial agg —
    * |windows|·|langs| rows out. The sweep costs one pass regardless of
    * how many W are swept (budgetSweep's discipline); `bleed_frac` is
    * one IEEE division of exact BIGINTs.
    */
  def packBleed(
      spark: SparkSession,
      dir: String,
      budgetTokens: Long = 512L,
      windows: Seq[Long] = Seq(4L, 16L, 64L)): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(windows.nonEmpty && windows.forall(_ > 0), "windows must be positive")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(Tables.tokens(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum("tok").over(w))
      .withColumn("sb", expr(s"(cum - tok) % $budgetTokens"))
      .withColumn("len1", least(col("tok"), lit(budgetTokens) - col("sb")))
      .select(col("lang"), col("tok"), col("sb"), col("len1"),
        explode(array(windows.map(lit): _*)).as("win"))
      .withColumn("bleed",
        when(col("sb") === 0L, 0L)
          .otherwise(least(col("len1"), col("win") - 1L)))
      .groupBy("win", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("bleed") > 0L, 1L).otherwise(0L)).as("n_bleed_docs"),
        sum("bleed").as("bleed_positions"),
        sum("tok").as("n_tokens"))
      .withColumn("bleed_frac",
        when(col("n_tokens") === 0L, lit(null).cast("double"))
          .otherwise(col("bleed_positions").cast("double") / col("n_tokens")))
      .orderBy("win", "lang")
  }
}
