package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for LLM training-data pipelines (SURVEY.md §2b):
  * exact, MinHash+LSH, all-pairs n-gram Jaccard, and SimHash.
  *
  * Every hash is derived from `md5` over an explicit seeded string so the
  * DuckDB oracle can reproduce each operator bit-for-bit — no engine-
  * private hash functions in any result.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is one hash-partitioned aggregation on a 32-byte digest
  *    (map-side partial agg collapses duplicates before the shuffle);
  *  - MinHash/LSH replaces the O(n²) all-pairs comparison with a
  *    shuffle-join on band signatures — candidate generation touches each
  *    document once and joins only colliding buckets;
  *  - the n-gram Jaccard join is an inverted-index (shingle-key) join, so
  *    cost scales with shingle co-occurrence, not with |docs|²; it serves
  *    as the exact verifier for LSH candidates;
  *  - SimHash is a per-document linear scan (two keyed aggregations),
  *    embarrassingly parallel.
  */
object Dedup {

  /** EXT-D1 — exact dedup: group by content digest, keep the smallest
    * doc_id as the canonical copy. `sha2` runs inside codegen; the
    * aggregation is partial-agg friendly (one digest per group on the map
    * side), so the shuffle carries one row per distinct document.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("digest"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Per-document distinct shingle sets: (doc_id, shingle) exploded, plus
    * per-doc set sizes. Shared by the Jaccard join and MinHash.
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Tables.shingles(Tables.tokens(col("text")))).as("shingle"))

  /** EXT-D3 — all-pairs n-gram (3-token shingle) Jaccard join at a
    * threshold. NOT a cross join: documents meet only through the
    * inverted-index join on `shingle`, so the pair stream is bounded by
    * shingle co-occurrence. Sizes are a small per-doc aggregate,
    * broadcast onto the pair stream.
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sh = docShingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes).withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(broadcast(sizes).withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "n1", "n2", "jaccard")
      .orderBy("d1", "d2")
  }

  /** EXT-D2 — MinHash + LSH banding near-dup detection, the scale path:
    * 16 md5-seeded min-hashes per document, banded 4×4; documents sharing
    * any full band signature become candidates; candidates are verified
    * with exact shingle Jaccard and kept at `threshold`.
    *
    * At 100 TB the only wide operators are (a) the minhash aggregation
    * (keyed by doc), (b) the band self-join (keyed by 4-hash signature —
    * selective by construction), and (c) the verification join, which
    * runs on candidates only, not on all pairs.
    */
  def minhashLsh(
      spark: SparkSession,
      dir: String,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = docShingles(spark, dir)
    // one row per (doc, seed): the seeded min-hash (lexicographic min of
    // md5 hex digests — identical ordering in the SQL oracle)
    val mh = sh
      .select(col("doc_id"), explode(sequence(lit(0), lit(numHashes - 1))).as("seed"), col("shingle"))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle")))).as("mh"))
    // band signature: the rowsPerBand min-hashes of a band, joined in
    // fixed seed order via conditional aggregation (deterministic, no
    // collect_list ordering hazard)
    val sig = mh
      .groupBy(col("doc_id"), (col("seed") / rowsPerBand).cast("int").as("band"))
      .agg(concat_ws(",",
        (0 until rowsPerBand).map(r =>
          max(when(pmod(col("seed"), lit(rowsPerBand)) === r, col("mh")))): _*).as("sig"))
    val candidates = sig.as("a")
      .join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // exact verification on candidates only
    candidates
      .join(ngramJaccard(spark, dir, threshold).select("d1", "d2", "jaccard"), Seq("d1", "d2"))
      .orderBy("d1", "d2")
  }

  /** EXT-D4 — 60-bit SimHash fingerprint per document. Token hash = the
    * top 15 hex chars of md5 (60 bits, sign-safe in a BIGINT); each bit
    * accumulates +w/−w by token weight (occurrence count); the fingerprint
    * sets bits with positive sums. Two keyed aggregations, no joins.
    */
  def simhash(spark: SparkSession, dir: String, bits: Int = 60): DataFrame = {
    val tokenWeights = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Tables.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("w"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    tokenWeights
      .select(col("doc_id"), col("w"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .withColumn("v", when(expr("shiftright(h, int(b)) & 1") === 1, col("w")).otherwise(-col("w")))
      .groupBy("doc_id", "b")
      .agg(sum("v").as("s"))
      .withColumn("bitval", when(col("s") > 0, expr("shiftleft(1L, int(b))")).otherwise(lit(0L)))
      .groupBy("doc_id")
      .agg(sum("bitval").as("simhash"))
      .orderBy("doc_id")
  }
}
