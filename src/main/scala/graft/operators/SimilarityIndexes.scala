package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted-index and product-quantization half of [[Similarity]]
  * (split out at r16 — the 2,645-LoC wall the r15 verdict flagged; the
  * seam is in-memory brute/LSH/IVF/k-means vs the write→stamp→probe
  * index family): IVF / sign-Hamming / PQ / IVF-PQ index writers, their
  * stamp-validated probe paths, and the PQ coding machinery (codebook
  * training, ADC scoring). Mixed into `object Similarity`, so every
  * public name keeps its `Similarity.foo` address and the two files
  * compile as one object — shared plan helpers (`presentTopK`,
  * `ivfScoredCells`, the broadcast guard) stay in [[Similarity]] as
  * `private[operators]` members this self-type reaches.
  */
private[operators] trait SimilarityIndexOps { self: Similarity.type =>
  /** EXT-S13 — persist the IVF index: the corpus assignment pass of
    * [[ivfTopK]] (argmax cell per vector, identical expression and
    * tie-break) written out cell-PARTITIONED, plus the centroid table
    * stamped with its `n_centroids` parameter — the "train once, probe
    * forever" layout. The build is the ONE expensive corpus pass; every
    * later query batch goes through [[ivfTopKFromIndex]] without
    * rescanning or re-assigning the corpus.
    *
    * `partitionBy("cell")` is the 100 TB point: probing reads only the
    * cells the query batch fans out to — the cell equi-join against a
    * broadcast query side triggers dynamic partition pruning, so
    * nprobe/nCentroids of the index FILES are touched, not all of them.
    * The parameter stamp follows [[Dedup.bandSignatures]]'s bundling
    * contract: an index probed with the wrong nCentroids would silently
    * derive wrong probe cells, so the probe validates the stamp instead.
    */
  def writeIvfIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      nCentroids: Int = 16): Unit = {
    val cents = ivfSeedCentroids(spark, dir, nCentroids)
    // the ONE coarse-geometry spelling (ivfScoredCells): the index WRITER
    // is exactly the site where a drifted tie-break would silently
    // mis-partition cells relative to every probe
    ivfCellProjection(Tables.embeddings(spark, dir), cents)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexPath/cells")
    writeIvfCentroids(spark, indexPath, cents, nCentroids)
  }

  /** EXT-6ar's init half — stamp the float-IVF index's coarse geometry
    * (`centroids/` with the `n_centroids` stamp, seeded from `dir`) and
    * NO cell rows: the cell relation is then populated incrementally by
    * [[graft.streaming.StreamOps.maintainIvfIndex]]. The
    * [[initIvfPqIndex]] contract for the float layout.
    */
  def initIvfIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      nCentroids: Int = 16): Unit =
    writeIvfCentroids(spark, indexPath,
      ivfSeedCentroids(spark, dir, nCentroids), nCentroids)

  private def writeIvfCentroids(
      spark: SparkSession,
      indexPath: String,
      cents: Seq[(Int, Seq[Float])],
      nCentroids: Int): Unit = {
    import spark.implicits._
    cents.toDF("cid", "embedding")
      .withColumn("n_centroids", lit(nCentroids))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
  }

  /** Row-local coarse-cell routing over ANY `(vec_id, embedding)`
    * relation — the cell half of [[ivfPqAssignProjection]] without the
    * coding: shared by the static writer and the streaming maintainer
    * (EXT-6ar), so an arriving vector lands in exactly the cell every
    * probe will look for it in.
    */
  private[graft] def ivfCellProjection(
      vecs: DataFrame, cents: Seq[(Int, Seq[Float])]): DataFrame = {
    val scoredCells = ivfScoredCells(cents, col("embedding"))
    vecs.select(col("vec_id"), col("embedding"),
      argmaxCell(scoredCells, cents.length).as("cell"))
  }

  /** EXT-S13 probe path: top-k cosine neighbors for an arbitrary
    * `(vec_id, embedding)` query relation against a PERSISTED index —
    * identical results, tie-breaks, and presentation to running
    * [[ivfTopK]] over the same corpus (spec-asserted), with the corpus
    * pass replaced by a pruned read of the probed cells.
    *
    * The centroid table is collected driver-side — bounded by
    * CONSTRUCTION (nCentroids rows, validated against the stamp), the
    * same bounded-broadcast rule as every centroid literal in this
    * file. Probe cells are derived on the query side only (nprobe
    * fan-out); the index side is read already partitioned by cell, so
    * the equi-join shuffles only the query fan-out at most.
    *
    * `staticPrune` (default ON) pins the batch's DISTINCT probe cells —
    * at most nCentroids values by construction, the legitimate bounded
    * collect — as a literal partition filter on the index read, so the
    * pruned scan is guaranteed by the PLANNER (`PartitionFilters` with
    * `selectedPartitions` resolved before execution), not left to the
    * dynamic-partition-pruning heuristic (which does not consider an
    * unfiltered query batch "selective" and would scan every cell).
    * Cost: one extra narrow pass over the query side to derive the cell
    * set — for any index big enough to matter, reading
    * nprobe/nCentroids of the FILES repays it immediately. This is the
    * per-microbatch serving shape (EXT-6i): train once, probe each
    * arriving query batch against only the cells it fans out to.
    */
  /** Bounded centroid-table read + stamp validation shared by every
    * persisted-probe path (EXT-S13's refusal contract): nCentroids rows
    * by construction, returned sorted by cid with the validated count.
    * A corrupt coarse quantizer must REFUSE, not mis-route probes.
    * Memoized per (indexPath, sidecar listing signature) via
    * [[IndexCache]] — the r15 verdict's per-probe driver-overhead ask:
    * an unchanged index pays the parquet job once per session, a
    * rewritten one re-reads AND re-validates (refusals never cache).
    */
  private def loadCoarseCentroids(
      spark: SparkSession, indexPath: String): (Seq[(Int, Seq[Float])], Int) =
    IndexCache.cached(spark, s"coarse|$indexPath", Seq(s"$indexPath/centroids")) {
      import spark.implicits._
      val centRows = spark.read.parquet(s"$indexPath/centroids")
        .select(col("cid"), col("embedding"), col("n_centroids"))
        .as[(Int, Seq[Float], Int)].collect()
      val stamps = centRows.map(_._3).distinct
      require(stamps.length == 1 && stamps.head == centRows.length,
        s"corrupt index: ${centRows.length} centroid rows, stamps ${stamps.mkString(",")}")
      (centRows.map(t => (t._1, t._2)).sortBy(_._1).toSeq, stamps.head)
    }

  /** The measured-query-width refusal shared by every persisted-index
    * probe: min AND max vector width over the WHOLE batch must both
    * equal the index's stamped dim — one narrow column scan (a single
    * `size` projection folded map-side to three scalars), so a ragged
    * batch refuses no matter where its odd rows sit. (The r16 advisory:
    * the earlier 1024-row sample could pass a ragged batch whose
    * short/long rows all fell outside the sample — the full min/max
    * aggregate costs one 4-byte-per-row pass and closes the hole.)
    * An EMPTY batch passes: in the per-microbatch serving shape
    * (EXT-6an) an empty trigger is a normal streaming event whose probe
    * must yield an empty result, not kill the stream — but a non-empty
    * batch of NULL/empty vectors still refuses (there is data and its
    * width is wrong).
    */
  private[graft] def requireUniformDim(queries: DataFrame, dim: Int, what: String): Unit = {
    val qDim = queries.select(size(col("embedding")).as("d"))
      .agg(min(col("d")).as("mn"), max(col("d")).as("mx"), count(lit(1)).as("n")).head()
    if (qDim.getLong(2) == 0L) return
    require(!qDim.isNullAt(0) && qDim.getInt(0) == dim && qDim.getInt(1) == dim,
      s"query width ${if (qDim.isNullAt(0)) "unknown"
        else if (qDim.getInt(0) == qDim.getInt(1)) qDim.getInt(1).toString
        else s"ragged ${qDim.getInt(0)}..${qDim.getInt(1)}"} " +
        s"does not match the index's $what $dim")
  }

  /** Bounded PQ-geometry read shared by the persisted PQ and IVF-PQ
    * probes (EXT-S20b's refusal contract): the one-row meta stamp, the
    * measured query-batch width checked against the coded dim (a
    * mismatched OR ragged batch must REFUSE, not mis-rank), and the
    * ksub·dim long-form codebook rebuilt into the plan-literal array.
    * `label` names the index family in the refusal messages.
    */
  private def loadPqGeometry(
      spark: SparkSession, indexPath: String, queries: DataFrame,
      label: String): (Array[Array[Array[Long]]], Int) = {
    // the meta/codebook reads memoize per (indexPath, listing signature)
    // — the per-call check below depends on the QUERY batch, so it can
    // never cache: a ragged or mis-sized batch refuses on every probe
    val (cb, dim, dsub) = loadPqMeta(spark, indexPath, label)
    requireUniformDim(queries, dim, "coded dim")
    (cb, dsub)
  }

  /** The cached meta/codebook half of [[loadPqGeometry]] — also the
    * geometry source for the streaming INGEST side (EXT-6ao encodes
    * arrivals with the index's own stamped layout), which has no query
    * batch to width-check at load time.
    */
  private def loadPqMeta(
      spark: SparkSession, indexPath: String,
      label: String): (Array[Array[Array[Long]]], Int, Int) = {
    IndexCache.cached(
      spark, s"pqgeom|$label|$indexPath",
      Seq(s"$indexPath/meta", s"$indexPath/codebook")) {
      import spark.implicits._
      val metaRows = spark.read.parquet(s"$indexPath/meta")
        .select("m", "ksub", "dim").as[(Int, Int, Int)].collect()
      require(metaRows.length == 1, s"corrupt $label index: ${metaRows.length} meta rows")
      val (m, ksub, d) = metaRows.head
      val ds = d / m
      val cbRows = spark.read.parquet(s"$indexPath/codebook")
        .select(col("s"), col("code"), col("d"), col("v")).as[(Int, Int, Int, Long)].collect()
      require(cbRows.length == ksub * d,
        s"corrupt $label index: ${cbRows.length} codebook rows, expected ${ksub * d}")
      val cbArr = Array.fill(m)(Array.fill(ksub)(Array.fill(ds)(0L)))
      cbRows.foreach { case (s, c, dd, v) => cbArr(s)(c)(dd) = v }
      (cbArr, d, ds)
    }
  }

  /** The stamped coarse-centroid table alone — the float-IVF index's
    * whole geometry (EXT-6ar's maintainer view; the composite's view is
    * [[loadIvfPqGeometry]]).
    */
  private[graft] def loadIvfCentroids(
      spark: SparkSession, indexPath: String): Seq[(Int, Seq[Float])] =
    loadCoarseCentroids(spark, indexPath)._1

  /** Both sidecar geometries of a persisted IVF-PQ index in one load —
    * the streaming maintainer's view (EXT-6ao): coarse centroids +
    * trained codebooks + stamped dim, all stamp-validated, no query
    * batch involved.
    */
  private[graft] def loadIvfPqGeometry(
      spark: SparkSession, indexPath: String)
      : (Seq[(Int, Seq[Float])], Array[Array[Array[Long]]], Int, Int) = {
    val (cents, _) = loadCoarseCentroids(spark, indexPath)
    val (cb, dim, dsub) = loadPqMeta(spark, indexPath, "ivfpq")
    (cents, cb, dim, dsub)
  }

  /** A deterministic CONTENT fingerprint of a loaded IVF-PQ geometry
    * (coarse centroids + codebooks + dim) — the generation-level stamp
    * EXT-6ao writes next to appended code rows and validates before
    * every append and probe. Code rows are meaningless without the
    * exact geometry that produced them, and a RETRAIN over a live
    * index (sidecars rewritten in place) would otherwise mix old-layout
    * and new-layout rows in one generation and mis-score every old row:
    * the stamp turns that into a refusal naming the rebuild. Pure
    * function of the values (MurmurHash3 over an ordered flattening),
    * so it is stable across JVMs and sessions.
    */
  private[graft] def ivfPqGeometryStamp(
      cents: Seq[(Int, Seq[Float])],
      cb: Array[Array[Array[Long]]],
      dim: Int): String = {
    val flat = Seq.newBuilder[Any]
    flat += dim
    cents.foreach { case (cid, v) => flat += cid; v.foreach(flat += _) }
    cb.foreach(_.foreach(_.foreach(flat += _)))
    scala.util.hashing.MurmurHash3.orderedHash(flat.result()).toHexString
  }

  /** The batch's DISTINCT probe cells for a staticPrune literal filter:
    * ≤ nCentroids values by construction (cells are 0..nCentroids−1),
    * so the collect is bounded no matter how large the query relation
    * is. Derived from a CELL-ONLY projection of the raw query relation
    * — never the probe's full (qid, qe, cell) plan — so the pruning
    * pass pays the coarse scoring only, not a second evaluation of the
    * probe side's quantization/fan-out projection (the r15 ivfpq
    * double-eval finding).
    */
  private def distinctProbeCells(
      queries: DataFrame, scoredCells: Column,
      nCentroids: Int, nprobe: Int): Seq[Int] = {
    import queries.sparkSession.implicits._
    val cellsOnly =
      if (nprobe == 1) queries.select(argmaxCell(scoredCells, nCentroids).as("cell"))
      else queries.select(probeCellsCol(scoredCells, nCentroids, nprobe).as("cell"))
    cellsOnly.distinct().as[Int].collect().toSeq
  }

  def ivfTopKFromIndex(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 1,
      staticPrune: Boolean = true): DataFrame =
    ivfTopKOverCells(spark, indexPath,
      spark.read.parquet(s"$indexPath/cells"), queries, k, nprobe,
      staticPrune, dedupReplays = false)

  /** The float-IVF probe over an EXPLICIT cell relation — shared by the
    * static layout (reads `cells/`) and the streaming-maintained one
    * (EXT-6ar probes the live generation). Same contract as
    * [[ivfPqTopKOverCells]]: `dedupReplays` shields the generational
    * layout's at-least-once appends (byte-identical duplicate rows
    * dropped over the PRUNED minority before scoring); the static path
    * skips it so x175's bit-pinned plan is untouched.
    */
  private[graft] def ivfTopKOverCells(
      spark: SparkSession,
      sidecarPath: String,
      cellRows: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      staticPrune: Boolean,
      dedupReplays: Boolean): DataFrame = {
    val (cents, nCentroids) = loadCoarseCentroids(spark, sidecarPath)
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe ($nprobe) must be in [1, nCentroids=$nCentroids]")
    val scoredCells = ivfScoredCells(cents, col("embedding"))
    // spread the QUERY side too (r18): a single-file query batch arrives
    // as ONE scan partition, and when the planner broadcasts the (often
    // smaller) index side the whole Σ|cell| expansion + dot + TopK
    // partial agg runs in that one task — measured on x175 (full-corpus
    // query batch): one 3.8–4.3 s single-task stage was the entire
    // query. The spread moves only the narrow query rows; identity once
    // the batch arrives with ≥ parallelism partitions.
    val qSpread = expansionPartitioned(queries)
    val q =
      if (nprobe == 1)
        qSpread.select(col("vec_id").as("qid"), col("embedding").as("qe"),
          argmaxCell(scoredCells, nCentroids).as("cell"))
      else
        qSpread.select(col("vec_id").as("qid"), col("embedding").as("qe"),
          probeCellsCol(scoredCells, nCentroids, nprobe).as("cell"))
    val idxRaw = cellRows
    val idxPruned =
      if (staticPrune) {
        val cells = distinctProbeCells(queries, scoredCells, nCentroids, nprobe)
        idxRaw.filter(col("cell").isin(cells.map(Int.box): _*))
      } else idxRaw
    // expansionPartitioned on the streamed index side: a freshly-written
    // cell-partitioned index is SMALL FILES locally, so the scan arrives
    // as one partition and a broadcast-joined probe batch then runs the
    // whole Σ|cell|² expansion + the TopK partial agg in ONE task — the
    // r13/r14 single-task expansion class, 6th site (found when x175 put
    // this probe on the slice bench: 46+ min single-task vs minutes
    // spread). At production scale the pruned cells already arrive as
    // ≥ parallelism file partitions and this is the identity.
    val idxProjected = idxPruned
      .select(col("cell"), col("vec_id").as("cid"), col("embedding").as("ce"))
    val idx = expansionPartitioned(
      if (dedupReplays) idxProjected.dropDuplicates("cid") else idxProjected)
    val scored = q.join(idx, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), dot(col("qe"), col("ce")).as("sim"))
    presentTopK(scored, k)
  }

  /** EXT-S15b build — persist the sign-signature relation: ONE corpus
    * pass packs each vector's sign bits ([[packSignBits]]) and writes
    * the 16-byte-per-vector table plus a one-row `meta` stamp carrying
    * the packed dimension (the [[writeIvfIndex]] parameter-bundling
    * contract: an index must refuse probes built with different
    * parameters, here a different dim → different bit layout).
    *
    * Scale: the build is the one full-vector pass; every later query
    * batch scans 16 bytes/vector instead of 4·dim — the 64× first-pass
    * I/O reduction [[hammingTopK]] computes inline, made durable.
    */
  def writeSignIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      dim: Int = 64): Unit = {
    signSignatureProjection(Tables.embeddings(spark, dir), dim)
      .write.mode("overwrite").parquet(s"$indexPath/signatures")
    spark.range(1).select(lit(dim).as("dim"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** EXT-6aq's init half — stamp the sign index's layout (`meta/` with
    * the packed dim) and NO signature rows: the signature relation is
    * then populated incrementally by
    * [[graft.streaming.StreamOps.maintainSignIndex]], which packs each
    * arriving microbatch row-locally against this stamp. The
    * [[initIvfPqIndex]] train-once/append-forever contract, for the
    * layout that needs no training at all.
    */
  def initSignIndex(
      spark: SparkSession,
      indexPath: String,
      dim: Int = 64): Unit =
    spark.range(1).select(lit(dim).as("dim"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")

  /** Row-local sign packing over ANY `(vec_id, embedding)` relation —
    * the ONE spelling shared by the static writer, the streaming
    * maintainer (EXT-6aq), and [[hammingTopKOverSignatures]]'s query
    * side (via the same [[packSignBits]] expressions): a drifted bit
    * layout anywhere would silently wreck every Hamming distance.
    */
  private[graft] def signSignatureProjection(vecs: DataFrame, dim: Int): DataFrame = {
    val loBits = math.min(32, dim)
    val hiBits = math.max(0, dim - 32)
    vecs.select(col("vec_id"),
      packSignBits(col("embedding"), 0, loBits).as("lo"),
      (if (hiBits > 0) packSignBits(col("embedding"), 32, hiBits) else lit(0L)).as("hi"))
  }

  /** EXT-S15b probe — top-k neighbors for an arbitrary
    * `(vec_id, embedding)` query relation against a PERSISTED signature
    * index: identical results, tie-breaks, and presentation to running
    * [[hammingTopK]] over the same corpus (spec-asserted). The first
    * pass reads SIGNATURES only (never the vector table); full vectors
    * are touched exclusively by the candidate-id equi-joins — query
    * vectors from the passed relation, corpus vectors from `corpusDir`
    * — keeping the index itself 16 bytes/row (production keeps the
    * primary vector store separate from the sketch, fetched by id).
    *
    * The dim stamp is validated against the measured query width
    * (bounded sample, the [[embRowBytes]] discipline): a query batch
    * whose vectors do not match the index's packed layout is REFUSED,
    * not silently mis-ranked.
    */
  def hammingTopKFromIndex(
      spark: SparkSession,
      indexPath: String,
      corpusDir: String,
      queries: DataFrame,
      candidates: Int = 20,
      k: Int = 3,
      maxBroadcastBytes: Long = 64L << 20): DataFrame =
    hammingTopKOverSignatures(spark, indexPath,
      spark.read.parquet(s"$indexPath/signatures"), corpusDir, queries,
      candidates, k, maxBroadcastBytes, dedupReplays = false)

  /** The stamped dim of a persisted sign index — shared by the static
    * probe, the streaming maintainer (EXT-6aq packs arrivals with the
    * index's own layout), and the live probe.
    */
  private[graft] def loadSignDim(spark: SparkSession, indexPath: String): Int = {
    import spark.implicits._
    IndexCache.cached[java.lang.Integer](
        spark, s"signmeta|$indexPath", Seq(s"$indexPath/meta")) {
      val metaRows = spark.read.parquet(s"$indexPath/meta").select("dim").as[Int].collect()
      require(metaRows.length == 1, s"corrupt index: ${metaRows.length} meta rows")
      Int.box(metaRows.head)
    }
  }

  /** The sign-sketch probe over an EXPLICIT signature relation — shared
    * by the static layout (reads `signatures/`) and the streaming-
    * maintained one (EXT-6aq probes the live generation; `dedupReplays`
    * drops at-least-once duplicate signature rows before the Hamming
    * pass, the [[ivfPqTopKOverCells]] shield).
    */
  private[graft] def hammingTopKOverSignatures(
      spark: SparkSession,
      sidecarPath: String,
      sigRows: DataFrame,
      corpusDir: String,
      queries: DataFrame,
      candidates: Int,
      k: Int,
      maxBroadcastBytes: Long,
      dedupReplays: Boolean): DataFrame = {
    val dim = loadSignDim(spark, sidecarPath)
    requireUniformDim(queries, dim, "packed dim")
    val loBits = math.min(32, dim)
    val hiBits = math.max(0, dim - 32)
    val qRaw = queries.select(col("vec_id").as("qid"),
      packSignBits(col("embedding"), 0, loBits).as("qlo"),
      (if (hiBits > 0) packSignBits(col("embedding"), 32, hiBits) else lit(0L)).as("qhi"))
    val qSig = broadcastIfMeasuredUnder(qRaw,
      s"$sidecarPath|qsig|${System.identityHashCode(queries)}",
      () => 3L * 8 + 64, maxBroadcastBytes)
    val sigProjected = sigRows.select(col("vec_id").as("cid"), col("lo"), col("hi"))
    val idx = expansionPartitioned(
      if (dedupReplays) sigProjected.dropDuplicates("cid") else sigProjected)
    val ham = qSig.join(idx, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (bit_count(col("qlo").bitwiseXOR(col("lo"))) +
          bit_count(col("qhi").bitwiseXOR(col("hi")))).as("ham"))
    val cand = rankedTopK(
      ham.select(col("qid"), col("cid"), (lit(0.0) - col("ham").cast("double")).as("sim")),
      candidates).select("qid", "cid")
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ce = Tables.embeddings(spark, corpusDir)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = broadcast(cand.join(qe, Seq("qid")))
      .join(ce, Seq("cid"))
      .select(col("qid"), col("cid"), dot(col("qe"), col("ce")).as("sim"))
    presentTopK(scored, k)
  }

  /** Product-quantization codebooks: the vector space split into `m`
    * subspaces of `dim/m` dimensions, each with `ksub` int8 code
    * vectors — seeded from the first `ksub` vectors by id (the
    * deterministic-seed contract of [[ivfTopK]] applied per subspace)
    * and then TRAINED with `iters` bounded Lloyd rounds over the int8
    * sub-vectors. The per-cell mean is the exact-integer twin of
    * [[kmeansCentroids]]'s `exactMeans` convention: group sums over
    * BIGINT sub-vector components are order-free and exact, so the
    * update is one IEEE division + `floor(x + 0.5)` per component —
    * the DuckDB oracle reproduces the trained codebooks bit-for-bit
    * (empty cells keep their previous entry, [[trainCentroids]]'s
    * fallback). `iters = 0` gives the raw seeds.
    * Int8-lattice codebook entries make every PQ distance an exact
    * BIGINT: |q−c|² ≤ dim·254², far inside both BIGINT and the double
    * mantissa, so the ranking is bit-identical in any engine — the
    * [[quantizedRecall]] exactness argument extended to the coded
    * domain (the trained means stay on the lattice by the floor).
    *
    * Driver footprint: m·ksub·(dim/m) = ksub·dim longs — the k·dim
    * bounded-collect class of the IVF centroid table. Each Lloyd round
    * is ONE corpus pass: the row-local [[pqAssign]] argmin (codebooks
    * as plan literals) into a (s, code, dim)-keyed partial agg that
    * collapses map-side to ≤ ksub·dim rows per partition — nothing
    * data-sized shuffles or reaches the driver at any corpus size.
    */
  def pqCodebooks(
      spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): (Array[Array[Array[Long]]], Int) = {
    require(iters >= 0, s"pq: iters ($iters) must be >= 0")
    // train-once-per-corpus: the codebooks are a pure deterministic
    // function of (corpus content, m, ksub, iters), so every consumer
    // in a session (encode, topK, recall's two legs, the index writer)
    // shares ONE training run — the production train/serve split. The
    // cache is validated against the corpus file's FILESYSTEM signature
    // (sorted path/length/mtime listing — [[IndexCache.dirSignature]]'s
    // documented contract: every Spark-style rewrite emits fresh part
    // names and misses the cache; an external in-place same-name-same-
    // mtime rewrite is outside the contract), so a corpus rewritten at
    // the same path retrains instead of silently serving stale
    // codebooks. r18: this replaced a per-call CONTENT stamp (count +
    // xxhash64-XOR scan) — every PQ-family query paid one full-corpus
    // Spark job per pqCodebooks call just to re-validate an unchanged
    // cache (x182 paid three); the listing is a metadata call with no
    // job at all, the exact trade IndexCache already documents for the
    // sidecar loads.
    pqCodebooksCached(spark, dir, "", m, ksub, iters)(
      int8Corpus(spark, dir).localCheckpoint())
  }

  /** The stamp-validated train-once cache shared by the base and the
    * OPQ-permuted codebooks: `variantKey` distinguishes layouts over
    * the same corpus (the permutation is itself a pure function of the
    * corpus content the stamp already guards, so the variant key only
    * needs to name the layout family, not the permutation). `corpus`
    * is by-name: a cache hit never materializes it.
    */
  private def pqCodebooksCached(
      spark: SparkSession, dir: String, variantKey: String, m: Int,
      ksub: Int, iters: Int)(
      corpus: => DataFrame): (Array[Array[Array[Long]]], Int) = {
    val key = s"$dir|pq$variantKey|$m|$ksub|$iters"
    val stamp = embSig(spark, dir)
    val cached = trainedCodebooks.get(key)
    if (cached != null && cached._2 == stamp) cached._1
    else {
      val trained = trainPqCodebooksOn(corpus, m, ksub, iters)
      trainedCodebooks.put(key, (trained, stamp))
      trained
    }
  }

  private val trainedCodebooks =
    new java.util.concurrent.ConcurrentHashMap[
      String, ((Array[Array[Array[Long]]], Int), String)]()

  /** Embedding-corpus identity for the codebook cache: the corpus
    * file's filesystem listing signature ([[IndexCache.dirSignature]] —
    * path/length/mtime, a metadata call, no Spark job). Same staleness
    * contract as every sidecar load in [[IndexCache]].
    */
  private def embSig(spark: SparkSession, dir: String): String =
    IndexCache.dirSignature(spark, Seq(s"$dir/embeddings.parquet"))

  /** The uncached training run behind [[pqCodebooks]] — see there for
    * the algorithm contract.
    */
  private[graft] def trainPqCodebooks(
      spark: SparkSession, dir: String, m: Int, ksub: Int,
      iters: Int): (Array[Array[Array[Long]]], Int) =
    trainPqCodebooksOn(
      int8Corpus(spark, dir).localCheckpoint(), // seeds + one scan per round
      m, ksub, iters)

  /** [[trainPqCodebooks]] over an ALREADY-MATERIALIZED `(vec_id, qv)`
    * int8 relation — the shared body, reused by the OPQ-permuted layout
    * (the permuted corpus trains its own codebooks; geometry contract
    * identical).
    */
  private def trainPqCodebooksOn(
      corpus: DataFrame, m: Int, ksub: Int,
      iters: Int): (Array[Array[Array[Long]]], Int) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seeds = corpus
      .filter(col("vec_id") < ksub)
      .select(col("vec_id").cast("int"), col("qv"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1)
    require(seeds.length == ksub,
      s"pq: seeding needs vectors with vec_id 0..${ksub - 1}, found ${seeds.length} of $ksub")
    val dim = seeds.head._2.length
    require(dim % m == 0, s"pq: dim $dim is not divisible by m=$m subspaces")
    val dsub = dim / m
    var cb = Array.tabulate(m) { s =>
      Array.tabulate(ksub) { c => seeds(c)._2.slice(s * dsub, (s + 1) * dsub).toArray }
    }
    for (_ <- 1 to iters) {
      val perDim = pqAssign(corpus, cb, dsub)
        .select(col("vec_id"), posexplode(array(cb.indices.map { s =>
          struct(slice(col("qv"), s * dsub + 1, dsub).as("qs"),
            element_at(col("codes"), s + 1).as("code"))
        }: _*)).as(Seq("s", "sc")))
        .select(col("s"), col("sc.code").as("code"),
          posexplode(col("sc.qs")).as(Seq("d0", "v")))
      val means = perDim.groupBy("s", "code", "d0")
        .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
        .select(col("s"), col("code"), col("d0"),
          floor(col("sv").cast("double") / col("cnt") + lit(0.5)).cast("long").as("cv"))
        .as[(Int, Int, Int, Long)].collect() // ≤ m·ksub·dsub = ksub·dim rows
        .map { case (s, c, d, v) => (s, c, d) -> v }.toMap
      cb = Array.tabulate(m)(s => Array.tabulate(ksub)(c =>
        Array.tabulate(dsub)(d => means.getOrElse((s, c, d), cb(s)(c)(d)))))
    }
    (cb, dsub)
  }

  /** Row-local PQ encoding over any `(vec_id, qv: array<bigint>)`
    * relation: per subspace, the argmin-distance code (exact integer
    * `‖q‖² − 2q·c + ‖c‖²`, ties to the lowest code id — the struct-min
    * twin of [[ivfTopK]]'s struct-max), plus the total squared
    * reconstruction error. The codebooks ride as plan literals, so this
    * is a narrow projection — no shuffle, no join, no UDF — and the SAME
    * definition encodes the batch corpus and an unbounded vector stream
    * (the [[centroidProjection]] train-once/encode-forever contract).
    */
  private[graft] def pqAssign(
      qv: DataFrame, cb: Array[Array[Array[Long]]], dsub: Int,
      passthrough: Seq[String] = Nil): DataFrame = {
    // ONE codegen'd kernel ([[graft.functions.PqOps.pq_encode]]) in
    // place of the declarative spellings that both failed at the
    // production geometry (m 16 × ksub 128): ksub inlined dot
    // expressions blew the generated-method size (the x182 Janino
    // lesson), and the transform/zip_with loop form evaluates its
    // lambdas INTERPRETED per element (higher-order functions have no
    // doGenCode) — the measured single-task wall that kept the
    // 60k-vector slice encode from finishing. The kernel's
    // `Σ_d (q−c)²` is integer-identical to the `‖q‖² − 2q·c + ‖c‖²`
    // expansion, ties to the lowest code — codes and recon_err are
    // bit-unchanged (oracle-verified).
    val enc = graft.functions.PqOps.pq_encode(col("qv"), cb)
    // passthrough lets a caller ride extra key columns (e.g. the IVF cell
    // label) through the projection WITHOUT a later re-join — the encode
    // stays one narrow corpus pass however the codes are keyed downstream
    qv.select(col("vec_id") +: passthrough.map(col) ++: Seq(col("qv"),
      enc.getField("codes").as("codes"),
      enc.getField("recon_err").as("recon_err")): _*)
  }

  /** EXT-S20 (x104) — PQ corpus encoding: every vector compressed to
    * `m` one-byte codes (m=8 here: 8 bytes/vector vs 256 float bytes —
    * a 32× compression, 4× beyond int8 and 2× beyond the sign sketch)
    * plus the exact integer reconstruction error, the quality dial the
    * (m, ksub) configuration is tuned by. Codes are emitted as their
    * CSV string so the harness hashes them portably ([[quantize]]'s
    * x32 convention).
    *
    * Scale: ONE narrow corpus pass (the [[pqAssign]] literal-codebook
    * projection) — zero shuffles beyond the presentation sort at any
    * corpus size; the codebook build reads `ksub` rows.
    */
  def pqCodes(
      spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
    pqAssign(int8Corpus(spark, dir), cb, dsub)
      .select(col("vec_id"), concat_ws(",", col("codes")).as("codes_csv"), col("recon_err"))
      .orderBy("vec_id")
  }

  /** The exact int8 dimension GRAM: for every dimension pair i < j
    * (0-based), `Σ_v qv_i·qv_j` over the int8 lattice corpus — the
    * exact-BIGINT raw-moment form of the correlation evidence
    * [[dimCorrelation]] (x109) reports normalized. Plan shape: the pair
    * index rides as ONE literal array and the products expand
    * row-locally through a `transform` LOOP (codegen iterates the
    * literal — never inlines dim²/2 expressions, the x182 Janino
    * lesson), then an (i, j)-keyed partial agg collapses map-side to
    * ≤ dim²/2 rows per partition. One corpus pass; nothing data-sized
    * shuffles or reaches the driver.
    */
  private[graft] def dimGram(spark: SparkSession, dir: String): DataFrame = {
    val corpus = int8Corpus(spark, dir)
    val dims = corpus
      .agg(min(size(col("qv"))).as("mn"), max(size(col("qv"))).as("mx")).head()
    require(!dims.isNullAt(0) && dims.getInt(0) == dims.getInt(1),
      s"dimGram needs a uniform-width corpus (got widths ${dims.get(0)}..${dims.get(1)})")
    val dim = dims.getInt(0)
    // r18: ONE native dim²/2-slot fold ([[graft.functions.GramUpper]])
    // in place of the exploded per-pair relation — the transform lambda
    // ran interpreted per element (4M struct allocations + a 4M-row
    // exchange at sf0.1); the aggregate's update is the bare multiply-
    // add loop and the shuffle carries one buffer per partition. The
    // (i, j) frame re-attaches row-locally over the ONE result row;
    // per-pair sums are bit-identical (order-free integer adds).
    val pairs = for { i <- 0 until dim; j <- (i + 1) until dim } yield (i, j)
    corpus
      .agg(graft.functions.GramUpper.gram_upper(col("qv"), dim).as("gram"))
      .select(posexplode(col("gram")).as(Seq("t", "g")))
      .select(
        element_at(typedlit(pairs), col("t") + 1).getField("_1").as("i"),
        element_at(typedlit(pairs), col("t") + 1).getField("_2").as("j"),
        col("g"))
  }

  /** EXT-S36 — OPQ-lite decorrelating subspace LAYOUT: a deterministic
    * permutation of the dimensions, derived from the exact int8 Gram,
    * that deals correlated dimensions into DIFFERENT PQ subspaces.
    * Rule: each dimension's `strength` is the largest |Gram| entry it
    * participates in (its top-partner correlation mass); dimensions are
    * ranked by (strength desc, dim asc) and DEALT round-robin — rank r
    * lands in subspace r mod m at position r div m. Mutually-top
    * correlated pairs carry EQUAL strength, so they rank adjacently and
    * the deal separates them (whenever their strength tie-block is
    * shorter than m — for the dominant pairs x109 flags, ties beyond
    * the pair itself are measure-zero); the deal is exactly balanced by
    * construction.
    *
    * This is the permutation (rotation-free) member of the OPQ family
    * (Ge et al., CVPR 2013, whose parametric form allocates dimensions
    * to balance per-subspace variance): `Similarity.scala`'s x109 note
    * cites re-rotation as what high-r² dimension pairs call for, and a
    * permutation is the rotation restricted to exact integer arithmetic
    * — which keeps every downstream distance an exact BIGINT and the
    * whole layout DuckDB-reproducible (the repo's oracle bar; a dense
    * rotation would put IEEE matrix products in every distance).
    *
    * Driver footprint: |dim| (dim, strength) rows — the bounded-collect
    * class of the centroid tables. The Gram pass is [[dimGram]]'s one
    * corpus scan.
    */
  def opqPermutation(spark: SparkSession, dir: String, m: Int = 8): Seq[Int] = {
    import spark.implicits._
    val strengths = dimGram(spark, dir)
      .select(explode(array(
        struct(col("i").as("d"), abs(col("g")).as("a")),
        struct(col("j").as("d"), abs(col("g")).as("a")))).as("e"))
      .select(col("e.d").as("d"), col("e.a").as("a"))
      .groupBy("d").agg(max("a").as("strength"))
      .as[(Int, Long)].collect() // |dim| rows — bounded by construction
    val dim = strengths.length
    require(m >= 1 && dim % m == 0, s"opq: dim $dim is not divisible by m=$m")
    val dsub = dim / m
    val ranked = strengths.sortBy { case (d, s) => (-s, d) }.map(_._1)
    val perm = Array.fill(dim)(0)
    for (r <- 0 until dim) perm((r % m) * dsub + (r / m)) = ranked(r)
    perm.toSeq
  }

  /** The permuted-vector projection: position p of the output reads
    * input dimension `perm(p)` — row-local, exact, order fixed by the
    * permutation literal.
    */
  private def permutedVec(qv: Column, perm: Seq[Int]): Column =
    array(perm.map(d => element_at(qv, lit(d + 1))): _*)

  /** EXT-S36 (`x189_pq_codes_opq`) — PQ corpus encoding under the
    * [[opqPermutation]] layout: the corpus is permuted row-locally,
    * codebooks are TRAINED on the permuted corpus (same seeds-by-id +
    * exact-integer Lloyd contract as [[pqCodebooks]], through the same
    * stamp-validated train-once cache), and every vector is encoded to
    * its `m` codes + exact reconstruction error — x104's output
    * contract over the decorrelated subspace split. Reading this next
    * to x104 at the same (m, ksub) prices the layout: the recon-err
    * delta is the coding loss the permutation did (or did not) recover
    * on this corpus, and [[pqRecallOpq]] prices it in recall terms.
    *
    * Invariance law (spec-pinned): at m = 1 the subspace split is the
    * whole vector, and distances are permutation-invariant when query
    * and codebook share the permutation — the operator is bit-equal to
    * [[pqCodes]] there; for m > 1 the split (and hence the coding
    * geometry) genuinely changes.
    */
  def pqCodesOpq(
      spark: SparkSession, dir: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val (corpusP, cb, dsub) = opqCodedCorpus(spark, dir, m, ksub, iters)
    pqAssign(corpusP, cb, dsub)
      .select(col("vec_id"), concat_ws(",", col("codes")).as("codes_csv"), col("recon_err"))
      .orderBy("vec_id")
  }

  /** The shared OPQ build: permuted int8 corpus (materialized — it
    * feeds training, encoding, and the query side) + its trained
    * codebooks from the stamp-validated cache.
    */
  private def opqCodedCorpus(
      spark: SparkSession, dir: String, m: Int, ksub: Int,
      iters: Int): (DataFrame, Array[Array[Array[Long]]], Int) = {
    val perm = opqPermutation(spark, dir, m)
    val corpusP = int8Corpus(spark, dir)
      .select(col("vec_id"), permutedVec(col("qv"), perm).as("qv"))
      .localCheckpoint()
    val (cb, dsub) = pqCodebooksCached(spark, dir, "-opq", m, ksub, iters)(corpusP)
    (corpusP, cb, dsub)
  }

  /** [[pqTopK]] under the OPQ layout: identical ADC serving plan, the
    * permuted corpus coded by permuted-trained codebooks, query side
    * permuted by the same literal (asymmetric ADC unchanged).
    */
  def pqTopKOpq(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      queryMod: Int = 10,
      m: Int = 8,
      ksub: Int = 16,
      maxBroadcastBytes: Long = 64L << 20,
      iters: Int = 2): DataFrame = {
    val (corpusP, cb, dsub) = opqCodedCorpus(spark, dir, m, ksub, iters)
    val codes = pqAssign(corpusP, cb, dsub).select(col("vec_id").as("cid"), col("codes"))
    val queriesRaw = corpusP.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("qid"), col("qv").as("qe"))
    val queries = broadcastIfMeasuredUnder(queriesRaw,
      s"$dir|pqopqq|mod=$queryMod",
      () => { val b = embRowBytes(queriesRaw, "qe"); if (b < 0) b else b * 2 },
      maxBroadcastBytes)
    adcTopK(queries, codes, cb, dsub, k)
  }

  /** [[pqRecall]] under the OPQ layout — the measured answer to "did
    * decorrelating the subspaces buy ADC recall at this (m, ksub)?".
    * The truth leg is the UNPERMUTED float brute force: a permutation
    * shared by query and corpus is cosine-invariant, so the true
    * neighbor sets are identical and the delta vs [[pqRecall]] is pure
    * coding-geometry effect.
    */
  def pqRecallOpq(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      queryMod: Int = 10,
      m: Int = 8,
      ksub: Int = 16,
      maxBroadcastBytes: Long = 64L << 20,
      iters: Int = 2): DataFrame = {
    val exact = bruteForceTopK(spark, dir, k, queryMod)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint() // consumed by the query list AND the hit join
    val approx = pqTopKOpq(spark, dir, k, queryMod, m, ksub, maxBroadcastBytes, iters)
      .select(col("vec_id"), col("neighbor_id"))
    recallTail(exact, approx, k)
  }

  /** Per-query ADC distance TABLE (Jégou et al., PAMI 2011 — asymmetric
    * distance computation served as the LUT the paper actually
    * prescribes): for an int8 query vector `qe`, entry
    * `[s][c] = ‖q_s‖² − 2·q_s·cb[s][c] + ‖cb[s][c]‖²` — m·ksub exact
    * BIGINTs computed ONCE per query row, so every scored pair
    * afterwards costs m array lookups ([[adcDistFromTable]]). The
    * query side keeps full int8 precision; only the corpus pays the
    * compression. This replaced a per-PAIR spelling (each candidate
    * re-sliced the query and re-dotted it against code-indexed codebook
    * literals) that measured ~10× slower per pair at the production
    * geometry (m 16, ksub 128) — the allocation + re-dot cost per
    * CANDIDATE is exactly what the LUT amortizes per QUERY. Spelled as
    * transform LOOPS over the codebook literals (constant codegen size
    * in ksub — the pqAssign lesson). Callers must MATERIALIZE the
    * column on the query side of the candidate join (an exchange,
    * broadcast, or checkpoint boundary — every call site guarantees
    * one); the table is |queries|·m·ksub-bounded, never corpus-sized.
    */
  private def adcTableCol(
      qe: Column, cb: Array[Array[Array[Long]]], dsub: Int): Column =
    graft.functions.PqOps.adc_table(qe, cb)

  /** The pair-side ADC distance off a [[adcTableCol]] column `dtab`:
    * Σ_s dtab[s][codes_s] — the same exact BIGINT terms [[adcDist]]
    * computes, summed in the same subspace order, so rankings and
    * emitted distances are bit-identical.
    */
  private def adcDistFromTable(m: Int): Column =
    (0 until m).map { s =>
      element_at(element_at(col("dtab"), s + 1),
        element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)

  /** The shared ADC top-k plan: queries `(qid, qe: array<bigint>)` ×
    * codes `(cid, codes: array<int>)` under the caller's broadcast
    * decision, ranked by ascending exact ADC distance (ties to the
    * lowest cid), folded map-side by the bounded [[presentTopK]]
    * aggregate. Consumed by [[pqTopK]] (in-memory legs) and
    * [[pqTopKFromIndex]] (persisted legs) — the plan shape lives here
    * exactly once.
    */
  private def adcTopK(
      queries: DataFrame,
      codes: DataFrame,
      cb: Array[Array[Array[Long]]],
      dsub: Int,
      k: Int): DataFrame = {
    // the broadcast expansion must not run in the scan's task count (one
    // task for a single code file): the same single-task fix as the x5
    // family — measured 1038 s -> (see BASELINE r14L) at the 10x slice.
    // The query side carries its ADC distance TABLE (materialized by the
    // join's own broadcast/exchange of that side — never recomputed per
    // pair), so the expansion stream pays m lookups per candidate.
    val q = queries.withColumn("dtab", adcTableCol(col("qe"), cb, dsub))
    val scored = q.join(expansionPartitioned(codes), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (lit(0L) - adcDistFromTable(cb.length)).cast("double").as("sim"))
    presentTopK(scored, k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (lit(0.0) - col("sim4")).cast("bigint").as("adc_dist"))
  }

  /** PQ-coded approximate top-k (ADC serving): the corpus is scanned as
    * 8-byte code rows — at 100 TB of float vectors the coded relation
    * is ~3 TB, an order below even the sign-sketch scan — and only the
    * distance TABLE (ksub·m literal entries) touches real vector
    * components. The scored stream folds map-side to ≤ |queries|·k rows
    * per partition before the one exchange ([[presentTopK]]'s plan).
    * Query side broadcast only under the measured guard.
    */
  def pqTopK(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      queryMod: Int = 10,
      m: Int = 8,
      ksub: Int = 16,
      maxBroadcastBytes: Long = 64L << 20,
      iters: Int = 2): DataFrame = {
    val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
    val corpus = int8Corpus(spark, dir)
    val codes = pqAssign(corpus, cb, dsub).select(col("vec_id").as("cid"), col("codes"))
    val queriesRaw = corpus.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
      .select(col("vec_id").as("qid"), col("qv").as("qe"))
    val queries = broadcastIfMeasuredUnder(queriesRaw,
      s"$dir|pqq|mod=$queryMod",
      () => { val b = embRowBytes(queriesRaw, "qe"); if (b < 0) b else b * 2 },
      maxBroadcastBytes)
    adcTopK(queries, codes, cb, dsub, k)
  }

  /** EXT-S21 (x105) — PQ recall audit: [[pqTopK]]'s ADC ranking
    * measured against the float brute-force truth with the shared
    * [[recallTail]]. THE go/no-go for serving the 32×-compressed code
    * scan: read next to [[quantizedRecall]] (int8, 4×), the recall-vs-
    * bytes curve is what picks the serving representation — and because
    * ADC distances are exact integers, a recall loss here is pure
    * quantization geometry, never engine float noise.
    */
  def pqRecall(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      queryMod: Int = 10,
      m: Int = 8,
      ksub: Int = 16,
      maxBroadcastBytes: Long = 64L << 20,
      iters: Int = 2): DataFrame = {
    val exact = bruteForceTopK(spark, dir, k, queryMod)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint() // consumed by the query list AND the hit join
    val approx = pqTopK(spark, dir, k, queryMod, m, ksub, maxBroadcastBytes, iters)
      .select(col("vec_id"), col("neighbor_id"))
    recallTail(exact, approx, k)
  }

  /** EXT-S31 (x176) — IVF-PQ composite serving (the FAISS "IVFADC"
    * architecture, Jégou et al. PAMI 2011 §IV): the coarse IVF quantizer
    * restricts each query to its `nprobe` nearest cells, and within the
    * probed cells candidates are ranked by the exact-integer ADC
    * distance over their 8-byte PQ codes — never the float vectors.
    * This is the composition both halves exist for: [[ivfTopK]] bounds
    * WHICH rows are scanned (nprobe/nCentroids of the corpus),
    * [[pqTopK]] bounds the BYTES per scanned row (m bytes vs 4·dim) —
    * multiplied, a 100 TB float corpus serves from a ~(nprobe/nCentroids)
    * · (m/4dim) slice of its raw size per query batch.
    *
    * Plan shape: ONE corpus pass produces (cell, codes) — the IVF argmax
    * and PQ argmin ride the same projection via [[pqAssign]]'s
    * passthrough, over the cell-partitioned materialized assignment that
    * [[annNprobeSweep]] shares — then the query side (sampled, fanned
    * ×nprobe) meets it in a cell equi-join; ADC scores fold map-side
    * through the bounded [[presentTopK]] aggregate. Nothing here is
    * all-pairs and no float vector crosses the wire: the join carries
    * codes only.
    *
    * Output: (vec_id, rank, neighbor_id, adc_dist) — rank by ascending
    * exact ADC distance, ties to the lowest cid; adc_dist is the exact
    * BIGINT so the oracle hash-checks the distances themselves, not
    * just the ordering.
    */
  def ivfPqTopK(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      nCentroids: Int = 16,
      queryMod: Int = 10,
      nprobe: Int = 2,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe ($nprobe) must be in [1, nCentroids=$nCentroids]")
    val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
    val (withCell, scoredCells) = ivfAssignment(spark, dir, nCentroids)
    // the one coded-corpus pass: PQ codes projected row-locally over the
    // cell-labeled assignment, cell label riding through (no re-join).
    // MATERIALIZED before the scoring join, for two reasons measured at
    // the 10× slice (119 s -> see BASELINE r15): (a) without a stage
    // boundary the encode projection (m·ksub inline argmin distances)
    // FUSES with the ADC scoring projection into one generated method
    // that exceeds Janino's limit — whole-stage codegen falls back to
    // interpreted eval for the whole pipeline, the costliest stage of
    // the query; (b) the assignment's cell-hash partitioning would make
    // scoring task skew mirror cell-population skew (the x172 census) —
    // the round-robin spread evens the expansion, and the broadcast
    // probe join needs no co-location. The checkpoint is the in-memory
    // twin of what writeIvfPqIndex persists: encode once, probe many.
    val corpusCoded = pqAssign(
      withCell.select(col("vec_id"), col("cell"),
        int8Quantize(col("embedding")).as("qv")),
      cb, dsub, passthrough = Seq("cell"))
      .select(col("cell"), col("vec_id").as("cid"), col("codes"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    // query side: sample FIRST (unprobed corpus rows never pay the
    // nprobe-cell sort), keep full int8 precision (asymmetric ADC), fan
    // out to the nprobe best cells under the ivfProbe tie-break
    val qSrc = withCell.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
    val q =
      if (nprobe == 1)
        qSrc.select(col("vec_id").as("qid"),
          adcTableCol(int8Quantize(col("embedding")), cb, dsub).as("dtab"),
          col("cell"))
      else
        qSrc.select(col("vec_id").as("qid"),
          adcTableCol(int8Quantize(col("embedding")), cb, dsub).as("dtab"),
          probeCellsCol(scoredCells, nCentroids, nprobe).as("cell"))
    // a candidate lives in exactly ONE cell and a query's probe cells
    // are distinct, so no (qid, cid) pair repeats — no dedup needed
    val scored = q.join(corpusCoded, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (lit(0L) - adcDistFromTable(cb.length)).cast("double").as("sim"))
    presentTopK(scored, k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (lit(0.0) - col("sim4")).cast("bigint").as("adc_dist"))
  }

  /** EXT-S20b — persisted PQ index: the one expensive corpus pass
    * (encode) written once; every later query batch scans 8-byte code
    * rows plus a ksub·dim codebook table. Layout: `codes/` (vec_id,
    * codes), `codebook/` (s, code, d, v — the long form of the driver
    * literals), `meta/` one (m, ksub, dim) stamp row — the
    * parameter-bundling contract of [[writeIvfIndex]]/[[writeSignIndex]]:
    * probes read the geometry from the index itself and REFUSE a
    * mismatched query batch rather than mis-rank.
    */
  /** `opq = true` persists the index under the [[opqPermutation]]
    * layout — the deployment the r17 measurement singled out as OPQ's
    * home: PURE-ADC serving (no float store reachable at query time,
    * no refine tail to absorb coding error — the +5.6% relative ADC
    * recall is then end-to-end). The permutation is STAMPED as a
    * `perm/` sidecar (pos → dim), the [[writeIvfIndex]]
    * parameter-bundling contract: the probe reads the layout from the
    * index itself and permutes the query batch identically, so a
    * query can never be scored against a layout it wasn't projected
    * into. An index without `perm/` is the legacy identity layout —
    * every existing index probes unchanged.
    */
  def writePqIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      opq: Boolean = false): Unit = {
    import spark.implicits._
    val perm = if (opq) Some(opqPermutation(spark, dir, m)) else None
    val corpus = perm.fold(int8Corpus(spark, dir))(p =>
      int8Corpus(spark, dir)
        .select(col("vec_id"), permutedVec(col("qv"), p).as("qv"))
        .localCheckpoint())
    val (cb, dsub) = perm match {
      case None => pqCodebooks(spark, dir, m, ksub, iters)
      case Some(_) => pqCodebooksCached(spark, dir, "-opq", m, ksub, iters)(corpus)
    }
    pqAssign(corpus, cb, dsub)
      .select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$indexPath/codes")
    val rows = for {
      s <- cb.indices; c <- cb(s).indices; d <- cb(s)(c).indices
    } yield (s, c, d, cb(s)(c)(d))
    rows.toDF("s", "code", "d", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/codebook")
    spark.range(1)
      .select(lit(m).as("m"), lit(ksub).as("ksub"), lit(m * dsub).as("dim"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
    perm.foreach { p =>
      p.zipWithIndex.map { case (d, pos) => (pos, d) }.toDF("pos", "d")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/perm")
    }
  }

  /** The stamped layout permutation of a persisted PQ index, or None
    * for the legacy identity layout (no `perm/` sidecar). Validated as
    * a bijection of 0..dim−1 — a corrupt layout stamp must REFUSE, not
    * silently mis-project every query batch. Memoized like the other
    * sidecars.
    */
  private def loadPqPerm(
      spark: SparkSession, indexPath: String, dim: Int): Option[Seq[Int]] =
    IndexCache.cached[Option[Seq[Int]]](
      spark, s"pqperm|$indexPath", Seq(s"$indexPath/perm")) {
      import spark.implicits._
      val path = new org.apache.hadoop.fs.Path(s"$indexPath/perm")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) None
      else {
        val rows = spark.read.parquet(s"$indexPath/perm")
          .select(col("pos"), col("d")).as[(Int, Int)].collect() // dim rows, bounded
        require(rows.length == dim && rows.map(_._2).sorted.sameElements(0 until dim),
          s"corrupt perm sidecar: ${rows.length} rows for dim $dim")
        Some(rows.sortBy(_._1).map(_._2).toSeq)
      }
    }

  /** EXT-S20b probe — ADC top-k for an arbitrary `(vec_id, embedding)`
    * query relation against a PERSISTED PQ index: results spec-pinned
    * identical to [[pqTopK]] over the same corpus. The query batch is
    * quantized row-locally and checked against the stamped dim (the
    * measured-width [[hammingTopKFromIndex]] discipline); the codebook
    * is a bounded read (ksub·dim rows) rebuilt into plan literals, so
    * the probe plan is exactly [[adcTopK]]'s — the corpus is touched
    * only through the 8-byte code scan.
    */
  def pqTopKFromIndex(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val (cb, dim, dsub) = loadPqMeta(spark, indexPath, "pq")
    requireUniformDim(queries, dim, "coded dim")
    // the stamped layout: an OPQ index projects the query batch through
    // its own persisted permutation (identity for legacy layouts) — the
    // query can never be scored against a layout it wasn't coded in
    val perm = loadPqPerm(spark, indexPath, dim)
    val qRaw = queries
      .select(col("vec_id").as("qid"),
        perm.fold(int8Quantize(col("embedding")))(p =>
          permutedVec(int8Quantize(col("embedding")), p)).as("qe"))
    val q = broadcastIfMeasuredUnder(qRaw,
      s"$indexPath|pqq|${System.identityHashCode(queries)}",
      () => { val b = embRowBytes(qRaw, "qe"); if (b < 0) b else b * 2 },
      maxBroadcastBytes)
    val codes = spark.read.parquet(s"$indexPath/codes")
      .select(col("vec_id").as("cid"), col("codes"))
    adcTopK(q, codes, cb, dsub, k)
  }

  /** EXT-S31c (`x181_ivfpq_recall`) — composite recall audit:
    * [[ivfPqTopK]]'s ranking measured against the float brute-force
    * truth with the shared [[recallTail]]. Read NEXT TO x105 (PQ over
    * the whole corpus): the recall delta between the two isolates the
    * COARSE-CELL loss term — queries whose true neighbors live outside
    * the nprobe probed cells — from x105's coding loss, which is
    * exactly the decomposition that tunes (nprobe, nCentroids)
    * separately from (m, ksub) when standing up IVFADC serving. Same
    * deliberate n·m truth-leg economics as x105 (fixed-|queries| in
    * production).
    */
  def ivfPqRecall(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      nCentroids: Int = 16,
      queryMod: Int = 10,
      nprobe: Int = 2,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val exact = bruteForceTopK(spark, dir, k, queryMod)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint() // consumed by the query list AND the hit join
    val approx = ivfPqTopK(spark, dir, k, nCentroids, queryMod, nprobe, m, ksub, iters)
      .select(col("vec_id"), col("neighbor_id"))
    recallTail(exact, approx, k)
  }

  /** EXT-S34 (`x186_ivfpq_refined`) — the IVF-PQ composite with an
    * exact-refine tail (FAISS's IndexRefine): [[ivfPqTopK]] produces an
    * ADC SHORTLIST of `shortlist` candidates per query, and the final
    * top-k re-ranks that shortlist by the exact FLOAT dot — full
    * vectors touched exclusively through the candidate-id equi-joins
    * (the [[hammingTopK]] re-rank contract: a relation bounded at
    * |queries|·shortlist rows BY CONSTRUCTION, so its broadcast is
    * sound at any corpus size and the corpus vector store is probed by
    * id, never scanned).
    *
    * This is the stage that makes the composite's recall TUNABLE past
    * the coding ceiling: x182 measured that no pure-ADC geometry in the
    * codegen-safe range clears recall 0.9 on this corpus (coding loss
    * dominates at k = 3), while coarse+refine does — see BASELINE.md's
    * r16 note for the measured winning geometry. Structural law
    * (spec-pinned): refined hits per query = |true top-k ∩ shortlist|
    * ≥ the plain composite's hits (float order IS the truth order, so a
    * shortlisted true neighbor can only be displaced by a truer one);
    * at nprobe = nCentroids and shortlist ≥ |corpus|−1 the operator
    * reproduces [[bruteForceTopK]] row for row.
    *
    * Output: (vec_id, rank, neighbor_id, sim4) — the house ANN contract.
    */
  def ivfPqTopKRefined(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      nCentroids: Int = 16,
      queryMod: Int = 10,
      nprobe: Int = 2,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      shortlist: Int = 32): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val cand = ivfPqTopK(spark, dir, shortlist, nCentroids, queryMod, nprobe,
      m, ksub, iters)
      .select(col("vec_id").as("qid"), col("neighbor_id").as("cid"))
    val emb = Tables.embeddings(spark, dir)
    val qe = emb.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ce = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    // candidate relation ≤ |queries|·shortlist rows — bounded by
    // construction, per the repo broadcast rule (hammingTopK's tail)
    val scored = broadcast(cand.join(qe, Seq("qid")))
      .join(ce, Seq("cid"))
      .select(col("qid"), col("cid"), dot(col("qe"), col("ce")).as("sim"))
    presentTopK(scored, k)
  }

  /** EXT-S34b — [[ivfPqTopKRefined]] served from the PERSISTED IVF-PQ
    * index: the ADC shortlist comes from [[ivfPqTopKFromIndex]] (static
    * partition pruning, stamped refusals — the x179 probe unchanged),
    * and the refine tail fetches float vectors from `corpusDir` BY
    * CANDIDATE ID only (the [[hammingTopKFromIndex]] separation of
    * sketch from store: the index holds codes, the primary vector store
    * is probed by id, never scanned). This is the full production
    * serving recipe in one call: pruned code scan bounds the bytes,
    * the shortlist bounds the float fetch, recall rides (nprobe,
    * shortlist). Spec-pinned equal to the in-memory
    * [[ivfPqTopKRefined]] over the same corpus and query slice (both
    * halves are individually bit-equal to their in-memory twins).
    */
  def ivfPqTopKRefinedFromIndex(
      spark: SparkSession,
      indexPath: String,
      corpusDir: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      shortlist: Int = 32,
      staticPrune: Boolean = true): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val cand = ivfPqTopKFromIndex(spark, indexPath, queries, shortlist,
      nprobe, staticPrune)
      .select(col("vec_id").as("qid"), col("neighbor_id").as("cid"))
    refineByFloatStore(spark, corpusDir, cand, queries, k)
  }

  /** The exact-refine tail shared by the persisted serving path and the
    * streaming live probe (EXT-6as): re-rank a bounded (qid, cid)
    * candidate relation by the exact float dot, corpus vectors fetched
    * BY CANDIDATE ID from `corpusDir` — the sketch/store separation
    * ([[hammingTopKFromIndex]]'s contract: the candidate relation is
    * ≤ |queries|·shortlist rows by construction, so its broadcast is
    * sound at any corpus size and the primary vector store is probed by
    * id, never scanned).
    */
  private[graft] def refineByFloatStore(
      spark: SparkSession,
      corpusDir: String,
      cand: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    val qe = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val ce = Tables.embeddings(spark, corpusDir)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = broadcast(cand.join(qe, Seq("qid")))
      .join(ce, Seq("cid"))
      .select(col("qid"), col("cid"), dot(col("qe"), col("ce")).as("sim"))
    presentTopK(scored, k)
  }

  /** EXT-S33 (`x182_ivfpq_tuning_sweep`) — the IVF-PQ GEOMETRY tuning
    * table: the composite's recall/cost knobs swept jointly — one row
    * per ((nCentroids, m, ksub) geometry cell × nprobe) with the exact
    * query census, the SCANNED-CANDIDATE count (the probe-cost proxy:
    * ADC pairs scored), exact BIGINT hit mass against the float brute
    * truth, and mean recall@k. x170 sweeps the coarse knob alone over
    * float scoring; x181 measures ONE composite point; the x51/x91/
    * x105/x181 decomposition measures WHERE the loss lives — this is
    * the operator that CHOOSES: the table a production corpus reads to
    * pick the geometry that clears its recall budget at the lowest
    * scanned-candidate cost (the r15 verdict's "audits measure, nothing
    * chooses" ask).
    *
    * Cost sharing, the x170 discipline extended to the composite:
    *  - the float brute TRUTH leg is paid once for the whole table
    *    (x105's deliberate n·m audit economics, fixed-|queries| in
    *    production);
    *  - the coarse assignment is paid once per DISTINCT nCentroids
    *    ([[Similarity.ivfAssignment]]'s materialized pass — the default
    *    grid shares one);
    *  - codebooks come from the train-once content-stamped cache
    *    ([[pqCodebooks]]), one corpus ENCODE pass per geometry cell;
    *  - the query fan-out is derived ONCE per geometry at the WIDEST
    *    nprobe with each probe cell's RANK carried: probe sets nest by
    *    construction (the x143 banding-nesting argument), so the
    *    nprobe = np sweep point is the `prank ≤ np` slice — candidate
    *    counts are monotone in nprobe BY CONSTRUCTION (spec-pinned);
    *  - the SCANNED-CANDIDATE count is computed from the |cells|-row
    *    cell-size census, never by materializing candidate pairs
    *    (exactly Σ probed |cell| − 1 self-pair per query — exact
    *    because a query's own argmax cell is always its rank-1 probe);
    *  - each sweep point's ADC expansion recomputes from the
    *    checkpointed CODED corpus rather than persisting the pair
    *    relation: Σnp/nCentroids code-scan passes of compute, zero
    *    pair-relation storage. (The r16 first cut materialized the
    *    widest-probe scored relation — |queries|·maxNp/nCentroids·n
    *    pairs — and OOM'd the 8 GB slice-bench JVM at 60k vectors;
    *    persisting a candidate-pair relation is exactly the thing that
    *    cannot survive a scale-up, while re-scanning m-byte code rows
    *    is what the composite makes cheap.)
    *
    * Scale: nothing here is all-pairs except the truth leg; the only
    * materialized relations are the coded corpus (m bytes + cell per
    * vector) and the |queries|·maxNp fan-out. Report is
    * |geometries|·|nprobes| rows.
    *
    * NOTE recall@k is NOT claimed per-query monotone in nprobe (x181's
    * documented caveat: ADC is approximate, so widening the candidate
    * set can admit a coded impostor that evicts a true hit); the
    * aggregate table at the fixture is monotone and the spec pins the
    * structural laws (candidate nesting; nprobe = nCentroids ≡ the
    * full-corpus PQ point).
    */
  def ivfPqTuningSweep(
      spark: SparkSession,
      dir: String,
      geometries: Seq[(Int, Int, Int)] = Seq((16, 4, 16), (16, 8, 16), (16, 8, 32)),
      nprobes: Seq[Int] = Seq(1, 2, 4),
      k: Int = 3,
      queryMod: Int = 10,
      iters: Int = 2): DataFrame = {
    require(geometries.nonEmpty && geometries.distinct.size == geometries.size,
      s"geometries must be non-empty and distinct (got $geometries)")
    require(nprobes.nonEmpty && nprobes.distinct.size == nprobes.size,
      s"nprobes must be non-empty and distinct (got ${nprobes.mkString(",")})")
    geometries.foreach { case (nc, m, ksub) =>
      require(nprobes.forall(p => p >= 1 && p <= nc),
        s"nprobes (${nprobes.mkString(",")}) must be in [1, nCentroids=$nc]")
      require(m >= 1 && ksub >= 1, s"degenerate geometry ($nc, $m, $ksub)")
    }
    import spark.implicits._
    val maxNp = nprobes.max
    val npArr = typedlit(nprobes)
    // the one float brute truth leg, shared by every sweep cell
    val exact = bruteForceTopK(spark, dir, k, queryMod)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint()
    // one coarse assignment per DISTINCT nCentroids in the grid
    val assignments = scala.collection.mutable.Map.empty[Int, (DataFrame, Column)]
    def assignment(nc: Int): (DataFrame, Column) =
      assignments.getOrElseUpdate(nc, ivfAssignment(spark, dir, nc))
    geometries.map { case (nc, m, ksub) =>
      val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
      val (withCell, scoredCells) = assignment(nc)
      // the one coded-corpus pass of this geometry cell (x176's build
      // half: cell label rides the encode projection, spread + pinned
      // before the scoring join — the codegen-fusion/skew note there)
      val corpusCoded = pqAssign(
        withCell.select(col("vec_id"), col("cell"),
          int8Quantize(col("embedding")).as("qv")),
        cb, dsub, passthrough = Seq("cell"))
        .select(col("cell"), col("vec_id").as("cid"), col("codes"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
      // query fan-out ONCE at the widest probe width, probe RANK carried
      // (posexplode over the same best-first slice as probeCellsCol —
      // identical tie-break): nprobe = np is the prank ≤ np slice.
      // Materialized: |queries|·maxNp narrow rows, consumed by the one
      // scoring pass AND the candidate-cost census
      val qSrc = withCell.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
      val q = qSrc
        .select(col("vec_id").as("qid"),
          adcTableCol(int8Quantize(col("embedding")), cb, dsub).as("dtab"),
          posexplode(slice(reverse(array_sort(scoredCells)), 1, maxNp)).as(Seq("pr", "pc")))
        .select(col("qid"), col("dtab"), (col("pr") + 1).cast("int").as("prank"),
          (lit(nc - 1) - col("pc").getField("nk")).as("cell"))
        .localCheckpoint()
      // scanned-candidate cost from the |cells|-row census — never from
      // a materialized pair relation: Σ probed |cell|, minus the one
      // self-pair each query sheds in its (always-probed) argmax cell.
      // r18: EVERY sweep point's census comes out of ONE bounded
      // aggregation — each (prank, csz) row is dealt row-locally to the
      // points with np >= prank and folded by np; the prank = 1 count
      // recovers the per-query self-pair correction (every np probes
      // rank 1, so the group count at any np IS |queries|). This
      // replaces a per-point filter+agg over a checkpointed qSized
      // relation plus a driver-side count() job.
      val cellSizes = corpusCoded.groupBy("cell").agg(count(lit(1)).as("csz"))
      val candByNp = q.select(col("prank"), col("cell"))
        .join(broadcast(cellSizes), Seq("cell"))
        .select(col("csz"), col("prank"),
          explode(filter(npArr, n => n >= col("prank"))).as("np"))
        .groupBy("np")
        .agg(sum(col("csz")).as("cand_sum"),
          sum(when(col("prank") === 1, lit(1L)).otherwise(lit(0L))).as("nq"))
      // r18 (guide §2.4): ONE ADC expansion at the widest probe width
      // replaces the per-point re-expansion — the coded-corpus join, the
      // m-lookup ADC scoring, and the bounded TopK exchange each ran
      // |nprobes| times over nested candidate sets (the prank <= np
      // slices); now each pair is scored once and dealt row-locally to
      // every point with np >= its probe rank, and ONE TopK aggregation
      // keyed by (np, qid) folds all sweep points map-side. Top-k sets
      // per point are unchanged: the np slice of the deal IS the
      // prank <= np candidate set under the same sim and tie-break.
      val scoredAll = q.join(corpusCoded, Seq("cell"))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), col("prank"),
          (lit(0L) - adcDistFromTable(cb.length)).cast("double").as("sim"))
      val topkAgg = graft.functions.TopK.topk(k)
      val byNp = scoredAll
        .select(col("qid"), col("sim"), col("cid"),
          explode(filter(npArr, n => n >= col("prank"))).as("np"))
        .groupBy(col("np"), col("qid"))
        .agg(topkAgg(col("sim"), col("cid")).as("nb"))
        .select(col("np"), col("qid").as("vec_id"), explode(col("nb.entries")).as("e"))
        .select(col("np"), col("vec_id"), col("e.cid").as("neighbor_id"))
      // recall hits for every point in one semi-join + one fold (the
      // recallTail algebra aggregated: n_hits = |approx ∩ exact| pairs,
      // n_queries = |distinct exact queries| — identical by uniqueness
      // of both pair relations on (vec_id, neighbor_id) within a point)
      val hitsByNp = byNp.join(exact, Seq("vec_id", "neighbor_id"), "left_semi")
        .groupBy("np").agg(count(lit(1)).as("n_hits"))
      val nQueries = exact.select("vec_id").distinct()
        .agg(count(lit(1)).as("n_queries"))
      nprobes.toDF("np")
        .join(candByNp, Seq("np"), "left")
        .join(hitsByNp, Seq("np"), "left")
        .crossJoin(broadcast(nQueries)) // 1-row totals join
        .select(lit(nc).as("n_centroids"), lit(m).as("m"), lit(ksub).as("ksub"),
          col("np").as("nprobe"), col("n_queries"),
          (col("cand_sum") - col("nq")).as("n_candidates"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .withColumn("recall4",
          round(col("n_hits").cast("double") / (col("n_queries") * k), 4))
    }.reduce(_ unionByName _).orderBy("n_centroids", "m", "ksub", "nprobe")
  }

  /** EXT-S35 (`x187_refined_tuning_sweep`) — the refined composite's
    * OPERATING-POINT tuning table: per (nprobe × shortlist) point, at a
    * FIXED (nCentroids, m, ksub) geometry, the exact query census, the
    * scanned ADC-candidate count (probe cost: code rows scored), the
    * float-fetch count (refine cost: full vectors touched by candidate
    * id — ≤ |queries|·shortlist by construction), exact BIGINT hit mass
    * against the float brute truth, and mean recall@k.
    *
    * This is [[ivfPqTuningSweep]]'s discipline applied to the knobs
    * that actually clear the recall budget: x182 proved no pure-ADC
    * geometry in the codegen-safe range reaches recall 0.9 on this
    * corpus (coding loss dominates), and [[ivfPqTopKRefined]] (x186)
    * proved the exact-refine tail does — but x186's operating point was
    * hand-measured. This operator emits the table that CHOOSES it: the
    * cheapest (nprobe, shortlist) clearing a recall budget, with both
    * cost axes priced (ADC scans scale with nprobe·mean|cell|; float
    * fetches with shortlist).
    *
    * Cost sharing (the x182 economics, one axis deeper):
    *  - ONE float brute TRUTH leg for the whole table;
    *  - ONE coarse assignment + ONE coded-corpus pass (fixed geometry);
    *  - the query fan-out derived once at the WIDEST nprobe with probe
    *    RANK carried — probe sets nest, so nprobe = np is the
    *    `prank ≤ np` slice;
    *  - per nprobe, ONE ADC ranking kept at the WIDEST shortlist:
    *    shortlists nest as RANK-SLICES of that ranking (the double-
    *    nesting law, spec-pinned) — and ONE bounded float fetch of that
    *    widest shortlist, carrying the ADC rank, so every shortlist
    *    point re-ranks an already-fetched `adc_rank ≤ sl` slice without
    *    touching the vector store again;
    *  - the scanned-candidate count comes from the |cells|-row census,
    *    never a materialized pair relation (x182's OOM lesson); the
    *    only checkpointed relations are the coded corpus, the
    *    |queries|·maxNp fan-out, and the |queries|·maxShortlist refine
    *    slice — all bounded by construction.
    *
    * Structural laws (spec-pinned): n_candidates and n_float_fetches
    * are monotone in their knobs by nesting; per-query hits are
    * monotone non-decreasing in shortlist at fixed nprobe (float order
    * IS the truth order — a shortlisted true neighbor can only be
    * displaced by a truer one, [[ivfPqTopKRefined]]'s law), and the
    * (nprobe, shortlist) grid point matching x186's defaults carries
    * exactly x186's hit mass. Recall is NOT claimed monotone in nprobe
    * (x181's ADC-impostor caveat applies to the shortlist's content).
    */
  /** `opq = true` sweeps the table under the [[opqPermutation]] layout:
    * the PQ subspace split (codebooks, corpus codes, query subvectors)
    * moves to the decorrelated deal while the COARSE quantizer, the
    * truth leg, and the float refine stay in unpermuted space (cosine
    * is permutation-invariant; only the ADC ranking inside the probed
    * set changes). The question this knob answers: does a better-coded
    * shortlist CAPTURE the true neighbors earlier, letting a smaller
    * shortlist — fewer float fetches — clear the same recall budget?
    */
  def refinedTuningSweep(
      spark: SparkSession,
      dir: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      nprobes: Seq[Int] = Seq(2, 4, 8),
      shortlists: Seq[Int] = Seq(8, 16, 32),
      k: Int = 3,
      queryMod: Int = 10,
      opq: Boolean = false): DataFrame =
    refinedTuningSweepBounded(spark, dir, nCentroids, m, ksub, iters,
      nprobes, shortlists, k, queryMod, opq)

  /** [[refinedTuningSweep]] with the float-fetch broadcast bound
    * exposed (r19, the r18 ADVICE item): the fused fetch relation
    * carries |queries|·maxSl·|nprobes| rows WITH float embeddings —
    * |nprobes|× more than the r18 per-width loop broadcast — so the
    * hint now rides a MEASURED bound (|queries| counted from the
    * cached fan-out, the rest literals) instead of unconditionally:
    * past the bound the join degrades to the planner's keyed shuffle,
    * the correct 100 TB fallback. Package-private so the spec can
    * force a tiny bound and pin the no-hint fallback.
    */
  private[graft] def refinedTuningSweepBounded(
      spark: SparkSession,
      dir: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      nprobes: Seq[Int] = Seq(2, 4, 8),
      shortlists: Seq[Int] = Seq(8, 16, 32),
      k: Int = 3,
      queryMod: Int = 10,
      opq: Boolean = false,
      maxFetchBroadcastBytes: Long = 64L << 20): DataFrame = {
    require(nprobes.nonEmpty && nprobes.distinct.size == nprobes.size,
      s"nprobes must be non-empty and distinct (got ${nprobes.mkString(",")})")
    require(shortlists.nonEmpty && shortlists.distinct.size == shortlists.size,
      s"shortlists must be non-empty and distinct (got ${shortlists.mkString(",")})")
    require(nprobes.forall(p => p >= 1 && p <= nCentroids),
      s"nprobes (${nprobes.mkString(",")}) must be in [1, nCentroids=$nCentroids]")
    require(shortlists.forall(_ >= k),
      s"shortlists (${shortlists.mkString(",")}) must be >= k ($k)")
    import spark.implicits._
    val maxNp = nprobes.max
    val maxSl = shortlists.max
    // the one float brute truth leg, shared by every sweep point
    val exact = bruteForceTopK(spark, dir, k, queryMod)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint()
    val perm = if (opq) Some(opqPermutation(spark, dir, m)) else None
    def q8(c: Column): Column =
      perm.fold(int8Quantize(c))(p => permutedVec(int8Quantize(c), p))
    val (cb, dsub) = perm match {
      case None => pqCodebooks(spark, dir, m, ksub, iters)
      case Some(p) => pqCodebooksCached(spark, dir, "-opq", m, ksub, iters)(
        int8Corpus(spark, dir)
          .select(col("vec_id"), permutedVec(col("qv"), p).as("qv"))
          .localCheckpoint())
    }
    val (withCell, scoredCells) = ivfAssignment(spark, dir, nCentroids)
    // the one coded-corpus pass (x176's build half: cell label rides the
    // encode projection; spread + pinned — the codegen-fusion/skew note)
    val corpusCoded = pqAssign(
      withCell.select(col("vec_id"), col("cell"),
        q8(col("embedding")).as("qv")),
      cb, dsub, passthrough = Seq("cell"))
      .select(col("cell"), col("vec_id").as("cid"), col("codes"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    // query fan-out once at the widest probe width, probe RANK carried
    // (the x182 spelling — identical tie-break to probeCellsCol); the
    // fan-out rows carry the per-query ADC distance TABLE in place of
    // the raw int8 query (the checkpoint materializes it once per
    // (query, probe-cell) row — |queries|·maxNp·m·ksub-bounded), so
    // every per-nprobe re-scan pays m lookups per candidate
    val qSrc = withCell.filter(pmod(col("vec_id"), lit(queryMod)) === 0)
    val q = qSrc
      .select(col("vec_id").as("qid"),
        adcTableCol(q8(col("embedding")), cb, dsub).as("dtab"),
        posexplode(slice(reverse(array_sort(scoredCells)), 1, maxNp)).as(Seq("pr", "pc")))
      .select(col("qid"), col("dtab"), (col("pr") + 1).cast("int").as("prank"),
        (lit(nCentroids - 1) - col("pc").getField("nk")).as("cell"))
      .localCheckpoint()
    // scanned-candidate cost from the |cells|-row census (x182's rule,
    // r18: one bounded aggregation serves every probe width — see
    // ivfPqTuningSweep's census note; nq recovers |queries| from the
    // always-probed rank-1 rows, replacing the checkpointed qSized
    // relation and its driver-side count() job)
    val npArr = typedlit(nprobes)
    val slArr = typedlit(shortlists)
    val cellSizes = corpusCoded.groupBy("cell").agg(count(lit(1)).as("csz"))
    val candByNp = q.select(col("prank"), col("cell"))
      .join(broadcast(cellSizes), Seq("cell"))
      .select(col("csz"), col("prank"),
        explode(filter(npArr, n => n >= col("prank"))).as("np"))
      .groupBy("np")
      .agg(sum(col("csz")).as("cand_sum"),
        sum(when(col("prank") === 1, lit(1L)).otherwise(lit(0L))).as("nq"))
    // the float store, touched ONLY by candidate-id joins in the refine
    val emb = Tables.embeddings(spark, dir)
    val fq = emb.select(col("vec_id").as("qid"), col("embedding").as("fqe"))
    val fc = emb.select(col("vec_id").as("cid"), col("embedding").as("fce"))
    // r18 (guide §2.4): ONE ADC expansion + ONE (np, qid)-keyed TopK at
    // the widest shortlist replaces the per-probe-width re-expansion —
    // the coded-corpus join and the bounded TopK exchange ran |nprobes|
    // times over nested prank <= np slices; each pair is now scored
    // once and dealt row-locally to every width with np >= its probe
    // rank. Rankings per width are unchanged (same candidate set, same
    // sim, same tie-break), so every shortlist rank-slice is unchanged.
    val scoredAll = q.join(corpusCoded, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("prank"),
        (lit(0L) - adcDistFromTable(cb.length)).cast("double").as("sim"))
    val topMax = graft.functions.TopK.topk(maxSl)
    val adcTopAll = scoredAll
      .select(col("qid"), col("sim"), col("cid"),
        explode(filter(npArr, n => n >= col("prank"))).as("np"))
      .groupBy(col("np"), col("qid"))
      .agg(topMax(col("sim"), col("cid")).as("nb"))
      .select(col("np"), col("qid"), posexplode(col("nb.entries")).as(Seq("pos", "e")))
      .select(col("np"), col("qid"), col("e.cid").as("cid"),
        (col("pos") + 1).cast("int").as("adc_rank"))
    // ONE bounded float fetch for ALL (np, shortlist) points
    // (≤ |queries|·maxSl·|nprobes| rows — was one fetch + checkpoint
    // PER probe width), ADC rank carried so every point re-ranks an
    // already-fetched adc_rank <= sl slice without touching the vector
    // store again. r19: the hint is GUARDED by the measured-size rule
    // (the repo's broadcastIfMeasuredUnder principle — |queries|
    // counted from the cached fan-out, row width from the coded
    // geometry m·dsub): the fused relation is |nprobes|× the r18
    // per-width broadcast, so an unconditional hint would be the first
    // thing to hit the 8 GB broadcast wall at a production query
    // batch. Past the bound the planner keeps its keyed shuffle join.
    val nQ = q.filter(col("prank") === 1).count() // one cheap cached job
    val fetchEstBytes = nQ * maxSl * nprobes.length * (4L * m * dsub + 96L)
    val fetchRel = adcTopAll.join(fq, Seq("qid"))
    val refScoredAll =
      (if (fetchEstBytes <= maxFetchBroadcastBytes) broadcast(fetchRel) else fetchRel)
        .join(fc, Seq("cid"))
      .select(col("np"), col("qid"), col("cid"), col("adc_rank"),
        dot(col("fqe"), col("fce")).as("sim"))
      .localCheckpoint() // consumed by the refine TopK AND the fetch census
    val topkAgg = graft.functions.TopK.topk(k)
    val refTop = refScoredAll
      .select(col("np"), col("qid"), col("cid"), col("sim"),
        explode(filter(slArr, s => s >= col("adc_rank"))).as("sl"))
      .groupBy(col("np"), col("sl"), col("qid"))
      .agg(topkAgg(col("sim"), col("cid")).as("nb"))
      .select(col("np"), col("sl"), col("qid").as("vec_id"),
        explode(col("nb.entries")).as("e"))
      .select(col("np"), col("sl"), col("vec_id"), col("e.cid").as("neighbor_id"))
    // recall hits for every grid point in one semi-join + one fold (the
    // recallTail algebra aggregated — ivfPqTuningSweep's note)
    val hitRows = refTop.join(exact, Seq("vec_id", "neighbor_id"), "left_semi")
      .groupBy("np", "sl").agg(count(lit(1)).as("n_hits"))
    val ffRows = refScoredAll
      .select(col("np"), explode(filter(slArr, s => s >= col("adc_rank"))).as("sl"))
      .groupBy("np", "sl").agg(count(lit(1)).as("n_float_fetches"))
    val nQueries = exact.select("vec_id").distinct()
      .agg(count(lit(1)).as("n_queries"))
    nprobes.flatMap(np => shortlists.map(sl => (np, sl))).toDF("np", "sl")
      .join(candByNp, Seq("np"), "left")
      .join(hitRows, Seq("np", "sl"), "left")
      .join(ffRows, Seq("np", "sl"), "left")
      .crossJoin(broadcast(nQueries)) // 1-row totals join
      .select(col("np").as("nprobe"), col("sl").as("shortlist"),
        col("n_queries"),
        (col("cand_sum") - col("nq")).as("n_candidates"),
        coalesce(col("n_float_fetches"), lit(0L)).as("n_float_fetches"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall4",
        round(col("n_hits").cast("double") / (col("n_queries") * k), 4))
      .orderBy("nprobe", "shortlist")
  }

  /** EXT-S31b — persisted IVF-PQ index (the on-disk FAISS IVFADC
    * layout): ONE corpus pass assigns the coarse cell and the PQ codes
    * in the same projection ([[ivfPqTopK]]'s build half) and writes
    * `cells/` (vec_id, codes) PARTITIONED BY the coarse cell, plus the
    * two bounded sidecar tables — `centroids/` with the
    * [[writeIvfIndex]] `n_centroids` stamp and `codebook/` + `meta/`
    * with the [[writePqIndex]] geometry stamp. No float corpus vector
    * is written at all: the index IS the (nprobe/nCentroids ×
    * m/4·dim)-shrunk serving relation, and the only float rows on disk
    * are the nCentroids coarse centroids.
    */
  /** The IVF seed centroids as driver literals — bounded by
    * construction (nCentroids rows), the same collect class as every
    * centroid table in this file. Shared by the index writer and the
    * streaming ingest encoder (EXT-6al) so both quantize against the
    * identical coarse geometry.
    */
  def ivfSeedCentroids(
      spark: SparkSession, dir: String, nCentroids: Int = 16): Seq[(Int, Seq[Float])] = {
    import spark.implicits._
    val cents = Tables.embeddings(spark, dir).filter(col("vec_id") < nCentroids)
      .select(col("vec_id").cast("int"), col("embedding"))
      .as[(Int, Seq[Float])].collect().sortBy(_._1).toSeq
    require(cents.length == nCentroids,
      s"corpus has only ${cents.length} seed rows for $nCentroids centroids")
    cents
  }

  /** Row-local IVF-PQ assignment over ANY `(vec_id, embedding)` relation
    * — batch corpus or unbounded stream: per vector its coarse cell
    * ([[ivfTopK]]'s argmax, same tie-break) AND its PQ codes + exact
    * reconstruction error ([[pqAssign]]), centroids and codebooks riding
    * as plan literals. No join, no shuffle, no state — the ingest arm of
    * [[writeIvfPqIndex]] (EXT-6al's batch face): an arriving vector is
    * routed and coded the moment it lands, so the composite serving
    * relation stays current without re-encoding the corpus.
    */
  def ivfPqAssignProjection(
      vecs: DataFrame,
      cents: Seq[(Int, Seq[Float])],
      cb: Array[Array[Array[Long]]],
      dsub: Int): DataFrame = {
    val scoredCells = ivfScoredCells(cents, col("embedding"))
    pqAssign(
      vecs.select(col("vec_id"),
        argmaxCell(scoredCells, cents.length).as("cell"),
        int8Quantize(col("embedding")).as("qv")),
      cb, dsub, passthrough = Seq("cell"))
  }

  def writeIvfPqIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2): Unit = {
    val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
    val cents = ivfSeedCentroids(spark, dir, nCentroids)
    ivfPqAssignProjection(Tables.embeddings(spark, dir), cents, cb, dsub)
      .select(col("vec_id"), col("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexPath/cells")
    writeIvfPqSidecars(spark, indexPath, cents, nCentroids, cb, m, dsub)
  }

  /** EXT-6ao's init half — train the IVF-PQ GEOMETRY on `dir` and write
    * only the bounded sidecar tables (`centroids/`, `codebook/`,
    * `meta/`) under `indexPath`, with NO code rows: the code relation
    * is then populated incrementally by the streaming maintainer
    * ([[graft.streaming.StreamOps.maintainIvfPqIndex]]), which appends
    * each arriving microbatch's encoded rows into `gen-<n>/` generation
    * directories (the EXT-6h lifecycle) instead of a static `cells/`.
    * Train once, append forever — the layout every later probe and
    * every ingest encode validates against its stamps.
    */
  def initIvfPqIndex(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2): Unit = {
    val (cb, dsub) = pqCodebooks(spark, dir, m, ksub, iters)
    val cents = ivfSeedCentroids(spark, dir, nCentroids)
    writeIvfPqSidecars(spark, indexPath, cents, nCentroids, cb, m, dsub)
  }

  /** The bounded sidecar tables of a persisted IVF-PQ index — the one
    * spelling shared by the static writer and the streaming init (a
    * drifted stamp layout would make every probe refusal lie).
    */
  private def writeIvfPqSidecars(
      spark: SparkSession,
      indexPath: String,
      cents: Seq[(Int, Seq[Float])],
      nCentroids: Int,
      cb: Array[Array[Array[Long]]],
      m: Int,
      dsub: Int): Unit = {
    import spark.implicits._
    cents.toDF("cid", "embedding")
      .withColumn("n_centroids", lit(nCentroids))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
    val rows = for {
      s <- cb.indices; c <- cb(s).indices; d <- cb(s)(c).indices
    } yield (s, c, d, cb(s)(c)(d))
    rows.toDF("s", "code", "d", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/codebook")
    val ksub = cb.headOption.map(_.length).getOrElse(0)
    spark.range(1)
      .select(lit(m).as("m"), lit(ksub).as("ksub"), lit(m * dsub).as("dim"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** EXT-S31b probe — [[ivfPqTopK]] served from the PERSISTED index:
    * results spec-pinned identical to the in-memory composite over the
    * same corpus. Combines the two refusal disciplines of its parents —
    * the [[ivfTopKFromIndex]] centroid stamp (a corrupt coarse
    * quantizer must refuse, not mis-route probes) and the
    * [[pqTopKFromIndex]] measured query width vs the coded dim (a
    * mismatched batch must refuse, not mis-rank) — and both prune
    * paths: `staticPrune` pins the batch's distinct probe cells as a
    * literal partition filter (≤ nCentroids values, the bounded
    * collect), so the planner guarantees only nprobe/nCentroids of the
    * code FILES are read, each an 8-byte-per-row scan.
    */
  def ivfPqTopKFromIndex(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int = 3,
      nprobe: Int = 2,
      staticPrune: Boolean = true): DataFrame =
    ivfPqTopKOverCells(spark, indexPath,
      spark.read.parquet(s"$indexPath/cells"), queries, k, nprobe,
      staticPrune, dedupReplays = false)

  /** The composite probe over an EXPLICIT code-row relation — shared by
    * the static layout ([[ivfPqTopKFromIndex]] reads `cells/`) and the
    * streaming-maintained layout (EXT-6ao probes the live GENERATION
    * directory resolved by `StreamOps.ivfPqIndex`). `sidecarPath` is
    * where the stamped centroids/codebook/meta live — the two layouts
    * share it.
    *
    * `dedupReplays` is the generational layout's replay shield: the
    * maintainer's at-least-once appends can only duplicate IDENTICAL
    * (cell, vec_id, codes) rows (the 6h contract — arrivals are new
    * vec_ids; re-encoding an existing id is out of contract), and a
    * duplicated code row would duplicate its (qid, cid) scored pair and
    * eat a top-k slot. `dropDuplicates` over the PRUNED code rows (m
    * bytes/row, nprobe/nCentroids of the relation) makes the probe
    * replay-IMMUNE, the winnowCandidates discipline; the static layout
    * skips it (overwrite semantics cannot duplicate) so x179's
    * bit-pinned plan is untouched.
    */
  private[graft] def ivfPqTopKOverCells(
      spark: SparkSession,
      sidecarPath: String,
      cellRows: DataFrame,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      staticPrune: Boolean,
      dedupReplays: Boolean): DataFrame = {
    val (cents, nCentroids) = loadCoarseCentroids(spark, sidecarPath)
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe ($nprobe) must be in [1, nCentroids=$nCentroids]")
    val (cb, dsub) = loadPqGeometry(spark, sidecarPath, queries, "ivfpq")
    val scoredCells = ivfScoredCells(cents, col("embedding"))
    // the probe side carries its ADC distance TABLE (adcTableCol) in
    // place of the raw int8 query: the cell equi-join's exchange (or
    // broadcast) materializes it once per (query, probe-cell) row, and
    // the candidate stream pays m lookups per code row.
    // r19 (VERDICT r18 task 2): the r18 query-side spread is REMOVED on
    // this path — the driver measured it regressing the queries it was
    // meant to help (x179 1.26→1.54 s, x191 2.53→2.82 s vs the pre-opt
    // base) and a same-session A/B this round confirmed it (see
    // OPTIMIZATION_r19.md). The float path (ivfTopKOverCells) keeps its
    // spread: there the per-pair work is a dim-wide dot product and the
    // one-task expansion measured 3.8–4.3 s (x175); here it is m table
    // lookups over ALREADY-PRUNED code rows, so the added exchange (and
    // its extra AQE stage) costs more than the parallelism buys.
    // Scale-safety without the spread: a single-partition query batch
    // only serializes the expansion when the planner BROADCASTS the
    // index side, which it does only when the pruned code relation is
    // under the broadcast threshold — and a sub-threshold code relation
    // bounds the expansion to |q|·(small) cheap ADC lookups. A larger
    // pruned index plans a shuffle join, whose exchange spreads the
    // query side anyway.
    val qSpread = queries
    val q =
      if (nprobe == 1)
        qSpread.select(col("vec_id").as("qid"),
          adcTableCol(int8Quantize(col("embedding")), cb, dsub).as("dtab"),
          argmaxCell(scoredCells, nCentroids).as("cell"))
      else
        qSpread.select(col("vec_id").as("qid"),
          adcTableCol(int8Quantize(col("embedding")), cb, dsub).as("dtab"),
          probeCellsCol(scoredCells, nCentroids, nprobe).as("cell"))
    val idxPruned =
      if (staticPrune) {
        // cell-only derivation: the prune pass never re-evaluates the
        // int8 quantize projection the probe side carries
        val cells = distinctProbeCells(queries, scoredCells, nCentroids, nprobe)
        cellRows.filter(col("cell").isin(cells.map(Int.box): _*))
      } else cellRows
    val idxProjected = idxPruned
      .select(col("cell"), col("vec_id").as("cid"), col("codes"))
    val idxDeduped =
      if (dedupReplays) idxProjected.dropDuplicates("cid") else idxProjected
    // freshly-written cell partitions are small files locally — spread
    // the probe expansion off the scan's task count (the x175 site)
    val idx = expansionPartitioned(idxDeduped)
    val scored = q.join(idx, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (lit(0L) - adcDistFromTable(cb.length)).cast("double").as("sim"))
    presentTopK(scored, k)
      .select(col("vec_id"), col("rank"), col("neighbor_id"),
        (lit(0.0) - col("sim4")).cast("bigint").as("adc_dist"))
  }

  /** The operating-point SELECTION rule over a [[refinedTuningSweep]]
    * table (EXT-S37's chooser half, shared with the x190 oracle's SQL
    * spelling): among points clearing `budget` (recall4 ≥ budget), the
    * CHEAPEST — scanned ADC candidates first (the probe cost that
    * scales with the corpus), float fetches second (the refine cost
    * bounded by |queries|·shortlist), then (nprobe, shortlist) as the
    * deterministic tail. If NO point clears, the rule degrades
    * honestly instead of failing: the max-recall point wins (cheapest
    * among recall ties), and the emitted `cleared` flag says so — the
    * consumer decides whether an unmet budget is an error, the chooser
    * never hides it. Total and deterministic on any sweep table: every
    * comparison is on exact BIGINTs or the bit-reproducible recall4.
    */
  private[graft] def selectOperatingPoint(
      sweep: DataFrame, budget: Double): DataFrame = {
    require(budget > 0.0 && budget <= 1.0,
      s"recall budget ($budget) must be in (0, 1]")
    val cleared = col("recall4") >= lit(budget)
    sweep
      .withColumn("cleared", cleared)
      .withColumn("budget", lit(budget))
      .orderBy(col("cleared").desc,
        when(col("cleared"), col("n_candidates")).otherwise(lit(-1L)),
        when(col("cleared"), col("n_float_fetches")).otherwise(lit(-1L)),
        col("recall4").desc,
        col("n_candidates"), col("n_float_fetches"),
        col("nprobe"), col("shortlist"))
      .limit(1)
  }

  /** EXT-S37 (`x190_operating_point`) — the refined composite's CHOSEN
    * serving point: [[refinedTuningSweep]]'s table folded through
    * [[selectOperatingPoint]] to ONE row — (nprobe, shortlist) plus the
    * evidence it was chosen on (census, both cost axes, hit mass,
    * recall4, the `cleared` verdict against `budget`).
    *
    * This is the step after x182 (chooses the geometry) and x187
    * (tabulates the serving points): the table stops being something a
    * human reads and becomes something the engine ACTS on — see
    * [[tuneIvfPqIndex]], which stamps this row into the persisted index
    * so the serving path probes at it with no hand-carried knobs.
    */
  def chooseOperatingPoint(
      spark: SparkSession,
      dir: String,
      budget: Double = 0.9,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      nprobes: Seq[Int] = Seq(2, 4, 8),
      shortlists: Seq[Int] = Seq(8, 16, 32),
      k: Int = 3,
      queryMod: Int = 10,
      opq: Boolean = false): DataFrame =
    selectOperatingPoint(
      refinedTuningSweep(spark, dir, nCentroids, m, ksub, iters, nprobes,
        shortlists, k, queryMod, opq),
      budget)

  /** EXT-S37b — tune a PERSISTED IVF-PQ index: run the operating-point
    * sweep against `corpusDir` UNDER THE INDEX'S OWN GEOMETRY, choose
    * per [[selectOperatingPoint]], and stamp the winning row into the
    * index as the bounded 1-row `opp/` sidecar together with the
    * [[ivfPqGeometryStamp]] it was measured under.
    *
    * Geometry binding, refused not assumed: the sweep re-derives the
    * (coarse centroids, codebooks) from `corpusDir` with the index's
    * stamped (nCentroids, m, ksub) and REFUSES if the derived geometry's
    * stamp differs from the index's — an operating point measured under
    * a different quantizer than the one serving would make every recall
    * number in the sidecar a lie (a retrained index, a different
    * training corpus, a different `iters`). The same stamp rides in
    * `opp/` so the PROBE side re-checks it on every load
    * ([[loadOperatingPoint]]): tune-then-retrain refuses at serve time
    * exactly like retrain-then-append does in the generational
    * maintainer (EXT-6ao's law, applied to the tuning sidecar).
    */
  def tuneIvfPqIndex(
      spark: SparkSession,
      indexPath: String,
      corpusDir: String,
      budget: Double = 0.9,
      iters: Int = 2,
      nprobes: Seq[Int] = Seq(2, 4, 8),
      shortlists: Seq[Int] = Seq(8, 16, 32),
      k: Int = 3,
      queryMod: Int = 10): DataFrame = {
    val (cents, cb, dim, _) = loadIvfPqGeometry(spark, indexPath)
    val stamp = ivfPqGeometryStamp(cents, cb, dim)
    val nCentroids = cents.length
    val m = cb.length
    val ksub = cb.headOption.map(_.length).getOrElse(0)
    val (cbDerived, _) = pqCodebooks(spark, corpusDir, m, ksub, iters)
    val derivedStamp = ivfPqGeometryStamp(
      ivfSeedCentroids(spark, corpusDir, nCentroids), cbDerived, dim)
    require(derivedStamp == stamp,
      s"refusing to tune: corpus at $corpusDir derives geometry $derivedStamp " +
        s"but the index at $indexPath serves $stamp — the sweep would measure " +
        "a different quantizer than the one serving (retrained index, wrong " +
        "corpus, or wrong iters)")
    val point = chooseOperatingPoint(spark, corpusDir, budget, nCentroids,
      m, ksub, iters, nprobes, shortlists, k, queryMod)
      .withColumn("geom_stamp", lit(stamp))
    point.coalesce(1).write.mode("overwrite").parquet(s"$indexPath/opp")
    spark.read.parquet(s"$indexPath/opp")
  }

  /** The stamped operating point of a tuned IVF-PQ index — the 1-row
    * `opp/` sidecar, validated before every serve: an UNTUNED index
    * refuses naming the fix ([[tuneIvfPqIndex]]), and a geometry stamp
    * that no longer matches the index's current sidecars refuses too —
    * the index was RETRAINED after tuning, so the stamped (nprobe,
    * shortlist) was chosen on recall numbers the new quantizer never
    * produced. The row read memoizes per listing signature (the
    * [[IndexCache]] contract); the stamp check re-derives from the
    * geometry loaders' own memos, so an unchanged index validates with
    * zero extra jobs.
    */
  def loadOperatingPoint(spark: SparkSession, indexPath: String): DataFrame = {
    val oppPath = new org.apache.hadoop.fs.Path(s"$indexPath/opp")
    val fs = oppPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(oppPath),
      s"ivfpq index at $indexPath has no stamped operating point — run " +
        "tuneIvfPqIndex(indexPath, corpusDir, budget) first")
    val row = IndexCache.cached(
      spark, s"ivfpqopp|$indexPath", Seq(s"$indexPath/opp")) {
      val rows = spark.read.parquet(s"$indexPath/opp").collect()
      require(rows.length == 1,
        s"corrupt opp sidecar at $indexPath: ${rows.length} rows")
      rows.head
    }
    val (cents, cb, dim, _) = loadIvfPqGeometry(spark, indexPath)
    val current = ivfPqGeometryStamp(cents, cb, dim)
    val tuned = row.getAs[String]("geom_stamp")
    require(tuned == current,
      s"stamped operating point at $indexPath was tuned under geometry " +
        s"$tuned but the index now serves $current — the index was " +
        "retrained after tuning; re-run tuneIvfPqIndex")
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(row).asJava, row.schema)
  }

  /** EXT-S38 (`x191_ivfpq_refined_auto`) — the refined composite served
    * AT THE STAMPED OPERATING POINT: [[loadOperatingPoint]]'s validated
    * (nprobe, shortlist) drives [[ivfPqTopKRefinedFromIndex]], so the
    * production serving call carries NO hand-picked knobs — the sweep
    * measured, the chooser chose, the tuner stamped, and this probes.
    * Completes the arc the tuning family opened: x182 picks the
    * geometry, x187 tabulates the serving points, x190 picks one, and
    * the serve path consumes the pick with the same refusal discipline
    * as every other stamped sidecar (untuned → refuse naming the fix;
    * retrained since tuning → refuse; the underlying probe's own width/
    * stamp refusals unchanged).
    */
  def ivfPqTopKRefinedFromIndexAuto(
      spark: SparkSession,
      indexPath: String,
      corpusDir: String,
      queries: DataFrame,
      k: Int = 3,
      staticPrune: Boolean = true): DataFrame = {
    val point = loadOperatingPoint(spark, indexPath)
      .select("nprobe", "shortlist").collect().head
    // r18 (ADVICE): the stamped shortlist must cover the serve call's k
    // — the streaming twin (ivfPqRefinedProbeLiveAuto) already refuses;
    // without this, an index tuned for a smaller k silently returns
    // under-filled top-k rows instead of naming the fix
    require(point.getInt(1) >= k,
      s"stamped operating point at $indexPath has shortlist " +
        s"${point.getInt(1)} < requested k ($k) — the index was tuned " +
        "for a smaller k; re-run tuneIvfPqIndex with k >= the serve k")
    ivfPqTopKRefinedFromIndex(spark, indexPath, corpusDir, queries, k,
      nprobe = point.getInt(0), shortlist = point.getInt(1),
      staticPrune = staticPrune)
  }
}
