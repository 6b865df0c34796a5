package graft.entries

/** Oracle SQL for the Similarity-module keys (brute/IVF/PQ/Hamming ANN, audits, sweeps) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait SimilarityOracles {
  import OracleCtes._

  /** The refined-composite sweep body parameterized by grid — shared by
    * x187 (the full table), x190 (the chooser's LIMIT-1 fold), and x191
    * (the probe at the chosen point): ONE pq chain at the fixed x176
    * geometry, ONE coarse assignment with probe rank carried to the
    * widest nprobe, ONE shared brute truth (whose all-pairs float sims
    * double as the refine scores), then one block per grid point — ADC
    * rank over the prank ≤ np slice, shortlist as the rank ≤ sl slice,
    * float re-rank, hits vs truth — ending in `tab` (the res blocks +
    * recall4). Candidate and fetch counts come off the same sliced
    * relations, mirroring the Spark side's census/nesting exactly;
    * callers append their own final SELECT over `tab` (x191's probe
    * tail also reuses `adct`/`s_ex`).
    */
  private def refinedSweepCtes(
      nprobes: Seq[Int], shortlists: Seq[Int],
      m: Int = pqM, ksub: Int = pqKsub): String = {
    val maxNp = nprobes.max
    val dsub = 64 / m
    val blocks = (for {
      np <- nprobes; sl <- shortlists
    } yield
      s"""(SELECT $np::INT AS nprobe, $sl::INT AS shortlist, nqc.n_queries,
         |  (SELECT count(*)::BIGINT FROM adct WHERE prank <= $np) AS n_candidates,
         |  (SELECT count(*)::BIGINT FROM (
         |     SELECT row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank
         |     FROM adct WHERE prank <= $np) a WHERE a.rank <= $sl) AS n_float_fetches,
         |  coalesce((SELECT count(*)::BIGINT FROM ex JOIN (
         |     SELECT t.qid, t.cid,
         |            row_number() OVER (PARTITION BY t.qid ORDER BY t.fsim DESC, t.cid) AS rank
         |     FROM (SELECT a.qid, a.cid, se.sim AS fsim
         |           FROM (SELECT qid, cid,
         |                        row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank
         |                 FROM adct WHERE prank <= $np) a
         |           JOIN s_ex se ON se.qid = a.qid AND se.cid = a.cid
         |           WHERE a.rank <= $sl) t) r
         |     ON r.qid = ex.qid AND r.cid = ex.cid AND r.rank <= $pqK), 0)::BIGINT AS n_hits
         |  FROM nqc)""".stripMargin).mkString("\nUNION ALL\n")
    s"""$e8Cte,
       |${pqChain(m, ksub, pqIters, "")},
       |ivc AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < $ivfPqNCent),
       |ive AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |iva AS (SELECT ive.vec_id, ivc.ccid,
       |               row_number() OVER (PARTITION BY ive.vec_id ORDER BY
       |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
       |                 ivc.ccid) AS rn
       |        FROM ive CROSS JOIN ivc),
       |cells AS (SELECT vec_id, ccid AS cell FROM iva WHERE rn = 1),
       |probes AS (SELECT vec_id, ccid AS cell, rn FROM iva WHERE rn <= $maxNp AND vec_id % $pqQueryMod = 0),
       |qq AS (SELECT vec_id AS qid, s, qs, nq FROM vs WHERE vec_id % $pqQueryMod = 0),
       |cand AS (SELECT p.vec_id AS qid, y.vec_id AS cid, p.rn AS prank
       |         FROM probes p JOIN cells y ON y.cell = p.cell AND y.vec_id != p.vec_id),
       |adct AS (SELECT c.qid, c.cid, c.prank,
       |         sum(q.nq - 2 * list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${dsub + 1}), i -> q.qs[i] * cb.cs[i])), (x, y) -> x + y) + cb.nc)::BIGINT AS d
       |         FROM cand c JOIN qq q ON q.qid = c.qid
       |              JOIN asg g ON g.vec_id = c.cid AND g.s = q.s
       |              JOIN cbs cb ON cb.s = g.s AND cb.code = g.code
       |         GROUP BY 1, 2, 3),
       |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % $pqQueryMod = 0),
       |fc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
       |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM fq CROSS JOIN fc WHERE qid != cid),
       |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
       |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= $pqK),
       |nqc AS (SELECT count(DISTINCT qid)::BIGINT AS n_queries FROM ex),
       |res AS (
       |$blocks
       |),
       |tab AS (SELECT nprobe, shortlist, n_queries, n_candidates, n_float_fetches, n_hits,
       |               round(n_hits::DOUBLE / (n_queries * $pqK), 4) AS recall4
       |        FROM res)""".stripMargin
  }

  /** `Similarity.selectOperatingPoint`'s rule in SQL (the x190/x191
    * chooser): cleared points first, cheapest by (ADC scans, float
    * fetches); if none clears, max recall4 wins; exact-cost then
    * (nprobe, shortlist) tails make the fold total and deterministic.
    */
  private def oppOrderBy: String =
    s"""ORDER BY (recall4 >= $oppBudget) DESC,
       |         CASE WHEN recall4 >= $oppBudget THEN n_candidates ELSE -1::BIGINT END,
       |         CASE WHEN recall4 >= $oppBudget THEN n_float_fetches ELSE -1::BIGINT END,
       |         recall4 DESC, n_candidates, n_float_fetches, nprobe, shortlist
       |LIMIT 1""".stripMargin

  protected def similarityOracles: Map[String, String] = Map(
    "x35_kmeans_centroids" -> kmeansOracle(k = 8, iters = 2),


    "x5_topk_cosine" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN c WHERE qid != cid),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 5 ORDER BY vec_id, rank""".stripMargin,


    "x6_ann_bucketed" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed,
         |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
         |  (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |s AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
         |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) AS sim
         |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,


    "x14_cosine_near_dup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed,
         |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |s AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
         |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) AS sim
         |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT v1, v2, round(sim, 4) AS sim4 FROM s WHERE sim >= 0.4 ORDER BY v1, v2""".stripMargin,


    "x15_ann_ivf" ->
      s"""WITH c AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 16),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |asg AS (SELECT e.vec_id, c.ccid,
         |               row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
         |                 c.ccid) AS rn
         |        FROM e CROSS JOIN c),
         |cells AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn = 1),
         |s AS (SELECT x.vec_id AS qid, y.vec_id AS cid,
         |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ex.ed[i] * ey.ed[i])), (x2, y2) -> x2 + y2) AS sim
         |      FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id != y.vec_id
         |      JOIN e ex ON ex.vec_id = x.vec_id JOIN e ey ON ey.vec_id = y.vec_id),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,


    // both leg ranks and the fused tie break to the lower cid; the RRF
    // sum is two IEEE terms in a fixed order, so both engines agree
    "x79_rank_fusion" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |       FROM toks, unnest(range(1, len(ts)-1)) AS t(i)),
         |ov AS (SELECT q.doc_id AS qid, c.doc_id AS cid, count(*)::BIGINT AS overlap
         |       FROM sh q JOIN sh c ON q.shingle = c.shingle
         |       WHERE q.doc_id % 10 = 0 AND q.doc_id != c.doc_id
         |       GROUP BY 1, 2),
         |lex AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, cid) AS rank_lex
         |        FROM ov QUALIFY rank_lex <= 20),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |vs AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN c WHERE qid != cid),
         |vec AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank_vec
         |        FROM vs QUALIFY rank_vec <= 20),
         |fused AS (SELECT coalesce(l.qid, v.qid) AS qid, coalesce(l.cid, v.cid) AS cid,
         |                 coalesce(1.0::DOUBLE / (60.0::DOUBLE + rank_lex), 0.0::DOUBLE) +
         |                 coalesce(1.0::DOUBLE / (60.0::DOUBLE + rank_vec), 0.0::DOUBLE) AS rrf
         |          FROM lex l FULL OUTER JOIN vec v ON l.qid = v.qid AND l.cid = v.cid),
         |r AS (SELECT qid, cid, rrf,
         |        row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rank FROM fused)
         |SELECT qid AS query_id, rank, cid AS doc_id, round(rrf, 6) AS rrf6
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,


    // x79's two leg CTEs truncated at k=agreementK; the agreement join is
    // k-bounded; k/queryMod interpolated from the SAME constants as the
    // Spark call so neither side can drift alone
    "x103_retriever_agreement" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |       FROM toks, unnest(range(1, len(ts)-1)) AS t(i)),
         |ov AS (SELECT q.doc_id AS qid, c.doc_id AS cid, count(*)::BIGINT AS overlap
         |       FROM sh q JOIN sh c ON q.shingle = c.shingle
         |       WHERE q.doc_id % $agreementQueryMod = 0 AND q.doc_id != c.doc_id
         |       GROUP BY 1, 2),
         |lex AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, cid) AS rank_lex
         |        FROM ov QUALIFY rank_lex <= $agreementK),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % $agreementQueryMod = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |vs AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN c WHERE qid != cid),
         |vec AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank_vec
         |        FROM vs QUALIFY rank_vec <= $agreementK),
         |ln AS (SELECT qid, count(*)::BIGINT AS n_lex FROM lex GROUP BY 1),
         |vn AS (SELECT qid, count(*)::BIGINT AS n_vec FROM vec GROUP BY 1),
         |cm AS (SELECT l.qid, count(*)::BIGINT AS n_common
         |       FROM lex l JOIN vec v ON v.qid = l.qid AND v.cid = l.cid GROUP BY 1)
         |SELECT vn.qid AS query_id, coalesce(n_lex, 0)::BIGINT AS n_lex, n_vec,
         |       coalesce(n_common, 0)::BIGINT AS n_common,
         |       coalesce(n_common, 0)::DOUBLE / $agreementK AS overlap_frac
         |FROM vn LEFT JOIN ln ON ln.qid = vn.qid LEFT JOIN cm ON cm.qid = vn.qid
         |ORDER BY query_id""".stripMargin,


    // sign-bit signatures packed into two 32-bit halves (bit 63 would
    // overflow a BIGINT shift); hamming ties at the candidate boundary
    // and cosine ties in the re-rank both break to the lower cid
    "x80_hamming_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 33),
         |    i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)),
         |    (a, b) -> a + b) AS lo,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(range(33, 65),
         |    i -> CASE WHEN embedding[i] >= 0 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT END)),
         |    (a, b) -> a + b) AS hi
         |  FROM embeddings),
         |h AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
         |             bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi)) AS ham
         |      FROM e q JOIN e c ON q.vec_id % 10 = 0 AND q.vec_id != c.vec_id),
         |cand AS (SELECT qid, cid,
         |           row_number() OVER (PARTITION BY qid ORDER BY ham, cid) AS hrank
         |         FROM h QUALIFY hrank <= 20),
         |s AS (SELECT cand.qid, cand.cid, $dotCte AS sim
         |      FROM cand JOIN (SELECT vec_id, ed AS qe FROM e) a ON a.vec_id = cand.qid
         |                JOIN (SELECT vec_id, ed AS ce FROM e) b ON b.vec_id = cand.cid),
         |r AS (SELECT qid, cid, sim,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,


    "x94_dim_audit" ->
      """WITH v AS (SELECT (i - 1)::BIGINT AS dim, embedding[i] AS v
        |           FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))
        |SELECT dim, count(*)::BIGINT AS n_vals,
        |       sum(CASE WHEN v = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
        |       sum(CASE WHEN v > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |       sum(CASE WHEN v < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
        |       min(v)::DOUBLE AS min_v, max(v)::DOUBLE AS max_v,
        |       (min(v) = max(v)) AS dead
        |FROM v GROUP BY dim ORDER BY dim""".stripMargin,


    "x109_dim_correlation" ->
      """WITH qz AS (SELECT list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS qv FROM embeddings),
        |p AS (SELECT i::BIGINT AS d1, j::BIGINT AS d2, sum(qv[i] * qv[j])::BIGINT AS s
        |      FROM qz, unnest(range(1, 65)) AS a(i), unnest(range(1, 65)) AS b(j)
        |      WHERE i <= j GROUP BY 1, 2),
        |d AS (SELECT d1 AS dd, s AS sdd FROM p WHERE d1 = d2)
        |SELECT p.d1, p.d2, p.s, a.sdd AS s11, b.sdd AS s22,
        |       CASE WHEN a.sdd::DOUBLE * b.sdd::DOUBLE = 0 THEN NULL
        |            ELSE (p.s::DOUBLE * p.s::DOUBLE) / (a.sdd::DOUBLE * b.sdd::DOUBLE) END AS r2
        |FROM p JOIN d a ON a.dd = p.d1 JOIN d b ON b.dd = p.d2
        |WHERE p.d1 < p.d2
        |ORDER BY abs(p.s) DESC, p.d1, p.d2 LIMIT 20""".stripMargin,


    "x32_quantize_embeddings" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding, x -> floor(x::DOUBLE * 127.0 + 0.5)::INT), ',') AS q_csv,
        |  list_aggregate(list_transform(embedding,
        |    x -> abs(x::DOUBLE - floor(x::DOUBLE * 127.0 + 0.5) / 127.0)), 'max') AS max_err
        |FROM embeddings ORDER BY vec_id""".stripMargin,


    "x104_pq_codes" ->
      s"""WITH $pqCte
         |SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY s) AS codes_csv,
         |       sum(d)::BIGINT AS recon_err
         |FROM asg GROUP BY vec_id ORDER BY vec_id""".stripMargin,


    // the OPQ-permuted encode: the exact int8 Gram, each dim's
    // top-partner strength, the (strength DESC, dim) round-robin deal
    // into subspaces, then the UNCHANGED pq chain over the permuted
    // corpus — a wrong gram, rank, deal, or permuted slice all move the
    // codes and fail the hash. Oracle dims are 1-based (qv[d]); the
    // rank/deal arithmetic is base-free
    "x189_pq_codes_opq" ->
      s"""WITH $e8Cte,
         |gd AS (SELECT unnest(range(1, 65))::INT AS i),
         |gp AS (SELECT a.i AS i, b.i AS j FROM gd a JOIN gd b ON b.i > a.i),
         |gram AS (SELECT gp.i, gp.j, sum(e8.qv[gp.i] * e8.qv[gp.j])::BIGINT AS g
         |         FROM e8 CROSS JOIN gp GROUP BY 1, 2),
         |gds AS (SELECT i AS d, abs(g) AS a FROM gram UNION ALL SELECT j AS d, abs(g) AS a FROM gram),
         |gst AS (SELECT d, max(a) AS strength FROM gds GROUP BY d),
         |grk AS (SELECT d, (row_number() OVER (ORDER BY strength DESC, d) - 1)::INT AS r FROM gst),
         |gpm AS (SELECT ((r % $pqM) * $pqDsub + (r // $pqM))::INT AS pos, d FROM grk),
         |pe8 AS (SELECT e8.vec_id, list(e8.qv[gpm.d] ORDER BY gpm.pos) AS qv
         |        FROM e8 CROSS JOIN gpm GROUP BY e8.vec_id),
         |${pqChain(pqM, pqKsub, pqIters, "o_", src = "pe8")}
         |SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY s) AS codes_csv,
         |       sum(d)::BIGINT AS recon_err
         |FROM o_asg GROUP BY vec_id ORDER BY vec_id""".stripMargin,


    "x105_pq_recall" ->
      s"""WITH $pqCte,
         |qq AS (SELECT vec_id AS qid, s, qs, nq FROM vs WHERE vec_id % $pqQueryMod = 0),
         |adct AS (SELECT q.qid, g.vec_id AS cid,
         |         sum(q.nq - 2 * list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${pqDsub + 1}), i -> q.qs[i] * c.cs[i])), (x, y) -> x + y) + c.nc)::BIGINT AS d
         |         FROM qq q JOIN asg g ON g.s = q.s AND g.vec_id != q.qid
         |              JOIN cbs c ON c.s = g.s AND c.code = g.code
         |         GROUP BY 1, 2),
         |rq AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank FROM adct),
         |pqn AS (SELECT qid, cid FROM rq WHERE rank <= $pqK),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % $pqQueryMod = 0),
         |fc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM fq CROSS JOIN fc WHERE qid != cid),
         |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
         |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= $pqK),
         |hits AS (SELECT ex.qid, count(pqn.cid)::BIGINT AS hits
         |         FROM ex LEFT JOIN pqn ON pqn.qid = ex.qid AND pqn.cid = ex.cid
         |         GROUP BY 1)
         |SELECT qid AS vec_id, hits, hits::DOUBLE / $pqK AS recall
         |FROM hits ORDER BY vec_id""".stripMargin,


    // IVF-PQ composite: x58's coarse cells/probes (renamed ivc/ive/iva —
    // the pq chain owns `asg`) restrict the candidate set; x105's exact-
    // BIGINT ADC ranks it; distances themselves are hash-checked
    "x176_ivfpq_topk" ->
      s"""WITH $ivfPqCtes
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, d AS adc_dist
         |FROM rr WHERE rank <= $pqK ORDER BY vec_id, rank""".stripMargin,


    // the composite + exact-refine tail: x176's ranked relation widened
    // to the shortlist, then a float re-rank over the shortlisted pairs
    // only (the bounded candidate-id joins), presented by x5's contract
    "x186_ivfpq_refined" ->
      s"""WITH $ivfPqCtes,
         |sl AS (SELECT qid, cid FROM rr WHERE rank <= $refineShortlist),
         |fv AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |rs AS (SELECT sl.qid, sl.cid,
         |       list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) AS sim
         |       FROM sl JOIN fv a ON a.vec_id = sl.qid JOIN fv b ON b.vec_id = sl.cid),
         |rr2 AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM rs)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM rr2 WHERE rank <= $pqK ORDER BY vec_id, rank""".stripMargin,


    // the IVF-PQ geometry tuning table: one prefixed PQ chain per
    // (m, ksub) cell (pqChain — the x35/x170 unroll convention), ONE
    // shared coarse assignment + probe-rank relation (all cells share
    // nCentroids), one shared brute truth, then one ranked block per
    // (cell, nprobe) over the prank ≤ np candidate slice — candidate
    // sets nest by construction, exactly like the Spark side's single
    // materialized scored relation
    "x182_ivfpq_tuning_sweep" -> {
      // the oracle builds ONE coarse assignment (at ivfPqNCent) shared
      // by every geometry block — self-enforce the grid constraint the
      // Spark side handles per-distinct-nc, so an extended grid fails
      // HERE with a clear message instead of as a confusing hash
      // mismatch against the wrong coarse geometry
      require(sweepGeoms.forall(_._1 == ivfPqNCent),
        s"x182 oracle shares one coarse assignment at nCentroids=$ivfPqNCent; " +
          s"grid cells with a different nCentroids need their own iva chain: $sweepGeoms")
      val maxNp = sweepNprobes.max
      val prefixed = sweepGeoms.zipWithIndex.map { case (g, i) => (g, s"g${i}_") }
      val chains = prefixed.map { case ((_, m, ksub), p) =>
        pqChain(m, ksub, pqIters, p)
      }.mkString(",\n")
      val adcts = prefixed.map { case ((_, m, _), p) =>
        val dsub = 64 / m
        s"""${p}qq AS (SELECT vec_id AS qid, s, qs, nq FROM ${p}vs WHERE vec_id % $pqQueryMod = 0),
           |${p}adct AS (SELECT c.qid, c.cid, c.prank,
           |         sum(q.nq - 2 * list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${dsub + 1}), i -> q.qs[i] * cb.cs[i])), (x, y) -> x + y) + cb.nc)::BIGINT AS d
           |         FROM cand c JOIN ${p}qq q ON q.qid = c.qid
           |              JOIN ${p}asg g ON g.vec_id = c.cid AND g.s = q.s
           |              JOIN ${p}cbs cb ON cb.s = g.s AND cb.code = g.code
           |         GROUP BY 1, 2, 3)""".stripMargin
      }.mkString(",\n")
      val blocks = prefixed.flatMap { case ((nc, m, ksub), p) =>
        sweepNprobes.map { np =>
          s"""(SELECT $nc::INT AS n_centroids, $m::INT AS m, $ksub::INT AS ksub, $np::INT AS nprobe,
             |  nqc.n_queries,
             |  (SELECT count(*)::BIGINT FROM ${p}adct WHERE prank <= $np) AS n_candidates,
             |  coalesce((SELECT count(*)::BIGINT FROM ex JOIN (
             |     SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank
             |     FROM ${p}adct WHERE prank <= $np) a
             |     ON a.qid = ex.qid AND a.cid = ex.cid AND a.rank <= $pqK), 0)::BIGINT AS n_hits
             |  FROM nqc)""".stripMargin
        }
      }.mkString("\nUNION ALL\n")
      s"""WITH $e8Cte,
         |$chains,
         |ivc AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < $ivfPqNCent),
         |ive AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |iva AS (SELECT ive.vec_id, ivc.ccid,
         |               row_number() OVER (PARTITION BY ive.vec_id ORDER BY
         |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
         |                 ivc.ccid) AS rn
         |        FROM ive CROSS JOIN ivc),
         |cells AS (SELECT vec_id, ccid AS cell FROM iva WHERE rn = 1),
         |probes AS (SELECT vec_id, ccid AS cell, rn FROM iva WHERE rn <= $maxNp AND vec_id % $pqQueryMod = 0),
         |cand AS (SELECT p.vec_id AS qid, y.vec_id AS cid, p.rn AS prank
         |         FROM probes p JOIN cells y ON y.cell = p.cell AND y.vec_id != p.vec_id),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % $pqQueryMod = 0),
         |fc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM fq CROSS JOIN fc WHERE qid != cid),
         |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
         |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= $pqK),
         |nqc AS (SELECT count(DISTINCT qid)::BIGINT AS n_queries FROM ex),
         |$adcts,
         |res AS (
         |$blocks
         |)
         |SELECT n_centroids, m, ksub, nprobe, n_queries, n_candidates, n_hits,
         |       round(n_hits::DOUBLE / (n_queries * $pqK), 4) AS recall4
         |FROM res ORDER BY n_centroids, m, ksub, nprobe""".stripMargin
    },


    // the refined composite's (nprobe × shortlist) tuning table — the
    // shared refinedSweepCtes body at the x187 grid, presented in full
    "x187_refined_tuning_sweep" ->
      s"""WITH ${refinedSweepCtes(refinedSweepNprobes, refinedSweepShortlists)}
         |SELECT nprobe, shortlist, n_queries, n_candidates, n_float_fetches, n_hits, recall4
         |FROM tab ORDER BY nprobe, shortlist""".stripMargin,


    // the CHOSEN operating point (the x190 key): the sweep at the
    // opp grid (wide enough that the 0.9 budget is attainable at
    // sf0.1) folded to one row by the selection rule — both engines
    // compute the identical table (x187's law) and apply the identical
    // deterministic ORDER BY, so the stamped choice is hash-checkable
    "x190_operating_point" ->
      s"""WITH ${refinedSweepCtes(oppNprobes, oppShortlists, oppM, oppKsub)}
         |SELECT nprobe, shortlist, n_queries, n_candidates, n_float_fetches, n_hits, recall4,
         |       recall4 >= $oppBudget AS cleared, $oppBudget::DOUBLE AS budget
         |FROM tab
         |$oppOrderBy""".stripMargin,


    // the refined composite served AT the chosen point (the x191 key):
    // the same sweep + selection as x190 in a CTE, then the probe tail
    // at the scalar-subquery (nprobe, shortlist) — ADC rank over the
    // prank ≤ chosen-np slice, shortlist as the rank slice, float
    // re-rank, x5's presentation. The oracle recomputes the CHOICE and
    // the SERVE in one statement, so a Spark-side stamp that drifted
    // from the sweep's own winner fails the hash
    "x191_ivfpq_refined_auto" ->
      s"""WITH ${refinedSweepCtes(oppNprobes, oppShortlists, oppM, oppKsub)},
         |opp AS (SELECT nprobe, shortlist FROM tab
         |$oppOrderBy),
         |adcr AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank
         |         FROM adct WHERE prank <= (SELECT nprobe FROM opp)),
         |slc AS (SELECT qid, cid FROM adcr WHERE rank <= (SELECT shortlist FROM opp)),
         |rs AS (SELECT slc.qid, slc.cid, se.sim FROM slc JOIN s_ex se ON se.qid = slc.qid AND se.cid = slc.cid),
         |rr2 AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM rs)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM rr2 WHERE rank <= $pqK ORDER BY vec_id, rank""".stripMargin,


    // x176's ranking measured against the float brute truth with x105's
    // recall tail: the one extra loss term vs x105 is the coarse cell
    // restriction — the number that picks nprobe for IVFADC serving
    "x181_ivfpq_recall" ->
      s"""WITH $ivfPqCtes,
         |ivfpqn AS (SELECT qid, cid FROM rr WHERE rank <= $pqK),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % $pqQueryMod = 0),
         |fc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM fq CROSS JOIN fc WHERE qid != cid),
         |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
         |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= $pqK),
         |hits AS (SELECT ex.qid, count(ivfpqn.cid)::BIGINT AS hits
         |         FROM ex LEFT JOIN ivfpqn ON ivfpqn.qid = ex.qid AND ivfpqn.cid = ex.cid
         |         GROUP BY 1)
         |SELECT qid AS vec_id, hits, hits::DOUBLE / $pqK AS recall
         |FROM hits ORDER BY vec_id""".stripMargin,


    // float trained-centroid assignment (af — the x54/x57 spelling) +
    // int8-lattice margins (x114's exactness device) scored on the SAME
    // L2 objective the assignment maximizes (2·qv·c8 − ‖c8‖² — the r15
    // advisory: a plain dot's margin can reflect the omitted norm term
    // for unequal-norm trained centroids, not assignment disagreement):
    // own-cell objective vs best other, exact BIGINT folds, two single
    // IEEE divisions; dead cells as zero rows off the k-row frame
    // (x172's rule)
    "x180_cluster_separation" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        """,
          |qz AS (SELECT e.vec_id, list_transform(e.ed, x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS qv FROM e),
          |cq AS (SELECT cid, cv,
          |       list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), i -> cv[i] * cv[i])), (a, b) -> a + b) AS nc
          |       FROM (SELECT cid, list_transform(cd, x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS cv FROM c2) t),
          |sall AS (SELECT q.vec_id, c.cid,
          |         2 * list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])), (a, b) -> a + b) - c.nc AS s
          |         FROM qz q CROSS JOIN cq c),
          |oth AS (SELECT s2.vec_id, max(s2.s) AS s_other
          |        FROM sall s2 JOIN af a2 ON a2.vec_id = s2.vec_id AND s2.cid != a2.cid GROUP BY 1),
          |mg AS (SELECT af.cid AS cell, o.s - oth.s_other AS margin
          |       FROM af JOIN sall o ON o.vec_id = af.vec_id AND o.cid = af.cid
          |              JOIN oth ON oth.vec_id = af.vec_id),
          |agg AS (SELECT cell, count(*)::BIGINT AS n_vectors, sum(margin)::BIGINT AS margin_mass,
          |        sum(CASE WHEN margin < 0 THEN 1 ELSE 0 END)::BIGINT AS n_misfit FROM mg GROUP BY 1)
          |SELECT t.cell::BIGINT AS cell, coalesce(n_vectors, 0)::BIGINT AS n_vectors,
          |       coalesce(margin_mass, 0)::BIGINT AS margin_mass,
          |       CASE WHEN n_vectors IS NULL THEN NULL ELSE round(margin_mass::DOUBLE / n_vectors, 4) END AS mean_margin4,
          |       coalesce(n_misfit, 0)::BIGINT AS n_misfit,
          |       CASE WHEN n_vectors IS NULL THEN NULL ELSE round(n_misfit::DOUBLE / n_vectors, 4) END AS misfit_frac4
          |FROM (SELECT unnest(range(0, 8)) AS cell) t LEFT JOIN agg ON agg.cell = t.cell
          |ORDER BY t.cell""".stripMargin),


    "x91_quantized_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |qz AS (SELECT vec_id, list_transform(ed, x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS qv FROM e),
         |qq AS (SELECT vec_id AS qid, qv AS qe FROM qz WHERE vec_id % 10 = 0),
         |qc AS (SELECT vec_id AS cid, qv AS ce FROM qz),
         |s_q AS (SELECT qid, cid,
         |      list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), i -> qe[i] * ce[i])), (a, b) -> a + b) AS sim
         |      FROM qq CROSS JOIN qc WHERE qid != cid),
         |r_q AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_q),
         |qn AS (SELECT qid, cid FROM r_q WHERE rank <= 3),
         |fq AS (SELECT vec_id AS qid, ed AS qe FROM e WHERE vec_id % 10 = 0),
         |fc AS (SELECT vec_id AS cid, ed AS ce FROM e),
         |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM fq CROSS JOIN fc WHERE qid != cid),
         |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
         |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= 3),
         |hits AS (SELECT ex.qid, count(qn.cid)::BIGINT AS hits
         |         FROM ex LEFT JOIN qn ON qn.qid = ex.qid AND qn.cid = ex.cid
         |         GROUP BY 1)
         |SELECT qid AS vec_id, hits, hits::DOUBLE / 3 AS recall
         |FROM hits ORDER BY vec_id""".stripMargin,


    "x44_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qe
         |           FROM embeddings WHERE vec_id % 5 = 0),
         |c AS (SELECT vec_id AS cid, label AS cl, embedding::DOUBLE[] AS ce FROM embeddings),
         |s AS (SELECT qid, cid, $dotCte AS sim
         |      FROM q CROSS JOIN c WHERE qid != cid AND ql != cl),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,


    "x51_ann_recall" ->
      s"""WITH c AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 16),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |asg AS (SELECT e.vec_id, c.ccid,
         |               row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
         |                 c.ccid) AS rn
         |        FROM e CROSS JOIN c),
         |cells AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn = 1),
         |s_ann AS (SELECT x.vec_id AS qid, y.vec_id AS cid,
         |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ex.ed[i] * ey.ed[i])), (x2, y2) -> x2 + y2) AS sim
         |      FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id != y.vec_id
         |      JOIN e ex ON ex.vec_id = x.vec_id JOIN e ey ON ey.vec_id = y.vec_id),
         |r_ann AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ann),
         |ann AS (SELECT qid, cid FROM r_ann WHERE rank <= 3 AND qid % 10 = 0),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN cc WHERE qid != cid),
         |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
         |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= 3),
         |hits AS (SELECT ex.qid, count(ann.cid)::BIGINT AS hits
         |         FROM ex LEFT JOIN ann ON ann.qid = ex.qid AND ann.cid = ex.cid
         |         GROUP BY 1)
         |SELECT qid AS vec_id, hits, hits::DOUBLE / 3 AS recall
         |FROM hits ORDER BY vec_id""".stripMargin,


    "x58_ann_multiprobe" ->
      s"""WITH c AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 16),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |asg AS (SELECT e.vec_id, c.ccid,
         |               row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
         |                 c.ccid) AS rn
         |        FROM e CROSS JOIN c),
         |cells AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn = 1),
         |probes AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn <= 2),
         |s AS (SELECT x.vec_id AS qid, y.vec_id AS cid,
         |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ex.ed[i] * ey.ed[i])), (x2, y2) -> x2 + y2) AS sim
         |      FROM probes x JOIN cells y ON x.cell = y.cell AND x.vec_id != y.vec_id
         |      JOIN e ex ON ex.vec_id = x.vec_id JOIN e ey ON ey.vec_id = y.vec_id),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s)
         |SELECT qid AS vec_id, rank, cid AS neighbor_id, round(sim, 4) AS sim4
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,


    "x54_semantic_dedup" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        """,
          |p AS (SELECT x.vec_id AS v1, count(*) AS n_dups
          |      FROM af x JOIN af y ON x.cid = y.cid AND y.vec_id < x.vec_id
          |      JOIN e ex ON ex.vec_id = x.vec_id
          |      JOIN e ey ON ey.vec_id = y.vec_id
          |      WHERE list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ex.ed[i] * ey.ed[i])), (a, b) -> a + b) >= 0.4
          |      GROUP BY 1)
          |SELECT af.vec_id, af.cid AS cell, coalesce(p.n_dups, 0)::BIGINT AS n_dups,
          |       coalesce(p.n_dups, 0) = 0 AS is_kept
          |FROM af LEFT JOIN p ON p.v1 = af.vec_id ORDER BY af.vec_id""".stripMargin),


    "x57_centroid_sim" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        """
          |SELECT af.vec_id, af.cid AS cell,
          |       round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> e.ed[i] * c.cd[i])), (a, b) -> a + b)
          |             / sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> c.cd[i] * c.cd[i])), (a, b) -> a + b)), 4) AS cent_sim4
          |FROM af JOIN e ON e.vec_id = af.vec_id JOIN c2 c ON c.cid = af.cid
          |ORDER BY af.vec_id""".stripMargin),


    // exact-integer per-dimension mean shift over the int8 quantization;
    // same parity-split convention and numerator spelling as x60. The
    // two same-level unnests zip in DuckDB (list element + its index)
    "x64_embedding_drift" ->
      """WITH e AS (SELECT vec_id % 2 AS parity,
        |  unnest(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 + 0.5) AS BIGINT))) AS q,
        |  unnest(range(1, len(embedding) + 1)) AS dim
        |FROM embeddings)
        |SELECT dim, n_a, n_b, sum_a, sum_b,
        |       (sum_a * n_b - sum_b * n_a) AS shift_numer,
        |       CAST(sum_a * n_b - sum_b * n_a AS DOUBLE) / (n_a * n_b) AS q_shift
        |FROM (SELECT dim,
        |        sum(CASE WHEN parity = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |        sum(CASE WHEN parity = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |        sum(CASE WHEN parity = 0 THEN q ELSE 0 END)::BIGINT AS sum_a,
        |        sum(CASE WHEN parity = 1 THEN q ELSE 0 END)::BIGINT AS sum_b
        |      FROM e GROUP BY dim)
        |ORDER BY dim""".stripMargin,


    // max cosine vs the benchmark slice; rank on the UNROUNDED sim with
    // the lower-cid tie-break (presentTopK's struct-max, x58's spelling)
    "x112_semantic_contamination" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |b AS (SELECT vec_id AS cid, ed AS ce FROM e WHERE vec_id % $contamBenchMod = 0),
         |c AS (SELECT vec_id AS qid, ed AS qe FROM e WHERE vec_id % $contamBenchMod != 0),
         |s AS (SELECT qid, cid, $dotCte AS sim FROM c CROSS JOIN b),
         |r AS (SELECT qid, cid, sim,
         |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn FROM s)
         |SELECT qid AS vec_id, cid AS bench_id, round(sim, 4) AS sim4,
         |       round(sim, 4) >= $contamTau AS contaminated
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,


    // within-cell rank on the ROUNDED cent_sim4 (both engines rank the
    // identical rounded doubles; vec_id breaks ties deterministically)
    "x114_cell_outliers" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        s""",
           |cs AS (SELECT af.vec_id, af.cid AS cell,
           |       round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> e.ed[i] * c.cd[i])), (a, b) -> a + b)
           |             / sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> c.cd[i] * c.cd[i])), (a, b) -> a + b)), 4) AS cent_sim4
           |       FROM af JOIN e ON e.vec_id = af.vec_id JOIN c2 c ON c.cid = af.cid),
           |r AS (SELECT vec_id, cell, cent_sim4,
           |             row_number() OVER (PARTITION BY cell ORDER BY cent_sim4, vec_id)::BIGINT AS rn,
           |             count(*) OVER (PARTITION BY cell)::BIGINT AS n_cell FROM cs)
           |SELECT vec_id, cell, cent_sim4, rn, n_cell, rn * $outlierPctDen <= n_cell AS outlier
           |FROM r ORDER BY vec_id""".stripMargin),


    // x5's exact top-k relation folded to the k-occurrence census, the
    // corpus left join keeping the n_hits = 0 anti-hub class visible
    "x136_hubness" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN c WHERE qid != cid),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s),
         |occ AS (SELECT cid, count(*)::BIGINT AS hits FROM r WHERE rank <= 5 GROUP BY 1),
         |n AS (SELECT coalesce(occ.hits, 0)::BIGINT AS n_hits
         |      FROM c LEFT JOIN occ ON occ.cid = c.cid)
         |SELECT n_hits, count(*)::BIGINT AS n_vectors FROM n GROUP BY 1 ORDER BY 1""".stripMargin,


    // one pass, both conditional maxes; NULL pos/margin/noisy for a
    // query alone in its label (absence is a finding)
    "x138_negative_margin" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS qlabel
         |           FROM embeddings WHERE vec_id % 5 = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, label AS clabel FROM embeddings),
         |s AS (SELECT qid, qlabel, qlabel = clabel AS same, $dotCte AS sim
         |      FROM q CROSS JOIN c WHERE qid != cid),
         |a AS (SELECT qid, qlabel,
         |             max(CASE WHEN same THEN sim END) AS pos,
         |             max(CASE WHEN NOT same THEN sim END) AS neg
         |      FROM s GROUP BY 1, 2)
         |SELECT qid AS vec_id, qlabel AS label,
         |       round(pos, 4) AS pos_sim4, round(neg, 4) AS neg_sim4,
         |       round(pos - neg, 4) AS margin4, neg > pos AS noisy
         |FROM a ORDER BY vec_id""".stripMargin,


    // x5's exact top-k joined to labels; majority tie to the GREATER
    // label (the struct-max spelling); Simpson in exact integers
    "x140_topk_diversity" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
         |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
         |s AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN c WHERE qid != cid),
         |r AS (SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s),
         |t AS (SELECT r.qid, e.label FROM r JOIN embeddings e ON e.vec_id = r.cid WHERE rank <= 5),
         |lc AS (SELECT qid, label, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
         |mj AS (SELECT qid, label, c,
         |              row_number() OVER (PARTITION BY qid ORDER BY c DESC, label DESC) AS rn FROM lc),
         |a AS (SELECT qid, count(*)::BIGINT AS n_labels,
         |             sum(c * c)::BIGINT AS sq, sum(c)::BIGINT AS kk FROM lc GROUP BY 1)
         |SELECT a.qid AS vec_id, n_labels, mj.label AS top_label, mj.c AS top_n,
         |       round(sq::DOUBLE / (kk * kk), 4) AS simpson4
         |FROM a JOIN mj ON mj.qid = a.qid AND rn = 1
         |ORDER BY vec_id""".stripMargin,


    // af is the shared trained-centroid assignment; the drift fold is
    // one |k|-bounded census + a 1-row totals attach, the share/shift
    // spelling identical to the Spark side (two IEEE divisions, one
    // difference, one round)
    "x144_cell_drift" ->
      s"""${kmeansAssignCtes(8, 2)},
         |per AS (SELECT cid, count(*) FILTER (vec_id % 2 = 0)::BIGINT AS n_even,
         |               count(*) FILTER (vec_id % 2 = 1)::BIGINT AS n_odd
         |        FROM af GROUP BY cid),
         |tot AS (SELECT sum(n_even)::BIGINT AS t_even, sum(n_odd)::BIGINT AS t_odd FROM per)
         |SELECT cid, n_even, n_odd,
         |       CASE WHEN t_even = 0 THEN NULL ELSE round(n_even::DOUBLE / t_even, 4) END AS share_even4,
         |       CASE WHEN t_odd = 0 THEN NULL ELSE round(n_odd::DOUBLE / t_odd, 4) END AS share_odd4,
         |       CASE WHEN t_even = 0 OR t_odd = 0 THEN NULL
         |            ELSE round(n_odd::DOUBLE / t_odd - n_even::DOUBLE / t_even, 4) END AS shift4
         |FROM per CROSS JOIN tot ORDER BY cid""".stripMargin,


    // one unrolled greedy block per pick (the x35 Lloyd convention):
    // candidate top-m by (rel desc, cid), then each round folds the
    // max-sim-to-selected, scores (λ·rel − (100−λ)·msim)/100 in the
    // identical IEEE expression, and argmaxes by (score, rel, −cid) —
    // the row_number spelling of the Spark side's struct-max
    "x158_mmr_rerank" -> {
      def dotAb(ae: String, be: String) =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), " +
          s"i -> $ae[i] * $be[i])), (x, y) -> x + y)"
      val lam = mmrLambdaPct
      val steps = (2 to mmrK).map { r =>
        s"""m$r AS (SELECT p.qid, p.c1 AS cid, max(p.s) AS msim
           |        FROM ps p JOIN sel${r - 1} s ON s.qid = p.qid AND s.cid = p.c2
           |        GROUP BY 1, 2),
           |sc$r AS (SELECT c.qid, c.cid, c.rel,
           |                ($lam * c.rel - ${100 - lam} * m$r.msim) / 100 AS score
           |         FROM cand c JOIN m$r ON m$r.qid = c.qid AND m$r.cid = c.cid
           |         WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} z
           |                           WHERE z.qid = c.qid AND z.cid = c.cid)),
           |s$r AS (SELECT qid, cid, rel, $r::INT AS mmr_rank, score
           |        FROM (SELECT *, row_number() OVER (PARTITION BY qid
           |                ORDER BY score DESC, rel DESC, cid) AS rn FROM sc$r)
           |        WHERE rn = 1),
           |sel$r AS (SELECT qid, cid FROM sel${r - 1} UNION ALL SELECT qid, cid FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |           WHERE vec_id % $mmrQueryMod = 0),
         |c0 AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
         |scored AS (SELECT qid, cid, $dotCte AS rel FROM q JOIN c0 ON cid <> qid),
         |cand AS (SELECT s.qid, s.cid, s.rel, c0.ce
         |         FROM (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
         |                 ORDER BY rel DESC, cid) AS rn FROM scored) s
         |         JOIN c0 ON c0.cid = s.cid
         |         WHERE s.rn <= $mmrM),
         |ps AS (SELECT a.qid, a.cid AS c1, b.cid AS c2, ${dotAb("a.ce", "b.ce")} AS s
         |       FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid),
         |s1 AS (SELECT qid, cid, rel, 1::INT AS mmr_rank, ($lam * rel) / 100 AS score
         |       FROM (SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
         |               ORDER BY rel DESC, cid) AS rn FROM cand)
         |       WHERE rn = 1),
         |sel1 AS (SELECT qid, cid FROM s1),
         |$steps
         |SELECT qid AS vec_id, mmr_rank, cid AS neighbor_id,
         |       round(rel, 4) AS rel4, round(score, 4) AS score4
         |FROM (${(1 to mmrK).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")})
         |ORDER BY vec_id, mmr_rank""".stripMargin
    },


    // x51's IVF relations with the multi-probe generalization: per
    // query the top-nprobe cells by the same (dot DESC, ccid ASC)
    // order, candidates under their single argmax cell, recall folded
    // against the shared brute truth — one block per nprobe, UNION ALL
    "x170_ann_nprobe_sweep" -> {
      val shared =
        s"""WITH c AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 16),
           |e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
           |asg AS (SELECT e.vec_id, c.ccid,
           |               row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
           |                 c.ccid) AS rn
           |        FROM e CROSS JOIN c),
           |cells AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn = 1),
           |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 10 = 0),
           |cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
           |s_ex AS (SELECT qid, cid, $dotCte AS sim FROM q CROSS JOIN cc WHERE qid != cid),
           |r_ex AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank FROM s_ex),
           |ex AS (SELECT qid, cid FROM r_ex WHERE rank <= 3),
           |nq AS (SELECT count(DISTINCT qid)::BIGINT AS n_queries FROM ex)""".stripMargin
      def block(np: Int): String =
        s"""(SELECT $np::INT AS nprobe, nq.n_queries,
           |  coalesce((SELECT sum(h)::BIGINT FROM (
           |    SELECT count(*) AS h
           |    FROM ex JOIN (
           |      SELECT x.vec_id AS qid, y.vec_id AS cid,
           |             row_number() OVER (PARTITION BY x.vec_id ORDER BY
           |               list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ex2.ed[i] * ey.ed[i])), (x2, y2) -> x2 + y2) DESC,
           |               y.vec_id) AS rank
           |      FROM (SELECT vec_id, ccid FROM asg WHERE rn <= $np AND vec_id % 10 = 0) x
           |      JOIN cells y ON y.cell = x.ccid AND y.vec_id != x.vec_id
           |      JOIN e ex2 ON ex2.vec_id = x.vec_id JOIN e ey ON ey.vec_id = y.vec_id
           |    ) ann ON ann.qid = ex.qid AND ann.cid = ex.cid AND ann.rank <= 3
           |    GROUP BY ex.qid) hh), 0)::BIGINT AS n_hits
           |  FROM nq)""".stripMargin
      shared + "\n,res AS (" + Seq(1, 2, 4, 8).map(block).mkString("\nUNION ALL\n") +
        ")\nSELECT nprobe, n_queries, n_hits, round(n_hits::DOUBLE / (n_queries * 3), 4) AS recall4 FROM res ORDER BY nprobe"
    },


    // x51's cell assignment folded to the census; the range frame keeps
    // dead cells visible as zero rows
    "x172_ivf_cell_balance" ->
      """WITH c AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
        |asg AS (SELECT e.vec_id, c.ccid,
        |               row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
        |                 c.ccid) AS rn
        |        FROM e CROSS JOIN c),
        |cells AS (SELECT a.vec_id, a.ccid AS cell FROM asg a WHERE rn = 1),
        |census AS (SELECT cell, count(*)::BIGINT AS n_vectors FROM cells GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM e),
        |frame AS (SELECT unnest(range(0, 16))::INT AS cell)
        |SELECT f.cell, coalesce(c.n_vectors, 0)::BIGINT AS n_vectors,
        |       round(coalesce(c.n_vectors, 0)::DOUBLE / t.n_total, 4) AS share4
        |FROM frame f LEFT JOIN census c ON c.cell = f.cell CROSS JOIN tot t
        |ORDER BY f.cell""".stripMargin,


    // the int8 lattice self-dot is exact BIGINT; bin_lo = nq - nq % width
    "x173_embedding_norm_audit" ->
      """WITH q AS (SELECT list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS qv FROM embeddings),
        |n AS (SELECT list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), i -> qv[i] * qv[i])), (a, b) -> a + b) AS nq FROM q),
        |b AS (SELECT (nq - (nq % 2048))::BIGINT AS bin_lo FROM n),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM q)
        |SELECT bin_lo, count(*)::BIGINT AS n_vectors,
        |       round(count(*)::DOUBLE / any_value(t.n_total), 4) AS share4
        |FROM b CROSS JOIN tot t GROUP BY bin_lo
        |ORDER BY bin_lo""".stripMargin,
  )
}
