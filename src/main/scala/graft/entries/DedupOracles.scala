package graft.entries

/** Oracle SQL for the Dedup-module keys (exact/MinHash/SimHash/PPJoin/CDC families) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait DedupOracles {
  import OracleCtes._

  protected def dedupOracles: Map[String, String] = Map(

    "x1_exact_dedup" ->
      "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY sha256(text) ORDER BY doc_id",


    "x2_minhash_lsh" ->
      s"""WITH $shinglesCte,
         |seeds AS (SELECT unnest(range(0, 16)) AS seed),
         |mh AS (SELECT doc_id, seed,
         |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |sig AS (SELECT doc_id, (seed // 4)::INT AS band,
         |               max(mh) FILTER (seed % 4 = 0) AS m0, max(mh) FILTER (seed % 4 = 1) AS m1,
         |               max(mh) FILTER (seed % 4 = 2) AS m2, max(mh) FILTER (seed % 4 = 3) AS m3
         |        FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM sig a JOIN sig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
         |                              AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id)
         |SELECT c.d1, c.d2, j.jaccard
         |FROM cand c JOIN jac j ON c.d1 = j.d1 AND c.d2 = j.d2
         |WHERE j.jaccard >= 0.8 ORDER BY c.d1, c.d2""".stripMargin,


    "x3_ngram_jaccard" ->
      s"""WITH $shinglesCte
         |SELECT d1, d2, inter, n1, n2, jaccard FROM jac
         |WHERE jaccard >= 0.8 ORDER BY d1, d2""".stripMargin,


    "x4_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT doc_id, tok, count(*)::BIGINT AS w FROM toks GROUP BY 1, 2),
        |th AS (SELECT doc_id, w, (('0x' || substr(md5(tok), 1, 15))::UBIGINT)::BIGINT AS h FROM tc),
        |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS s
        |         FROM th, unnest(range(0, 60)) AS t(b) GROUP BY 1, 2)
        |SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "x16_simhash_near_dup" ->
      s"""WITH $simhashPairsCte
         |SELECT d1, d2, hamming FROM nd_pairs ORDER BY d1, d2""".stripMargin,


    "x36_incremental_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        |       FROM toks, unnest(range(1, len(ts)-1)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |mh AS (SELECT doc_id, seed,
        |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
        |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |sig AS (SELECT doc_id, (seed // 4)::INT AS band,
        |               max(mh) FILTER (seed % 4 = 0) AS m0, max(mh) FILTER (seed % 4 = 1) AS m1,
        |               max(mh) FILTER (seed % 4 = 2) AS m2, max(mh) FILTER (seed % 4 = 3) AS m3
        |        FROM mh GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS d_new, b.doc_id AS d_old
        |         FROM sig a JOIN sig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
        |                              AND a.m2 = b.m2 AND a.m3 = b.m3
        |         WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
        |inter AS (SELECT a.doc_id AS d_new, b.doc_id AS d_old, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle
        |          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        |          GROUP BY 1, 2),
        |jacx AS (SELECT i.d_new, i.d_old,
        |                i.inter::DOUBLE / (s1.n + s2.n - i.inter) AS jaccard
        |         FROM inter i JOIN sizes s1 ON s1.doc_id = i.d_new
        |                      JOIN sizes s2 ON s2.doc_id = i.d_old),
        |matched AS (SELECT c.d_new, c.d_old, j.jaccard
        |            FROM cand c JOIN jacx j ON j.d_new = c.d_new AND j.d_old = c.d_old
        |            WHERE j.jaccard >= 0.8),
        |best AS (SELECT d_new, d_old, jaccard,
        |                row_number() OVER (PARTITION BY d_new ORDER BY jaccard DESC, d_old) AS rn
        |         FROM matched)
        |SELECT d_new AS doc_id, d_old AS dup_of, jaccard FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,


    "x81_winnow_matches" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |w AS (SELECT doc_id, i::BIGINT AS p,
        |             (('0x' || substr(md5(array_to_string(list_slice(ts, i, i + 7), ' ')), 1, 15))::UBIGINT)::BIGINT AS h
        |      FROM t, unnest(range(1, len(ts) - 6)) AS r(i)
        |      WHERE len(ts) >= 8),
        |s AS (SELECT doc_id, p,
        |        max(p) OVER (PARTITION BY doc_id) AS maxp,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY p
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minh
        |      FROM w),
        |f AS (SELECT DISTINCT doc_id, minh AS h FROM s WHERE p <= maxp - 3)
        |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*)::BIGINT AS n_shared
        |FROM f a JOIN f b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 ORDER BY d1, d2""".stripMargin,


    "x84_segment_repair" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, i::BIGINT AS s,
        |        array_to_string(list_slice(ts, i, i + 9), ' ') AS seg
        |      FROM t, unnest(range(1, len(ts) + 1, 10)) AS r(i)),
        |gh AS (SELECT doc_id, s, seg, md5(seg) AS h FROM g),
        |boiler AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
        |                          FROM gh GROUP BY 1) WHERE nd >= 2),
        |kept AS (SELECT * FROM gh WHERE h NOT IN (SELECT h FROM boiler)),
        |r AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
        |        string_agg(seg, ' ' ORDER BY s) AS repaired
        |      FROM kept GROUP BY 1),
        |tot AS (SELECT doc_id, count(*)::BIGINT AS n_seg FROM gh GROUP BY 1)
        |SELECT tot.doc_id, tot.n_seg,
        |       (tot.n_seg - coalesce(r.n_kept, 0))::BIGINT AS n_dropped,
        |       md5(coalesce(r.repaired, '')) AS repaired_digest
        |FROM tot LEFT JOIN r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    "x43_source_similarity" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
        |       FROM toks, unnest(range(1, len(ts)-1)) AS t(i)),
        |ssh AS (SELECT DISTINCT d.source, s.shingle
        |        FROM sh s JOIN documents d USING (doc_id)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |mh AS (SELECT source, seed,
        |              min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
        |       FROM ssh CROSS JOIN seeds GROUP BY 1, 2),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             count(*) FILTER (a.mh = b.mh)::BIGINT AS n_match
        |      FROM mh a JOIN mh b ON a.seed = b.seed AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT source_a, source_b, n_match, n_match::DOUBLE / 16 AS est_jaccard
        |FROM p ORDER BY source_a, source_b""".stripMargin,


    "x52_lsh_calibration" ->
      s"""WITH $shinglesCte,
         |seeds AS (SELECT unnest(range(0, 16)) AS seed),
         |mh AS (SELECT doc_id, seed,
         |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |sig AS (SELECT doc_id, (seed // 4)::INT AS band,
         |               max(mh) FILTER (seed % 4 = 0) AS m0, max(mh) FILTER (seed % 4 = 1) AS m1,
         |               max(mh) FILTER (seed % 4 = 2) AS m2, max(mh) FILTER (seed % 4 = 3) AS m3
         |        FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM sig a JOIN sig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
         |                              AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id),
         |nm AS (SELECT c.d1, c.d2, count(*) FILTER (a.mh = b.mh)::BIGINT AS n_match
         |       FROM cand c JOIN mh a ON a.doc_id = c.d1
         |                   JOIN mh b ON b.doc_id = c.d2 AND b.seed = a.seed
         |       GROUP BY 1, 2)
         |SELECT n.d1, n.d2, n.n_match, n.n_match::DOUBLE / 16 AS est_jaccard, j.jaccard,
         |       abs(n.n_match::DOUBLE / 16 - j.jaccard) AS abs_err
         |FROM nm n JOIN jac j ON j.d1 = n.d1 AND j.d2 = n.d2
         |ORDER BY n.d1, n.d2""".stripMargin,


    "x53_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |w AS (SELECT doc_id, i::BIGINT AS p,
        |             (('0x' || substr(md5(array_to_string(list_slice(ts, i, i + 7), ' ')), 1, 15))::UBIGINT)::BIGINT AS h
        |      FROM t, unnest(range(1, len(ts) - 6)) AS r(i)
        |      WHERE len(ts) >= 8),
        |hot AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
        |d AS (SELECT doc_id, p FROM w JOIN hot USING (h)),
        |m AS (SELECT doc_id, p,
        |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
        |             THEN 0 ELSE 1 END AS brk
        |      FROM d),
        |s AS (SELECT doc_id, p,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS span_id
        |      FROM m)
        |SELECT doc_id, span_id::BIGINT AS span_id, min(p)::BIGINT AS start_pos,
        |       (max(p) - min(p) + 8)::BIGINT AS span_tokens
        |FROM s GROUP BY 1, 2 ORDER BY doc_id, span_id""".stripMargin,


    "x50_dup_degree" ->
      s"""WITH $simhashPairsCte,
         |u AS (SELECT d1 AS doc_id FROM nd_pairs UNION ALL SELECT d2 FROM nd_pairs)
         |SELECT doc_id, count(*)::BIGINT AS degree FROM u
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,


    // LSH candidates (x2's mh/sig/cand chain) re-scored by DuckDB's
    // built-in levenshtein — the same dynamic program Spark compiles
    "x111_edit_dedup" ->
      s"""WITH $shinglesCte,
         |seeds AS (SELECT unnest(range(0, 16)) AS seed),
         |mh AS (SELECT doc_id, seed,
         |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |sig AS (SELECT doc_id, (seed // 4)::INT AS band,
         |               max(mh) FILTER (seed % 4 = 0) AS m0, max(mh) FILTER (seed % 4 = 1) AS m1,
         |               max(mh) FILTER (seed % 4 = 2) AS m2, max(mh) FILTER (seed % 4 = 3) AS m3
         |        FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM sig a JOIN sig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
         |                              AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id),
         |d AS (SELECT c.d1, c.d2,
         |             length(ta.text)::BIGINT AS len1, length(tb.text)::BIGINT AS len2,
         |             levenshtein(ta.text, tb.text)::BIGINT AS dist
         |      FROM cand c JOIN documents ta ON ta.doc_id = c.d1
         |                  JOIN documents tb ON tb.doc_id = c.d2),
         |r AS (SELECT d1, d2, len1, len2, dist,
         |             round(CASE WHEN greatest(len1, len2) = 0 THEN 1.0
         |                        ELSE 1.0 - dist::DOUBLE / greatest(len1, len2) END, 4) AS edit_sim4
         |      FROM d)
         |SELECT d1, d2, len1, len2, dist, edit_sim4, edit_sim4 >= $editMinSim AS near_dup
         |FROM r ORDER BY d1, d2""".stripMargin,


    // the exact all-pairs spelling: DuckDB verifies every pair, the
    // Spark side's containment-PPJoin prefix filter is lossless for the
    // c >= t verdict, so the two relations agree exactly
    "x116_containment" ->
      s"""WITH $shinglesCte,
         |c AS (SELECT CASE WHEN n1 < n2 OR (n1 = n2 AND d1 < d2) THEN d1 ELSE d2 END AS d_small,
         |             CASE WHEN n1 < n2 OR (n1 = n2 AND d1 < d2) THEN d2 ELSE d1 END AS d_large,
         |             inter::BIGINT AS inter,
         |             least(n1, n2)::BIGINT AS n_small, greatest(n1, n2)::BIGINT AS n_large
         |      FROM jac)
         |SELECT d_small, d_large, inter, n_small, n_large,
         |       inter::DOUBLE / n_small AS containment
         |FROM c WHERE inter::DOUBLE / n_small >= $containTau
         |ORDER BY d_small, d_large""".stripMargin,


    // x52's signature/candidate CTEs + x116's canonical orientation; the
    // derived estimator C-hat = m(n1+n2)/((16+m)·n_small) and the exact
    // containment are each ONE division of exact BIGINTs
    "x125_containment_estimate" ->
      s"""WITH $shinglesCte,
         |seeds AS (SELECT unnest(range(0, $mh125Hashes)) AS seed),
         |mh AS (SELECT doc_id, seed,
         |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |sig AS (SELECT doc_id, (seed // ${mh125Hashes / mh125Bands})::INT AS band,
         |               max(mh) FILTER (seed % ${mh125Hashes / mh125Bands} = 0) AS m0, max(mh) FILTER (seed % ${mh125Hashes / mh125Bands} = 1) AS m1,
         |               max(mh) FILTER (seed % ${mh125Hashes / mh125Bands} = 2) AS m2, max(mh) FILTER (seed % ${mh125Hashes / mh125Bands} = 3) AS m3
         |        FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM sig a JOIN sig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
         |                              AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id),
         |nm AS (SELECT c.d1, c.d2, count(*) FILTER (a.mh = b.mh)::BIGINT AS n_match
         |       FROM cand c JOIN mh a ON a.doc_id = c.d1
         |                   JOIN mh b ON b.doc_id = c.d2 AND b.seed = a.seed
         |       GROUP BY 1, 2),
         |e AS (SELECT CASE WHEN n1 < n2 OR (n1 = n2 AND j.d1 < j.d2) THEN j.d1 ELSE j.d2 END AS d_small,
         |             CASE WHEN n1 < n2 OR (n1 = n2 AND j.d1 < j.d2) THEN j.d2 ELSE j.d1 END AS d_large,
         |             least(n1, n2)::BIGINT AS n_small, greatest(n1, n2)::BIGINT AS n_large,
         |             n_match,
         |             (n_match * (n1 + n2))::DOUBLE / (($mh125Hashes + n_match) * least(n1, n2)) AS est_containment,
         |             inter::DOUBLE / least(n1, n2) AS containment
         |      FROM nm n JOIN jac j ON j.d1 = n.d1 AND j.d2 = n.d2)
         |SELECT d_small, d_large, n_small, n_large, n_match,
         |       est_containment, containment, abs(est_containment - containment) AS abs_err
         |FROM e ORDER BY d_small, d_large""".stripMargin,


    // the shared CDC chunk CTE + the digest census and per-source fold
    "x126_cdc_chunk_dedup" ->
      s"""WITH $cdcChunksCte,
         |census AS (SELECT digest, count(*)::BIGINT AS n_copies FROM ch GROUP BY 1)
         |SELECT source, count(*)::BIGINT AS n_chunks, sum(n_tokens)::BIGINT AS n_chunk_tokens,
         |       sum(CASE WHEN n_copies >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
         |       sum(CASE WHEN n_copies >= 2 THEN n_tokens ELSE 0 END)::BIGINT AS dup_tokens,
         |       CASE WHEN sum(n_tokens) = 0 THEN NULL
         |            ELSE round(sum(CASE WHEN n_copies >= 2 THEN n_tokens ELSE 0 END)::DOUBLE / sum(n_tokens), 4)
         |       END AS dup_frac4
         |FROM ch JOIN census USING (digest)
         |GROUP BY source ORDER BY source""".stripMargin,


    // per-source DISTINCT chunk vocabularies self-joined by digest —
    // each shared digest contributes exactly one intersection unit
    "x128_source_overlap" ->
      s"""WITH $cdcChunksCte,
         |u AS (SELECT DISTINCT source, digest FROM ch),
         |sz AS (SELECT source, count(*)::BIGINT AS n_distinct FROM u GROUP BY 1),
         |pr AS (SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS inter
         |       FROM u a JOIN u b ON a.digest = b.digest AND a.source <> b.source
         |       GROUP BY 1, 2)
         |SELECT source_a, source_b, sa.n_distinct AS n_a, sb.n_distinct AS n_b, inter,
         |       round(inter::DOUBLE / sa.n_distinct, 4) AS containment4
         |FROM pr JOIN sz sa ON sa.source = source_a JOIN sz sb ON sb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin,


    // jac holds ALL sharing pairs; per-threshold membership is the
    // integer predicate 100*inter >= pct*union — no float compare
    "x131_threshold_sweep" ->
      s"""WITH $shinglesCte,
         |tot AS (SELECT count(*)::BIGINT AS n_total FROM documents),
         |p AS (SELECT d1, d2, inter, n1 + n2 - inter AS un FROM jac),
         |sw AS (SELECT pct, d1, d2 FROM p
         |       CROSS JOIN (SELECT unnest([${sweepPcts.mkString(", ")}]) AS pct)
         |       WHERE inter * 100 >= pct * un),
         |a AS (SELECT pct, count(*)::BIGINT AS n_pairs,
         |             count(DISTINCT d2)::BIGINT AS n_dropped FROM sw GROUP BY 1),
         |t2 AS (SELECT pct, count(DISTINCT doc)::BIGINT AS n_docs_paired FROM (
         |         SELECT pct, d1 AS doc FROM sw UNION ALL SELECT pct, d2 FROM sw) u
         |       GROUP BY 1)
         |SELECT base.pct, coalesce(n_pairs, 0)::BIGINT AS n_pairs,
         |       coalesce(n_docs_paired, 0)::BIGINT AS n_docs_paired,
         |       coalesce(n_dropped, 0)::BIGINT AS n_dropped,
         |       round(coalesce(n_dropped, 0)::DOUBLE / n_total, 4) AS drop_frac4
         |FROM (SELECT unnest([${sweepPcts.mkString(", ")}]) AS pct) base
         |LEFT JOIN a ON a.pct = base.pct
         |LEFT JOIN t2 ON t2.pct = base.pct
         |CROSS JOIN tot ORDER BY base.pct""".stripMargin,


    // new (odd) docs' distinct chunk digests probed against the corpus
    // (even) side's distinct set — x24's membership check, kept as a
    // LEFT join because the per-doc FRACTION is the output
    "x130_chunk_novelty" ->
      s"""WITH $cdcChunksCte,
         |corp AS (SELECT DISTINCT digest FROM ch WHERE doc_id % 2 = 0),
         |nw AS (SELECT DISTINCT doc_id, digest FROM ch WHERE doc_id % 2 = 1)
         |SELECT nw.doc_id, count(*)::BIGINT AS n_chunks,
         |       sum(CASE WHEN corp.digest IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_known,
         |       round(sum(CASE WHEN corp.digest IS NULL THEN 0 ELSE 1 END)::DOUBLE / count(*), 4) AS known_frac4
         |FROM nw LEFT JOIN corp ON corp.digest = nw.digest
         |GROUP BY nw.doc_id ORDER BY nw.doc_id""".stripMargin,


    // the minhash leg re-spells x2 under m-prefixed names (the shared
    // shingles/simhash CTEs collide on toks/sh/cand); set algebra over
    // the two verified pair relations is one FULL JOIN + count FILTERs
    "x142_detector_agreement" ->
      s"""WITH $simhashPairsCte,
         |mt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |mshg AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
         |         FROM mt, unnest(range(1, len(ts)-1)) AS t(i)),
         |msizes AS (SELECT doc_id, count(*) AS n FROM mshg GROUP BY 1),
         |mpairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
         |           FROM mshg a JOIN mshg b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |           GROUP BY 1, 2),
         |mjac AS (SELECT d1, d2, inter::DOUBLE / (s1.n + s2.n - inter) AS jaccard
         |         FROM mpairs JOIN msizes s1 ON s1.doc_id = d1 JOIN msizes s2 ON s2.doc_id = d2),
         |mseeds AS (SELECT unnest(range(0, 16)) AS seed),
         |mmh AS (SELECT doc_id, seed,
         |               min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |        FROM mshg CROSS JOIN mseeds GROUP BY 1, 2),
         |msig AS (SELECT doc_id, (seed // 4)::INT AS band,
         |                max(mh) FILTER (seed % 4 = 0) AS m0, max(mh) FILTER (seed % 4 = 1) AS m1,
         |                max(mh) FILTER (seed % 4 = 2) AS m2, max(mh) FILTER (seed % 4 = 3) AS m3
         |         FROM mmh GROUP BY 1, 2),
         |mcand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |          FROM msig a JOIN msig b ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
         |                               AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id),
         |mh_pairs AS (SELECT c.d1, c.d2 FROM mcand c JOIN mjac j ON c.d1 = j.d1 AND c.d2 = j.d2
         |             WHERE j.jaccard >= 0.8),
         |lab AS (SELECT (m.d1 IS NOT NULL) AS in_mh, (s.d1 IS NOT NULL) AS in_sh
         |        FROM mh_pairs m FULL JOIN (SELECT d1, d2 FROM nd_pairs) s
         |          ON m.d1 = s.d1 AND m.d2 = s.d2),
         |agg AS (SELECT count(*) FILTER (in_mh)::BIGINT AS n_minhash,
         |               count(*) FILTER (in_sh)::BIGINT AS n_simhash,
         |               count(*) FILTER (in_mh AND in_sh)::BIGINT AS n_both,
         |               count(*) FILTER (in_mh AND NOT in_sh)::BIGINT AS only_minhash,
         |               count(*) FILTER (NOT in_mh AND in_sh)::BIGINT AS only_simhash,
         |               count(*)::BIGINT AS n_union FROM lab)
         |SELECT n_minhash, n_simhash, n_both, only_minhash, only_simhash, n_union,
         |       CASE WHEN n_union = 0 THEN NULL
         |            ELSE round(n_both::DOUBLE / n_union, 4) END AS agreement4
         |FROM agg""".stripMargin,


    // the banding key re-spells x2's fixed 4x4 grouping generically:
    // band = seed // rowsPerBand, the band tuple string_agg'd in seed
    // order (injective over BIGINT hash tuples); truth is x3's exact
    // jac relation at the same threshold
    "x143_band_sweep" ->
      s"""WITH $shinglesCte,
         |seeds AS (SELECT unnest(range(0, 16)) AS seed),
         |mh AS (SELECT doc_id, seed,
         |              min((('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::UBIGINT)::BIGINT) AS mh
         |       FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |bconfs AS (SELECT unnest([2, 4, 8]) AS bands),
         |bsig AS (SELECT doc_id, bands, (seed // (16 // bands))::INT AS band,
         |                string_agg(mh::VARCHAR, ',' ORDER BY seed) AS sig
         |         FROM mh CROSS JOIN bconfs GROUP BY 1, 2, 3),
         |cand AS (SELECT DISTINCT a.bands, a.doc_id AS d1, b.doc_id AS d2
         |         FROM bsig a JOIN bsig b ON a.bands = b.bands AND a.band = b.band
         |                                AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |ver AS (SELECT c.bands, (j.jaccard >= 0.8) AS ok
         |        FROM cand c LEFT JOIN jac j ON c.d1 = j.d1 AND c.d2 = j.d2),
         |per AS (SELECT bands, count(*)::BIGINT AS n_candidates,
         |               count(*) FILTER (coalesce(ok, false))::BIGINT AS n_verified
         |        FROM ver GROUP BY 1),
         |truth AS (SELECT count(*)::BIGINT AS n_true FROM jac WHERE jaccard >= 0.8)
         |SELECT b.bands, coalesce(n_candidates, 0)::BIGINT AS n_candidates,
         |       coalesce(n_verified, 0)::BIGINT AS n_verified, n_true,
         |       CASE WHEN coalesce(n_candidates, 0) = 0 THEN NULL
         |            ELSE round(n_verified::DOUBLE / n_candidates, 4) END AS precision4,
         |       CASE WHEN n_true = 0 THEN NULL
         |            ELSE round(coalesce(n_verified, 0)::DOUBLE / n_true, 4) END AS recall4
         |FROM bconfs b LEFT JOIN per ON per.bands = b.bands CROSS JOIN truth
         |ORDER BY b.bands""".stripMargin,
  )
}
