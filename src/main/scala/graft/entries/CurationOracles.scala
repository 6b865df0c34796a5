package graft.entries

/** Oracle SQL for the Curation-module keys (gates, splits, clusters, governance, allocation) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait CurationOracles {
  import OracleCtes._

  protected def curationOracles: Map[String, String] = Map(

    "x87_importance_weights" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id, source,
        |        (('0x' || substr(md5(ts[i]), 1, 15))::UBIGINT)::BIGINT % 65536 AS b
        |      FROM t, unnest(range(1, len(ts) + 1)) AS r(i)),
        |rc AS (SELECT b, count(*)::BIGINT AS rc FROM s GROUP BY 1),
        |tc AS (SELECT b, count(*)::BIGINT AS tc FROM s WHERE source = 'src0' GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS nr,
        |               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS nt
        |        FROM s),
        |d AS (SELECT doc_id, count(*)::BIGINT AS n_toks,
        |             sum(coalesce(tc, 0))::BIGINT AS t_mass,
        |             sum(rc)::BIGINT AS r_mass
        |      FROM s JOIN rc USING (b) LEFT JOIN tc USING (b) GROUP BY 1)
        |SELECT doc_id, n_toks, t_mass, r_mass,
        |       (t_mass::DOUBLE * nr) / (r_mass::DOUBLE * nt) AS importance
        |FROM d CROSS JOIN tot ORDER BY doc_id""".stripMargin,


    "x18_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS gram
        |       FROM toks, unnest(range(1, len(ts) - 3)) AS t(i)),
        |bench AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 20 = 0)
        |SELECT doc_id, count(*) AS n_shared
        |FROM sh JOIN bench USING (gram)
        |WHERE doc_id % 20 != 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "x19_quality_gate" ->
      s"""WITH $qualityCte
         |SELECT doc_id, n_tokens, avg_len, stop_hits, top_tok_frac,
         |  n_tokens BETWEEN 20 AND 80 AS r_len,
         |  avg_len BETWEEN 3.0 AND 8.0 AS r_avg,
         |  stop_hits >= 2 AS r_stop,
         |  top_tok_frac <= 0.125 AS r_rep,
         |  ($qualityKeepPred) AS keep
         |FROM q ORDER BY doc_id""".stripMargin,


    "x20_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |b AS (SELECT doc_id, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS bg FROM t),
        |s AS (SELECT doc_id, len(bg)::BIGINT AS n_bigrams,
        |  len(list_distinct(bg))::DOUBLE / len(bg) AS distinct_ratio,
        |  list_aggregate(list_transform(list_distinct(bg), g -> len(list_filter(bg, x -> x = g))::BIGINT), 'max')::DOUBLE / len(bg) AS top_bigram_frac
        |  FROM b WHERE len(bg) > 0)
        |SELECT doc_id, n_bigrams, distinct_ratio, top_bigram_frac FROM s ORDER BY doc_id""".stripMargin,


    "x92_dup_gram_coverage" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, i, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |      FROM t, unnest(range(1, len(ts) - 1)) AS r(i)),
        |d AS (SELECT doc_id, g, list(i) AS starts FROM g GROUP BY 1, 2 HAVING count(*) >= 2),
        |c1 AS (SELECT doc_id, unnest(starts) AS s FROM d),
        |c2 AS (SELECT DISTINCT doc_id, s + o AS pos FROM c1, unnest([0, 1, 2]) AS u(o)),
        |cv AS (SELECT doc_id, count(*)::BIGINT AS n_cov FROM c2 GROUP BY 1)
        |SELECT t.doc_id, len(ts)::BIGINT AS n_tokens,
        |       coalesce(n_cov, 0)::BIGINT AS n_cov,
        |       coalesce(n_cov, 0)::DOUBLE / len(ts) AS cov_frac
        |FROM t LEFT JOIN cv USING (doc_id) ORDER BY doc_id""".stripMargin,


    "x93_corpus_diff" ->
      """WITH old AS (SELECT doc_id, source, n_chars, sha256(text) AS digest
        |             FROM documents WHERE doc_id % 3 <> 0),
        |neu AS (SELECT doc_id, source, n_chars,
        |        sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS digest
        |        FROM documents WHERE doc_id % 3 <> 1)
        |SELECT coalesce(o.source, n.source) AS source,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.digest <> n.digest THEN 'changed'
        |            ELSE 'same' END AS status,
        |       count(*)::BIGINT AS n_docs,
        |       sum(coalesce(n.n_chars, o.n_chars))::BIGINT AS total_chars
        |FROM old o FULL JOIN neu n ON o.doc_id = n.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "x95_gate_attrition" ->
      s"""WITH $qualityCte,
         |f AS (SELECT doc_id,
         |  (n_tokens BETWEEN 20 AND 80) AS r_len,
         |  (avg_len BETWEEN 3.0 AND 8.0) AS r_avg,
         |  (stop_hits >= 2) AS r_stop,
         |  (top_tok_frac <= 0.125) AS r_rep FROM q),
         |a AS (SELECT count(*)::BIGINT AS n0,
         |  sum(CASE WHEN r_len THEN 1 ELSE 0 END)::BIGINT AS s1,
         |  sum(CASE WHEN r_len AND r_avg THEN 1 ELSE 0 END)::BIGINT AS s2,
         |  sum(CASE WHEN r_len AND r_avg AND r_stop THEN 1 ELSE 0 END)::BIGINT AS s3,
         |  sum(CASE WHEN r_len AND r_avg AND r_stop AND r_rep THEN 1 ELSE 0 END)::BIGINT AS s4,
         |  sum(CASE WHEN NOT r_len AND r_avg AND r_stop AND r_rep THEN 1 ELSE 0 END)::BIGINT AS b1,
         |  sum(CASE WHEN r_len AND NOT r_avg AND r_stop AND r_rep THEN 1 ELSE 0 END)::BIGINT AS b2,
         |  sum(CASE WHEN r_len AND r_avg AND NOT r_stop AND r_rep THEN 1 ELSE 0 END)::BIGINT AS b3,
         |  sum(CASE WHEN r_len AND r_avg AND r_stop AND NOT r_rep THEN 1 ELSE 0 END)::BIGINT AS b4
         |  FROM f)
         |SELECT * FROM (
         |  SELECT 1::BIGINT AS gate, 'len' AS rule, n0 AS n_in,
         |         (n0 - s1)::BIGINT AS n_dropped, s1 AS n_out, b1 AS n_sole_blocker FROM a
         |  UNION ALL SELECT 2, 'avg', s1, s1 - s2, s2, b2 FROM a
         |  UNION ALL SELECT 3, 'stop', s2, s2 - s3, s3, b3 FROM a
         |  UNION ALL SELECT 4, 'rep', s3, s3 - s4, s4, b4 FROM a)
         |ORDER BY gate""".stripMargin,


    "x97_domain_caps" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n_source FROM documents GROUP BY 1),
        |dr AS (SELECT doc_id, source,
        |       (('0x' || substr(md5('cap:' || doc_id::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS draw
        |       FROM documents)
        |SELECT d.doc_id, d.source, c.n_source
        |FROM dr d JOIN c USING (source)
        |WHERE d.draw < floor(4294967296.0 / sqrt(c.n_source::DOUBLE))::BIGINT
        |ORDER BY doc_id""".stripMargin,


    "x98_survivor_bias" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |$qualityCte,
         |coh AS (SELECT d.doc_id,
         |        CASE WHEN c.cluster IS NOT NULL AND c.cluster <> d.doc_id
         |             THEN 'removed' ELSE 'kept' END AS cohort,
         |        d.n_chars, qq.n_tokens,
         |        ($qualityKeepPred) AS keep
         |        FROM documents d
         |        JOIN q qq ON qq.doc_id = d.doc_id
         |        LEFT JOIN comp c ON c.doc_id = d.doc_id)
         |SELECT cohort, count(*)::BIGINT AS n_docs,
         |       sum(n_chars)::BIGINT AS total_chars,
         |       sum(n_tokens)::BIGINT AS total_tokens,
         |       sum(n_chars)::DOUBLE / count(*) AS mean_chars,
         |       sum(n_tokens)::DOUBLE / count(*) AS mean_tokens,
         |       sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*) AS quality_pass_rate
         |FROM coh GROUP BY 1 ORDER BY 1""".stripMargin,


    "x99_bloom_fpr_audit" ->
      """WITH cd AS (SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id % 2 = 0),
        |bloom AS (SELECT DISTINCT
        |            (('0x' || substr(md5('bf' || i::VARCHAR || ':' || digest), 1, 8))::UBIGINT % 65536)::BIGINT AS pos
        |          FROM cd, unnest(range(0, 4)) AS t(i)),
        |nd AS (SELECT doc_id, sha256(text) AS digest FROM documents WHERE doc_id % 2 = 1),
        |np AS (SELECT doc_id,
        |            (('0x' || substr(md5('bf' || i::VARCHAR || ':' || digest), 1, 8))::UBIGINT % 65536)::BIGINT AS pos
        |       FROM nd, unnest(range(0, 4)) AS t(i)),
        |hits AS (SELECT np.doc_id, count(b.pos)::BIGINT AS n_hits
        |         FROM np LEFT JOIN bloom b ON b.pos = np.pos GROUP BY 1),
        |rel AS (SELECT nd.doc_id, h.n_hits = 4 AS maybe_dup, c.digest IS NOT NULL AS is_dup
        |        FROM nd JOIN hits h ON h.doc_id = nd.doc_id
        |        LEFT JOIN cd c ON c.digest = nd.digest)
        |SELECT count(*)::BIGINT AS n_probes,
        |       sum(CASE WHEN maybe_dup THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
        |       sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_true_dups,
        |       sum(CASE WHEN maybe_dup AND NOT is_dup THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
        |       sum(CASE WHEN is_dup AND NOT maybe_dup THEN 1 ELSE 0 END)::BIGINT AS n_false_neg,
        |       CASE WHEN count(*) = sum(CASE WHEN is_dup THEN 1 ELSE 0 END) THEN 0.0
        |            ELSE sum(CASE WHEN maybe_dup AND NOT is_dup THEN 1 ELSE 0 END)::DOUBLE /
        |                 (count(*) - sum(CASE WHEN is_dup THEN 1 ELSE 0 END)) END AS fpr,
        |       (sum(CASE WHEN is_dup AND NOT maybe_dup THEN 1 ELSE 0 END) = 0) AS no_false_negatives
        |FROM rel""".stripMargin,


    "x107_blocklist_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |m AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
        |        len(list_filter(ts, x -> x = 'dup'))::BIGINT AS severe_hits,
        |        len(list_filter(ts, x -> x IN ('slow', 'big')))::BIGINT AS mild_hits
        |      FROM t)
        |SELECT doc_id, n_tokens, severe_hits, mild_hits,
        |       mild_hits::DOUBLE / n_tokens AS mild_rate,
        |       (severe_hits = 0 AND mild_hits::DOUBLE / n_tokens <= 0.0625) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,


    "x106_unimax_budget" ->
      """WITH ps AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |            FROM documents GROUP BY 1),
        |c AS (SELECT source, n_tokens, n_tokens * 2 AS cap_tokens FROM ps),
        |r AS (SELECT *, row_number() OVER (ORDER BY cap_tokens, source) AS i,
        |        sum(cap_tokens) OVER (ORDER BY cap_tokens, source ROWS UNBOUNDED PRECEDING) AS cum,
        |        count(*) OVER () AS n_src
        |      FROM c),
        |f AS (SELECT *, (cap_tokens * (n_src - i + 1) <= 50000 - (cum - cap_tokens)) AS flag FROM r),
        |b AS (SELECT min(CASE WHEN NOT flag THEN i END) AS bad FROM f),
        |g AS (SELECT f.*, b.bad, (b.bad IS NULL OR f.i < b.bad) AS capped FROM f CROSS JOIN b),
        |m AS (SELECT coalesce(sum(CASE WHEN capped THEN cap_tokens END), 0) AS capped_sum,
        |             sum(CASE WHEN NOT capped THEN 1 ELSE 0 END) AS u FROM g),
        |a AS (SELECT g.source, g.n_tokens, g.cap_tokens, g.capped,
        |        (CASE WHEN g.capped THEN g.cap_tokens
        |              ELSE (50000 - m.capped_sum) // m.u
        |                   + (CASE WHEN g.i - g.bad + 1 <= (50000 - m.capped_sum) % m.u
        |                      THEN 1 ELSE 0 END)
        |         END)::BIGINT AS alloc
        |      FROM g CROSS JOIN m)
        |SELECT source, n_tokens, cap_tokens, capped, alloc,
        |       alloc::DOUBLE / n_tokens AS epochs
        |FROM a ORDER BY source""".stripMargin,


    "x108_contamination_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pg AS (SELECT doc_id, i AS p,
        |         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS gram
        |       FROM toks, unnest(range(1, len(ts) - 3)) AS t(i)),
        |bench AS (SELECT DISTINCT gram FROM pg WHERE doc_id % 20 = 0),
        |hp AS (SELECT doc_id, p FROM pg JOIN bench USING (gram) WHERE doc_id % 20 != 0),
        |rr AS (SELECT doc_id, p,
        |         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
        |              THEN 0 ELSE 1 END AS brk
        |       FROM hp),
        |rs AS (SELECT doc_id, p,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS run_id
        |       FROM rr),
        |runs AS (SELECT doc_id, run_id, count(*)::BIGINT AS run_len FROM rs GROUP BY 1, 2)
        |SELECT doc_id, sum(run_len)::BIGINT AS n_hit_positions, count(*)::BIGINT AS n_runs,
        |       max(run_len)::BIGINT AS max_run, (max(run_len) + 4)::BIGINT AS max_span_tokens
        |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    "x21_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |  (('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,


    "x22_dedup_clusters" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte
         |SELECT doc_id, cluster FROM comp ORDER BY doc_id""".stripMargin,


    "x23_corpus_stats" ->
      """SELECT lang, source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars,
        |       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
        |       sum(n_chars)::DOUBLE / count(*) AS mean_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "x24_incremental_dedup" ->
      """WITH corpus AS (SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id % 2 = 0)
        |SELECT doc_id, sha256(text) AS digest FROM documents
        |WHERE doc_id % 2 = 1 AND sha256(text) NOT IN (SELECT digest FROM corpus)
        |ORDER BY doc_id""".stripMargin,


    "x25_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |  (('0x' || substr(md5('samp:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 25 END
        |ORDER BY doc_id""".stripMargin,


    "x29_curated_corpus" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |$qualityCte,
         |keepq AS (SELECT doc_id FROM q WHERE $qualityKeepPred),
         |spl AS (SELECT doc_id FROM documents
         |        WHERE (('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100) < 80)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN keepq k ON k.doc_id = d.doc_id
         |LEFT JOIN comp c ON c.doc_id = d.doc_id
         |JOIN spl s ON s.doc_id = d.doc_id
         |WHERE c.cluster IS NULL OR c.cluster = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,


    "x30_length_histogram" ->
      """SELECT n_chars // 50 AS bucket, (n_chars // 50) * 50 AS bucket_lo,
        |       count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY bucket""".stripMargin,


    "x31_top_docs_per_lang" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
        |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
        |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio FROM t),
        |q AS (SELECT doc_id,
        |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |  FROM s),
        |r AS (SELECT d.lang, q.doc_id, q.quality,
        |        row_number() OVER (PARTITION BY d.lang ORDER BY q.quality DESC, q.doc_id) AS rank
        |      FROM q JOIN documents d ON d.doc_id = q.doc_id)
        |SELECT lang, rank, doc_id, quality FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,


    "x33_median_chars" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |        row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY lang) AS cnt
        |      FROM documents)
        |SELECT lang, n_chars AS median_chars, cnt AS n_docs
        |FROM r WHERE rn = (cnt + 1) // 2 ORDER BY lang""".stripMargin,


    "x40_boilerplate_ngrams" -> // reuses the canonical shingle CTEs (pairs/jac unused here)
      s"""WITH $shinglesCte,
         |hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) >= 3)
         |SELECT s.doc_id, count(*) AS n_boiler,
         |       count(*)::DOUBLE / any_value(z.n) AS boiler_frac
         |FROM sh s JOIN hot h ON h.shingle = s.shingle JOIN sizes z ON z.doc_id = s.doc_id
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,


    "x42_bloom_prefilter" ->
      """WITH cd AS (SELECT DISTINCT sha256(text) AS digest FROM documents WHERE doc_id % 2 = 0),
        |bloom AS (SELECT DISTINCT
        |            (('0x' || substr(md5('bf' || i::VARCHAR || ':' || digest), 1, 8))::UBIGINT % 65536)::BIGINT AS pos
        |          FROM cd, unnest(range(0, 4)) AS t(i)),
        |nd AS (SELECT doc_id, sha256(text) AS digest FROM documents WHERE doc_id % 2 = 1),
        |np AS (SELECT doc_id,
        |            (('0x' || substr(md5('bf' || i::VARCHAR || ':' || digest), 1, 8))::UBIGINT % 65536)::BIGINT AS pos
        |       FROM nd, unnest(range(0, 4)) AS t(i)),
        |hits AS (SELECT np.doc_id, count(b.pos)::BIGINT AS n_hits
        |         FROM np LEFT JOIN bloom b ON b.pos = np.pos GROUP BY 1)
        |SELECT nd.doc_id, h.n_hits, h.n_hits = 4 AS maybe_dup, c.digest IS NOT NULL AS is_dup
        |FROM nd JOIN hits h ON h.doc_id = nd.doc_id
        |LEFT JOIN cd c ON c.digest = nd.digest
        |ORDER BY nd.doc_id""".stripMargin,


    "x45_weighted_sample" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id,
        |  len(ts)::BIGINT AS n_tokens,
        |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
        |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio
        |  FROM t),
        |q AS (SELECT doc_id,
        |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |  FROM s),
        |b AS (SELECT doc_id, quality,
        |  (('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS u,
        |  floor((0.3 * quality) * 4294967296.0)::BIGINT AS threshold
        |  FROM q)
        |SELECT doc_id, quality, u, threshold, u < threshold AS keep
        |FROM b ORDER BY doc_id""".stripMargin,


    "x47_cluster_reps" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
         |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
         |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio FROM t),
         |q AS (SELECT doc_id,
         |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
         |  FROM s),
         |r AS (SELECT c.cluster, c.doc_id, q.quality,
         |        row_number() OVER (PARTITION BY c.cluster ORDER BY q.quality DESC, c.doc_id) AS rn,
         |        count(*) OVER (PARTITION BY c.cluster) AS n_members
         |      FROM comp c JOIN q ON q.doc_id = c.doc_id)
         |SELECT cluster, doc_id AS rep_doc_id, quality AS rep_quality, n_members
         |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin,


    "x48_mixture_plan" ->
      """WITH s AS (SELECT source, count(*)::BIGINT AS n_docs,
        |                  sum(len(string_split(text, ' ')))::BIGINT AS src_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(src_tokens)::BIGINT AS total, count(*)::BIGINT AS n_sources FROM s)
        |SELECT source, n_docs, src_tokens,
        |       src_tokens::DOUBLE / total AS natural_share,
        |       least(1.0, (1.0 / n_sources) / (src_tokens::DOUBLE / total)) AS rate
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin,


    "x49_contamination_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |         ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS gram
        |      FROM toks, unnest(range(1, len(ts) - 3)) AS t(i)),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        |corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 != 0),
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM corpus GROUP BY 1),
        |sh AS (SELECT doc_id, count(*)::BIGINT AS n_shared
        |       FROM corpus JOIN bench USING (gram) GROUP BY 1)
        |SELECT s.doc_id, s.n_grams, coalesce(sh.n_shared, 0)::BIGINT AS n_shared,
        |       coalesce(sh.n_shared, 0)::DOUBLE / s.n_grams AS shared_frac,
        |       coalesce(sh.n_shared, 0)::DOUBLE / s.n_grams >= 0.1 AS "drop"
        |FROM sizes s LEFT JOIN sh ON sh.doc_id = s.doc_id
        |ORDER BY s.doc_id""".stripMargin,


    "x46_fixed_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |  (('0x' || substr(md5('fsamp:' || doc_id::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS u
        |  FROM documents),
        |r AS (SELECT lang, doc_id, u,
        |        row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rank
        |      FROM b)
        |SELECT lang, rank, doc_id, u FROM r WHERE rank <= 20
        |ORDER BY lang, rank""".stripMargin,


    // x57's prototypicality columns joined to x31's quality formula;
    // keep = both gates (thresholds are the harness medians)
    "x75_crossmodal_curation" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        """,
          |xsim AS (SELECT af.vec_id, af.cid AS cell,
          |       round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> e.ed[i] * c.cd[i])), (a, b) -> a + b)
          |             / sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> c.cd[i] * c.cd[i])), (a, b) -> a + b)), 4) AS cent_sim4
          |       FROM af JOIN e ON e.vec_id = af.vec_id JOIN c2 c ON c.cid = af.cid),
          |xt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          |xs AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
          |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
          |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio FROM xt),
          |xq AS (SELECT doc_id,
          |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
          |  FROM xs)
          |SELECT xq.doc_id, xq.quality, xsim.cell, xsim.cent_sim4,
          |       (xq.quality >= 0.63 AND xsim.cent_sim4 >= 0.25) AS keep
          |FROM xq JOIN xsim ON xsim.vec_id = xq.doc_id
          |ORDER BY xq.doc_id""".stripMargin),


    // sketch_ok is asserted as a CONSTANT: DuckDB recomputes the exact
    // side; the Spark side computes the verdict from its sketch — a
    // drifting sketch flips the boolean and fails the hash
    "x59_cardinality_sketch" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT source, count(*)::BIGINT AS n_tokens,
        |       count(DISTINCT tok)::BIGINT AS exact_distinct,
        |       TRUE AS sketch_ok
        |FROM toks GROUP BY source ORDER BY source""".stripMargin,


    "x60_token_drift" ->
      """WITH toks AS (SELECT doc_id % 2 AS parity, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok,
        |        sum(CASE WHEN parity = 0 THEN 1 ELSE 0 END)::BIGINT AS count_a,
        |        sum(CASE WHEN parity = 1 THEN 1 ELSE 0 END)::BIGINT AS count_b
        |      FROM toks GROUP BY tok),
        |t AS (SELECT sum(count_a)::BIGINT AS na, sum(count_b)::BIGINT AS nb FROM c)
        |SELECT t.na AS n_tokens_a, t.nb AS n_tokens_b,
        |       sum(abs(c.count_a * t.nb - c.count_b * t.na))::BIGINT AS tv_numer,
        |       sum(abs(c.count_a * t.nb - c.count_b * t.na))::DOUBLE / (2.0 * t.na * t.nb) AS tv_distance
        |FROM c CROSS JOIN t GROUP BY t.na, t.nb""".stripMargin,


    "x61_top_movers" ->
      """WITH toks AS (SELECT doc_id % 2 AS parity, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok,
        |        sum(CASE WHEN parity = 0 THEN 1 ELSE 0 END)::BIGINT AS count_a,
        |        sum(CASE WHEN parity = 1 THEN 1 ELSE 0 END)::BIGINT AS count_b
        |      FROM toks GROUP BY tok),
        |t AS (SELECT sum(count_a)::BIGINT AS na, sum(count_b)::BIGINT AS nb FROM c)
        |SELECT c.tok, c.count_a, c.count_b,
        |       abs(c.count_a * t.nb - c.count_b * t.na)::BIGINT AS shift_numer
        |FROM c CROSS JOIN t
        |ORDER BY shift_numer DESC, tok LIMIT 15""".stripMargin,


    "x66_split_leakage" ->
      s"""WITH $simhashPairsCte,
         |sp AS (SELECT doc_id,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    (('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS b
         |    FROM documents))
         |SELECT p.d1, p.d2, s1.split AS split_1, s2.split AS split_2, p.hamming
         |FROM nd_pairs p JOIN sp s1 ON s1.doc_id = p.d1 JOIN sp s2 ON s2.doc_id = p.d2
         |WHERE s1.split <> s2.split
         |ORDER BY p.d1, p.d2""".stripMargin,


    // x66's pair relation feeding a drop set: the lower-priority member
    // (train=2 > val=1 > test=0) of each leaking pair loses its row
    "x71_leakage_repair" ->
      s"""WITH $simhashPairsCte,
         |sp AS (SELECT doc_id,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    (('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS b
         |    FROM documents)),
         |lk AS (SELECT p.d1, p.d2, s1.split AS split_1, s2.split AS split_2
         |       FROM nd_pairs p JOIN sp s1 ON s1.doc_id = p.d1 JOIN sp s2 ON s2.doc_id = p.d2
         |       WHERE s1.split <> s2.split),
         |pr AS (SELECT *,
         |         CASE split_1 WHEN 'train' THEN 2 WHEN 'val' THEN 1 ELSE 0 END AS p1,
         |         CASE split_2 WHEN 'train' THEN 2 WHEN 'val' THEN 1 ELSE 0 END AS p2
         |       FROM lk),
         |drops AS (SELECT DISTINCT CASE WHEN p1 < p2 THEN d1 ELSE d2 END AS doc_id FROM pr)
         |SELECT sp.doc_id, sp.split, drops.doc_id IS NULL AS kept
         |FROM sp LEFT JOIN drops ON drops.doc_id = sp.doc_id
         |ORDER BY sp.doc_id""".stripMargin,


    // Hamilton apportionment in pure BIGINT: floor quotas + the largest
    // division remainders take the leftover seats (ties to source asc)
    "x72_budget_allocation" ->
      """WITH s AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs)::BIGINT AS total FROM s),
        |b AS (SELECT source, n_docs,
        |        (100::BIGINT * n_docs) // total AS base,
        |        (100::BIGINT * n_docs) % total AS rem
        |      FROM s CROSS JOIN t),
        |l AS (SELECT (100::BIGINT - sum(base))::BIGINT AS leftover FROM b),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
        |SELECT source, n_docs, base, rem,
        |       base + CASE WHEN rk <= leftover THEN 1::BIGINT ELSE 0::BIGINT END AS quota
        |FROM r CROSS JOIN l ORDER BY source""".stripMargin,


    // x31's quality formula + the split/sampler md5 derivation mod 8,
    // then best-first rank within each shard
    "x74_curriculum_shards" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
        |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
        |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio FROM t),
        |q AS (SELECT doc_id,
        |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |  FROM s),
        |b AS (SELECT doc_id, quality,
        |  (('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 8)::BIGINT AS shard
        |  FROM q),
        |r AS (SELECT doc_id, shard, quality,
        |        row_number() OVER (PARTITION BY shard ORDER BY quality DESC, doc_id) AS position
        |      FROM b)
        |SELECT doc_id, shard, position, quality FROM r
        |ORDER BY shard, position""".stripMargin,


    // the ok_* verdicts are the audit law (sketch rank within ±n/accuracy
    // of the target — x59's contract); exact_p* are the discrete order
    // statistics both engines compute in pure integer selection
    "x67_quantile_audit" ->
      """WITH r AS (SELECT source, n_chars,
        |        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY source) AS cnt
        |      FROM documents)
        |SELECT source, max(cnt)::BIGINT AS n_docs,
        |  max(CASE WHEN rn <= least(cnt, greatest(1, ceil(0.5 * cnt)::BIGINT)) THEN n_chars END) AS exact_p50,
        |  max(CASE WHEN rn <= least(cnt, greatest(1, ceil(0.9 * cnt)::BIGINT)) THEN n_chars END) AS exact_p90,
        |  max(CASE WHEN rn <= least(cnt, greatest(1, ceil(0.99 * cnt)::BIGINT)) THEN n_chars END) AS exact_p99,
        |  TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
        |FROM r GROUP BY source ORDER BY source""".stripMargin,


    // x60's parity-snapshot convention; exact distinct-gram counts, the
    // anti-join spelling of "unseen in the previous snapshot"
    "x77_gram_novelty" ->
      """WITH t77 AS (SELECT source, doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT DISTINCT source, doc_id % 2 AS parity,
        |        ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
        |      FROM t77, unnest(range(1, len(ts) - 1)) AS t(i)),
        |a AS (SELECT source, gram FROM g WHERE parity = 0),
        |b AS (SELECT source, gram FROM g WHERE parity = 1),
        |n AS (SELECT source, count(*)::BIGINT AS n_grams_b FROM b GROUP BY 1),
        |nov AS (SELECT b.source, count(*)::BIGINT AS n_novel
        |        FROM b ANTI JOIN a USING (source, gram) GROUP BY 1)
        |SELECT n.source, n.n_grams_b, coalesce(nov.n_novel, 0)::BIGINT AS n_novel,
        |       coalesce(nov.n_novel, 0)::DOUBLE / n.n_grams_b AS novelty
        |FROM n LEFT JOIN nov ON nov.source = n.source
        |ORDER BY n.source""".stripMargin,


    // x48's rate CTE verbatim, then the gate: u < floor(rate·2^32) —
    // the weightedSample threshold spelling, all exactly-rounded IEEE ops
    "x68_mixture_sample" ->
      """WITH s AS (SELECT source, count(*)::BIGINT AS n_docs,
        |                  sum(len(string_split(text, ' ')))::BIGINT AS src_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(src_tokens)::BIGINT AS total, count(*)::BIGINT AS n_sources FROM s),
        |p AS (SELECT source,
        |        least(1.0, (1.0 / n_sources) / (src_tokens::DOUBLE / total)) AS rate
        |      FROM s CROSS JOIN t),
        |b AS (SELECT doc_id, source,
        |        (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS u
        |      FROM documents)
        |SELECT b.doc_id, b.source, b.u FROM b JOIN p USING (source)
        |WHERE b.u < floor(p.rate * 4294967296.0)::BIGINT
        |ORDER BY b.doc_id""".stripMargin,


    // both signals ranked on their ROUNDED values with the doc_id
    // tie-break (each rank a permutation → the classical rho formula);
    // the denominator keeps the fixed association n*(n*n - 1) in DOUBLE
    "x115_signal_agreement" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dfr AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |rar AS (SELECT tf.doc_id,
        |               round(sum(tf.tf * (n_docs - df))::DOUBLE / sum(tf.tf), 4) AS a4
        |        FROM tf JOIN dfr USING (token) CROSS JOIN nn GROUP BY tf.doc_id),
        |t2 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bgr AS (SELECT doc_id, list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS bg FROM t2),
        |rep AS (SELECT doc_id, round(len(list_distinct(bg))::DOUBLE / len(bg), 4) AS b4
        |        FROM bgr WHERE len(bg) > 0),
        |j AS (SELECT d.source, d.doc_id, a4, b4
        |      FROM documents d JOIN rar ON rar.doc_id = d.doc_id JOIN rep ON rep.doc_id = d.doc_id),
        |r AS (SELECT source,
        |             row_number() OVER (PARTITION BY source ORDER BY a4, doc_id)::BIGINT AS ra,
        |             row_number() OVER (PARTITION BY source ORDER BY b4, doc_id)::BIGINT AS rb
        |      FROM j),
        |agg AS (SELECT source, count(*)::BIGINT AS n,
        |               sum((ra - rb) * (ra - rb))::BIGINT AS sum_d2 FROM r GROUP BY 1)
        |SELECT source, n, sum_d2,
        |       CASE WHEN n < 2 THEN NULL
        |            ELSE 1.0 - 6.0 * sum_d2::DOUBLE / (n::DOUBLE * (n::DOUBLE * n::DOUBLE - 1.0))
        |       END AS rho
        |FROM agg ORDER BY source""".stripMargin,


    // x22's component closure + a size histogram; the size-1 bucket is
    // the unpaired complement (components always have >= 2 members)
    "x121_cluster_sizes" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |sizes AS (SELECT cluster, count(*)::BIGINT AS cluster_size FROM comp GROUP BY 1),
         |hist AS (SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM sizes GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS n_total FROM documents),
         |clustered AS (SELECT count(*)::BIGINT AS n_clustered FROM comp),
         |all_h AS (SELECT * FROM hist
         |          UNION ALL
         |          SELECT 1::BIGINT, n_total - n_clustered FROM tot CROSS JOIN clustered
         |          WHERE n_total > n_clustered)
         |SELECT cluster_size, n_clusters,
         |       cluster_size * n_clusters AS n_docs,
         |       round((cluster_size * n_clusters)::DOUBLE / n_total, 4) AS docs_share4
         |FROM all_h CROSS JOIN tot ORDER BY cluster_size""".stripMargin,


    // majority pick mirrors max(struct(n_l, lang)): count desc, then
    // the LEXICALLY GREATER language on ties
    "x123_lang_purity" ->
      """WITH cells AS (SELECT source, lang, count(*)::BIGINT AS n_l
        |               FROM documents GROUP BY 1, 2),
        |agg AS (SELECT source, sum(n_l)::BIGINT AS n_docs, count(*)::BIGINT AS n_langs,
        |               sum(n_l * n_l)::BIGINT AS sum_sq FROM cells GROUP BY 1),
        |mj AS (SELECT source, lang AS majority_lang, n_l AS mj_n,
        |              row_number() OVER (PARTITION BY source ORDER BY n_l DESC, lang DESC) AS rn
        |       FROM cells)
        |SELECT a.source, n_docs, n_langs, majority_lang,
        |       round(mj_n::DOUBLE / n_docs, 4) AS majority_share4,
        |       round((n_docs * n_docs - sum_sq)::DOUBLE / (n_docs * n_docs), 4) AS gini4
        |FROM agg a JOIN mj ON mj.source = a.source AND rn = 1
        |ORDER BY a.source""".stripMargin,


    "x124_rare_cell_suppression" ->
      s"""SELECT lang, source, count(*)::BIGINT AS n_docs,
         |       count(*) < $kanonK AS suppress,
         |       (CASE WHEN count(*) < $kanonK THEN 0 ELSE count(*) END)::BIGINT AS kept_docs
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // x67's order-statistic rank rule per (side, source); x93's parity
    // snapshot binding; shifts exact BIGINTs, rel shifts guarded
    "x127_quantile_drift" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
        |                  CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END AS side
        |           FROM documents),
        |r AS (SELECT source, side, n_chars,
        |             row_number() OVER (PARTITION BY side, source ORDER BY n_chars, doc_id) AS rn,
        |             count(*) OVER (PARTITION BY side, source) AS cnt
        |      FROM d),
        |a AS (SELECT source,
        |  max(cnt) FILTER (side = 'old')::BIGINT AS n_old,
        |  max(cnt) FILTER (side = 'new')::BIGINT AS n_new,
        |  max(CASE WHEN side = 'old' AND rn <= least(cnt, greatest(1, ceil(0.5 * cnt)::BIGINT)) THEN n_chars END) AS old_p50,
        |  max(CASE WHEN side = 'new' AND rn <= least(cnt, greatest(1, ceil(0.5 * cnt)::BIGINT)) THEN n_chars END) AS new_p50,
        |  max(CASE WHEN side = 'old' AND rn <= least(cnt, greatest(1, ceil(0.9 * cnt)::BIGINT)) THEN n_chars END) AS old_p90,
        |  max(CASE WHEN side = 'new' AND rn <= least(cnt, greatest(1, ceil(0.9 * cnt)::BIGINT)) THEN n_chars END) AS new_p90,
        |  max(CASE WHEN side = 'old' AND rn <= least(cnt, greatest(1, ceil(0.99 * cnt)::BIGINT)) THEN n_chars END) AS old_p99,
        |  max(CASE WHEN side = 'new' AND rn <= least(cnt, greatest(1, ceil(0.99 * cnt)::BIGINT)) THEN n_chars END) AS new_p99
        |  FROM r GROUP BY source)
        |SELECT source, n_old, n_new, old_p50, new_p50, old_p90, new_p90, old_p99, new_p99,
        |  new_p50 - old_p50 AS shift_p50,
        |  CASE WHEN old_p50 IS NULL OR new_p50 IS NULL OR old_p50 = 0 THEN NULL
        |       ELSE round((new_p50 - old_p50)::DOUBLE / old_p50, 4) END AS rel_shift4_p50,
        |  new_p90 - old_p90 AS shift_p90,
        |  CASE WHEN old_p90 IS NULL OR new_p90 IS NULL OR old_p90 = 0 THEN NULL
        |       ELSE round((new_p90 - old_p90)::DOUBLE / old_p90, 4) END AS rel_shift4_p90,
        |  new_p99 - old_p99 AS shift_p99,
        |  CASE WHEN old_p99 IS NULL OR new_p99 IS NULL OR old_p99 = 0 THEN NULL
        |       ELSE round((new_p99 - old_p99)::DOUBLE / old_p99, 4) END AS rel_shift4_p99
        |FROM a ORDER BY source""".stripMargin,


    // x22's component closure joined to (source, lang); majority source
    // mirrors max(struct(n_s, source)) — count desc, then source DESC
    "x129_cluster_purity" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |m AS (SELECT comp.doc_id, cluster, source, lang
         |      FROM comp JOIN documents ON documents.doc_id = comp.doc_id),
         |bs AS (SELECT cluster, source, count(*)::BIGINT AS n_s FROM m GROUP BY 1, 2),
         |mj AS (SELECT cluster, source AS majority_source, n_s,
         |              row_number() OVER (PARTITION BY cluster ORDER BY n_s DESC, source DESC) AS rn
         |       FROM bs),
         |agg AS (SELECT cluster, count(*)::BIGINT AS n_members,
         |               count(DISTINCT source)::BIGINT AS n_sources,
         |               count(DISTINCT lang)::BIGINT AS n_langs
         |        FROM m GROUP BY 1)
         |SELECT agg.cluster, n_members, n_sources, n_langs, majority_source,
         |       round(n_s::DOUBLE / n_members, 4) AS majority_share4,
         |       n_sources > 1 AS cross_source, n_langs > 1 AS cross_lang
         |FROM agg JOIN mj ON mj.cluster = agg.cluster AND rn = 1
         |ORDER BY agg.cluster""".stripMargin,


    // x108's positioned-gram run detection + a covered-position
    // expansion and the x84 rebuild (anti join + ordered re-concat)
    "x132_decontamination_repair" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |pos AS (SELECT doc_id, i::BIGINT AS p,
         |               array_to_string(list_slice(ts, i, i + ${repairK - 1}), ' ') AS gram
         |        FROM t, unnest(range(1, len(ts) - ${repairK - 2})) AS r(i)
         |        WHERE len(ts) >= $repairK),
         |bench AS (SELECT DISTINCT gram FROM pos WHERE doc_id % $repairBenchMod = 0),
         |hits AS (SELECT doc_id, p FROM pos JOIN bench USING (gram)
         |         WHERE doc_id % $repairBenchMod <> 0),
         |m AS (SELECT doc_id, p,
         |        CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
         |             THEN 0 ELSE 1 END AS brk
         |      FROM hits),
         |s AS (SELECT doc_id, p,
         |        sum(brk) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS run_id
         |      FROM m),
         |runs AS (SELECT doc_id, run_id, min(p) AS p0, count(*)::BIGINT AS run_len
         |         FROM s GROUP BY 1, 2 HAVING count(*) >= $repairMinRun),
         |cov AS (SELECT DISTINCT doc_id, tp
         |        FROM runs, unnest(range(p0, p0 + run_len + ${repairK - 1})) AS r(tp)),
         |tok AS (SELECT doc_id, tp::BIGINT AS tp, ts[tp] AS token
         |        FROM t, unnest(range(1, len(ts) + 1)) AS r(tp)
         |        WHERE doc_id % $repairBenchMod <> 0),
         |kept AS (SELECT tok.doc_id, count(*)::BIGINT AS n_kept,
         |                string_agg(token, ' ' ORDER BY tp) AS text_repaired
         |         FROM tok ANTI JOIN cov USING (doc_id, tp) GROUP BY 1),
         |rn AS (SELECT doc_id, count(*)::BIGINT AS n_runs_excised FROM runs GROUP BY 1),
         |base AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens FROM t
         |         WHERE doc_id % $repairBenchMod <> 0)
         |SELECT base.doc_id, n_tokens,
         |       n_tokens - coalesce(n_kept, 0) AS n_removed,
         |       coalesce(n_runs_excised, 0)::BIGINT AS n_runs_excised,
         |       n_tokens = coalesce(n_kept, 0) AS clean,
         |       coalesce(text_repaired, '') AS text_repaired
         |FROM base LEFT JOIN kept ON kept.doc_id = base.doc_id
         |          LEFT JOIN rn ON rn.doc_id = base.doc_id
         |ORDER BY base.doc_id""".stripMargin,


    // x22's pair graph, ranks in scaled BIGINTs, one unrolled CTE block
    // per damped power step (the x35 Lloyd convention) — `//` is floor
    // division, matching Spark's `div` on the same non-negative ints
    "x134_dup_pagerank" -> {
      val steps = (1 to prIters).map { i =>
        s"""r$i AS (SELECT e.v AS node,
           |        (${15L * prScale / 100L}::BIGINT + (85 * sum(r.rank // d.deg)) // 100)::BIGINT AS rank
           |        FROM r${i - 1} r JOIN deg d ON d.node = r.node
           |                         JOIN edges e ON e.u = r.node
           |        GROUP BY e.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH $simhashPairsCte,
         |edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM nd_pairs
         |                       UNION ALL SELECT d2, d1 FROM nd_pairs),
         |deg AS MATERIALIZED (SELECT u AS node, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT node, $prScale::BIGINT AS rank FROM deg),
         |$steps
         |SELECT d.node AS doc_id, d.deg AS degree, r.rank::BIGINT AS rank_scaled,
         |       round(r.rank::DOUBLE / $prScale, 4) AS rank4
         |FROM deg d JOIN r$prIters r ON r.node = d.node
         |ORDER BY doc_id""".stripMargin
    },


    // five exact keyed folds over the shared chunk / cluster / pack
    // machinery; the pack tail law (everything at/after the first
    // deleted doc repacks) mirrors the Spark window spelling
    "x139_deletion_blast" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |$cdcChunksCte,
         |d AS (SELECT 'doc' AS artifact,
         |        sum(CASE WHEN doc_id % $blastDelMod = 0 THEN 1 ELSE 0 END)::BIGINT AS n_affected,
         |        count(*)::BIGINT AS n_total FROM documents),
         |cf AS (SELECT digest,
         |         max(CASE WHEN doc_id % $blastDelMod = 0 THEN 1 ELSE 0 END) AS has_del,
         |         max(CASE WHEN doc_id % $blastDelMod <> 0 THEN 1 ELSE 0 END) AS has_kept
         |       FROM ch GROUP BY 1),
         |cagg AS (SELECT 'chunk_digest' AS artifact,
         |          sum(CASE WHEN has_del = 1 AND has_kept = 0 THEN 1 ELSE 0 END)::BIGINT AS n_affected,
         |          count(*)::BIGINT AS n_total FROM cf),
         |pc AS (SELECT cluster,
         |         max(CASE WHEN doc_id % $blastDelMod = 0 THEN 1 ELSE 0 END) AS has_del,
         |         count(*)::BIGINT AS n_members,
         |         sum(CASE WHEN doc_id % $blastDelMod <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_kept
         |       FROM comp GROUP BY 1),
         |clagg AS (SELECT 'cluster' AS artifact,
         |           sum(CASE WHEN has_del = 1 THEN 1 ELSE 0 END)::BIGINT AS n_affected,
         |           count(*)::BIGINT AS n_total FROM pc),
         |coagg AS (SELECT 'co_clustered_doc' AS artifact,
         |           sum(CASE WHEN has_del = 1 THEN n_kept ELSE 0 END)::BIGINT AS n_affected,
         |           sum(n_members)::BIGINT AS n_total FROM pc),
         |pt AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS tok FROM documents),
         |pw AS (SELECT lang, doc_id, tok,
         |         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |       FROM pt),
         |pb AS (SELECT lang, max((cum - tok) // 512) AS max_bin,
         |         min(CASE WHEN doc_id % $blastDelMod = 0 THEN (cum - tok) // 512 END) AS min_del_bin
         |       FROM pw GROUP BY 1),
         |pagg AS (SELECT 'pack_bin' AS artifact,
         |          sum(CASE WHEN min_del_bin IS NULL THEN 0 ELSE max_bin - min_del_bin + 1 END)::BIGINT AS n_affected,
         |          sum(max_bin + 1)::BIGINT AS n_total FROM pb),
         |u AS (SELECT * FROM d UNION ALL SELECT * FROM cagg UNION ALL SELECT * FROM clagg
         |      UNION ALL SELECT * FROM coagg UNION ALL SELECT * FROM pagg)
         |SELECT artifact, n_affected, n_total,
         |       CASE WHEN n_total = 0 THEN NULL
         |            ELSE round(n_affected::DOUBLE / n_total, 4) END AS affected_frac4
         |FROM u ORDER BY artifact""".stripMargin,


    // per-doc simhash is corpus-independent, so the even-only corpus's
    // pair relation is exactly nd_pairs with both endpoints even; the
    // two component closures feed one contingency pair-count
    "x141_cluster_stability" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |op AS (SELECT d1, d2 FROM nd_pairs WHERE d1 % 2 = 0 AND d2 % 2 = 0),
         |oedges AS (SELECT d1 AS u, d2 AS v FROM op UNION ALL SELECT d2, d1 FROM op),
         |oreach(u, v) AS (SELECT u, v FROM oedges
         |                 UNION
         |                 SELECT r.u, e.v FROM oreach r JOIN oedges e ON r.v = e.u),
         |ocomp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM oreach GROUP BY u),
         |asg AS (SELECT d.doc_id,
         |               coalesce(o.cluster, d.doc_id) AS c_old,
         |               coalesce(n.cluster, d.doc_id) AS c_new
         |        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
         |        LEFT JOIN ocomp o ON o.doc_id = d.doc_id
         |        LEFT JOIN comp n ON n.doc_id = d.doc_id),
         |cells AS (SELECT c_old, c_new, count(*)::BIGINT AS nij FROM asg GROUP BY 1, 2),
         |am AS (SELECT sum(nij * (nij - 1) // 2)::BIGINT AS together_both,
         |              sum(nij)::BIGINT AS n_docs FROM cells),
         |rm AS (SELECT sum(ni * (ni - 1) // 2)::BIGINT AS old_together
         |       FROM (SELECT c_old, sum(nij)::BIGINT AS ni FROM cells GROUP BY 1)),
         |cm AS (SELECT sum(nj * (nj - 1) // 2)::BIGINT AS new_together
         |       FROM (SELECT c_new, sum(nij)::BIGINT AS nj FROM cells GROUP BY 1))
         |SELECT n_docs, (n_docs * (n_docs - 1) // 2)::BIGINT AS all_pairs,
         |       together_both,
         |       (old_together - together_both)::BIGINT AS split_by_new,
         |       (new_together - together_both)::BIGINT AS merged_by_new,
         |       (n_docs * (n_docs - 1) // 2 - old_together - new_together + together_both)::BIGINT AS apart_both,
         |       CASE WHEN n_docs * (n_docs - 1) // 2 = 0 THEN NULL
         |            ELSE round((together_both + n_docs * (n_docs - 1) // 2 - old_together
         |                        - new_together + together_both)::DOUBLE
         |                       / (n_docs * (n_docs - 1) // 2), 4) END AS rand4
         |FROM am CROSS JOIN rm CROSS JOIN cm""".stripMargin,


    // degree-ordered orientation makes each triangle {x<y<z} visible
    // exactly once as the wedge (x->y, x->z) closed by y->z; row-value
    // comparison mirrors the Spark struct order
    "x145_triangle_census" ->
      s"""WITH $simhashPairsCte,
         |und AS (SELECT d1 AS u, d2 AS v FROM nd_pairs UNION ALL SELECT d2, d1 FROM nd_pairs),
         |dg AS (SELECT u AS node, count(*)::BIGINT AS deg FROM und GROUP BY 1),
         |ore AS (SELECT CASE WHEN (g1.deg, p.d1) < (g2.deg, p.d2) THEN p.d1 ELSE p.d2 END AS src,
         |               CASE WHEN (g1.deg, p.d1) < (g2.deg, p.d2) THEN p.d2 ELSE p.d1 END AS dst
         |        FROM nd_pairs p JOIN dg g1 ON g1.node = p.d1 JOIN dg g2 ON g2.node = p.d2),
         |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |        FROM ore e1 JOIN ore e2 ON e1.src = e2.src AND e1.dst <> e2.dst
         |        JOIN ore e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |tn AS (SELECT node, count(*)::BIGINT AS n_tri
         |       FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
         |             UNION ALL SELECT c FROM tri)
         |       GROUP BY 1)
         |SELECT dg.node AS doc_id, dg.deg AS degree,
         |       coalesce(tn.n_tri, 0)::BIGINT AS n_triangles,
         |       CASE WHEN dg.deg < 2 THEN NULL
         |            ELSE round(2.0 * coalesce(tn.n_tri, 0)::DOUBLE
         |                       / (dg.deg * (dg.deg - 1))::DOUBLE, 4) END AS cc4
         |FROM dg LEFT JOIN tn ON tn.node = dg.node ORDER BY doc_id""".stripMargin,


    // x145's triangle relation re-read per EDGE: each triangle feeds
    // its three canonical (min, max) edges into one fold; the left
    // join back keeps zero-support edges visible
    "x146_edge_support" ->
      s"""WITH $simhashPairsCte,
         |und AS (SELECT d1 AS u, d2 AS v FROM nd_pairs UNION ALL SELECT d2, d1 FROM nd_pairs),
         |dg AS (SELECT u AS node, count(*)::BIGINT AS deg FROM und GROUP BY 1),
         |ore AS (SELECT CASE WHEN (g1.deg, p.d1) < (g2.deg, p.d2) THEN p.d1 ELSE p.d2 END AS src,
         |               CASE WHEN (g1.deg, p.d1) < (g2.deg, p.d2) THEN p.d2 ELSE p.d1 END AS dst
         |        FROM nd_pairs p JOIN dg g1 ON g1.node = p.d1 JOIN dg g2 ON g2.node = p.d2),
         |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |        FROM ore e1 JOIN ore e2 ON e1.src = e2.src AND e1.dst <> e2.dst
         |        JOIN ore e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |es AS (SELECT least(a, b) AS d1, greatest(a, b) AS d2 FROM tri
         |       UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
         |       UNION ALL SELECT least(b, c), greatest(b, c) FROM tri),
         |sup AS (SELECT d1, d2, count(*)::BIGINT AS support FROM es GROUP BY 1, 2)
         |SELECT p.d1, p.d2, coalesce(s.support, 0)::BIGINT AS support,
         |       (coalesce(s.support, 0) = 0) AS unsupported
         |FROM nd_pairs p LEFT JOIN sup s ON s.d1 = p.d1 AND s.d2 = p.d2
         |ORDER BY p.d1, p.d2""".stripMargin,


    // three layer folds over the shared digest/chunk/cluster CTEs,
    // each joined to one totals row; grouping by text = grouping by
    // its digest (the x1 spelling)
    "x147_dedup_savings" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |$cdcChunksCte,
         |dt AS (SELECT doc_id, text, len(string_split(text, ' '))::BIGINT AS n_toks FROM documents),
         |tot AS (SELECT count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS tok_total FROM dt),
         |dl AS (SELECT sum(cnt - 1)::BIGINT AS n_dropped, sum((cnt - 1) * nt)::BIGINT AS toks_dropped
         |       FROM (SELECT count(*) AS cnt, min(n_toks) AS nt FROM dt GROUP BY text)),
         |chu AS (SELECT count(*)::BIGINT AS n_units FROM ch),
         |cdrop AS (SELECT sum(cnt - 1)::BIGINT AS n_dropped, sum((cnt - 1) * nt)::BIGINT AS toks_dropped
         |          FROM (SELECT count(*) AS cnt, min(n_tokens) AS nt FROM ch GROUP BY digest)),
         |cldrop AS (SELECT count(*)::BIGINT AS n_dropped, sum(dt.n_toks)::BIGINT AS toks_dropped
         |           FROM comp JOIN dt ON dt.doc_id = comp.doc_id
         |           WHERE comp.doc_id <> comp.cluster)
         |SELECT 'doc' AS layer, tot.n_docs AS n_units, coalesce(dl.n_dropped, 0)::BIGINT AS n_dropped,
         |       tot.tok_total, coalesce(dl.toks_dropped, 0)::BIGINT AS toks_dropped,
         |       CASE WHEN tot.tok_total = 0 THEN NULL
         |            ELSE round(coalesce(dl.toks_dropped, 0)::DOUBLE / tot.tok_total, 4) END AS savings_frac4
         |FROM tot CROSS JOIN dl
         |UNION ALL
         |SELECT 'chunk', chu.n_units, coalesce(cdrop.n_dropped, 0)::BIGINT,
         |       tot.tok_total, coalesce(cdrop.toks_dropped, 0)::BIGINT,
         |       CASE WHEN tot.tok_total = 0 THEN NULL
         |            ELSE round(coalesce(cdrop.toks_dropped, 0)::DOUBLE / tot.tok_total, 4) END
         |FROM tot CROSS JOIN chu CROSS JOIN cdrop
         |UNION ALL
         |SELECT 'cluster', tot.n_docs, coalesce(cldrop.n_dropped, 0)::BIGINT,
         |       tot.tok_total, coalesce(cldrop.toks_dropped, 0)::BIGINT,
         |       CASE WHEN tot.tok_total = 0 THEN NULL
         |            ELSE round(coalesce(cldrop.toks_dropped, 0)::DOUBLE / tot.tok_total, 4) END
         |FROM tot CROSS JOIN cldrop
         |ORDER BY layer""".stripMargin,


    // the NAIVE |pos|x|neg| rank-sum comparison — the differential
    // proof of the Spark side's bucketed two-level class scan; quality
    // is x7's exact double spelling on both sides, so ties align
    "x150_quality_auc" ->
      s"""WITH $simhashPairsCte,
         |t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id,
         |  len(ts)::BIGINT AS n_tokens,
         |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
         |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio
         |  FROM t),
         |q AS (SELECT doc_id,
         |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
         |  FROM s),
         |dd AS (SELECT DISTINCT doc_id FROM
         |       (SELECT d1 AS doc_id FROM nd_pairs UNION ALL SELECT d2 FROM nd_pairs)),
         |pos AS (SELECT quality FROM q JOIN dd USING (doc_id)),
         |neg AS (SELECT quality FROM q ANTI JOIN dd USING (doc_id)),
         |pn AS (SELECT count(*)::BIGINT AS n_pos FROM pos),
         |ngn AS (SELECT count(*)::BIGINT AS n_neg FROM neg),
         |u AS (SELECT coalesce(sum(CASE WHEN p.quality > n.quality THEN 2
         |                               WHEN p.quality = n.quality THEN 1
         |                               ELSE 0 END), 0)::BIGINT AS u2
         |      FROM pos p CROSS JOIN neg n)
         |SELECT n_pos, n_neg, u2,
         |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |            ELSE round(u2::DOUBLE / (2.0 * (n_pos * n_neg)), 4) END AS auc4
         |FROM pn CROSS JOIN ngn CROSS JOIN u""".stripMargin,


    // x47's quality-argmax CTEs; the canonical rep is the cluster label
    // itself (comp labels components by their MIN member id), so both
    // rep lookups are plain doc_id joins
    "x152_rep_divergence" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
         |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
         |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio FROM t),
         |q AS (SELECT doc_id,
         |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
         |  FROM s),
         |r AS (SELECT c.cluster, c.doc_id, q.quality,
         |        row_number() OVER (PARTITION BY c.cluster ORDER BY q.quality DESC, c.doc_id) AS rn,
         |        count(*) OVER (PARTITION BY c.cluster) AS n_members
         |      FROM comp c JOIN q ON q.doc_id = c.doc_id),
         |rep AS (SELECT cluster, n_members, doc_id AS rep_quality_pick, quality AS q_pick
         |        FROM r WHERE rn = 1)
         |SELECT rep.cluster, rep.n_members, rep.rep_quality_pick,
         |       (rep.rep_quality_pick = rep.cluster) AS same,
         |       round(rep.q_pick - ql.quality, 4) AS q_gap4,
         |       (sp.n_tokens - sl.n_tokens)::BIGINT AS tok_delta
         |FROM rep JOIN q ql ON ql.doc_id = rep.cluster
         |         JOIN s sl ON sl.doc_id = rep.cluster
         |         JOIN s sp ON sp.doc_id = rep.rep_quality_pick
         |ORDER BY rep.cluster""".stripMargin,


    // one unrolled peel block per round (the x134 convention): support
    // via the naive common-neighbor count (the differential oracle of
    // the Spark side's oriented wedge join), filter at k-2, repeat —
    // blocks past the fixpoint are identities, and the Spark loop
    // throws if the fixpoint needs more removal rounds than unrolled
    "x154_k_truss" -> {
      val peel = (1 to trussRounds).map { i =>
        s"""u$i AS (SELECT d1 AS a, d2 AS b FROM e${i - 1} UNION ALL SELECT d2, d1 FROM e${i - 1}),
           |s$i AS (SELECT e.d1, e.d2, count(*)::BIGINT AS sup
           |        FROM e${i - 1} e JOIN u$i x ON x.a = e.d1
           |                         JOIN u$i y ON y.a = e.d2 AND y.b = x.b
           |        GROUP BY e.d1, e.d2),
           |e$i AS MATERIALIZED (SELECT d1, d2 FROM s$i WHERE sup >= ${trussK - 2})""".stripMargin
      }.mkString(",\n")
      s"""WITH $simhashPairsCte,
         |e0 AS MATERIALIZED (SELECT d1, d2 FROM nd_pairs),
         |u0 AS (SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0),
         |s0 AS (SELECT e.d1, e.d2, count(*)::BIGINT AS sup
         |       FROM e0 e JOIN u0 x ON x.a = e.d1
         |                 JOIN u0 y ON y.a = e.d2 AND y.b = x.b
         |       GROUP BY e.d1, e.d2),
         |$peel
         |SELECT p.d1, p.d2, coalesce(s0.sup, 0)::BIGINT AS support,
         |       (t.d1 IS NOT NULL) AS in_truss
         |FROM nd_pairs p
         |LEFT JOIN s0 ON s0.d1 = p.d1 AND s0.d2 = p.d2
         |LEFT JOIN e$trussRounds t ON t.d1 = p.d1 AND t.d2 = p.d2
         |ORDER BY p.d1, p.d2""".stripMargin
    },


    // the ONE-SHOT <=4 clustering plus the tight sub-clustering — the
    // differential proof that the Spark side's incremental merge
    // (star(tight labels) ∪ delta pairs, re-contracted) reproduces the
    // batch answer; nd_pairs carries hamming, so both closures read one
    // pair relation
    "x155_incremental_clusters" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |edges4 AS (SELECT d1 AS u, d2 AS v FROM nd_pairs UNION ALL SELECT d2, d1 FROM nd_pairs),
         |reach4(u, v) AS (SELECT u, v FROM edges4
         |                 UNION
         |                 SELECT r.u, e.v FROM reach4 r JOIN edges4 e ON r.v = e.u),
         |comp4 AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach4 GROUP BY u),
         |tp AS (SELECT d1, d2 FROM nd_pairs WHERE hamming <= $incTight),
         |edgest AS (SELECT d1 AS u, d2 AS v FROM tp UNION ALL SELECT d2, d1 FROM tp),
         |reacht(u, v) AS (SELECT u, v FROM edgest
         |                 UNION
         |                 SELECT r.u, e.v FROM reacht r JOIN edgest e ON r.v = e.u),
         |compt AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_tight FROM reacht GROUP BY u)
         |SELECT c4.doc_id, c4.cluster, ct.cluster_tight,
         |       (ct.doc_id IS NULL) AS newly_clustered,
         |       (coalesce(ct.cluster_tight, c4.doc_id) <> c4.cluster) AS relabeled
         |FROM comp4 c4 LEFT JOIN compt ct ON ct.doc_id = c4.doc_id
         |ORDER BY c4.doc_id""".stripMargin,


    // one unrolled node-peel block per round (x154's convention, degree
    // folds instead of triangle counts): nodes below k fall with their
    // edges, blocks past the fixpoint are identities, the Spark loop
    // throws if the fixpoint needs more rounds than unrolled
    "x156_k_core" -> {
      val peel = (1 to coreRounds).map { i =>
        s"""u$i AS (SELECT d1 AS a, d2 AS b FROM e${i - 1} UNION ALL SELECT d2, d1 FROM e${i - 1}),
           |n$i AS (SELECT a AS node FROM u$i GROUP BY a HAVING count(*) >= $coreK),
           |e$i AS MATERIALIZED (SELECT e.d1, e.d2 FROM e${i - 1} e
           |                     JOIN n$i x ON x.node = e.d1 JOIN n$i y ON y.node = e.d2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $simhashPairsCte,
         |e0 AS MATERIALIZED (SELECT d1, d2 FROM nd_pairs),
         |u0 AS (SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0),
         |d0 AS (SELECT a AS node, count(*)::BIGINT AS degree FROM u0 GROUP BY a),
         |$peel,
         |core AS (SELECT DISTINCT a AS node
         |         FROM (SELECT d1 AS a FROM e$coreRounds UNION ALL SELECT d2 FROM e$coreRounds))
         |SELECT d0.node AS doc_id, d0.degree, (c.node IS NOT NULL) AS in_kcore
         |FROM d0 LEFT JOIN core c ON c.node = d0.node
         |ORDER BY doc_id""".stripMargin
    },


    // frontier expansion unrolled one block per hop (x154's convention):
    // sources are the cluster canonicals, block i settles exactly the
    // hop-i ring; blocks past every family's eccentricity are identities
    "x157_canonical_distance" -> {
      val blocks = (1 to bfsHops).map { i =>
        s"""n$i AS (SELECT DISTINCT e.v AS node
           |        FROM d${i - 1} d JOIN edges e ON e.u = d.node AND d.hops = ${i - 1}
           |        WHERE e.v NOT IN (SELECT node FROM d${i - 1})),
           |d$i AS MATERIALIZED (SELECT node, hops FROM d${i - 1}
           |                     UNION ALL SELECT node, ${i}::BIGINT FROM n$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |d0 AS (SELECT DISTINCT cluster AS node, 0::BIGINT AS hops FROM comp),
         |$blocks
         |SELECT c.doc_id, c.cluster, d.hops
         |FROM comp c JOIN d$bfsHops d ON d.node = c.doc_id
         |ORDER BY c.doc_id""".stripMargin
    },


    // x134's unrolled power steps with the teleport confined to x19's
    // quality keepers: seeds re-receive the damping base each step,
    // non-seeds only propagated mass; same scaled-BIGINT arithmetic
    "x159_trust_rank" -> {
      val base = 15L * prScale / 100L
      val steps = (1 to prIters).map { i =>
        s"""r$i AS (SELECT x.node,
           |        (CASE WHEN sn.is_seed THEN $base::BIGINT ELSE 0::BIGINT END
           |         + (85 * x.inc) // 100)::BIGINT AS rank
           |        FROM (SELECT e.v AS node, sum(r.rank // d.deg) AS inc
           |              FROM r${i - 1} r JOIN deg d ON d.node = r.node
           |                               JOIN edges e ON e.u = r.node
           |              GROUP BY e.v) x JOIN sn ON sn.node = x.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $simhashPairsCte,
         |$qualityCte,
         |edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM nd_pairs
         |                       UNION ALL SELECT d2, d1 FROM nd_pairs),
         |deg AS MATERIALIZED (SELECT u AS node, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
         |seeds AS (SELECT doc_id FROM q WHERE $qualityKeepPred),
         |sn AS MATERIALIZED (SELECT d.node, d.deg, (s.doc_id IS NOT NULL) AS is_seed
         |                    FROM deg d LEFT JOIN seeds s ON s.doc_id = d.node),
         |r0 AS (SELECT node, CASE WHEN is_seed THEN $prScale::BIGINT ELSE 0::BIGINT END AS rank
         |       FROM sn),
         |$steps
         |SELECT sn.node AS doc_id, sn.deg AS degree, sn.is_seed,
         |       r.rank::BIGINT AS rank_scaled,
         |       round(r.rank::DOUBLE / $prScale, 4) AS rank4
         |FROM sn JOIN r$prIters r ON r.node = sn.node
         |ORDER BY doc_id""".stripMargin
    },


    // x21's bucket derivation keyed twice — by doc_id and by the
    // component canonical — then both policies audited over the SAME
    // pair relation; the cluster rows' leak_pairs = 0 IS the output law
    "x160_cluster_split" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |assign AS MATERIALIZED (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN db < 80 THEN 'train' WHEN db < 90 THEN 'val' ELSE 'test' END AS doc_split,
         |    CASE WHEN cb < 80 THEN 'train' WHEN cb < 90 THEN 'val' ELSE 'test' END AS clu_split
         |  FROM (SELECT dd.doc_id, dd.n_chars,
         |          (('0x' || substr(md5('split:' || dd.doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS db,
         |          (('0x' || substr(md5('split:' || coalesce(c.cluster, dd.doc_id)::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT AS cb
         |        FROM documents dd LEFT JOIN comp c ON c.doc_id = dd.doc_id)),
         |per AS (SELECT 'doc' AS policy, doc_split AS split, count(*)::BIGINT AS n_docs,
         |               sum(n_chars)::BIGINT AS n_chars,
         |               sum(CASE WHEN doc_split <> clu_split THEN 1 ELSE 0 END)::BIGINT AS moved_docs
         |        FROM assign GROUP BY 2
         |        UNION ALL
         |        SELECT 'cluster', clu_split, count(*)::BIGINT, sum(n_chars)::BIGINT,
         |               sum(CASE WHEN doc_split <> clu_split THEN 1 ELSE 0 END)::BIGINT
         |        FROM assign GROUP BY 2),
         |straddle AS (SELECT a1.doc_split AS s1d, a2.doc_split AS s2d,
         |                    a1.clu_split AS s1c, a2.clu_split AS s2c
         |             FROM nd_pairs p JOIN assign a1 ON a1.doc_id = p.d1
         |                             JOIN assign a2 ON a2.doc_id = p.d2),
         |leaks AS (SELECT policy, split, count(*)::BIGINT AS leak_pairs FROM (
         |            SELECT 'doc' AS policy, s1d AS split FROM straddle WHERE s1d <> s2d
         |            UNION ALL SELECT 'doc', s2d FROM straddle WHERE s1d <> s2d
         |            UNION ALL SELECT 'cluster', s1c FROM straddle WHERE s1c <> s2c
         |            UNION ALL SELECT 'cluster', s2c FROM straddle WHERE s1c <> s2c)
         |          GROUP BY 1, 2)
         |SELECT per.policy, per.split, per.n_docs, per.n_chars, per.moved_docs,
         |       coalesce(l.leak_pairs, 0)::BIGINT AS leak_pairs
         |FROM per LEFT JOIN leaks l ON l.policy = per.policy AND l.split = per.split
         |ORDER BY per.policy, per.split""".stripMargin,


    // one unrolled synchronous vote block per round (x134's convention):
    // each round counts neighbor labels per node and argmins
    // (−count, label) — the row_number spelling of the struct-min
    "x161_source_communities" -> {
      val rounds = (1 to lpIters).map { i =>
        s"""l$i AS MATERIALIZED (SELECT u AS node, label FROM (
           |  SELECT e.u, l.label, row_number() OVER (PARTITION BY e.u
           |           ORDER BY count(*) DESC, l.label) AS rn
           |  FROM edges e JOIN l${i - 1} l ON l.node = e.v GROUP BY e.u, l.label)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $simhashPairsCte,
         |edges AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM nd_pairs
         |                       UNION ALL SELECT d2, d1 FROM nd_pairs),
         |seeds AS MATERIALIZED (SELECT d.doc_id AS node, d.source AS label
         |                       FROM documents d JOIN (SELECT DISTINCT u FROM edges) n
         |                         ON n.u = d.doc_id),
         |l0 AS (SELECT node, label FROM seeds),
         |$rounds
         |SELECT s.node AS doc_id, s.label AS seed_label, l.label AS community,
         |       (l.label <> s.label) AS changed
         |FROM seeds s JOIN l$lpIters l ON l.node = s.node
         |ORDER BY doc_id""".stripMargin
    },


    // x14's bucketed cosine pairs closed transitively (x22's recursive
    // spelling over vec ids), then a label census with the row_number
    // spelling of the struct-argmin (count desc, label asc)
    "x162_semantic_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS ed, label,
         |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |p AS MATERIALIZED (SELECT a.vec_id AS d1, b.vec_id AS d2
         |     FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |     WHERE list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) >= 0.4),
         |edges AS (SELECT d1 AS u, d2 AS v FROM p UNION ALL SELECT d2, d1 FROM p),
         |reach(u, v) AS (SELECT u, v FROM edges
         |                UNION
         |                SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |bl AS (SELECT c.cluster, e.label, count(*)::BIGINT AS cnt
         |       FROM comp c JOIN e ON e.vec_id = c.doc_id GROUP BY 1, 2),
         |ag AS (SELECT cluster, sum(cnt)::BIGINT AS n_members, count(*)::BIGINT AS n_labels
         |       FROM bl GROUP BY 1),
         |mj AS (SELECT cluster, label AS maj_label, cnt FROM (
         |         SELECT *, row_number() OVER (PARTITION BY cluster
         |           ORDER BY cnt DESC, label) AS rn FROM bl) WHERE rn = 1)
         |SELECT ag.cluster, ag.n_members, ag.n_labels, mj.maj_label,
         |       round(mj.cnt::DOUBLE / ag.n_members, 4) AS maj_frac4
         |FROM ag JOIN mj ON mj.cluster = ag.cluster
         |ORDER BY ag.cluster""".stripMargin,


    // the x29 predicates applied cumulatively, folded to one row of
    // 8 conditional sums, exploded to the 4-stage report
    "x163_curation_funnel" ->
      s"""WITH RECURSIVE $simhashPairsCte,
         |$clusterCte,
         |$qualityCte,
         |fl AS (SELECT q.doc_id, q.n_tokens, ($qualityKeepPred) AS keep,
         |         (c.doc_id IS NOT NULL AND c.cluster <> c.doc_id) AS dup,
         |         ((('0x' || substr(md5('split:' || q.doc_id::VARCHAR), 1, 8))::UBIGINT % 100) < 80) AS train
         |       FROM q LEFT JOIN comp c ON c.doc_id = q.doc_id),
         |ag AS (SELECT count(*)::BIGINT AS d1, sum(n_tokens)::BIGINT AS t1,
         |         sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS d2,
         |         sum(CASE WHEN keep THEN n_tokens ELSE 0 END)::BIGINT AS t2,
         |         sum(CASE WHEN keep AND NOT dup THEN 1 ELSE 0 END)::BIGINT AS d3,
         |         sum(CASE WHEN keep AND NOT dup THEN n_tokens ELSE 0 END)::BIGINT AS t3,
         |         sum(CASE WHEN keep AND NOT dup AND train THEN 1 ELSE 0 END)::BIGINT AS d4,
         |         sum(CASE WHEN keep AND NOT dup AND train THEN n_tokens ELSE 0 END)::BIGINT AS t4
         |       FROM fl),
         |st AS (SELECT 1::INT AS stage_ord, 'raw' AS stage, d1 AS n_docs, t1 AS n_tokens, d1 AS rd, t1 AS rt FROM ag
         |       UNION ALL SELECT 2::INT, 'quality', d2, t2, d1, t1 FROM ag
         |       UNION ALL SELECT 3::INT, 'dedup', d3, t3, d1, t1 FROM ag
         |       UNION ALL SELECT 4::INT, 'train', d4, t4, d1, t1 FROM ag)
         |SELECT stage_ord, stage, n_docs, n_tokens,
         |       round(n_docs::DOUBLE / rd, 4) AS doc_frac4,
         |       round(n_tokens::DOUBLE / rt, 4) AS tok_frac4
         |FROM st ORDER BY stage_ord""".stripMargin,


    // share^alpha spelled as NESTED sqrt (IEEE correctly-rounded, so
    // the un-normalized weights are bit-identical across engines);
    // per-alpha normalizer over the |sources|-row relation
    "x164_mixture_temperature" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n_docs,
        |             sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_tokens)::BIGINT AS tot FROM c),
        |s AS (SELECT c.source, c.n_docs, c.n_tokens, c.n_tokens::DOUBLE / t.tot AS share FROM c, t),
        |pa AS (SELECT 100 AS alpha_pct, source, n_docs, n_tokens, share, share AS w_raw FROM s
        |       UNION ALL SELECT 50, source, n_docs, n_tokens, share, sqrt(share) FROM s
        |       UNION ALL SELECT 25, source, n_docs, n_tokens, share, sqrt(sqrt(share)) FROM s),
        |z AS (SELECT alpha_pct, sum(w_raw) AS zn FROM pa GROUP BY 1)
        |SELECT pa.alpha_pct::INT AS alpha_pct, pa.source, pa.n_docs, pa.n_tokens,
        |       round(pa.share, 4) AS share4,
        |       round(pa.w_raw / z.zn, 4) AS weight4,
        |       round(pa.w_raw / z.zn / pa.share, 4) AS boost4
        |FROM pa JOIN z ON z.alpha_pct = pa.alpha_pct
        |ORDER BY alpha_pct, source""".stripMargin,


    // the banded pair evidence tagged with both endpoints' sources,
    // folded to unordered cells with exact Hamming mass
    "x165_source_pair_matrix" ->
      s"""WITH $simhashPairsCte,
         |tagged AS (SELECT least(a.source, b.source) AS source_a,
         |                  greatest(a.source, b.source) AS source_b, p.hamming
         |           FROM nd_pairs p JOIN documents a ON a.doc_id = p.d1
         |                           JOIN documents b ON b.doc_id = p.d2),
         |cells AS (SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
         |                 sum(hamming)::BIGINT AS sum_hamming
         |          FROM tagged GROUP BY 1, 2),
         |t AS (SELECT sum(n_pairs)::BIGINT AS tot FROM cells)
         |SELECT c.source_a, c.source_b, c.n_pairs, c.sum_hamming,
         |       round(c.n_pairs::DOUBLE / t.tot, 4) AS pair_share4
         |FROM cells c, t
         |ORDER BY source_a, source_b""".stripMargin,


    // x14's pair CTE at the loosest tau, labels tagged, then one
    // row-local re-threshold per tau (sim >= tau/100.0 — the identical
    // IEEE division/comparison); the tau-list left join keeps
    // zero-pair thresholds visible
    "x166_semantic_threshold_sweep" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed, label,
         |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) AS bucket
         |  FROM embeddings),
         |p AS MATERIALIZED (SELECT a.label AS l1, b.label AS l2,
         |     list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) AS sim
         |     FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT sim, (l1 = l2) AS same FROM p WHERE sim >= 40 / 100.0),
         |taus AS (SELECT unnest([40, 50, 60, 70]) AS tau_pct),
         |folded AS (SELECT t.tau_pct, count(*)::BIGINT AS n_pairs,
         |                  sum(CASE WHEN same THEN 1 ELSE 0 END)::BIGINT AS n_same
         |           FROM pairs p2 JOIN taus t ON p2.sim >= t.tau_pct::DOUBLE / 100.0
         |           GROUP BY 1)
         |SELECT t.tau_pct::INT AS tau_pct,
         |       coalesce(f.n_pairs, 0)::BIGINT AS n_pairs,
         |       coalesce(f.n_same, 0)::BIGINT AS n_same,
         |       round(f.n_same::DOUBLE / f.n_pairs, 4) AS coherence4
         |FROM taus t LEFT JOIN folded f ON f.tau_pct = t.tau_pct
         |ORDER BY tau_pct""".stripMargin,


    // x164's census + exact-BIGINT budget arithmetic; the only floats
    // are floor((budget*n)/tot) and the two round(…, 4) divisions
    "x167_epoch_allocation" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n_docs,
        |             sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_tokens)::BIGINT AS tot FROM c),
        |a AS (SELECT source, n_docs, n_tokens,
        |        CAST(floor((4000000 * n_tokens)::DOUBLE / tot) AS BIGINT) AS alloc
        |      FROM c, t),
        |b AS (SELECT *, least(alloc // n_tokens, 4)::BIGINT AS epochs_full,
        |        least(alloc, 4 * n_tokens)::BIGINT AS effective_tokens FROM a)
        |SELECT source, n_docs, n_tokens, alloc, epochs_full, effective_tokens,
        |       (alloc - effective_tokens)::BIGINT AS leftover,
        |       round(effective_tokens::DOUBLE / n_tokens, 4) AS epochs4,
        |       CASE WHEN alloc = 0 THEN 1.0
        |            ELSE round(effective_tokens::DOUBLE / alloc, 4) END AS util4
        |FROM b ORDER BY source""".stripMargin,


    // x49's gram/benchmark relations re-derived per k, folded to the
    // |ks|-row tuning table (UNION ALL of one block per gram length)
    "x168_contamination_k_sweep" -> {
      def block(k: Int): String = {
        val gram = (0 until k).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
        s"""(WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           |g AS (SELECT DISTINCT doc_id, $gram AS gram
           |      FROM toks, unnest(range(1, len(ts) - ${k - 2})) AS t(i)),
           |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
           |corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 != 0),
           |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM corpus GROUP BY 1),
           |sh AS (SELECT doc_id, count(*)::BIGINT AS n_shared
           |       FROM corpus JOIN bench USING (gram) GROUP BY 1),
           |scored AS (SELECT s.doc_id, s.n_grams, coalesce(sh.n_shared, 0)::BIGINT AS n_shared
           |           FROM sizes s LEFT JOIN sh ON sh.doc_id = s.doc_id)
           |SELECT $k::INT AS k, count(*)::BIGINT AS n_docs,
           |       sum(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hit,
           |       sum(CASE WHEN n_shared::DOUBLE / n_grams >= 0.1 THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
           |       sum(n_grams)::BIGINT AS sum_grams,
           |       sum(n_shared)::BIGINT AS sum_shared,
           |       round(sum(CASE WHEN n_shared::DOUBLE / n_grams >= 0.1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS flag_rate4
           |FROM scored)""".stripMargin
      }
      Seq(3, 5, 7).map(block).mkString("", "\nUNION ALL\n", "\nORDER BY k")
    },


    // x150's quality + dup-label relations, folded to the exact bucket
    // spelling least(floor(q·10), 9) — the reliability-diagram bins
    "x169_quality_calibration" ->
      s"""WITH $simhashPairsCte,
         |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |s AS (SELECT doc_id,
         |  len(ts)::BIGINT AS n_tokens,
         |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
         |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio
         |  FROM t),
         |q AS (SELECT doc_id,
         |  ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
         |  FROM s),
         |dd AS (SELECT DISTINCT doc_id FROM
         |       (SELECT d1 AS doc_id FROM nd_pairs UNION ALL SELECT d2 FROM nd_pairs)),
         |binned AS (SELECT least(floor(q.quality * 10), 9)::BIGINT AS bin,
         |                  (dd.doc_id IS NOT NULL) AS is_dup
         |           FROM q LEFT JOIN dd ON dd.doc_id = q.doc_id)
         |SELECT bin, round(bin::DOUBLE / 10, 4) AS bin_lo4,
         |       count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup,
         |       round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_rate4
         |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,


    // x14's bucketed cosine pairs + x21's split derivation, leak = the
    // cross-split subset (doc_id and vec_id are the same key space)
    "x171_semantic_split_leakage" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed,
        |  (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
        |             list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> a.ed[i] * b.ed[i])), (x, y) -> x + y) AS sim
        |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |sp AS (SELECT doc_id,
        |  CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT p.v1, p.v2, s1.split AS split_1, s2.split AS split_2, round(p.sim, 4) AS sim4
        |FROM p JOIN sp s1 ON s1.doc_id = p.v1 JOIN sp s2 ON s2.doc_id = p.v2
        |WHERE p.sim >= 0.4 AND s1.split != s2.split
        |ORDER BY p.v1, p.v2""".stripMargin,
  )
}
