package graft.entries

/** Oracle SQL for the TextAnalysis-module keys (lang-ID, BM25/TF-IDF, LM, BPE, profiles) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait TextOracles {
  import OracleCtes._

  protected def textOracles: Map[String, String] = Map(

    "x82_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id,
        |        (('0x' || substr(md5(ts[i]), 1, 15))::UBIGINT)::BIGINT AS h1,
        |        (('0x' || substr(md5(array_to_string(list_slice(ts, i, i + 1), ' ')), 1, 15))::UBIGINT)::BIGINT AS h2
        |      FROM t, unnest(range(1, len(ts))) AS r(i)
        |      WHERE len(ts) >= 2),
        |bc AS (SELECT h2, count(*)::BIGINT AS cb FROM s GROUP BY 1),
        |uc AS (SELECT h1, count(*)::BIGINT AS cu FROM s GROUP BY 1),
        |sc AS (SELECT doc_id, cb, cu, cb::DOUBLE / cu AS condp
        |       FROM s JOIN bc USING (h2) JOIN uc USING (h1))
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams, min(condp) AS min_condp,
        |       sum(cb)::DOUBLE / sum(cu) AS pooled_condp
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,


    "x83_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |b AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |      FROM t, unnest(range(1, len(ts))) AS r(i)
        |      WHERE len(ts) >= 2),
        |n AS (SELECT count(*)::BIGINT AS nb FROM b),
        |cxy AS (SELECT w1, w2, count(*)::BIGINT AS c_xy FROM b GROUP BY 1, 2),
        |cx AS (SELECT w1, count(*)::BIGINT AS c_x FROM b GROUP BY 1),
        |cy AS (SELECT w2, count(*)::BIGINT AS c_y FROM b GROUP BY 1)
        |SELECT w1, w2, c_xy,
        |       (c_xy::DOUBLE * nb) / (c_x::DOUBLE * c_y) AS assoc
        |FROM cxy JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN n
        |WHERE c_xy >= 5
        |ORDER BY assoc DESC, w1, w2 LIMIT 20""".stripMargin,


    "x85_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id, lang,
        |        (('0x' || substr(md5(ts[i]), 1, 15))::UBIGINT)::BIGINT AS h1,
        |        (('0x' || substr(md5(array_to_string(list_slice(ts, i, i + 1), ' ')), 1, 15))::UBIGINT)::BIGINT AS h2
        |      FROM t, unnest(range(1, len(ts))) AS r(i)
        |      WHERE len(ts) >= 2),
        |bc AS (SELECT h2, count(*)::BIGINT AS cb FROM s GROUP BY 1),
        |uc AS (SELECT h1, count(*)::BIGINT AS cu FROM s GROUP BY 1),
        |sc AS (SELECT doc_id, lang, cb, cu FROM s JOIN bc USING (h2) JOIN uc USING (h1)),
        |scored AS (SELECT doc_id, lang, sum(cb)::DOUBLE / sum(cu) AS pooled_condp
        |           FROM sc GROUP BY 1, 2),
        |samp AS (SELECT * FROM scored
        |         WHERE (('0x' || substr(md5('ppl:' || doc_id::VARCHAR), 1, 8))::UBIGINT % 100)::BIGINT < 40),
        |rk AS (SELECT lang, pooled_condp,
        |         row_number() OVER (PARTITION BY lang ORDER BY pooled_condp DESC, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS ns
        |       FROM samp),
        |cuts AS (SELECT lang,
        |           max(CASE WHEN rn = (ns + 2) // 3 THEN pooled_condp END) AS head_min,
        |           max(CASE WHEN rn = (2 * ns + 2) // 3 THEN pooled_condp END) AS mid_min
        |         FROM rk GROUP BY 1)
        |SELECT scored.doc_id, scored.lang, scored.pooled_condp,
        |       CASE WHEN pooled_condp >= head_min THEN 'head'
        |            WHEN pooled_condp >= mid_min THEN 'middle'
        |            ELSE 'tail' END AS ppl_bucket
        |FROM scored JOIN cuts USING (lang)
        |ORDER BY doc_id""".stripMargin,


    "x7_text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id,
        |  len(ts)::BIGINT AS n_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS n_subtokens,
        |  len(list_distinct(ts))::DOUBLE / len(ts) AS ttr,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(ts, x -> length(x)::BIGINT)), (a, b) -> a + b)::DOUBLE / len(ts) AS avg_tok_len,
        |  len(list_filter(ts, x -> x IN ('the', 'a')))::DOUBLE / len(ts) AS stop_ratio
        |  FROM t)
        |SELECT doc_id, n_tokens, n_subtokens, ttr, avg_tok_len, stop_ratio,
        |       ttr * 0.5 + (1.0 - stop_ratio) * 0.3 + least(n_tokens::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |FROM s ORDER BY doc_id""".stripMargin,


    "x8_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(ts, ['the','a','of','to','and']))::BIGINT AS s_en,
        |  len(list_intersect(ts, ['der','die','das','und','ist']))::BIGINT AS s_de,
        |  len(list_intersect(ts, ['el','la','de','y','es']))::BIGINT AS s_es,
        |  len(list_intersect(ts, ['le','la','de','et','est']))::BIGINT AS s_fr,
        |  len(list_intersect(ts, ['的','是','在','有','我']))::BIGINT AS s_zh
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_es >= greatest(s_en, s_de, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= greatest(s_en, s_de, s_es, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang,
        |  greatest(s_en, s_de, s_es, s_fr, s_zh) AS score
        |FROM s ORDER BY doc_id""".stripMargin,


    "x17_lang_id_ngram" ->
      """WITH t AS (SELECT doc_id, list_distinct(list_transform(range(1, length(text)), i -> substr(text, i::INT, 2))) AS grams FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(grams, ['th','he','in','er','an','re','on','at']))::BIGINT AS g_en,
        |  len(list_intersect(grams, ['en','er','ch','de','ei','nd','te','ie']))::BIGINT AS g_de,
        |  len(list_intersect(grams, ['de','en','el','la','os','es','ar','ue']))::BIGINT AS g_es,
        |  len(list_intersect(grams, ['es','le','de','en','re','nt','on','ou']))::BIGINT AS g_fr,
        |  len(list_intersect(grams, ['的是','是在','在有','有我','我的','的一','一是','是了']))::BIGINT AS g_zh
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN g_en >= greatest(g_de, g_es, g_fr, g_zh) THEN 'en'
        |       WHEN g_de >= greatest(g_en, g_es, g_fr, g_zh) THEN 'de'
        |       WHEN g_es >= greatest(g_en, g_de, g_fr, g_zh) THEN 'es'
        |       WHEN g_fr >= greatest(g_en, g_de, g_es, g_zh) THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang,
        |  greatest(g_en, g_de, g_es, g_fr, g_zh) AS score
        |FROM s ORDER BY doc_id""".stripMargin,


    "x9_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |              (a, b) -> (a * 31 + b) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,


    "x10_token_topn" ->
      """SELECT tok AS token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin,


    "x96_distinct_ngrams" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
        |d1 AS (SELECT source, 1::BIGINT AS n, count(DISTINCT tok)::BIGINT AS n_distinct
        |       FROM (SELECT source, unnest(ts) AS tok FROM toks) GROUP BY source),
        |d2 AS (SELECT source, 2::BIGINT AS n, count(DISTINCT g)::BIGINT AS n_distinct
        |       FROM (SELECT source, ts[i] || ' ' || ts[i+1] AS g
        |             FROM toks, unnest(range(1, len(ts))) AS t(i)) GROUP BY source),
        |d3 AS (SELECT source, 3::BIGINT AS n, count(DISTINCT g)::BIGINT AS n_distinct
        |       FROM (SELECT source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |             FROM toks, unnest(range(1, len(ts) - 1)) AS t(i)) GROUP BY source),
        |tot AS (SELECT source, g.n::BIGINT AS n,
        |               sum(greatest(len(ts) - g.n + 1, 0))::BIGINT AS n_total
        |        FROM toks, (VALUES (1), (2), (3)) AS g(n) GROUP BY 1, 2),
        |d AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
        |SELECT t.source, t.n, t.n_total,
        |       coalesce(d.n_distinct, 0)::BIGINT AS n_distinct,
        |       CASE WHEN t.n_total = 0 THEN 0.0
        |            ELSE coalesce(d.n_distinct, 0)::DOUBLE / t.n_total END AS distinct_frac
        |FROM tot t LEFT JOIN d ON d.source = t.source AND d.n = t.n
        |ORDER BY t.source, t.n""".stripMargin,


    "x34_normalize_text" ->
      """WITH m AS (SELECT doc_id, ' ' || upper(replace(text, ' ', '  ')) || '  ' AS text
        |           FROM documents),
        |n AS (SELECT doc_id, text, trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS norm
        |      FROM m)
        |SELECT doc_id, md5(norm) AS norm_digest,
        |       (length(text) - length(norm))::BIGINT AS chars_removed
        |FROM n ORDER BY doc_id""".stripMargin,


    "x37_redact_pii" ->
      """WITH m AS (SELECT doc_id,
        |             text || ' contact user' || doc_id::VARCHAR || '@example.com or +1-555-' || doc_id::VARCHAR AS text
        |           FROM documents),
        |e AS (SELECT doc_id, text,
        |        len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::INT AS n_emails,
        |        regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS no_email
        |      FROM m)
        |SELECT doc_id, n_emails,
        |       len(regexp_extract_all(no_email, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]+'))::INT AS n_phones,
        |       md5(regexp_replace(no_email, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]+', '<PHONE>', 'g')) AS redacted_digest
        |FROM e ORDER BY doc_id""".stripMargin,


    "x90_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |v AS (SELECT word, count(*)::BIGINT AS n_word FROM w
        |      WHERE length(word) >= 2 GROUP BY 1),
        |p AS (SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym, n_word
        |      FROM v, unnest(range(1, length(word))) AS r(i))
        |SELECT left_sym, right_sym, sum(n_word)::BIGINT AS n_pairs
        |FROM p GROUP BY 1, 2
        |ORDER BY n_pairs DESC, left_sym, right_sym LIMIT 50""".stripMargin,


    "x41_tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |             (tf.tf * n.n_docs)::DOUBLE / df.df AS score
        |      FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank FROM s)
        |SELECT doc_id, rank, token, tf, df, score FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,


    // deflate_ok is theorem-true for any conforming zlib (envelope law);
    // raw_bytes is the deterministic byte count both engines can compute
    "x62_compression_ratio" ->
      """SELECT doc_id, strlen(text)::BIGINT AS raw_bytes,
        |       CASE WHEN text IS NULL THEN NULL ELSE TRUE END AS deflate_ok
        |FROM documents ORDER BY doc_id""".stripMargin,


    // probe terms are the 10 highest-df tokens of length >= 6; idf is the
    // log-free rational (N-df+0.5)/(df+0.5); every arithmetic step is
    // spelled in the same order as the Spark plan (exactly-rounded IEEE
    // ops are bit-reproducible only when the expression tree matches)
    "x69_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dfr AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |q AS (SELECT token, df FROM dfr WHERE length(token) >= 6
        |      ORDER BY df DESC, token LIMIT 10),
        |dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
        |st AS (SELECT count(*)::BIGINT AS n_docs,
        |              sum(len(string_split(text, ' ')))::BIGINT AS total_toks FROM documents),
        |sc AS (SELECT tf.token, tf.doc_id,
        |         ((n_docs::DOUBLE - df + 0.5) / (df::DOUBLE + 0.5)) *
        |         ((tf::DOUBLE * (1.2 + 1.0)) /
        |          (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 *
        |             (dl::DOUBLE / (total_toks::DOUBLE / n_docs))))) AS score
        |       FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN st),
        |r AS (SELECT token, doc_id, score,
        |        row_number() OVER (PARTITION BY token ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT token, rank, doc_id, score FROM r WHERE rank <= 5
        |ORDER BY token, rank""".stripMargin,


    // pure BIGINT sums (order-insensitive), one IEEE division at the end
    "x70_rarity_score" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dfr AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
        |SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_toks,
        |       sum(tf.tf * (n_docs - df))::BIGINT AS rarity_sum,
        |       sum(tf.tf * (n_docs - df))::DOUBLE / sum(tf.tf) AS mean_rarity
        |FROM tf JOIN dfr USING (token) CROSS JOIN n
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,


    "x113_oov_rate" ->
      s"""WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
         |tc AS (SELECT source, token, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2),
         |vocab AS (SELECT token FROM (SELECT token, sum(n) AS tot FROM tc GROUP BY 1
         |                             ORDER BY tot DESC, token LIMIT $oovVocabSize)),
         |rates AS (SELECT source, sum(n)::BIGINT AS n_tokens,
         |                 sum(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE n END)::BIGINT AS n_oov
         |          FROM tc GROUP BY 1)
         |SELECT s.source, coalesce(r.n_tokens, 0)::BIGINT AS n_tokens,
         |       coalesce(r.n_oov, 0)::BIGINT AS n_oov,
         |       CASE WHEN coalesce(r.n_tokens, 0) = 0 THEN NULL
         |            ELSE coalesce(r.n_oov, 0)::DOUBLE / r.n_tokens END AS oov_rate
         |FROM (SELECT DISTINCT source FROM documents) s
         |LEFT JOIN rates r ON r.source = s.source
         |ORDER BY s.source""".stripMargin,


    // the NAIVE per-token rank window — the law the Spark side's
    // count-of-counts contraction must reproduce exactly
    "x119_vocab_coverage" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |cnt AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY 1),
         |tot AS (SELECT sum(c)::BIGINT AS total FROM cnt),
         |r AS (SELECT row_number() OVER (ORDER BY c DESC, token)::BIGINT AS rnk,
         |             sum(c) OVER (ORDER BY c DESC, token ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |      FROM cnt),
         |sel AS (SELECT pct, min(rnk)::BIGINT AS vocab_rank
         |        FROM r CROSS JOIN tot
         |             CROSS JOIN (SELECT unnest([${coveragePcts.mkString(", ")}]) AS pct)
         |        WHERE 100 * cum >= pct * total GROUP BY pct)
         |SELECT sel.pct, sel.vocab_rank, r.cum AS covered_mass, tot.total AS total_mass,
         |       round(r.cum::DOUBLE / tot.total, 4) AS coverage4
         |FROM sel JOIN r ON r.rnk = sel.vocab_rank CROSS JOIN tot
         |ORDER BY sel.pct""".stripMargin,


    "x120_zipf_profile" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
         |cnt AS (SELECT lang, token, count(*)::BIGINT AS freq FROM toks GROUP BY 1, 2),
         |tot AS (SELECT lang, sum(freq)::BIGINT AS lang_mass FROM cnt GROUP BY 1),
         |r AS (SELECT lang, token, freq,
         |             row_number() OVER (PARTITION BY lang ORDER BY freq DESC, token)::BIGINT AS rank
         |      FROM cnt)
         |SELECT r.lang, rank, token, freq, rank * freq AS zipf_product,
         |       round(freq::DOUBLE / lang_mass, 4) AS share4
         |FROM r JOIN tot ON tot.lang = r.lang
         |WHERE rank IN (${(0 to zipfMaxRankLog2).map(1L << _).mkString(", ")})
         |ORDER BY r.lang, rank""".stripMargin,


    // deliberately the NAIVE per-token ascending-rank spelling — the
    // differential proof of the Spark side's count-of-counts
    // contraction (x119's convention); rank ties broken by token are
    // contribution-invariant within a frequency class
    "x149_token_gini" ->
      """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
        |tc AS (SELECT lang, t, count(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2),
        |rk AS (SELECT lang, cnt,
        |              row_number() OVER (PARTITION BY lang ORDER BY cnt, t) AS i,
        |              count(*) OVER (PARTITION BY lang) AS n,
        |              sum(cnt) OVER (PARTITION BY lang) AS tot
        |       FROM tc)
        |SELECT lang, max(n)::BIGINT AS n_types, max(tot)::BIGINT AS n_tokens,
        |       sum((2 * i - n - 1) * cnt)::BIGINT AS gini_num,
        |       CASE WHEN max(n) = 0 OR max(tot) = 0 THEN NULL
        |            ELSE round(sum((2 * i - n - 1) * cnt)::DOUBLE / (max(n) * max(tot)), 4) END AS gini4
        |FROM rk GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
