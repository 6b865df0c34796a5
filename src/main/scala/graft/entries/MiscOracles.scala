package graft.entries

/** Oracle SQL for the remaining modules (Payload, Multimodal, Packing, Linkage, Graph, Skew, SpaceSaving) — split out of SparkEntry at r15 (one file
  * for 182 keys hit the same maintainability wall the Curation module
  * did). Entry text is UNCHANGED from SparkEntry; the exactness ground
  * rules live in [[graft.SparkEntry]]'s scaladoc and
  * [[OracleCtes]] holds the shared CTE fragments/constants.
  */
trait MiscOracles {
  import OracleCtes._

  protected def miscOracles: Map[String, String] = Map(

    "x11_json_decode" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id",


    "x12_event_windows" ->
      """SELECT (floor(epoch(ts) / 600) * 600)::BIGINT AS window_start_s, event_type,
        |       count(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "x13_media_features" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len, sha256(text) AS sha256,
        |       16 * (1 + ascii(substr(text, 1, 1)) % 64) AS width,
        |       16 * (1 + ascii(substr(text, 2, 1)) % 64) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,


    "x100_semantic_packing" ->
      (kmeansAssignCtes(k = 8, iters = 2) +
        """,
          |pt AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS tok FROM documents),
          |pj AS (SELECT af.cid AS cell, pt.doc_id, pt.tok FROM pt JOIN af ON af.vec_id = pt.doc_id),
          |pw AS (SELECT cell, doc_id, tok,
          |        sum(tok) OVER (PARTITION BY cell ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          |      FROM pj)
          |SELECT cell, ((cum - tok) // 512)::BIGINT AS bin_id,
          |       count(*) AS n_docs, sum(tok)::BIGINT AS bin_tokens
          |FROM pw GROUP BY 1, 2 ORDER BY cell, bin_id""".stripMargin),


    "x102_schema_drift" ->
      """WITH ev AS (SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 AND event_id % 7 = 0
        |         THEN '{"k": 1, "legacy": true}'
        |       WHEN event_id % 2 = 1 AND event_id % 3 = 0
        |         THEN '{"v": 1}'
        |       ELSE props END AS props
        |  FROM events),
        |k AS (SELECT event_id % 2 AS snap, unnest(json_keys(props)) AS key FROM ev),
        |c AS (SELECT key,
        |        sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END)::BIGINT AS n_old,
        |        sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END)::BIGINT AS n_new
        |      FROM k GROUP BY 1),
        |t AS (SELECT sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS t_old,
        |             sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS t_new
        |      FROM ev)
        |SELECT key, n_old, n_new,
        |       CASE WHEN n_old = 0 THEN 'new'
        |            WHEN n_new = 0 THEN 'gone'
        |            ELSE 'stable' END AS status,
        |       n_old::DOUBLE / t_old AS rate_old,
        |       n_new::DOUBLE / t_new AS rate_new,
        |       (n_new::DOUBLE / t_new) - (n_old::DOUBLE / t_old) AS rate_shift
        |FROM c CROSS JOIN t ORDER BY key""".stripMargin,


    "x38_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |c AS (SELECT doc_id, len(ts)::BIGINT AS n, ts, unnest(range(1, len(ts) + 1, 10)) AS chunk_start
        |      FROM t)
        |SELECT doc_id, chunk_start::BIGINT AS chunk_start,
        |       least(20, n - chunk_start + 1)::BIGINT AS n_chunk_tokens,
        |       md5(array_to_string(list_slice(ts, chunk_start, chunk_start + 19), ' ')) AS chunk_digest
        |FROM c ORDER BY doc_id, chunk_start""".stripMargin,


    "x39_pack_sequences" ->
      """WITH t AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS tok FROM documents),
        |w AS (SELECT lang, doc_id, tok,
        |        sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM t)
        |SELECT lang, ((cum - tok) // 512)::BIGINT AS bin_id,
        |       count(*) AS n_docs, sum(tok)::BIGINT AS bin_tokens
        |FROM w GROUP BY 1, 2 ORDER BY lang, bin_id""".stripMargin,


    "x89_budget_sweep" ->
      """WITH t AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS tok FROM documents),
        |w AS (SELECT lang, doc_id, tok,
        |        sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
        |      FROM t),
        |s AS (SELECT budget, lang, tok, cum
        |      FROM w CROSS JOIN (SELECT unnest([32, 64, 128, 256])::BIGINT AS budget)),
        |dagg AS (SELECT budget, count(*)::BIGINT AS n_docs,
        |        sum(greatest(budget - tok, 0))::BIGINT AS pad_waste,
        |        sum(greatest(tok - budget, 0))::BIGINT AS trunc_tokens,
        |        sum(least(tok, budget))::BIGINT AS used,
        |        sum(CASE WHEN (cum - tok) // budget != (cum - 1) // budget
        |                 THEN 1 ELSE 0 END)::BIGINT AS n_split_docs
        |      FROM s GROUP BY 1),
        |lagg AS (SELECT budget, lang, sum(tok)::BIGINT AS tot FROM s GROUP BY 1, 2),
        |pagg AS (SELECT budget,
        |        sum((tot + budget - 1) // budget)::BIGINT AS n_bins,
        |        sum(((tot + budget - 1) // budget) * budget - tot)::BIGINT AS tail_waste,
        |        sum(tot)::BIGINT AS tot_all
        |      FROM lagg GROUP BY 1)
        |SELECT budget, n_docs, pad_waste, trunc_tokens,
        |       used::DOUBLE / (n_docs * budget)::DOUBLE AS util_1doc,
        |       n_split_docs, n_bins, tail_waste,
        |       tot_all::DOUBLE / (n_bins * budget)::DOUBLE AS util_packed
        |FROM dagg JOIN pagg USING (budget) ORDER BY budget""".stripMargin,


    // round-tripped columns must equal the source; avro_len is the Avro
    // binary-format arithmetic (zigzag varint + length-prefixed UTF-8 +
    // 8 IEEE bytes) in exact integer CASE rungs — a pass pins the wire
    // format, not just decode∘encode = id
    // varint rungs are spelled as ranges of event_id itself (zigzag(id)
    // < 2^7k iff id in [-2^(7k-1), 2^(7k-1)-1]) — no 2*id product, so
    // no BIGINT overflow for ids near 2^63, and the ladder reaches the
    // full 10-byte unsigned-varint range
    "x63_avro_roundtrip" ->
      """WITH z AS (SELECT event_id, event_type, value,
        |  strlen(event_type)::BIGINT AS tlen FROM events)
        |SELECT event_id, event_type AS type_rt, value AS value_rt,
        |  (CASE WHEN event_id BETWEEN -64 AND 63 THEN 1
        |        WHEN event_id BETWEEN -8192 AND 8191 THEN 2
        |        WHEN event_id BETWEEN -1048576 AND 1048575 THEN 3
        |        WHEN event_id BETWEEN -134217728 AND 134217727 THEN 4
        |        WHEN event_id BETWEEN -17179869184 AND 17179869183 THEN 5
        |        WHEN event_id BETWEEN -2199023255552 AND 2199023255551 THEN 6
        |        WHEN event_id BETWEEN -281474976710656 AND 281474976710655 THEN 7
        |        WHEN event_id BETWEEN -36028797018963968 AND 36028797018963967 THEN 8
        |        WHEN event_id BETWEEN -4611686018427387904 AND 4611686018427387903 THEN 9
        |        ELSE 10 END
        |   + CASE WHEN tlen < 64 THEN 1 WHEN tlen < 8192 THEN 2
        |          WHEN tlen < 1048576 THEN 3 ELSE 4 END
        |   + tlen + 8)::BIGINT AS avro_len
        |FROM z ORDER BY event_id""".stripMargin,


    // event_frac is one IEEE division; skew_ratio is one double product
    // then one division — identical op order in both engines
    "x65_hot_keys" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id),
        |t AS (SELECT sum(n_events)::BIGINT AS total_events, count(*)::BIGINT AS n_keys FROM c)
        |SELECT c.user_id, c.n_events,
        |       c.n_events::DOUBLE / t.total_events AS event_frac,
        |       c.n_events::DOUBLE * t.n_keys / t.total_events AS skew_ratio
        |FROM c CROSS JOIN t
        |ORDER BY c.n_events DESC, c.user_id LIMIT 15""".stripMargin,


    // x65's exact relation + the CMS law verdicts (x59's audit contract:
    // the oracle recomputes the deterministic columns and asserts the
    // verdicts TRUE; the sketch estimate never leaves the plan)
    "x73_freq_sketch_audit" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id),
        |t AS (SELECT sum(n_events)::BIGINT AS total_events, count(*)::BIGINT AS n_keys FROM c)
        |SELECT c.user_id, c.n_events,
        |       c.n_events::DOUBLE / t.total_events AS event_frac,
        |       c.n_events::DOUBLE * t.n_keys / t.total_events AS skew_ratio,
        |       TRUE AS ok_never_under, TRUE AS ok_within_eps
        |FROM c CROSS JOIN t
        |ORDER BY c.n_events DESC, c.user_id LIMIT 15""".stripMargin,


    // x78: the law verdicts are theorem-true (see Skew.heavyHitterAudit);
    // the deterministic columns are exactly the hot-key relation
    "x78_heavy_hitter_audit" ->
      """WITH c AS (SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id),
        |t AS (SELECT sum(n_events)::BIGINT AS total_events, count(*)::BIGINT AS n_keys FROM c)
        |SELECT c.user_id, c.n_events,
        |       c.n_events::DOUBLE / t.total_events AS event_frac,
        |       c.n_events::DOUBLE * t.n_keys / t.total_events AS skew_ratio,
        |       TRUE AS ok_never_under, TRUE AS ok_within_err
        |FROM c CROSS JOIN t
        |ORDER BY c.n_events DESC, c.user_id LIMIT 15""".stripMargin,


    // per doc only the FIRST bin segment can bleed (later segments start
    // at in-bin position 0); bleed = min(len1, W-1) iff s_b > 0
    "x117_pack_bleed" ->
      s"""WITH t AS (SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS tok FROM documents),
         |w AS (SELECT lang, doc_id, tok,
         |        sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |      FROM t),
         |g AS (SELECT lang, tok, (cum - tok) % $bleedBudget AS sb,
         |             least(tok, $bleedBudget - ((cum - tok) % $bleedBudget)) AS len1
         |      FROM w),
         |s AS (SELECT lang, tok,
         |             CASE WHEN sb = 0 THEN 0 ELSE least(len1, win - 1) END AS bleed, win
         |      FROM g CROSS JOIN (SELECT unnest([${bleedWindows.mkString(", ")}]::BIGINT[]) AS win))
         |SELECT win, lang, count(*)::BIGINT AS n_docs,
         |       sum(CASE WHEN bleed > 0 THEN 1 ELSE 0 END)::BIGINT AS n_bleed_docs,
         |       sum(bleed)::BIGINT AS bleed_positions,
         |       sum(tok)::BIGINT AS n_tokens,
         |       CASE WHEN sum(tok) = 0 THEN NULL
         |            ELSE sum(bleed)::DOUBLE / sum(tok) END AS bleed_frac
         |FROM s GROUP BY 1, 2 ORDER BY win, lang""".stripMargin,


    // all-pairs inside each (brand, size) block — the exact spelling of
    // the blocked candidate space; best match by (sim4 desc, cand asc),
    // the struct-max order; singleton blocks keep their record with NULLs
    "x118_entity_resolution" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_size, p_name,
        |                  length(p_name)::BIGINT AS len FROM part),
        |scored AS (SELECT a.p_partkey, b.p_partkey AS cand_key,
        |                  levenshtein(a.p_name, b.p_name)::BIGINT AS dist,
        |                  round(CASE WHEN greatest(a.len, b.len) = 0 THEN 1.0
        |                             ELSE 1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE / greatest(a.len, b.len)
        |                        END, 4) AS sim4
        |           FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |                            AND a.p_partkey <> b.p_partkey),
        |r AS (SELECT p_partkey, cand_key, dist, sim4,
        |             row_number() OVER (PARTITION BY p_partkey ORDER BY sim4 DESC, cand_key) AS rn,
        |             count(*) OVER (PARTITION BY p_partkey)::BIGINT + 1 AS n_block
        |      FROM scored)
        |SELECT p.p_partkey, p.p_brand AS block_brand, p.p_size AS block_size,
        |       coalesce(r.n_block, 1)::BIGINT AS n_block,
        |       r.cand_key AS match_key, r.dist, r.sim4
        |FROM p LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON r.p_partkey = p.p_partkey
        |ORDER BY p.p_partkey""".stripMargin,


    // x118's blocked scoring halved to undirected edges at the rounded
    // sim4 threshold, the x22/x129 recursive-reach components, then the
    // x129 purity shape over the attributes the block key does NOT pin
    "x133_entity_clusters" ->
      s"""WITH RECURSIVE p AS (SELECT p_partkey, p_brand, p_size, p_name,
         |                  length(p_name)::BIGINT AS len FROM part),
         |sc AS (SELECT a.p_partkey AS d1, b.p_partkey AS d2
         |       FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         |                        AND a.p_partkey < b.p_partkey
         |       WHERE round(CASE WHEN greatest(a.len, b.len) = 0 THEN 1.0
         |                        ELSE 1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE / greatest(a.len, b.len)
         |                   END, 4) >= $entityClusterSim),
         |edges AS (SELECT d1 AS u, d2 AS v FROM sc UNION ALL SELECT d2, d1 FROM sc),
         |reach(u, v) AS (SELECT u, v FROM edges
         |                UNION
         |                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS p_partkey, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |m AS (SELECT comp.p_partkey, cluster, p_type, p_retailprice
         |      FROM comp JOIN part ON part.p_partkey = comp.p_partkey),
         |bt AS (SELECT cluster, p_type, count(*)::BIGINT AS n_t FROM m GROUP BY 1, 2),
         |mj AS (SELECT cluster, p_type AS majority_type, n_t,
         |              row_number() OVER (PARTITION BY cluster ORDER BY n_t DESC, p_type DESC) AS rn
         |       FROM bt),
         |agg AS (SELECT cluster, count(*)::BIGINT AS n_members,
         |               count(DISTINCT p_type)::BIGINT AS n_types,
         |               round(max(p_retailprice) - min(p_retailprice), 2) AS price_span2
         |        FROM m GROUP BY 1)
         |SELECT agg.cluster, n_members, n_types, majority_type,
         |       round(n_t::DOUBLE / n_members, 4) AS majority_share4,
         |       n_types > 1 AS cross_type, price_span2
         |FROM agg JOIN mj ON mj.cluster = agg.cluster AND rn = 1
         |ORDER BY agg.cluster""".stripMargin,


    // frame bytes as lowercase hex so the hash pins the SAMPLED BYTES
    // (offset, stride, truncation), not just the frame count; only full
    // frames are emitted (len // frameSize), first frameMax of stride
    "x177_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
         |                  octet_length(encode(text))::BIGINT AS len FROM documents),
         |f AS (SELECT doc_id, hx, unnest(list_slice(range(0, len // $frameSize, $frameStride), 1, $frameMax)) AS i FROM m)
         |SELECT doc_id, i::BIGINT AS frame_idx, (i * $frameSize)::BIGINT AS offset,
         |       lower(substr(hx, (i * ${frameSize * 2} + 1)::INT, ${frameSize * 2})) AS frame_hex
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,


    // x13's decode spelling (width/height from the first two code
    // points) + the stub downscale arithmetic: ratio = min(1, target
    // area / decoded area), out = max(1, floor(len · ratio)) — the
    // exact truncation rule of Multimodal.resize, aggregated per type.
    // Empty payloads emit 0 bytes (take(1) of an empty array is empty —
    // the operator's PHYSICAL output, which the census measures), so
    // the len = 0 rung bypasses the 1-byte floor
    "x178_resize_census" ->
      s"""WITH m AS (SELECT doc_id,
         |  octet_length(encode(text))::BIGINT AS len,
         |  16 * (1 + ascii(substr(text, 1, 1)) % 64) AS w,
         |  16 * (1 + ascii(substr(text, 2, 1)) % 64) AS h,
         |  CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
         |                  ELSE 'video/mp4' END AS media_type
         |  FROM documents),
         |r AS (SELECT doc_id, media_type, len AS bytes_in,
         |             CASE WHEN len = 0 THEN 0
         |                  ELSE greatest(1, floor(len * least(1.0, ${resizeTargetW * resizeTargetH}.0 / (w * h)))::BIGINT)
         |             END AS bytes_out
         |      FROM m)
         |SELECT media_type, count(*)::BIGINT AS n_files,
         |       sum(bytes_in)::BIGINT AS bytes_in, sum(bytes_out)::BIGINT AS bytes_out,
         |       sum(CASE WHEN bytes_out < bytes_in THEN 1 ELSE 0 END)::BIGINT AS n_shrunk,
         |       CASE WHEN sum(bytes_in) = 0 THEN NULL
         |            ELSE round(1 - sum(bytes_out)::DOUBLE / sum(bytes_in), 4) END AS saved_frac4
         |FROM r GROUP BY media_type ORDER BY media_type""".stripMargin,


    // x13's payload binding + the deterministic type assignment; the
    // census is x1's digest fold per MIME type
    "x151_media_dedup" ->
      """WITH m AS (SELECT doc_id, sha256(text) AS dg,
        |                  octet_length(encode(text))::BIGINT AS len,
        |                  CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |                                  WHEN 1 THEN 'audio/wav'
        |                                  ELSE 'video/mp4' END AS media_type
        |           FROM documents),
        |g AS (SELECT media_type, dg, count(*)::BIGINT AS c, min(len) AS len
        |      FROM m GROUP BY 1, 2)
        |SELECT media_type, sum(c)::BIGINT AS n_files, count(*)::BIGINT AS n_distinct,
        |       sum(c - 1)::BIGINT AS n_dup_files, sum(c * len)::BIGINT AS bytes_total,
        |       sum((c - 1) * len)::BIGINT AS bytes_dup,
        |       CASE WHEN sum(c * len) = 0 THEN NULL
        |            ELSE round(sum((c - 1) * len)::DOUBLE / sum(c * len), 4) END AS dup_frac4
        |FROM g GROUP BY media_type ORDER BY media_type""".stripMargin,


    // the 60-bit dHash recomputed bit-for-bit from the payload hex
    // (sample grid pos_i = min((i·L)//61, L−1), bit i = s_i > s_{i+1}),
    // then x16's banding shape (5 × 12-bit bands, exact to hamming 4 by
    // pigeonhole) and the exact-hamming re-check; byte_equal via the
    // payload digest so the perceptual-only class is visible. The
    // variant CTE mirrors mediaWithReencodedVariants (leading-8-char
    // reversal at doc_id % 7 = 0, re-keyed +1000000)
    "x185_phash_near_dup" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents
        |               UNION ALL
        |               SELECT doc_id + 1000000, concat(reverse(substr(text, 1, 8)), substr(text, 9))
        |               FROM documents WHERE doc_id % 7 = 0),
        |m AS (SELECT doc_id, md5(text) AS pdigest, hex(encode(text)) AS hx,
        |             octet_length(encode(text))::BIGINT AS L
        |      FROM docs2),
        |h AS (SELECT doc_id, pdigest,
        |        CASE WHEN L = 0 THEN 0::BIGINT ELSE
        |          list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 60), i ->
        |            CASE WHEN ('0x' || substr(hx, (2 * least((i * L) // 61, L - 1) + 1)::INT, 2))::BIGINT
        |                    > ('0x' || substr(hx, (2 * least(((i + 1) * L) // 61, L - 1) + 1)::INT, 2))::BIGINT
        |                 THEN (1::BIGINT << i::INT) ELSE 0::BIGINT END)), (a, b) -> a + b)
        |        END AS phash
        |      FROM m),
        |banded AS (SELECT doc_id, phash, b, (phash >> (b * 12)::INT) & 4095 AS bv
        |           FROM h, unnest(range(0, 5)) AS t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |         FROM banded a JOIN banded b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT c.d1, c.d2,
        |       bit_count(xor(h1.phash::BIT, h2.phash::BIT))::BIGINT AS hamming,
        |       (h1.pdigest = h2.pdigest) AS byte_equal
        |FROM cand c JOIN h h1 ON h1.doc_id = c.d1 JOIN h h2 ON h2.doc_id = c.d2
        |WHERE bit_count(xor(h1.phash::BIT, h2.phash::BIT)) <= 4
        |ORDER BY d1, d2""".stripMargin,


    // the wire-length law computed ARITHMETICALLY: 29 scaffolding chars
    // ({"event_id":  ,"event_type":"  "}) + the id's digits + the type
    // — certifying Spark's to_json byte-for-byte; an escaped character
    // in a future corpus breaks this row loudly, by design
    "x153_json_envelope" ->
      """SELECT event_id, event_id AS id_rt, event_type AS type_rt,
        |       (29 + strlen(event_id::VARCHAR) + strlen(event_type))::BIGINT AS line_len
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
