package graft.entries

/** Shared DuckDB CTE fragments and oracle parameters — the constants
  * both faces consume: the oracle traits interpolate the SQL fragments
  * and [[graft.SparkEntry]]'s bindings pass the SAME parameter values
  * to the Spark operators, so neither side can drift alone. Moved out
  * of SparkEntry at r15 with the per-family oracle split.
  */
private[graft] object OracleCtes {
  /** Shared DuckDB CTE fragments (kept as constants so the per-query SQL
    * stays readable — each oracle string is standalone).
    */
  val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |       FROM toks, unnest(range(1, len(ts)-1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |jac AS (SELECT d1, d2, inter, s1.n AS n1, s2.n AS n2,
      |               inter::DOUBLE / (s1.n + s2.n - inter) AS jaccard
      |        FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2)""".stripMargin

  val dotCte = // identical left-fold order as Similarity.dot
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> qe[i] * ce[i])), (a, b) -> a + b)"

  /** x103's k and query-sampling modulus — the SAME constants feed the
    * Spark call in `queries` and the interpolated oracle SQL, so a
    * default change on either side cannot silently break agreement.
    */
  val agreementK = 5
  val agreementQueryMod = 10

  /** x111–x114 audit constants — the SAME values feed the Spark calls
    * and the interpolated oracle SQL (the x103 no-drift contract).
    */
  val editMinSim = 0.5
  val contamTau = 0.35
  val contamBenchMod = 20
  val oovVocabSize = 100
  val outlierPctDen = 20

  /** x116/x117 constants — same no-drift contract. */
  val containTau = 0.9
  val bleedBudget = 512L
  val bleedWindows = Seq(4L, 16L, 64L)

  /** x119/x120/x124 constants — same no-drift contract. */
  val coveragePcts = Seq(50, 90, 95, 99)
  val zipfMaxRankLog2 = 7
  val kanonK = 25L

  /** x126/x128/x130 CDC geometry — same no-drift contract. */
  val cdcK = 4
  val cdcDivisor = 16L

  /** x125 MinHash geometry — same no-drift contract. The oracle's band
    * CTE spells its per-band minima as four positional columns, so the
    * rows-per-band ratio is structurally pinned to 4: changing either
    * constant without rewriting that CTE fails here, loudly, instead of
    * silently desyncing the engines.
    */
  val mh125Hashes = 16
  val mh125Bands = 4
  require(mh125Hashes / mh125Bands == 4 && mh125Hashes % mh125Bands == 0,
    s"x125 oracle CTE is spelled for 4 rows per band " +
      s"(numHashes=$mh125Hashes, bands=$mh125Bands)")

  /** x131 swept thresholds (percent) — same no-drift contract. */
  val sweepPcts = Seq(60, 70, 80, 90)

  /** x133 cluster-edge similarity threshold (applied to the rounded
    * sim4 BOTH engines hash-match on, so the predicate classifies every
    * pair identically) — same no-drift contract.
    */
  val entityClusterSim = 0.7

  /** x134 PageRank steps and rank scale — the oracle UNROLLS one CTE
    * block per step (the x35 Lloyd convention), so `prIters` is
    * structurally pinned to the generated SQL; `prScale` rides into
    * both engines' integer arithmetic verbatim.
    */
  val prIters = 5
  val prScale = 1000000000L

  /** x154 truss level and peel-round budget — the oracle UNROLLS one
    * peel block per round (the x134 convention), so `trussRounds` is
    * structurally pinned to the generated SQL; the Spark loop THROWS
    * past `trussRounds` removal rounds, so a green row proves the
    * fixpoint was reached and the oracle's extra identity blocks are
    * exactly that.
    */
  val trussK = 4
  val trussRounds = 6

  /** x155 tight threshold (the delta is hamming in (incTight, 4]) —
    * same no-drift contract.
    */
  val incTight = 2

  /** x156 core level and peel-round budget — the x154 unroll/throw
    * contract, at node granularity. The budget is wider than the
    * truss's because node-peel cascades run deeper (measured: 5 removal
    * rounds at sf0.1, 9 at the 10× slice — geometric shedding with a
    * shallow tail); identity blocks past the fixpoint cost the oracle
    * nothing at the gate scale.
    */
  val coreK = 3
  val coreRounds = 12

  /** x157 BFS expansion budget — the oracle unrolls one frontier block
    * per hop (the x154 convention); the Spark loop throws if any node
    * is still unreached past it.
    */
  val bfsHops = 24

  /** x158 MMR geometry — the oracle unrolls one greedy block per pick
    * (the x35 Lloyd convention) and spells λ as the same integer
    * percent, so the score arithmetic is the identical IEEE expression
    * on both faces. Same no-drift contract.
    */
  val mmrQueryMod = 50
  val mmrM = 8
  val mmrK = 4
  val mmrLambdaPct = 70

  /** x161 synchronous label-propagation round count — part of the
    * operator contract (the oracle unrolls exactly this many vote
    * blocks). Same no-drift contract.
    */
  val lpIters = 4

  /** x135 audit lags in hours (short-range / daily / weekly) — same
    * no-drift contract.
    */
  val periodicityLags = Seq(1, 24, 168)

  /** x139 takedown-sample modulus — same no-drift contract. */
  val blastDelMod = 50L

  /** x132 repair geometry (x108's k and benchmark rule) — same
    * no-drift contract.
    */
  val repairK = 5
  val repairBenchMod = 20
  val repairMinRun = 2

  /** Shared CDC chunk CTE (x126/x128/x130): the relational spelling of
    * the row-local chunker — positioned k-gram hashes (x53's md5
    * top-60-bit), boundary AFTER token q where hash(q) % divisor = 0,
    * token→chunk via the cumulative-flag trick. Ends in
    * `ch(doc_id, source, cid, n_tokens, digest)`.
    */
  lazy val cdcChunksCte =
    s"""t AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
       |w AS (SELECT doc_id, i::BIGINT AS p,
       |             (('0x' || substr(md5(array_to_string(list_slice(ts, i, i + ${cdcK - 1}), ' ')), 1, 15))::UBIGINT)::BIGINT AS h
       |      FROM t, unnest(range(1, len(ts) - ${cdcK - 2})) AS r(i)
       |      WHERE len(ts) >= $cdcK),
       |b AS (SELECT doc_id, p FROM w WHERE h % $cdcDivisor = 0),
       |tok AS (SELECT doc_id, source, tp::BIGINT AS tp, ts[tp] AS token
       |        FROM t, unnest(range(1, len(ts) + 1)) AS r(tp)),
       |f AS (SELECT tok.doc_id, source, tp, token,
       |             CASE WHEN b.p IS NULL THEN 0 ELSE 1 END AS flag
       |      FROM tok LEFT JOIN b ON b.doc_id = tok.doc_id AND b.p = tok.tp - 1),
       |c AS (SELECT doc_id, source, tp, token,
       |             sum(flag) OVER (PARTITION BY doc_id ORDER BY tp ROWS UNBOUNDED PRECEDING) AS cid
       |      FROM f),
       |ch AS (SELECT doc_id, source, cid, count(*)::BIGINT AS n_tokens,
       |              md5(string_agg(token, ' ' ORDER BY tp)) AS digest
       |       FROM c GROUP BY 1, 2, 3)""".stripMargin

  /** PQ geometry (x104/x105): the SAME constants feed the Spark calls
    * and the interpolated oracle CTEs (the x103 no-drift contract).
    * dim 64 = pqM subspaces × pqDsub dims; pqKsub codes per subspace
    * seeded from vec_id < pqKsub.
    */
  val pqM = 8
  val pqKsub = 16
  val pqDsub = 8
  val pqK = 3
  val pqQueryMod = 10
  val pqIters = 2

  /** x176 IVF-PQ composite geometry: the coarse quantizer's cell count
    * and probe width (x58's multiprobe values); the PQ side rides the
    * x104/x105 constants above. Same no-drift contract.
    */
  val ivfPqNCent = 16
  val ivfPqNprobe = 2

  /** x186 exact-refine shortlist width (ADC candidates per query fed to
    * the float re-rank) — same no-drift contract.
    */
  val refineShortlist = 32

  /** x187 refined-composite tuning-sweep grid: the (nprobe × shortlist)
    * operating points swept at the FIXED x176 geometry — the knobs that
    * actually clear the recall budget (x182's finding: no pure-ADC
    * geometry reaches 0.9; the refine tail does, and its cost rides
    * nprobe and shortlist, not m/ksub). The grid includes the x186
    * point (ivfPqNprobe, refineShortlist), which the spec pins
    * bit-equal to x186's own hit mass. Same no-drift contract.
    */
  val refinedSweepNprobes = Seq(2, 4, 8)
  val refinedSweepShortlists = Seq(8, 16, 32)

  /** x190/x191 operating-point geometry, grid, and recall budget: the
    * chooser runs at the PRODUCTION geometry (m 16, ksub 128 — the r17
    * BASELINE table's), not the x104/x187 gate geometry, because that
    * is where the 0.9 budget is attainable at sf0.1 (gate-geometry
    * coding loss is too deep for any shortlist to recover: nprobe 12 ×
    * shortlist 64 reads 0.56 there vs 0.9217 at production), and the
    * grid extends to nprobe 12 for the same reason (nprobe 8 saturates
    * at 0.79 — an unprobed cell is unrecoverable). The stamped point
    * the engine serves at sf0.1 is therefore exactly the one the r17
    * note hand-picked. Same no-drift contract: these values feed the
    * Spark tune call AND the generated oracle blocks, and the selection
    * rule (cheapest clearing the budget, max-recall fallback,
    * exact-cost tie-breaks) is spelled identically in
    * `Similarity.selectOperatingPoint` and the x190/x191 oracle SQL.
    */
  val oppBudget = 0.9
  val oppM = 16
  val oppKsub = 128
  val oppNprobes = Seq(2, 4, 8, 12)
  val oppShortlists = Seq(16, 32, 64)

  /** x182 IVF-PQ tuning-sweep grid: the geometry cells (nCentroids, m,
    * ksub) and the probe widths every cell is swept over — the SAME
    * values feed the Spark call and the generated oracle blocks (the
    * x103 no-drift contract; the oracle unrolls one PQ chain per cell
    * and one ranked block per (cell, nprobe), the x170 convention).
    * All cells share nCentroids = ivfPqNCent so the coarse assignment
    * (and its oracle CTEs) are built once; the grid varies the CODING
    * knobs (m, ksub) the x181-vs-x105 decomposition showed dominate at
    * the gate geometry, and nprobe varies the coarse-loss knob.
    */
  val sweepGeoms = Seq((ivfPqNCent, 4, 16), (ivfPqNCent, 8, 16), (ivfPqNCent, 8, 32))
  val sweepNprobes = Seq(1, 2, 4)

  /** x177 frame-sampling geometry and x178 resize target — the SAME
    * values feed the Spark calls and the interpolated oracle SQL.
    */
  val frameSize = 16
  val frameStride = 4
  val frameMax = 8
  val resizeTargetW = 64
  val resizeTargetH = 64

  /** The int8-corpus CTE every PQ chain starts from (shared across
    * geometries in the x182 sweep — it depends on nothing but the
    * corpus).
    */
  val e8Cte =
    "e8 AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 127.0 + 0.5) AS BIGINT)) AS qv FROM embeddings)"

  /** One parameterized PQ oracle CTE chain (assumes [[e8Cte]] precedes):
    * seeded codebooks → `iters` unrolled Lloyd rounds (the x35 unrolling
    * pattern, in exact BIGINT: order-free integer group sums, one IEEE
    * division + floor(x+0.5) per component, empty cells keep their
    * previous entry) → per-subspace exact squared distances → argmin
    * assignment. CTE names carry prefix `p` so multiple geometries
    * coexist in one query (the x182 sweep); the un-prefixed instance at
    * the x104/x105 constants is [[pqCte]], whose final names
    * `vs`/`cbs`/`asg` every existing PQ oracle consumes unchanged.
    */
  def pqChain(m: Int, ksub: Int, iters: Int, p: String, src: String = "e8"): String = {
    require(64 % m == 0, s"pq oracle chain: dim 64 not divisible by m=$m")
    val dsub = 64 / m
    val sq = (v: String) =>
      s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${dsub + 1}), i -> $v[i] * $v[i])), (a, b) -> a + b)"
    val dotl = (a: String, b: String) =>
      s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${dsub + 1}), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    val init =
      s"""${p}sp AS (SELECT unnest(range(0, $m))::INT AS s),
         |${p}cb0 AS (SELECT s, vec_id::INT AS code, list_slice(qv, s*$dsub+1, s*$dsub+$dsub) AS cs
         |        FROM $src CROSS JOIN ${p}sp WHERE vec_id < $ksub),
         |${p}vs AS (SELECT vec_id, s, qs, ${sq("qs")} AS nq
         |       FROM (SELECT vec_id, s, list_slice(qv, s*$dsub+1, s*$dsub+$dsub) AS qs
         |             FROM $src CROSS JOIN ${p}sp) t)""".stripMargin
    val rounds = (1 to iters).map { t =>
      val q = t - 1
      s"""${p}tn$t AS (SELECT s, code, cs, ${sq("cs")} AS nc FROM ${p}cb$q),
         |${p}td$t AS (SELECT v.vec_id, v.s, c.code, v.nq - 2 * ${dotl("v.qs", "c.cs")} + c.nc AS d
         |         FROM ${p}vs v JOIN ${p}tn$t c ON c.s = v.s),
         |${p}ta$t AS (SELECT vec_id, s, code
         |         FROM (SELECT vec_id, s, code, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn FROM ${p}td$t) r
         |         WHERE rn = 1),
         |${p}tm$t AS (SELECT a.s, a.code, t.dim, CAST(floor(sum(v.qs[t.dim])::DOUBLE / count(*) + 0.5) AS BIGINT) AS val
         |         FROM ${p}ta$t a JOIN ${p}vs v ON v.vec_id = a.vec_id AND v.s = a.s, unnest(range(1, ${dsub + 1})) AS t(dim)
         |         GROUP BY 1, 2, 3),
         |${p}cb$t AS (SELECT p.s, p.code, coalesce(m.cs, p.cs) AS cs
         |         FROM ${p}cb$q p LEFT JOIN (SELECT s, code, list(val ORDER BY dim) AS cs FROM ${p}tm$t GROUP BY 1, 2) m
         |           ON m.s = p.s AND m.code = p.code)""".stripMargin
    }
    val fin =
      s"""${p}cbs AS (SELECT s, code, cs, ${sq("cs")} AS nc FROM ${p}cb$iters),
         |${p}pqd AS (SELECT v.vec_id, v.s, c.code,
         |        v.nq - 2 * ${dotl("v.qs", "c.cs")} + c.nc AS d
         |        FROM ${p}vs v JOIN ${p}cbs c ON c.s = v.s),
         |${p}asg AS (SELECT vec_id, s, code, d
         |        FROM (SELECT vec_id, s, code, d, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn FROM ${p}pqd) r
         |        WHERE rn = 1)""".stripMargin
    (Seq(init) ++ rounds :+ fin).mkString(",\n")
  }

  /** Shared PQ oracle CTE chain at the x104/x105 constants — see
    * [[pqChain]]. `vs` carries each vector's subvectors and their norms
    * for reuse by x105's ADC.
    */
  val pqCte = e8Cte + ",\n" + pqChain(pqM, pqKsub, pqIters, "")

  /** Shared IVF-PQ composite CTE chain (x176/x181): the full PQ chain
    * ([[pqCte]]) + x58's coarse cells/probes (renamed ivc/ive/iva — the
    * pq chain owns `asg`) + ADC over the probed candidate set. Ends in
    * `rr(qid, cid, d, rank)` — rank by ascending exact ADC distance,
    * ties to the lowest cid.
    */
  lazy val ivfPqCtes: String =
    s"""$pqCte,
       |ivc AS (SELECT vec_id AS ccid, embedding::DOUBLE[] AS ce FROM embeddings WHERE vec_id < $ivfPqNCent),
       |ive AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |iva AS (SELECT ive.vec_id, ivc.ccid,
       |               row_number() OVER (PARTITION BY ive.vec_id ORDER BY
       |                 list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> ed[i] * ce[i])), (x, y) -> x + y) DESC,
       |                 ivc.ccid) AS rn
       |        FROM ive CROSS JOIN ivc),
       |cells AS (SELECT vec_id, ccid AS cell FROM iva WHERE rn = 1),
       |probes AS (SELECT vec_id, ccid AS cell FROM iva WHERE rn <= $ivfPqNprobe AND vec_id % $pqQueryMod = 0),
       |qq AS (SELECT vec_id AS qid, s, qs, nq FROM vs WHERE vec_id % $pqQueryMod = 0),
       |cand AS (SELECT p.vec_id AS qid, y.vec_id AS cid
       |         FROM probes p JOIN cells y ON y.cell = p.cell AND y.vec_id != p.vec_id),
       |adct AS (SELECT q.qid, cand.cid,
       |         sum(q.nq - 2 * list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${pqDsub + 1}), i -> q.qs[i] * c.cs[i])), (x, y) -> x + y) + c.nc)::BIGINT AS d
       |         FROM cand JOIN qq q ON q.qid = cand.qid
       |              JOIN asg g ON g.vec_id = cand.cid AND g.s = q.s
       |              JOIN cbs c ON c.s = g.s AND c.code = g.code
       |         GROUP BY 1, 2),
       |rr AS (SELECT qid, cid, d, row_number() OVER (PARTITION BY qid ORDER BY d, cid) AS rank FROM adct)""".stripMargin

  /** SimHash fingerprints + banded exact Hamming near-dup pairs (shared by
    * x16 and the x22 cluster oracle; ends in relation `nd_pairs(d1, d2,
    * hamming)`).
    */
  val simhashPairsCte =
    """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tc AS (SELECT doc_id, tok, count(*)::BIGINT AS w FROM toks GROUP BY 1, 2),
      |th AS (SELECT doc_id, w, (('0x' || substr(md5(tok), 1, 15))::UBIGINT)::BIGINT AS h FROM tc),
      |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END) AS s
      |         FROM th, unnest(range(0, 60)) AS t(b) GROUP BY 1, 2),
      |sh AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
      |       FROM bits GROUP BY doc_id),
      |banded AS (SELECT doc_id, simhash, b2, (simhash >> (b2 * 12)::INT) & 4095 AS band_val
      |           FROM sh, unnest(range(0, 5)) AS t2(b2)),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |         FROM banded a JOIN banded b ON a.b2 = b.b2 AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
      |nd_pairs AS (SELECT c.d1, c.d2, bit_count(xor(s1.simhash::BIT, s2.simhash::BIT))::BIGINT AS hamming
      |             FROM cand c JOIN sh s1 ON s1.doc_id = c.d1 JOIN sh s2 ON s2.doc_id = c.d2
      |             WHERE bit_count(xor(s1.simhash::BIT, s2.simhash::BIT)) <= 4)""".stripMargin

  /** Connected-component closure over `nd_pairs` (shared by x22 and x29;
    * requires WITH RECURSIVE; ends in `comp(doc_id, cluster)`).
    */
  val clusterCte =
    """edges AS (SELECT d1 AS u, d2 AS v FROM nd_pairs UNION ALL SELECT d2, d1 FROM nd_pairs),
      |reach(u, v) AS (SELECT u, v FROM edges
      |                UNION
      |                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u)""".stripMargin

  /** Quality measurements per document (shared by x19 and x29; ends in
    * `q(doc_id, n_tokens, avg_len, stop_hits, top_tok_frac)`), and the
    * single definition of the gate predicate over them.
    */
  val qualityCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |q AS (SELECT doc_id,
      |  len(ts)::BIGINT AS n_tokens,
      |  list_reduce(list_prepend(0::BIGINT, list_transform(ts, x -> length(x)::BIGINT)), (a, b) -> a + b)::DOUBLE / len(ts) AS avg_len,
      |  len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'to', 'and')))::BIGINT AS stop_hits,
      |  list_aggregate(list_transform(list_distinct(ts), g -> len(list_filter(ts, t2 -> t2 = g))::BIGINT), 'max')::DOUBLE / len(ts) AS top_tok_frac
      |  FROM t)""".stripMargin

  val qualityKeepPred =
    "n_tokens BETWEEN 20 AND 80 AND avg_len BETWEEN 3.0 AND 8.0 " +
      "AND stop_hits >= 2 AND top_tok_frac <= 0.125"

  /** Unrolled Lloyd iterations for the x35 oracle — one CTE block per
    * iteration, mirroring [[graft.operators.Similarity.kmeansCentroids]]
    * hop for hop (same fold orders, same tie-breaks, same empty-cell
    * fallback) over 64-dim embeddings.
    */
  /** The shared k-means CTE chain (init + Lloyd iterations, trained
    * centroids in `c$iters`), mirroring the Spark side's trainCentroids.
    */
  def kmeansCtes(k: Int, iters: Int): Seq[String] = {
    val init =
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
         |c0 AS (SELECT vec_id::BIGINT AS cid, ed AS cd FROM e WHERE vec_id < $k)""".stripMargin
    val iterations = (1 to iters).map { t =>
      val p = t - 1
      s"""n$t AS (SELECT cid, list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> cd[i] * cd[i])), (a, b) -> a + b) AS nrm FROM c$p),
         |s$t AS (SELECT e.vec_id, c.cid,
         |        list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> e.ed[i] * c.cd[i])), (a, b) -> a + b) - n$t.nrm / 2 AS score
         |        FROM e CROSS JOIN c$p c JOIN n$t ON n$t.cid = c.cid),
         |a$t AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn FROM s$t) r WHERE rn = 1),
         |m$t AS (SELECT a.cid, t.dim,
         |        list_reduce(list_prepend(0.0::DOUBLE, list(e.ed[t.dim] ORDER BY e.vec_id)), (a2, b2) -> a2 + b2) / count(*) AS val
         |        FROM a$t a JOIN e ON e.vec_id = a.vec_id, unnest(range(1, 65)) AS t(dim)
         |        GROUP BY a.cid, t.dim),
         |c$t AS (SELECT c$p.cid, coalesce(m.cd, c$p.cd) AS cd
         |        FROM c$p LEFT JOIN (SELECT cid, list(val ORDER BY dim) AS cd FROM m$t GROUP BY cid) m ON m.cid = c$p.cid)""".stripMargin
    }
    Seq(s"WITH $init") ++ iterations
  }

  def kmeansOracle(k: Int, iters: Int): String =
    kmeansCtes(k, iters).mkString(",\n") +
      s"\nSELECT cid, t.dim::BIGINT AS dim, cd[t.dim] AS val FROM c$iters, unnest(range(1, 65)) AS t(dim) ORDER BY cid, dim"

  /** [[kmeansCtes]] plus a FINAL assignment under the trained centroids
    * (`af`: vec_id → cid) — the shared prefix of the trained-centroid
    * consumers (x54 semantic dedup, x57 prototypicality), mirroring the
    * Spark side's trainCentroids + assignCells split.
    */
  def kmeansAssignCtes(k: Int, iters: Int): String = {
    val finalAssign =
      s"""nf AS (SELECT cid, list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> cd[i] * cd[i])), (a, b) -> a + b) AS nrm FROM c$iters),
         |sf AS (SELECT e.vec_id, c.cid,
         |       list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), i -> e.ed[i] * c.cd[i])), (a, b) -> a + b) - nf.nrm / 2 AS score
         |       FROM e CROSS JOIN c$iters c JOIN nf ON nf.cid = c.cid),
         |af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn FROM sf) r WHERE rn = 1)""".stripMargin
    (kmeansCtes(k, iters) :+ finalAssign).mkString(",\n")
  }
}
