package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Generic graph engines (operators/Graph.scala): connected components,
  * exact-integer PageRank, triangle census, per-edge truss support —
  * hand-derived fixtures on synthetic shapes plus brute-force and
  * conservation-law differentials on harness data. Moved verbatim from
  * CurationSpec with the r13 module split.
  */
class GraphSpec extends AnyFunSuite with SparkSuite {

  test("connectedComponents: long chains converge (pointer jumping) to the component min") {
    import spark.implicits._
    // a 32-node chain needs 31 rounds under plain min-propagation — well
    // past what any O(diameter) scheme does in the default round budget
    // comfortably; the pointer jump must close it in ~log2(32) rounds
    val chain = (1L until 32L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Graph.connectedComponents(chain, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 32 && got.values.forall(_ == 1L))
    // two components + id order reversed inside the pairs
    val two = Seq((5L, 3L), (3L, 9L), (20L, 18L)).toDF("d1", "d2")
    val got2 = Graph.connectedComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 18L -> 18L, 20L -> 18L))
  }

  test("pageRank (x134): exact integer ranks on a star — hand-derived, bit-for-bit") {
    import spark.implicits._
    // star 0-{1,2,3}, scale S = 1e9, base = 0.15e9, two steps:
    //  step 1: contrib c0 = S div 3 = 333333333, leaves S;
    //    r(0) = base + (85*3S) div 100          = 2700000000
    //    r(l) = base + (85*333333333) div 100   =  433333333
    //  step 2: c0 = 2700000000 div 3 = 900000000; cl = 433333333;
    //    r(0) = base + (85*1299999999) div 100  = 1254999999
    //    r(l) = base + (85*900000000) div 100   =  915000000
    // every operation is integer div/floor — any float in the path
    // would miss these exact values
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("d1", "d2")
    val got = Graph.pageRank(pairs, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((3L, 1254999999L, 1.255)))
    Seq(1L, 2L, 3L).foreach(l => assert(got(l) == ((1L, 915000000L, 0.915))))
  }

  test("pageRank: rank mass flows toward hubs and the node set is preserved") {
    import spark.implicits._
    // path 1-2-3: the middle node must out-rank the endpoints at any
    // iteration count, and all three nodes stay visible
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val got = Graph.pageRank(pairs, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) > got(1L) && got(1L) == got(3L),
      "the hub out-ranks symmetric leaves, which tie exactly")
  }

  test("triangleCensus (x145): triangle + pendant, hand-derived coefficients") {
    import spark.implicits._
    // triangle {1,2,3} with pendant 4 on node 3: node 3 has one of its
    // C(3,2)=3 neighbor pairs connected (cc 1/3), the pendant is NULL
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val got = Graph.triangleCensus(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)) && got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.3333)))
    assert(got(4L)._1 == 1L && got(4L)._2 == 0L && got(4L)._3.isNaN)
  }

  test("triangleCensus: K4 counts every triangle once per node; a cycle has none") {
    import spark.implicits._
    // K4: 4 triangles total, each node on C(3,2) = 3 of them, cc = 1
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("d1", "d2")
    val gotK4 = Graph.triangleCensus(k4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotK4 == Set((3L, 3L, 1.0)))
    // 4-cycle: every degree is 2 but NO neighbor pair closes
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("d1", "d2")
    val gotC4 = Graph.triangleCensus(c4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(gotC4 == Set((2L, 0L, 0.0)))
  }

  test("triangleCensus: oriented count equals the brute-force reference on harness data") {
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, "/root/testdata/sf0.001")
      .select("d1", "d2")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def connected(a: Long, b: Long) =
      edges.contains((math.min(a, b), math.max(a, b)))
    val brute = nodes.map { n =>
      val nbrs = nodes.filter(m => m != n && connected(n, m))
      n -> nbrs.combinations(2).count { case Seq(x, y) => connected(x, y) }.toLong
    }.toMap
    val got = Graph.triangleCensus(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == brute, "per-node triangle counts must match the all-pairs reference")
  }

  test("edgeSupport (x146): interior edges counted per triangle, the stitch edge flagged") {
    import spark.implicits._
    // two triangles sharing edge (2,3), pendant (4,5): the shared edge
    // carries support 2, the four outer edges 1, the pendant 0
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    val got = Graph.edgeSupport(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got((2L, 3L)) == ((2L, false)))
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).foreach(e =>
      assert(got(e) == ((1L, false)), s"outer edge $e"))
    assert(got((4L, 5L)) == ((0L, true)), "the pendant is the unsupported stitch")
  }

  test("edgeSupport: incident-support law against the node census on harness data") {
    // every triangle through node v contains exactly TWO edges incident
    // to v, so sum of supports over v's edges = 2 * n_tri(v) — ties the
    // edge relation to x145's node relation exactly
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, "/root/testdata/sf0.001")
      .select("d1", "d2")
    val edges = Graph.edgeSupport(pairs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val nodes = Graph.triangleCensus(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(edges.nonEmpty && edges.exists(_._2 > 0L),
      "the harness graph must carry at least one supported edge")
    nodes.foreach { case (v, t) =>
      val incident = edges.filter { case ((a, b), _) => a == v || b == v }.map(_._2).sum
      assert(incident == 2L * t, s"node $v: incident support $incident vs 2*$t")
    }
  }

  test("kTruss (x154): a 4-clique survives k=4 whole; a triangle+pendant does not") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("d1", "d2")
    val gotK4 = Graph.kTruss(k4, k = 4).collect()
      .map(r => (r.getLong(2), r.getBoolean(3))).toSet
    assert(gotK4 == Set((2L, true)), "every K4 edge has support 2 and survives")
    // triangle {1,2,3} + pendant (3,4): at k=3 the triangle core survives
    // and the pendant is peeled; at k=4 everything falls
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
    val got3 = Graph.kTruss(tri, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(got3 == Map((1L, 2L) -> true, (1L, 3L) -> true, (2L, 3L) -> true,
      (3L, 4L) -> false))
    val got4 = Graph.kTruss(tri, k = 4).collect().map(_.getBoolean(3))
    assert(got4.length == 4 && got4.forall(_ == false))
  }

  test("kTruss: peel CASCADES — an edge with threshold support falls when its props are peeled") {
    import spark.implicits._
    // two triangles sharing edge (2,3): (2,3) has support 2 (>= k-2 at
    // k=4) on the ORIGINAL graph, but every outer edge has support 1 and
    // peels in round 1, leaving (2,3) naked — a raw support >= 2 filter
    // would WRONGLY keep it; only the fixpoint removes it
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("d1", "d2")
    val got = Graph.kTruss(pairs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got((2L, 3L)) == ((2L, false)), "the stitched edge reports its original support but falls")
    assert(got.values.forall(!_._2) && got.size == 5)
  }

  test("kTruss: throws past the round budget instead of returning a half-peeled graph") {
    import spark.implicits._
    // a chain of stitched triangles peels one layer per round — budget 1
    // cannot reach the (empty) fixpoint at k=4
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("d1", "d2")
    val e = intercept[IllegalStateException](Graph.kTruss(pairs, k = 4, maxRounds = 1))
    assert(e.getMessage.contains("peel fixpoint"))
    // and the k >= 3 contract is loud
    intercept[IllegalArgumentException](Graph.kTruss(pairs, k = 2))
  }

  test("kTruss: truss edges are a subset of raw-support survivors; monotone in k (harness data)") {
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, "/root/testdata/sf0.001")
      .select("d1", "d2")
    val sup = Graph.edgeSupport(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val t3 = Graph.kTruss(pairs, k = 3).collect()
      .filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val t4 = Graph.kTruss(pairs, k = 4).collect()
      .filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4.subsetOf(t3), "a k-truss is contained in the (k-1)-truss")
    // every truss edge had original support >= k-2 (peeling only removes)
    assert(t3.forall(e => sup(e) >= 1L) && t4.forall(e => sup(e) >= 2L))
    assert(t3.nonEmpty, "the harness near-dup graph carries a 3-truss core")
  }

  test("kCore (x156): K4 plus pendant — the clique survives k=3, the pendant falls") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("d1", "d2")
    val got = Graph.kCore(pairs, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((4L, true)), "node 1 reports its ORIGINAL degree incl. the pendant")
    Seq(2L, 3L, 4L).foreach(n => assert(got(n) == ((3L, true))))
    assert(got(5L) == ((1L, false)))
  }

  test("kCore: peel CASCADES — a path has no 2-core, a cycle IS its own 2-core") {
    import spark.implicits._
    // 5-path at k=2: endpoints fall, exposing new endpoints — three
    // removal rounds to empty; a single degree filter would keep 2,3,4
    val path = (1L until 5L).map(i => (i, i + 1)).toDF("d1", "d2")
    val gotPath = Graph.kCore(path, k = 2).collect().map(_.getBoolean(2))
    assert(gotPath.length == 5 && gotPath.forall(_ == false))
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("d1", "d2")
    val gotC4 = Graph.kCore(c4, k = 2).collect().map(r => (r.getLong(1), r.getBoolean(2))).toSet
    assert(gotC4 == Set((2L, true)))
    // round budget: the 5-path needs 3 removal rounds; budget 1 throws
    val e = intercept[IllegalStateException](Graph.kCore(path, k = 2, maxRounds = 1))
    assert(e.getMessage.contains("peel fixpoint"))
  }

  test("kCore: truss endpoints live in the (k-1)-core; core is degree-bounded (harness data)") {
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, "/root/testdata/sf0.001")
      .select("d1", "d2")
    val core3 = Graph.kCore(pairs, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // original-degree bound: peeling only removes, so every core member
    // had original degree >= k
    core3.filter(_._3).foreach { case (n, d, _) => assert(d >= 3L, s"core node $n degree $d") }
    // cross-engine law: a 4-truss edge has support >= 2, so each endpoint
    // keeps >= 3 truss neighbors — truss endpoints are 3-core members
    val coreSet = core3.filter(_._3).map(_._1).toSet
    val t4ends = Graph.kTruss(pairs, k = 4).collect()
      .filter(_.getBoolean(3)).flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(t4ends.subsetOf(coreSet), "4-truss endpoints must sit inside the 3-core")
  }

  test("personalizedPageRank (x159): exact integer ranks on a seeded star — hand-derived") {
    import spark.implicits._
    // star 0-{1,2,3}, seed {1}, scale S = 1e9, base = 0.15e9:
    //  r0: node1 = S, others 0
    //  step 1: node1 sends S div 1 to 0; node0 sends 0 div 3 = 0
    //    r1(0) = 0 + (85·S) div 100                  = 850000000
    //    r1(1) = base + 0                            = 150000000
    //    r1(2) = r1(3) = 0
    //  step 2: node0 sends 850000000 div 3 = 283333333 to each leaf;
    //          node1 sends 150000000 to 0
    //    r2(0) = 0 + (85·150000000) div 100          = 127500000
    //    r2(1) = base + (85·283333333) div 100       = 390833333
    //    r2(2) = r2(3) = 0 + 240833333               = 240833333
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("d1", "d2")
    val got = Graph.personalizedPageRank(pairs, Seq(1L).toDF("node"), iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got(0L) == ((false, 127500000L)))
    assert(got(1L) == ((true, 390833333L)))
    assert(got(2L) == ((false, 240833333L)) && got(3L) == ((false, 240833333L)))
    // seeds outside the graph are ignored, not invented as nodes
    val got2 = Graph.personalizedPageRank(pairs, Seq(1L, 99L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got2.keySet == Set(0L, 1L, 2L, 3L))
    assert(got2 == got.view.mapValues(_._2).toMap)
  }

  test("personalizedPageRank: seeding every node degenerates to the global pageRank") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L)).toDF("d1", "d2")
    val global = Graph.pageRank(pairs, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val allSeeded = Graph.personalizedPageRank(
      pairs, Seq(1L, 2L, 3L, 4L).toDF("node"), iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(allSeeded == global, "uniform teleport over all nodes IS PageRank, bit-for-bit")
  }

  test("labelPropagation (x161): synchronous votes with lex tie-break — hand-derived") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4-1; seeds 1→b, 2→a, 3→a, 4→a
    //  round 1: node1 sees {a,a,a}→a; node2 sees {b,a} tie→a (lex);
    //           node3 sees {b,a} tie→a; node4 sees {b}→b
    //  round 2: node1 {a,a,b}→a; node2 {a,a}→a; node3 {a,a}→a; node4 {a}→a
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L)).toDF("d1", "d2")
    val seeds = Seq((1L, "b"), (2L, "a"), (3L, "a"), (4L, "a")).toDF("node", "label")
    val got = Graph.labelPropagation(pairs, seeds, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> (("b", "a", true)), 2L -> (("a", "a", false)),
      3L -> (("a", "a", false)), 4L -> (("a", "a", false))))
    // seeds for non-nodes are ignored; a missing node seed throws loudly
    val got2 = Graph.labelPropagation(pairs,
      seeds.union(Seq((99L, "z")).toDF("node", "label")), iters = 2).collect()
    assert(got2.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    val e = intercept[IllegalArgumentException] {
      Graph.labelPropagation(pairs, Seq((1L, "a")).toDF("node", "label"), iters = 1)
    }
    assert(e.getMessage.contains("no seed label"))
  }

  test("hopsFrom (x157): chain distances, multi-source min, unreachable nodes absent") {
    import spark.implicits._
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("d1", "d2")
    def src(ids: Long*) = ids.toDF("node")
    val one = Graph.hopsFrom(chain, src(1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L))
    // two sources: each node settles at the NEARER one
    val two = Graph.hopsFrom(chain, src(1L, 6L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
    // disconnected component: absent from the result, not an error
    val twoComp = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    val got = Graph.hopsFrom(twoComp, src(1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
    // budget: the 6-chain needs 5 expansions; 4 throws
    val e = intercept[IllegalStateException](Graph.hopsFrom(chain, src(1L), maxHops = 4))
    assert(e.getMessage.contains("expansion rounds"))
  }
}
