package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Similarity, TextAnalysis}

/** Specs for the r9 audit/curation operators (x93–x98), each checked
  * against an independently-spelled Scala reference model over the same
  * fixture — no shared code with the DataFrame implementations — plus
  * plan-shape assertions for the scale-critical claims (no window in the
  * thresholded cap, no cartesian in the snapshot diff).
  */
class AuditOpsSpec extends AnyFunSuite with SparkSuite {

  /** Build the executed plan with AQE off: AdaptiveSparkPlanExec is a
    * leaf for TreeNode.collect, which would make every shape assertion
    * below vacuously pass (or spuriously fail) depending on wrap state.
    */
  private def plan(df: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def draw32(prefix: String, docId: Long): Long =
    java.lang.Long.parseLong(md5Hex(prefix + docId.toString).take(8), 16)

  // --- x93 corpus snapshot diff ---

  test("corpusDiff: statuses match the mod-rule reference model per source") {
    val docs = (0L until 60L).map(i => (i, s"doc $i body ${"w " * (i % 5).toInt}", s"s${i % 2}"))
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val got = Curation.corpusDiff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // reference: old = id%3!=0, new = id%3!=1 (text 'v2'-rewritten at id%5==0)
    val ref = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    docs.foreach { case (id, text, src) =>
      val inOld = id % 3 != 0
      val inNew = id % 3 != 1
      val status =
        if (!inOld && inNew) "added"
        else if (inOld && !inNew) "removed"
        else if (inOld && inNew && id % 5 == 0) "changed"
        else if (inOld && inNew) "same"
        else null
      if (status != null) {
        val chars = text.length.toLong
        val (n, c) = ref.getOrElse((src, status), (0L, 0L))
        ref((src, status)) = (n + 1, c + chars)
      }
    }
    assert(got == ref.toMap)
  }

  test("corpusDiff plan: digest equi-join, no cartesian, no text on the wire") {
    val dir = TestTables.documentsSourcedDir(spark,
      (0L until 20L).map(i => (i, s"t $i", "s0")))
    val plan = this.plan(Curation.corpusDiff(spark, dir)).toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }

  // --- x94 embedding dimension audit ---

  test("dimAudit: dead, all-zero, and mixed dimensions report exact facts") {
    // dim0 constant 0.5 (dead, nonzero), dim1 all zeros (dead, zero),
    // dim2 mixed signs, dim3 mixed with zeros
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0.5f, 0.0f, -1.0f, 0.0f)),
      (2L, Seq(0.5f, 0.0f, 2.0f, -3.0f)),
      (3L, Seq(0.5f, 0.0f, 0.25f, 4.0f)))
    val dir = TestTables.embeddingsDir(spark, vecs)
    val rows = Similarity.dimAudit(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    def row(d: Long): Row = rows.find(_.getLong(0) == d).get
    // (n_vals, n_zero, n_pos, n_neg, min, max, dead)
    assert((row(0).getLong(1), row(0).getLong(2), row(0).getLong(3), row(0).getLong(4),
      row(0).getDouble(5), row(0).getDouble(6), row(0).getBoolean(7)) ==
      ((3L, 0L, 3L, 0L, 0.5, 0.5, true)))
    assert((row(1).getLong(2), row(1).getBoolean(7)) == ((3L, true)))
    assert((row(2).getLong(2), row(2).getLong(3), row(2).getLong(4),
      row(2).getDouble(5), row(2).getDouble(6), row(2).getBoolean(7)) ==
      ((0L, 2L, 1L, -1.0, 2.0, false)))
    assert((row(3).getLong(2), row(3).getLong(3), row(3).getLong(4)) == ((1L, 1L, 1L)))
  }

  // --- x95 gate attrition funnel ---

  test("gateAttrition: funnel and sole-blocker counts match an independent model") {
    val stop = Set("the", "a", "of", "to", "and")
    // mix of docs: passing all, failing length only, failing stop only, etc.
    val docs = Seq[(Long, String)](
      // 25 tokens, all distinct (max frac 0.04), 2 stopwords, avg len ~5
      (1L, "the and " + (0 until 23).map(i => s"word$i").mkString(" ")),
      // 10 distinct tokens (max frac 0.1), 2 stopwords, avg in range —
      // fails ONLY the length gate: the sole-blocker case
      (2L, "the and " + (0 until 8).map(i => s"tokn$i").mkString(" ")),
      (3L, ("xx " * 40).trim),                                  // fails stop + rep
      (4L, ("the a of " + "supercalifragilistic " * 30).trim),  // fail avg_len
      (5L, ("the a of to " + "tok " * 30).trim))                // fail rep
    val dir = TestTables.documentsDir(spark, docs)

    case class Flags(len: Boolean, avg: Boolean, st: Boolean, rep: Boolean)
    val flags = docs.map { case (_, text) =>
      val ts = text.split(" ", -1).toSeq
      val n = ts.length
      val avgLen = ts.map(_.length).sum.toDouble / n
      val stopHits = ts.count(stop.contains)
      val topFrac = ts.groupBy(identity).values.map(_.size).max.toDouble / n
      Flags(n >= 20 && n <= 80, avgLen >= 3.0 && avgLen <= 8.0,
        stopHits >= 2, topFrac <= 0.125)
    }
    val n0 = flags.size.toLong
    val s1 = flags.count(_.len).toLong
    val s2 = flags.count(f => f.len && f.avg).toLong
    val s3 = flags.count(f => f.len && f.avg && f.st).toLong
    val s4 = flags.count(f => f.len && f.avg && f.st && f.rep).toLong
    val soles = Seq(
      flags.count(f => !f.len && f.avg && f.st && f.rep).toLong,
      flags.count(f => f.len && !f.avg && f.st && f.rep).toLong,
      flags.count(f => f.len && f.avg && !f.st && f.rep).toLong,
      flags.count(f => f.len && f.avg && f.st && !f.rep).toLong)

    val got = Curation.gateAttrition(spark, dir).collect()
    val ins = Seq(n0, s1, s2, s3)
    val outs = Seq(s1, s2, s3, s4)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1)
      assert(r.getLong(2) == ins(i), s"n_in gate ${i + 1}")
      assert(r.getLong(3) == ins(i) - outs(i), s"n_dropped gate ${i + 1}")
      assert(r.getLong(4) == outs(i), s"n_out gate ${i + 1}")
      assert(r.getLong(5) == soles(i), s"n_sole_blocker gate ${i + 1}")
    }
    // the fixture must actually exercise the funnel (no vacuous pass)
    assert(s4 >= 1 && s4 < n0 && soles.exists(_ > 0))
  }

  test("gateAttrition plan: one row-local pass, no join, only the single-row agg exchange + stack") {
    val dir = TestTables.documentsDir(spark,
      (1L to 10L).map(i => (i, s"doc $i the a of body text here")))
    val p = plan(Curation.gateAttrition(spark, dir))
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"the funnel is arithmetic, never a join:\n$p")
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length <= 1, s"no shuffle wider than the single-row aggregate:\n$p")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, p.toString)
  }

  test("bloomFprAudit plan: adds only the 1-row fold over x42's shape — no new corpus shuffle") {
    val dir = TestTables.documentsDir(spark,
      (0L until 20L).map(i => (i, s"body $i content")))
    val audit = plan(Curation.bloomFprAudit(spark, dir))
    val base = plan(Curation.bloomPrefilter(spark, dir))
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    // the base relation ends in a presentation sort the audit never
    // inherits; the audit's own fold adds at most the single-row exchange
    assert(shuffles(audit) <= shuffles(base) + 1, s"audit:\n$audit\nbase:\n$base")
    assert(audit.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, audit.toString)
  }

  // --- x96 distinct n-grams diversity ---

  test("distinctNgrams: exact distinct/total per source for n=1,2,3") {
    val docs = Seq[(Long, String, String)](
      (1L, "a b a b c", "s0"),
      (2L, "a b", "s0"),
      (3L, "x", "s1")) // len < 2 and < 3: zero bigrams/trigrams
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val rows = TextAnalysis.distinctNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

    def grams(toks: Seq[String], n: Int): Seq[String] =
      if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    val bySource = docs.groupBy(_._3)
    for ((src, ds) <- bySource; n <- 1 to 3) {
      val all = ds.flatMap(d => grams(d._2.split(" ", -1).toSeq, n))
      val total = all.size.toLong
      val distinct = all.distinct.size.toLong
      val (gt, gd, gf) = rows((src, n.toLong))
      assert(gt == total, s"$src n=$n total")
      assert(gd == distinct, s"$src n=$n distinct")
      if (total > 0) assert(gf == distinct.toDouble / total)
    }
    // s1 has no bigrams/trigrams: rows must still exist with zero totals
    assert(rows((("s1", 2L)))._1 == 0L && rows((("s1", 3L)))._1 == 0L)
  }

  test("distinctNgramsSketch: HLL++ estimates hold the 4-rsd law against the exact spelling") {
    // a corpus with enough distinct grams for the sketch to be exercised
    val docs = (0L until 80L).map { i =>
      (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 211}").mkString(" "), s"s${i % 2}")
    }
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val rsd = 0.05
    val exact = TextAnalysis.distinctNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = TextAnalysis.distinctNgramsSketch(spark, dir, rsd).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (tot, dist)) =>
      val (atot, adist) = approx(k)
      assert(atot == tot, s"$k: totals are exact in both spellings")
      assert(math.abs(adist - dist).toDouble <= 4 * rsd * math.max(dist, 1L),
        s"$k: sketch $adist vs exact $dist breaks the 4·rsd law")
    }
  }

  // --- x97 sublinear domain caps ---

  test("domainCaps: thresholded sqrt-law keep set matches the reference draw exactly") {
    val docs = (0L until 200L).map(i =>
      (i, s"body $i", if (i < 150) "big" else if (i < 190) "mid" else "tiny"))
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val got = Curation.domainCaps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    val sizes = Map("big" -> 150L, "mid" -> 40L, "tiny" -> 10L)
    val ref = docs.flatMap { case (id, _, src) =>
      val n = sizes(src)
      val threshold = math.floor(4294967296.0 / math.sqrt(n.toDouble)).toLong
      if (draw32("cap:", id) < threshold) Some((id, src, n)) else None
    }.toSet
    assert(got == ref)
    // expected ~sqrt(n) per source; generous binomial bounds, and the
    // fixture is deterministic so this can never flake
    val bySrc = got.groupBy(_._2).map { case (s, g) => s -> g.size }
    assert(bySrc.getOrElse("big", 0) >= 3 && bySrc.getOrElse("big", 0) <= 40)
  }

  test("domainCaps plan: no window, no sort before the filter") {
    val dir = TestTables.documentsSourcedDir(spark,
      (0L until 30L).map(i => (i, s"t $i", "s0")))
    val plan = this.plan(Curation.domainCaps(spark, dir)).toString
    assert(!plan.contains("Window"), "thresholded cap must not rank per source")
    assert(plan.contains("BroadcastHashJoin"), "count relation must broadcast")
  }

  // --- x99 Bloom FPR audit ---

  test("bloomFprAudit: counts reconcile, zero false negatives, FPR inside the theoretical bound") {
    // even ids form the corpus; odd ids probe — every third probe
    // duplicates its even sibling's text (is_dup), the rest are fresh
    val docs = (0L until 120L).map { i =>
      val base = i / 2
      val txt =
        if (i % 2 == 0 || base % 3 == 0) s"corpus body $base with shared content ${base * 13}"
        else s"fresh probe body $i with novel content ${i * 29}"
      (i, txt)
    }
    val dir = TestTables.documentsDir(spark, docs)

    val r = Curation.bloomFprAudit(spark, dir).collect().head
    val (nProbes, nFlagged, nTrue, nFp, nFn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nProbes == 60L)
    assert(nTrue == 20L, "every third probe duplicates the corpus")
    assert(nFn == 0L && r.getBoolean(6), "a Bloom filter can never false-negative")
    // a flagged probe is either a true dup or a false positive — exactly
    assert(nFlagged == nTrue + nFp)
    val fpr = r.getDouble(5)
    assert(fpr == nFp.toDouble / (nProbes - nTrue))
    // theoretical bound (1 - e^{-kn/m})^k at m=65536, k=4, n=|corpus
    // digests|: tiny here — measured FPR may not exceed 3x it plus the
    // small-sample floor of one miss
    val n = 60.0 // distinct corpus digests (even ids, all texts distinct)
    val bound = math.pow(1.0 - math.exp(-4.0 * n / 65536.0), 4)
    assert(fpr <= 3.0 * bound + 1.0 / (nProbes - nTrue),
      s"fpr $fpr vs bound $bound")

    // an UNDERSIZED filter must be caught by the same audit: m=64 makes
    // collisions near-certain, so false positives appear and the FPR
    // verdict says "resize" — the decision the audit exists to drive
    val tiny = Curation.bloomFprAudit(spark, dir, m = 64, k = 4).collect().head
    assert(tiny.getLong(3) > 0L, "m=64 must produce false positives on 60 fresh probes")
    assert(tiny.getLong(4) == 0L, "false negatives stay impossible at any m")
    assert(tiny.getDouble(5) > fpr)
  }

  // --- x98 dedup survivor bias ---

  test("survivorBias: cohorts partition the corpus and aggregate exactly") {
    // three exact-duplicate groups (near-dup clusters under SimHash) +
    // distinct docs; duplicated text is deliberately LONG so the removed
    // cohort's mean_chars differs from the kept cohort's
    val dupBody = ("the a of to and " + "lorem ipsum dolor sit amet " * 8).trim
    val docs =
      (1L to 3L).map(i => (i, dupBody)) ++
        (4L to 5L).map(i => (i, dupBody + " variant")) ++
        (6L to 12L).map(i => (i, s"unique short doc $i with the a of to and body ${i * 17}"))
    val dir = TestTables.documentsDir(spark, docs)

    val clusters = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val removedIds = clusters.collect { case (d, c) if c != d => d }.toSet
    assert(removedIds.nonEmpty, "fixture must produce removable duplicates")

    val got = Curation.survivorBias(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("kept", "removed"))
    val total = docs.size.toLong
    assert(got("kept").getLong(1) + got("removed").getLong(1) == total)
    assert(got("removed").getLong(1) == removedIds.size.toLong)
    // exact aggregates from the raw fixture + the cluster relation
    def refFor(ids: Seq[Long]) = {
      val txt = docs.filter(d => ids.contains(d._1)).map(_._2)
      (txt.map(_.length.toLong).sum, txt.map(_.split(" ", -1).length.toLong).sum)
    }
    val (remChars, remToks) = refFor(removedIds.toSeq)
    assert(got("removed").getLong(2) == remChars)
    assert(got("removed").getLong(3) == remToks)
    val (kChars, kToks) = refFor(docs.map(_._1).filterNot(removedIds))
    assert(got("kept").getLong(2) == kChars && got("kept").getLong(3) == kToks)
    assert(got("removed").getDouble(4) == remChars.toDouble / removedIds.size)
    val rate = got("kept").getDouble(6)
    assert(rate >= 0.0 && rate <= 1.0)
  }
}
