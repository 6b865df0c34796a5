package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** SURVEY.md §2b corpus curation: decontamination, quality gate,
  * repetition, hash split, dedup clusters, corpus stats.
  */
class CurationSpec extends AnyFunSuite with SparkSuite {

  test("decontaminate: flags docs sharing a 5-gram with the benchmark subset") {
    // doc 0 is the benchmark subset (id % 20 == 0); doc 1 copies doc 0's
    // phrase, doc 2 shares two distinct 5-gram windows (6 shared tokens
    // in a row = two 5-grams), doc 3 is clean
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "x alpha beta gamma delta epsilon y",
      2L -> "alpha beta gamma delta epsilon zeta tail",
      3L -> "one two three four five six seven"))
    val got = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L)) // benchmark docs never flagged
  }

  test("qualityGate: each rule fires independently; keep is their conjunction") {
    val longDoc = (1 to 30).map(i => s"tok$i").mkString(" ") + " the a of"
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> longDoc, // passes everything
      2L -> "short the a", // fails r_len (3 tokens) and r_rep
      3L -> ((1 to 25).map(_ => "spam").mkString(" ") + " the a of to and"))) // fails r_rep
    val rows = Curation.qualityGate(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    val r2 = rows(2L)
    assert(!r2.getAs[Boolean]("r_len") && !r2.getAs[Boolean]("keep"))
    assert(r2.getAs[Long]("stop_hits") == 2L)
    val r3 = rows(3L)
    assert(r3.getAs[Boolean]("r_len") && r3.getAs[Boolean]("r_stop"))
    assert(!r3.getAs[Boolean]("r_rep") && !r3.getAs[Boolean]("keep"))
    assert(r3.getAs[Double]("top_tok_frac") == 25.0 / 30.0)
  }

  test("repetition: distinct ratio and top-bigram fraction; <2-token docs excluded") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "a b a b a b", // bigrams: ab ba ab ba ab -> top 'a b' 3/5
      2L -> "w x y z", // all distinct
      3L -> "solo"))
    val rows = Curation.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(3L))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_bigrams") == 5L)
    assert(r1.getAs[Double]("distinct_ratio") == 2.0 / 5.0)
    assert(r1.getAs[Double]("top_bigram_frac") == 3.0 / 5.0)
    assert(rows(2L).getAs[Double]("distinct_ratio") == 1.0)
  }

  test("dupGramCoverage: positions under repeated trigrams; short and clean docs score 0") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "a b c a b c d", // "a b c" repeats at 1 and 4 -> covers 6 of 7
      2L -> "x y x y x",     // "x y x" at 1 and 3 -> covers all 5
      3L -> "p q r s",       // no repeated trigram
      4L -> "t u"))          // shorter than one trigram
    val got = Curation.dupGramCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 6L, 6.0 / 7.0),
      (2L, 5L, 5L, 1.0),
      (3L, 4L, 0L, 0.0),
      (4L, 2L, 0L, 0.0)))
  }

  test("hashSplit: deterministic, total, and ~80/10/10 at modest n") {
    val dir = TestTables.documentsDir(spark,
      (0L until 200L).map(i => i -> s"doc number $i"))
    val a = Curation.hashSplit(spark, dir).collect().map(r => (r.getLong(0), r.getString(2)))
    val b = Curation.hashSplit(spark, dir).collect().map(r => (r.getLong(0), r.getString(2)))
    assert(a.sameElements(b)) // content-stable across runs
    val counts = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.values.sum == 200)
    assert(counts("train") > 140 && counts("val") > 5 && counts("test") > 5)
  }

  test("dedupClusters: transitive closure assigns the component-min id") {
    // near-identical chain 1~2~3 (pairwise simhash-close) + far doc 9.
    // 1 and 3 may differ by > the band threshold directly, but the chain
    // must still place all three in cluster 1.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> base,
      2L -> base.replace("w7", "q7"),
      3L -> base.replace("w7", "q7").replace("w13", "q13"),
      9L -> (41 to 80).map(i => s"v$i").mkString(" ")))
    val got = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet.contains(1L) && got.keySet.contains(2L) && got.keySet.contains(3L))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(!got.contains(9L)) // unpaired docs are not clustered
  }

  test("incrementalDedup: new-batch docs with digests already in the corpus are dropped") {
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> "existing corpus doc",
      2L -> "another existing doc",
      1L -> "existing corpus doc", // dup of corpus doc 0 -> dropped
      3L -> "genuinely new doc")) // survives
    val got = Curation.incrementalDedup(spark, dir).collect().map(_.getLong(0))
    assert(got.sameElements(Array(3L)))
  }

  test("stratifiedSample: content-stable buckets with per-language rates") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s"samp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val dir = TestTables.documentsDir(spark, (0L until 300L).map(i => i -> s"doc $i"))
    val got = Curation.stratifiedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val expected = (0L until 300L).filter(bucket(_) < 10) // fixture is all-en
    assert(got.keySet == expected.toSet)
    got.foreach { case (id, b) => assert(b == bucket(id) && b < 10) }
  }

  test("boilerplateNgrams: only shingles hot across >= minDf docs are flagged") {
    val template = "copyright acme corp all rights reserved"
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> s"$template unique one body text here",
      2L -> s"$template another body entirely different words",
      3L -> s"$template third variant of the page content",
      4L -> "completely unrelated document with no template at all"))
    val got = graft.operators.Curation.boilerplateNgrams(spark, dir, minDf = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 6-token template contributes 4 shared 3-gram shingles to docs 1-3
    // (the shingles straddling into the distinct tails differ per doc)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_ == 4L))
  }

  test("curatedCorpus composes quality ∩ canonical ∩ train exactly") {
    val dir = "/root/testdata/sf0.001"
    val keep = Curation.qualityGate(spark, dir).filter("keep")
      .collect().map(_.getLong(0)).toSet
    val nonCanonical = Curation.dedupClusters(spark, dir)
      .filter("cluster != doc_id").collect().map(_.getLong(0)).toSet
    val train = Curation.hashSplit(spark, dir).filter("split = 'train'")
      .collect().map(_.getLong(0)).toSet
    val expected = (keep -- nonCanonical) intersect train
    val got = Curation.curatedCorpus(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("lengthHistogram: fixed-width buckets with exact bounds") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "x" * 10, 2L -> "y" * 49, 3L -> "z" * 50, 4L -> "w" * 120))
    val got = Curation.lengthHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.sameElements(Array((0L, 2L, 10L, 49L), (1L, 1L, 50L, 50L), (2L, 1L, 120L, 120L))))
  }

  test("topDocsPerLang: rank by quality desc with doc_id tie-break, k bound") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "the quick brown fox jumps over the lazy dog near a river bank today",
      2L -> "a a a a a a a a", // low quality: all stopwords, low ttr
      3L -> "many distinct interesting tokens compose an unusually varied document here"))
    val got = Curation.topDocsPerLang(spark, dir, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 2 && got.forall(_._1 == "en"))
    assert(got.map(_._2).sameElements(Array(1, 2)))
    assert(!got.map(_._3).contains(2L)) // the degenerate doc never ranks
  }

  test("medianChars: lower median with deterministic tie-break") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "aa", 2L -> "bbbb", 3L -> "cccccc", 4L -> "dddddddd")) // lengths 2,4,6,8
    val r = Curation.medianChars(spark, dir).collect()
    assert(r.length == 1) // single-lang fixture
    assert(r.head.getLong(1) == 4L && r.head.getLong(2) == 4L) // lower median of even count
  }

  test("corpusStats: exact integer sums and one-division mean") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "a b c", 2L -> "d e")) // same lang/source fixture
    val r = Curation.corpusStats(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("total_chars") == 5L + 3L)
    assert(r.getAs[Long]("total_tokens") == 5L)
    assert(r.getAs[Double]("mean_chars") == 8.0 / 2.0)
  }

  test("bloomPrefilter: no false negatives (is_dup ⇒ maybe_dup), duplicates flagged") {
    // even ids = corpus, odd = fresh; doc 1 duplicates corpus doc 2
    val dir = TestTables.documentsDir(spark, Seq(
      2L -> "alpha beta gamma", 4L -> "delta epsilon zeta",
      1L -> "alpha beta gamma",                 // fresh exact dup of 2
      3L -> "eta theta iota kappa"))            // fresh novel
    val rows = Curation.bloomPrefilter(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(rows.keySet == Set(1L, 3L))
    assert(rows(1L) == ((4L, true, true)))      // all k positions set, exact dup
    // THE Bloom law: a true duplicate can never be missed
    rows.values.foreach { case (_, maybe, is) => assert(!is || maybe) }
    // this fixed fixture has no hash coincidence: the novel doc clears the filter
    assert(rows(3L)._3 == false && rows(3L)._2 == false)
  }

  test("cardinalitySketch: HLL estimate within the rsd error law of the exact distinct") {
    import org.apache.spark.sql.functions.{col, countDistinct, explode}
    val sfDir = "/root/testdata/sf0.001"
    val rsd = 0.05
    val got = Curation.cardinalitySketch(spark, sfDir, rsd).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val toks = graft.operators.Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.operators.Tables.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("source").agg(countDistinct("tok").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    got.foreach { case (src, (approx, _)) =>
      val e = exact(src).toDouble
      // 4·rsd: comfortably beyond HLL++'s ~3σ while still meaningful
      assert(math.abs(approx - e) / e <= 4 * rsd,
        s"$src: approx $approx vs exact $e exceeds the error law")
    }
    // the driver-facing audit view encodes the same law as a verdict
    // column and carries the exact counts the oracle recomputes
    val audit = Curation.cardinalityAudit(spark, sfDir, rsd).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(audit.keySet == exact.keySet)
    audit.foreach { case (src, (ex, ok)) =>
      assert(ex == exact(src) && ok, s"$src: audit (exact=$ex, ok=$ok)")
    }
  }

  test("tokenDrift: exact-integer TV distance; zero for identical snapshots") {
    // even = snapshot A: "a a b" (NA=3); odd = snapshot B: "a b b c" (NB=4)
    // numer: a |2*4-1*3|=5, b |1*4-2*3|=2, c |0*4-1*3|=3 -> 10; TV = 10/24
    val dir = TestTables.documentsDir(spark, Seq(2L -> "a a b", 1L -> "a b b c"))
    val r = Curation.tokenDrift(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 10L)))
    assert(r.getDouble(3) == 10.0 / 24.0)
    val movers = Curation.topMovers(spark, dir).collect()
      .map(r2 => (r2.getString(0), r2.getLong(3)))
    assert(movers.toSeq == Seq(("a", 5L), ("c", 3L), ("b", 2L)))
    // identical relative frequencies -> zero drift
    val same = TestTables.documentsDir(spark, Seq(2L -> "x y", 1L -> "x y"))
    assert(Curation.tokenDrift(spark, same).collect().head.getDouble(3) == 0.0)
    // empty corpus: ZERO rows (the oracle's GROUP BY contract), never a
    // single all-null global-aggregate row
    val empty = TestTables.documentsDir(spark, Seq.empty)
    assert(Curation.tokenDrift(spark, empty).collect().isEmpty)
  }

  test("buildBloomIndex: null digests are dropped, matching the probes' null handling") {
    import spark.implicits._
    // null text -> null sha2 digest; the build must survive it AND the
    // resulting index must behave as if the null row were absent
    import org.apache.spark.sql.functions.{col, sha2}
    val digests = Seq(Some("alpha beta gamma"), None).toDF("text")
      .select(sha2(col("text"), 256).as("digest"))
    val idx = Curation.buildBloomIndex(digests)
    val alphaDigest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("alpha beta gamma".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(idx.mightContain(alphaDigest))
    assert(!idx.mightContain(null)) // null probes stay never-duplicate
  }

  test("mixturePlan: over-represented sources downsample, under-represented keep all") {
    // source A: 6 of 8 tokens (share 0.75), source B: 2 of 8 (share 0.25)
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, "a b c", "A"), (2L, "d e f", "A"), (3L, "g h", "B")))
    val got = Curation.mixturePlan(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val shareA = 6.0 / 8.0
    val shareB = 2.0 / 8.0
    assert(got("A") == ((2L, 6L, shareA, (1.0 / 2) / shareA))) // downsampled toward 0.5
    assert(got("B") == ((1L, 2L, shareB, 1.0)))                // min(1, 2.0) — keeps everything
  }

  test("mixtureSample: executes the plan's rates — keep-all sources intact, gates exact") {
    // the mixturePlan fixture: A at share 0.75 -> rate 2/3, B -> rate 1.0
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, "a b c", "A"), (2L, "d e f", "A"), (3L, "g h", "B")))
    val got = Curation.mixtureSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // recompute every draw + threshold independently and apply the gate
    val rates = Curation.mixturePlan(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val expected = graft.operators.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source",
        "CAST(conv(substring(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) AS u")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter { case (_, src, u) =>
        u < math.floor(rates(src) * 4294967296.0).toLong
      }.sortBy(_._1).toSeq
    assert(got.toSeq == expected)
    // a rate-1.0 source can never lose a document (u < 2^32 always)
    assert(got.count(_._2 == "B") == 1)
    // rerun-stable: no rand() anywhere in the gate
    val again = Curation.mixtureSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }

  test("contaminationScore: graded overlap, zero-overlap docs included, drop at threshold") {
    val benchText = (1 to 10).map(i => s"b$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> benchText,                                  // benchmark member (id % 20 == 0)
      1L -> benchText,                                  // full overlap -> frac 1.0
      2L -> (11 to 20).map(i => s"c$i").mkString(" "))) // disjoint -> frac 0.0, still present
    val got = Curation.contaminationScore(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet == Set(1L, 2L)) // benchmark rows excluded, zero-overlap retained
    assert(got(1L) == ((6L, 6L, 1.0, true)))  // 10 tokens -> 6 distinct 5-grams, all shared
    assert(got(2L) == ((6L, 0L, 0.0, false)))
  }

  test("clusterRepresentatives: per-cluster argmax quality, membership conserved") {
    val dir = "/root/testdata/sf0.001"
    val reps = Curation.clusterRepresentatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val members = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = graft.operators.TextAnalysis.stats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(reps.nonEmpty)
    assert(reps.map(_._1).toSeq == members.map(_._2).distinct.sorted.toSeq) // one rep per cluster
    assert(reps.map(_._4).sum == members.length) // every member counted once
    reps.foreach { case (cluster, rep, repQ, _) =>
      val club = members.filter(_._2 == cluster).map(_._1)
      assert(club.contains(rep))
      assert(repQ == quality(rep))
      // the argmax law with the doc_id tie-break
      club.foreach { d =>
        assert(quality(d) < repQ || (quality(d) == repQ && d >= rep), s"doc $d beats rep $rep")
      }
    }
  }

  test("fixedSample: exactly min(k, |stratum|) docs, lowest draws win, ranks dense") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.fixedSample(spark, dir, k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byLang = got.groupBy(_._1)
    val counts = graft.operators.Tables.documents(spark, dir)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independently recompute every draw to verify the selection per
    // stratum, not just the internal ordering of the selected rows
    val allDraws = graft.operators.Tables.documents(spark, dir)
      .selectExpr("lang", "doc_id",
        "CAST(conv(substring(md5(concat('fsamp:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) AS u")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(5L, counts(lang)), lang)
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1 to rows.length), s"$lang ranks")
      // selected (u, doc_id) are EXACTLY the stratum's smallest, in order
      val expected = allDraws.filter(_._1 == lang).map(t => (t._3, t._2))
        .sorted.take(rows.length).toSeq
      assert(rows.sortBy(_._2).map(t => (t._4, t._3)).toSeq == expected, s"$lang selection")
    }
    // rerun-stable
    val again = Curation.fixedSample(spark, dir, k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == got.toSeq)
  }

  test("weightedSample: deterministic across runs, threshold monotone in quality") {
    val dir = "/root/testdata/sf0.001"
    val a = Curation.weightedSample(spark, dir).collect()
    val b = Curation.weightedSample(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // rerun-stable, no rand()
    val rows = a.map(r => (r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    rows.foreach { case (_, u, thr, keep) => assert(keep == (u < thr)) }
    // higher quality can never LOWER the acceptance threshold
    rows.sortBy(_._1).map(_._3).sliding(2).foreach {
      case Array(t1, t2) => assert(t1 <= t2)
      case _             => ()
    }
    assert(rows.exists(_._4) && rows.exists(!_._4)) // the gate actually divides the corpus
  }

  test("splitLeakage: exactly the cross-split subset of the near-dup pairs, labels intact") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.simhashNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val split = Curation.hashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val expected = pairs.flatMap { case (d1, d2, h) =>
      val (s1, s2) = (split(d1), split(d2))
      if (s1 != s2) Some((d1, d2, s1, s2, h)) else None
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Curation.splitLeakage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(got.forall(t => t._3 != t._4)) // never reports a same-split pair
  }

  test("budgetAllocation: Hamilton invariants — sum(quota) = budget, largest remainder wins") {
    // sizes 5/3/2, budget 7: exact shares 3.5/2.1/1.4 -> bases 3/2/1
    // (sum 6); the one leftover seat goes to A (remainder 5 of 10)
    val dir = TestTables.documentsSourcedDir(spark,
      (1 to 5).map(i => (i.toLong, s"a$i", "A")) ++
        (6 to 8).map(i => (i.toLong, s"b$i", "B")) ++
        (9 to 10).map(i => (i.toLong, s"c$i", "C")))
    val got = Curation.budgetAllocation(spark, dir, budget = 7L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("A") == ((5L, 3L, 5L, 4L)))
    assert(got("B") == ((3L, 2L, 1L, 2L)))
    assert(got("C") == ((2L, 1L, 4L, 1L)))
    assert(got.values.map(_._4).sum == 7L) // the invariant rates can't give
    assert(got.values.forall(v => v._4 - v._2 == 0L || v._4 - v._2 == 1L))
    // equal remainders: the lexicographically first source takes the seat
    val tieDir = TestTables.documentsSourcedDir(spark,
      (1 to 3).map(i => (i.toLong, s"x$i", "A")) ++
        (4 to 6).map(i => (i.toLong, s"y$i", "B")))
    val tie = Curation.budgetAllocation(spark, tieDir, budget = 3L).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(tie == Map("A" -> 2L, "B" -> 1L))
  }

  test("gramNovelty: exact asymmetric newness — subset 0, disjoint 1, graded between") {
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      // S: prev {a b c, b c d}; fresh {a b c, b c e} -> 1 of 2 novel
      (0L, "a b c d", "S"), (1L, "a b c e", "S"),
      // T: fresh {x y z} is a subset of prev {x y z, y z w} -> 0.0
      (2L, "x y z w", "T"), (3L, "x y z", "T"),
      // U: fresh only (no previous snapshot) -> everything novel
      (5L, "p q r s", "U"),
      // V: previous only -> no fresh grams, source absent from the report
      (6L, "m n o", "V")))
    val got = Curation.gramNovelty(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "S" -> ((2L, 1L, 0.5)),
      "T" -> ((1L, 0L, 0.0)),
      "U" -> ((2L, 2L, 1.0))))
  }

  test("split and shard assignments survive corpus growth: stable across scale factors") {
    // the id-hash contract's point: growing the corpus 10x (sf0.001 ->
    // sf0.01 shares doc_ids 0..499) must move NO document across splits
    // or shards — re-crawls and incremental ingests keep placements
    val smallSplit = Curation.hashSplit(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val bigSplit = Curation.hashSplit(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(smallSplit.nonEmpty)
    smallSplit.foreach { case (id, s) => assert(bigSplit(id) == s, s"doc $id moved split") }
    val smallShard = Curation.curriculumShards(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bigShard = Curation.curriculumShards(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    smallShard.foreach { case (id, s) => assert(bigShard(id) == s, s"doc $id moved shard") }
  }

  test("crossmodalCuration: verdict is exactly quality-gate AND proto-gate, columns verbatim") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.crossmodalCuration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    val quality = graft.operators.TextAnalysis.stats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val proto = graft.operators.Similarity.centroidSim(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty && got.length == proto.size)
    got.foreach { case (id, q, cell, sim, keep) =>
      // the composition carries BOTH legs' values verbatim — no re-derivation
      assert(q == quality(id) && (cell, sim) == proto(id))
      assert(keep == (q >= 0.63 && sim >= 0.25))
    }
  }

  test("curriculumShards: content-stable shards, best-first dense positions, rerun-stable") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.curriculumShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // shard derivation recomputed independently (the split/sampler spelling)
    val draws = graft.operators.Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "pmod(CAST(conv(substring(md5(concat('shard:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT), 8L) AS shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, shard, _, _) => draws(id) == shard })
    // every document exactly once; positions dense 1..n per shard;
    // quality never increases along a shard's pack order
    assert(got.map(_._1).distinct.length == draws.size)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val inOrder = rows.sortBy(_._3)
      assert(inOrder.map(_._3).toSeq == (1 to rows.length), s"shard $shard ranks")
      inOrder.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"shard $shard quality order")
        case _           => ()
      }
    }
    val again = Curation.curriculumShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(again.toSeq == got.toSeq)
  }

  test("budgetAllocation: degenerate shapes — one source, zero budget, budget = total") {
    val dir = TestTables.documentsSourcedDir(spark,
      (1 to 4).map(i => (i.toLong, s"d$i", "only")))
    // a single source takes the whole budget
    val solo = Curation.budgetAllocation(spark, dir, budget = 3L).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    assert(solo.toSeq == Seq(("only", 3L)))
    // zero budget allocates zero everywhere (base 0, rem 0, no seats)
    val two = TestTables.documentsSourcedDir(spark,
      Seq((1L, "a", "A"), (2L, "b", "B")))
    val zero = Curation.budgetAllocation(spark, two, budget = 0L).collect()
      .map(r => r.getLong(4))
    assert(zero.toSeq == Seq(0L, 0L))
    // budget = corpus size: every source gets exactly its document count
    // (bases are exact, every remainder 0, no leftover seats)
    val full = Curation.budgetAllocation(spark, dir, budget = 4L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(full.toSeq == Seq((4L, 4L, 0L, 4L)))
  }

  test("budgetAllocation: invariants hold across seeded random size/budget mixes") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val nSources = 2 + rng.nextInt(4)
      val sizes = (0 until nSources).map(_ => 1 + rng.nextInt(6))
      var id = 0L
      val docs = sizes.zipWithIndex.flatMap { case (sz, s) =>
        (1 to sz).map { _ => id += 1; (id, s"t$id", f"s$s%02d") }
      }
      val total = sizes.sum
      val budget = rng.nextInt(total + 1).toLong
      val dir = TestTables.documentsSourcedDir(spark, docs)
      val got = Curation.budgetAllocation(spark, dir, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      assert(got.map(_._4).sum == budget, s"sum(quota) != $budget in ${got.toSeq}")
      assert(got.forall(t => t._4 - t._3 == 0L || t._4 - t._3 == 1L))
      // fixed-B monotonicity: a strictly larger source never gets less
      for (a <- got; b <- got if a._2 > b._2)
        assert(a._4 >= b._4, s"${a._1}(${a._2} docs) < ${b._1}(${b._2} docs): ${got.toSeq}")
    }
  }

  test("mixtureSample/leakageRepair: balanced sources keep all; no pairs -> all kept") {
    // perfectly balanced sources: every rate is exactly 1.0 -> identity
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, "a b", "A"), (2L, "c d", "B")))
    val sampled = Curation.mixtureSample(spark, dir).collect().map(_.getLong(0))
    assert(sampled.sorted.toSeq == Seq(1L, 2L))
    // a corpus with no near-dup pairs repairs to itself
    val distinctDir = TestTables.documentsDir(spark, Seq(
      1L -> "alpha beta gamma delta", 2L -> "epsilon zeta eta theta",
      3L -> "iota kappa lambda mu"))
    val rep = Curation.leakageRepair(spark, distinctDir).collect()
    assert(rep.length == 3 && rep.forall(_.getBoolean(2)))
  }

  test("leakageRepair: lower-priority members dropped, kept subset audits leak-free") {
    val dir = "/root/testdata/sf0.001"
    val leaks = Curation.splitLeakage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val got = Curation.leakageRepair(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val kept = got.filter(_._3).map(_._1).toSet
    val split = got.map(t => t._1 -> t._2).toMap
    // the full corpus appears exactly once, splits unchanged from x21
    val orig = Curation.hashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(got.map(_._1).toSeq == got.map(_._1).distinct.sorted.toSeq)
    assert(split == orig)
    val prio = Map("train" -> 2, "val" -> 1, "test" -> 0)
    // exactly the losers are dropped: every leak pair keeps its higher-
    // priority member, and nothing outside a leak pair is dropped
    val losers = leaks.map { case (d1, d2, s1, s2) =>
      if (prio(s1) < prio(s2)) d1 else d2
    }.toSet
    assert(got.filterNot(_._3).map(_._1).toSet == losers)
    // the shippable invariant: no leak pair survives within kept docs
    leaks.foreach { case (d1, d2, _, _) =>
      assert(!(kept(d1) && kept(d2)), s"pair ($d1,$d2) still straddles the split")
    }
    // train never loses documents to the repair
    assert(got.filter(_._2 == "train").forall(_._3))
  }

  test("quantileAudit: exact discrete order statistics; every rank-error verdict holds") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.operators.Tables.documents(spark, dir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Curation.quantileAudit(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val sorted = docs.filter(_._1 == r.getString(0)).sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      // the engine's own rank formula, replicated bit-for-bit
      def at(p: Double) =
        sorted(math.min(n.toLong, math.max(1L, math.ceil(p * n).toLong)).toInt - 1)
      assert(r.getLong(2) == at(0.5) && r.getLong(3) == at(0.9) && r.getLong(4) == at(0.99))
      assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7),
        s"sketch rank-error law violated for ${r.getString(0)}")
    }
  }

  test("importanceWeights: exact agreement with an independent brute-force reference") {
    val docs = Seq(
      (1L, "wiki facts wiki science", "src0"),   // the target slice
      (2L, "wiki science facts", "src0"),
      (3L, "wiki facts spam", "src1"),           // mostly target-mass tokens
      (4L, "spam spam buy now", "src1"),         // tokens absent from target
      (5L, "science wiki", "src2"))
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val nBuckets = 65536L

    // independent reference: same md5-top-60-bit token hash as RefWinnow's
    // k=1 gram, bucketed, pooled target/raw masses
    val toks = docs.map { case (id, t, s) => (id, s, t.split(" ").toSeq) }
    val stream = toks.flatMap { case (id, s, ts) =>
      ts.map(w => (id, s, RefWinnow.gramHash(Seq(w)) % nBuckets))
    }
    val rc = stream.groupBy(_._3).map { case (b, g) => b -> g.size.toLong }
    val tc = stream.filter(_._2 == "src0").groupBy(_._3)
      .map { case (b, g) => b -> g.size.toLong }
    val nr = stream.size.toLong
    val nt = stream.count(_._2 == "src0").toLong
    val expect = toks.map { case (id, _, ts) =>
      val bs = ts.map(w => RefWinnow.gramHash(Seq(w)) % nBuckets)
      val tMass = bs.map(b => tc.getOrElse(b, 0L)).sum
      val rMass = bs.map(rc).sum
      id -> ((ts.size.toLong, tMass, rMass,
        (tMass.toDouble * nr) / (rMass.toDouble * nt)))
    }.toMap

    val got = Curation.importanceWeights(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    // direction: the all-foreign doc 4 scores 0; target docs score > 1
    assert(got(4L)._4 == 0.0)
    assert(got(1L)._4 > 1.0 && got(2L)._4 > 1.0)
  }

  test("quantileAudit: degenerate strata (n=1, n=2) clamp every rank correctly") {
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, "x" * 7, "solo"),
      (2L, "y" * 3, "duo"), (3L, "z" * 9, "duo")))
    val got = Curation.quantileAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val solo = got("solo") // every rank clamps to 1 → the single value
    assert(solo.getLong(1) == 1L && (2 to 4).forall(solo.getLong(_) == 7L))
    assert((5 to 7).forall(solo.getBoolean))
    val duo = got("duo") // sorted lengths [3, 9]
    assert(duo.getLong(1) == 2L)
    assert(duo.getLong(2) == 3L) // p50: rank ceil(0.5·2)=1 → lower value
    assert(duo.getLong(3) == 9L && duo.getLong(4) == 9L) // p90/p99: rank 2
    assert((5 to 7).forall(duo.getBoolean))
  }

  test("blocklistFilter: severe blocks at one hit, mild blocks past the rate, instances counted") {
    val dir = TestTables.documentsDir(spark, Seq(
      (1L, "clean words only here"),                  // keep
      (2L, "one bad word inside text"),               // 1 severe hit -> blocked
      (3L, "meh meh fine fine fine fine fine fine"),  // 2/8 mild = 0.25 > 1/8 -> blocked
      (4L, "meh fine fine fine fine fine fine fine"), // 1/8 mild = 0.125 <= 1/8 -> keep
      (5L, "bad meh meh meh")))                       // both tiers trip
    val got = Curation.blocklistFilter(spark, dir,
      severe = Seq("bad"), mild = Seq("meh"), mildMaxRate = 0.125)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(got(1L) == ((0L, 0L, true)))
    assert(got(2L) == ((1L, 0L, false)))
    assert(got(3L) == ((0L, 2L, false)))
    assert(got(4L) == ((0L, 1L, true)))
    assert(got(5L) == ((1L, 3L, false)))
    // instance counting, not distinct: doc 3's two 'meh' both counted
    val r3 = Curation.blocklistFilter(spark, dir,
      severe = Seq("bad"), mild = Seq("meh"), mildMaxRate = 0.125)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 3L).head()
    assert(r3.getDouble(4) == 0.25)
  }

  test("unimaxBudget (x106): hand case — capped prefix, boundary cap, waterfilled tail") {
    // tokens: A=10, B=20, C=100; maxEpochs=2 → caps 20/40/200; budget 100:
    // A capped (20·3 ≤ 100), B capped at the exact boundary (40·2 ≤ 80),
    // C fails (200 > 40) → waterfills the remaining 40
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, Seq.fill(10)("t").mkString(" "), "A"),
      (2L, Seq.fill(20)("t").mkString(" "), "B"),
      (3L, Seq.fill(100)("t").mkString(" "), "C")))
    val got = Curation.unimaxBudget(spark, dir, budget = 100L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got("A") == ((20L, true, 20L, 2.0)))
    assert(got("B") == ((40L, true, 40L, 2.0)))
    assert(got("C") == ((200L, false, 40L, 0.4)))
  }

  test("unimaxBudget: under-subscribed allocates every cap; tiny budgets split with remainder") {
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (1L, Seq.fill(10)("t").mkString(" "), "A"),
      (2L, Seq.fill(20)("t").mkString(" "), "B"),
      (3L, Seq.fill(100)("t").mkString(" "), "C")))
    // budget above total cap: everyone capped, slack reported by Σalloc < B
    val full = Curation.unimaxBudget(spark, dir, budget = 1000L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(full == Map("A" -> ((true, 20L)), "B" -> ((true, 40L)), "C" -> ((true, 200L))))
    // budget below every cap·left: nobody capped; 31 = 10+10+10 with the
    // +1 unit going to the FIRST source in (cap, source) order
    val tiny = Curation.unimaxBudget(spark, dir, budget = 31L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(tiny == Map("A" -> ((false, 11L)), "B" -> ((false, 10L)), "C" -> ((false, 10L))))
  }

  test("unimaxBudget: invariants + exact agreement with a sequential greedy reference") {
    val rnd = new scala.util.Random(1096)
    for (trial <- 1 to 4) {
      val sizes = (0 until 6).map(i => (s"s$i", 1L + rnd.nextInt(50)))
      val docs = sizes.zipWithIndex.map { case ((src, n), i) =>
        ((i + 1).toLong, Seq.fill(n.toInt)("t").mkString(" "), src)
      }
      val dir = TestTables.documentsSourcedDir(spark, docs)
      val budget = 1L + rnd.nextInt(200)
      val e = 1L + rnd.nextInt(3)
      val got = Curation.unimaxBudget(spark, dir, budget, e)
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
      // independently-spelled sequential waterfilling
      val caps = sizes.map { case (s, n) => (s, n * e) }.sortBy { case (s, c) => (c, s) }
      var rem = budget
      var left = caps.length
      val ref = scala.collection.mutable.Map[String, Long]()
      var idx = 0
      var frozen = false
      while (idx < caps.length && !frozen) {
        val (s, c) = caps(idx)
        if (c * left <= rem) { ref(s) = c; rem -= c; left -= 1; idx += 1 }
        else frozen = true
      }
      val uncapped = caps.drop(idx)
      uncapped.zipWithIndex.foreach { case ((s, _), j) =>
        ref(s) = rem / left + (if (j < rem % left) 1L else 0L)
      }
      assert(got.map { case (s, (_, a)) => s -> a } == ref.toMap, s"trial $trial")
      // laws: alloc never exceeds the cap; the budget is conserved exactly
      got.values.foreach { case (cap, alloc) => assert(alloc <= cap) }
      val totalCap = caps.map(_._2).sum
      assert(got.values.map(_._2).sum == math.min(budget, totalCap), s"trial $trial sum")
    }
  }

  test("contaminationSpans (x108): consecutive hits merge to runs, gaps split, clean docs absent") {
    val dir = TestTables.documentsDir(spark, Seq(
      // doc 0 is the benchmark slice (doc_id % 20 == 0)
      (0L, "a b c d e f g h"),
      // hits at positions 3 ("a b c d e") and 4 ("b c d e f"), then a
      // second isolated hit at 11 ("a b c d e") → runs [2, 1]
      (1L, "x1 x2 a b c d e f x3 x4 a b c d e x5"),
      // no benchmark gram → absent from the output
      (2L, "y1 y2 y3 y4 y5 y6")))
    val got = Curation.contaminationSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set(1L))
    // (n_hit_positions, n_runs, max_run, max_span_tokens = max_run + 4)
    assert(got(1L) == ((3L, 2L, 2L, 6L)))
  }

  test("signalAgreement (x115): per-source Spearman matches an independent local recomputation") {
    val docs = Seq(
      (1L, "a a b c d", "s1"), (2L, "a b b a c", "s1"), (3L, "x y z w q", "s1"),
      (4L, "m n m n m", "s2"), (5L, "p q r s t", "s2"),
      (6L, "a c e g i", "s2"), (7L, "k k k k k", "s2"),
      (8L, "u v", "solo"))
    val dir = TestTables.documentsSourcedDir(spark, docs)
    val got = Curation.signalAgreement(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    // independent local spelling: occurrence-level rarity, bigram
    // distinct ratio, HALF_UP 4-rounding, (value, id) rank permutations
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val toks = docs.map { case (id, t, s) => (id, s, t.split(" ").toSeq) }
    val nDocs = docs.length
    val dfm = toks.flatMap { case (_, _, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.size).toMap
    val sig = toks.map { case (id, s, ts) =>
      val a = r4(ts.map(t => (nDocs - dfm(t)).toDouble).sum / ts.length)
      val bgs = ts.sliding(2).map(_.mkString(" ")).toSeq
      val b = r4(bgs.distinct.length.toDouble / bgs.length)
      (id, s, a, b)
    }
    val exp = sig.groupBy(_._2).map { case (src, rows) =>
      val ra = rows.sortBy(r => (r._3, r._1)).map(_._1).zipWithIndex.toMap
      val rb = rows.sortBy(r => (r._4, r._1)).map(_._1).zipWithIndex.toMap
      val d2 = rows.map(r => { val d = (ra(r._1) - rb(r._1)).toLong; d * d }).sum
      val n = rows.length
      val rho = if (n < 2) None
        else Some(1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n.toDouble - 1.0)))
      src -> ((n.toLong, d2, rho))
    }
    assert(got == exp)
    assert(got("solo")._3.isEmpty, "single-doc source reports rho NULL, never NaN")
    got.values.flatMap(_._3).foreach(r => assert(r >= -1.0 && r <= 1.0))
  }

  test("clusterSizes (x121): histogram covers the corpus — components plus the singleton bucket") {
    // the dedupClusters chain fixture: 1~2~3 one component, 9 unpaired
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> base,
      2L -> base.replace("w7", "q7"),
      3L -> base.replace("w7", "q7").replace("w13", "q13"),
      9L -> (41 to 80).map(i => s"v$i").mkString(" ")))
    val got = Curation.clusterSizes(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, 0.25)),
      3L -> ((1L, 3L, 0.75))))
  }

  test("clusterSizes: an all-unique corpus is one singleton bucket") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> (1 to 30).map(i => s"a$i").mkString(" "),
      2L -> (31 to 60).map(i => s"b$i").mkString(" ")))
    val got = Curation.clusterSizes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1.0)))
  }

  test("langPurity (x123): exact Gini, majority tie to the lexically greater lang") {
    val dir = TestTables.documentsLangSourcedDir(spark, Seq(
      // pure: 3 en
      (1L, "t", "en", "pure"), (2L, "t", "en", "pure"), (3L, "t", "en", "pure"),
      // mixed: 2 en + 1 fr + 1 de -> gini = (16 - (4+1+1))/16 = 0.625
      (4L, "t", "en", "mix"), (5L, "t", "en", "mix"),
      (6L, "t", "fr", "mix"), (7L, "t", "de", "mix"),
      // tied: 1 en + 1 fr -> majority must be fr (lexically greater)
      (8L, "t", "en", "tie"), (9L, "t", "fr", "tie")))
    val got = Curation.langPurity(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("pure") == ((3L, 1L, "en", 1.0, 0.0)))
    assert(got("mix") == ((4L, 3L, "en", 0.5, 0.625)))
    assert(got("tie") == ((2L, 2L, "fr", 0.5, 0.5)),
      "equal-count majority must break to the lexically greater language (struct-max order)")
  }

  test("decontaminationRepair (x132): quoted runs excised exactly; short hits and clean docs pass") {
    // bench doc 0 (id % 20 == 0) is the 6-token quote "b1..b6" -> its
    // 5-gram set is {b1..b5, b2..b6}
    val quote = "b1 b2 b3 b4 b5 b6"
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> quote,
      21L -> s"u1 u2 $quote u3 u4", // 2-gram run at p 3-4 -> tokens 3-8 excised
      22L -> "v1 v2 b1 b2 b3 b4 b5 v3", // single gram hit: run_len 1 < minRun -> untouched
      23L -> "w1 w2 w3 w4 w5 w6", // clean
      24L -> quote)) // fully quoted -> repaired to the empty string
    val got = Curation.decontaminationRepair(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5)))).toMap
    assert(got.keySet == Set(21L, 22L, 23L, 24L), "the benchmark doc never appears")
    assert(got(21L) == ((10L, 6L, 1L, false, "u1 u2 u3 u4")),
      "exactly the quoted span is excised, surrounding text survives")
    assert(got(22L) == ((8L, 0L, 0L, true, "v1 v2 b1 b2 b3 b4 b5 v3")),
      "an isolated shared k-gram (run < minRun) is coincidence, not a quote")
    assert(got(23L) == ((6L, 0L, 0L, true, "w1 w2 w3 w4 w5 w6")))
    assert(got(24L) == ((6L, 6L, 1L, false, "")),
      "a fully-quoted document repairs to the empty string, never disappears")
  }

  test("decontaminationRepair: overlapping runs excise a position once; two quotes = two runs") {
    // bench quotes A = a1..a6 and B = c1..c6; doc 41 carries both with a
    // 3-token gap — two separate runs, each excised, the gap survives
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> "a1 a2 a3 a4 a5 a6",
      20L -> "c1 c2 c3 c4 c5 c6",
      41L -> "a1 a2 a3 a4 a5 a6 g1 g2 g3 c1 c2 c3 c4 c5 c6"))
    val got = Curation.decontaminationRepair(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4 + 1)))).toMap
    assert(got(41L) == ((15L, 12L, 2L, "g1 g2 g3")),
      "two quotes excise independently; the clean gap between them survives")
  }

  test("repairProjection: the row-local spelling equals the batch repair, doc for doc") {
    // the x132 fixture plus edge shapes: quote at the very start, at the
    // very end, and a doc shorter than k
    val quote = "b1 b2 b3 b4 b5 b6"
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> quote,
      21L -> s"u1 u2 $quote u3 u4",
      22L -> "v1 v2 b1 b2 b3 b4 b5 v3",
      23L -> "w1 w2 w3 w4 w5 w6",
      24L -> quote,
      25L -> s"$quote t1 t2", // quote at position 1
      26L -> s"t3 t4 $quote", // quote ending at the last token
      27L -> "s1 s2")) // sub-k doc: no grams, trivially clean
    val batch = Curation.decontaminationRepair(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getString(5))))
      .toMap
    val grams = Curation.benchmarkGrams(spark, dir)
    assert(grams == Seq("b1 b2 b3 b4 b5", "b2 b3 b4 b5 b6"))
    val proj = Curation.repairProjection(
        graft.operators.Tables.documents(spark, dir)
          .filter("doc_id % 20 != 0"), grams)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("n_removed"),
          r.getAs[Boolean]("clean"), r.getAs[String]("text_repaired"))))
      .toMap
    assert(proj.keySet == batch.keySet)
    batch.foreach { case (id, b) =>
      assert(proj(id) == b, s"doc $id: stream spelling diverges from the batch repair")
    }
    assert(proj(25L)._4 == "t1 t2" && proj(26L)._4 == "t3 t4",
      "boundary quotes excise cleanly at both document edges")
    assert(proj(27L) == ((2L, 0L, true, "s1 s2")))
  }

  test("repairProjection: minRun 1 excises every isolated shared k-gram (vs the batch window)") {
    val quote = "b1 b2 b3 b4 b5 b6"
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> quote,
      22L -> "v1 v2 b1 b2 b3 b4 b5 v3")) // single gram hit at p=3
    val batch = Curation.decontaminationRepair(spark, dir, minRun = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(5)))).toMap
    val proj = Curation.repairProjection(
        graft.operators.Tables.documents(spark, dir).filter("doc_id % 20 != 0"),
        Curation.benchmarkGrams(spark, dir), minRun = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("text_repaired")))).toMap
    assert(batch(22L) == ((5L, "v1 v2 v3")) && proj(22L) == batch(22L),
      "at minRun 1 the isolated 5-gram IS excised, identically in both spellings")
  }

  test("clusterPurity (x129): composition per component; majority ties to the greater source") {
    // the x121 chain (1~2~3) with mixed provenance, plus an exact twin
    // pair (20~21) split across two sources at one member each
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val twin = (41 to 80).map(i => s"v$i").mkString(" ")
    val dir = TestTables.documentsLangSourcedDir(spark, Seq(
      (1L, base, "en", "s1"),
      (2L, base.replace("w7", "q7"), "en", "s1"),
      (3L, base.replace("w7", "q7").replace("w13", "q13"), "fr", "s2"),
      (20L, twin, "en", "sa"), (21L, twin, "en", "sb"),
      (9L, (81 to 120).map(i => s"z$i").mkString(" "), "en", "s9")))
    val got = Curation.clusterPurity(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5),
          r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(got.keySet == Set(1L, 20L), "only components appear — unpaired docs are not clusters")
    assert(got(1L) == ((3L, 2L, 2L, "s1", 0.6667, true, true)),
      "the chain cluster is cross-source AND cross-lang with s1 the 2-of-3 majority")
    assert(got(20L) == ((2L, 2L, 1L, "sb", 0.5, true, false)),
      "a one-each source tie breaks to the lexically greater source (struct-max order)")
  }

  test("quantileDrift (x127): exact order statistics per side; one-sided sources keep NULLs") {
    // s1 old (even ids): lengths 10/20/30/40 -> p50 = rank ceil(2) = 20,
    //    p90 = rank ceil(3.6) = 4 -> 40, p99 = 40
    // s1 new (odd ids): lengths 5/10/15 -> p50 = 10, p90 = p99 = 15
    // s2: old side only -> every new_/shift_ column NULL
    def doc(n: Int) = "x" * n
    val dir = TestTables.documentsSourcedDir(spark, Seq(
      (0L, doc(10), "s1"), (2L, doc(20), "s1"), (4L, doc(30), "s1"), (6L, doc(40), "s1"),
      (1L, doc(5), "s1"), (3L, doc(10), "s1"), (5L, doc(15), "s1"),
      (8L, doc(7), "s2"), (10L, doc(9), "s2")))
    val rows = Curation.quantileDrift(spark, dir).collect()
    val s1 = rows.find(_.getString(0) == "s1").get
    assert((s1.getLong(1), s1.getLong(2)) == ((4L, 3L)))
    assert((s1.getLong(3), s1.getLong(4)) == ((20L, 10L)), "p50 old/new")
    assert((s1.getLong(5), s1.getLong(6)) == ((40L, 15L)), "p90 old/new")
    assert((s1.getLong(7), s1.getLong(8)) == ((40L, 15L)), "p99 old/new")
    assert(s1.getLong(9) == -10L && s1.getDouble(10) == -0.5, "p50 shift")
    assert(s1.getLong(11) == -25L && s1.getDouble(12) == -0.625, "p90 shift")
    assert(s1.getLong(13) == -25L && s1.getDouble(14) == -0.625, "p99 shift")
    val s2 = rows.find(_.getString(0) == "s2").get
    assert(s2.getLong(1) == 2L && s2.isNullAt(2), "one-sided source stays visible")
    assert(s2.getLong(3) == 7L, "old p50 of lengths 7/9: rank ceil(0.5*2) = 1 -> 7")
    assert(s2.isNullAt(4) && s2.isNullAt(9) && s2.isNullAt(10),
      "absent side leaves quantiles and shifts NULL, never NaN")
  }

  test("rareCellSuppression (x124): cells below k suppressed, kept mass zeroed") {
    val docs = (0L until 30L).map(i => (i, "t", "en", "big")) ++
      Seq((100L, "t", "fr", "big"), (101L, "t", "fr", "big"),
        (102L, "t", "en", "thin"))
    val dir = TestTables.documentsLangSourcedDir(spark, docs)
    val got = Curation.rareCellSuppression(spark, dir, k = 25L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got(("en", "big")) == ((30L, false, 30L)))
    assert(got(("fr", "big")) == ((2L, true, 0L)))
    assert(got(("en", "thin")) == ((1L, true, 0L)))
    // the release invariant: kept mass is exactly the unsuppressed mass
    assert(got.values.map(_._3).sum == 30L)
  }

  test("deletionBlastRadius (x139): each artifact class counts its own exact reach") {
    // delMod 50 -> deleted = {0, 50}. Five docs, one lang:
    //  - docs 0 and 1 share identical text -> one shared chunk digest
    //    (NOT exclusive: doc 1 survives) and a near-dup cluster {0, 1}
    //    (identical simhash) -> 1 affected cluster, doc 1 co-clustered;
    //  - doc 50's text is unique -> its digest is EXCLUSIVE to the
    //    deletion set (the purge list);
    //  - docs 2 / 51 are unique survivors;
    //  - all five docs fit bin 0 of the one lang -> the whole (single-
    //    bin) pack tail repacks.
    val dir = TestTables.documentsLangSourcedDir(spark, Seq(
      (0L, "a b", "en", "s0"), (1L, "a b", "en", "s0"),
      (2L, "m n", "en", "s0"),
      (50L, "x y", "en", "s0"), (51L, "p q r", "en", "s0")))
    val got = Curation.deletionBlastRadius(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("doc", "chunk_digest", "cluster", "co_clustered_doc", "pack_bin"))
    assert(got("doc") == ((2L, 5L, 0.4)))
    assert(got("chunk_digest") == ((1L, 4L, 0.25)),
      "only the digest with NO surviving provenance joins the purge list")
    assert(got("cluster") == ((1L, 1L, 1.0)))
    assert(got("co_clustered_doc") == ((1L, 2L, 0.5)),
      "the surviving near-copy needs re-canonicalization — deletion reaches past its own rows")
    assert(got("pack_bin") == ((1L, 1L, 1.0)),
      "a deletion in bin 0 repacks the whole downstream tail")
  }

  test("pairCountingStability (x141): a pure merge fills merged_by_new, hand-derived") {
    import spark.implicits._
    // old {1,2},{3,4},{5}; new {1,2,3,4},{5}:
    //   cells (A,X):2 (B,X):2 (C,C):1 -> together_both = 1+1+0 = 2
    //   old marginals 2,2,1 -> old_together = 2 -> split = 0
    //   new marginals 4,1   -> new_together = 6 -> merged = 4
    //   apart = 10 - 2 - 6 + 2 = 4; rand = (2+4)/10 = 0.6
    val asg = Seq((1L, 10L, 90L), (2L, 10L, 90L), (3L, 11L, 90L),
      (4L, 11L, 90L), (5L, 12L, 92L)).toDF("doc_id", "c_old", "c_new")
    val r = Curation.pairCountingStability(asg).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) ==
      ((5L, 10L, 2L, 0L, 4L, 4L, 0.6)))
  }

  test("pairCountingStability: a split populates split_by_new; singleton world rand is NULL-safe") {
    import spark.implicits._
    // old {1,2,3}; new {1,2},{3}: together = 1, old_together = 3 ->
    // split = 2; new_together = 1 -> merged = 0; apart = 3-3-1+1 = 0;
    // rand = 1/3 = 0.3333
    val asg = Seq((1L, 7L, 70L), (2L, 7L, 70L), (3L, 7L, 71L))
      .toDF("doc_id", "c_old", "c_new")
    val r = Curation.pairCountingStability(asg).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) ==
      ((3L, 3L, 1L, 2L, 0L, 0L, 0.3333)))
    // one doc -> zero pairs -> rand4 must be NULL, not a 0/0 crash
    val one = Curation.pairCountingStability(
      Seq((1L, 7L, 70L)).toDF("doc_id", "c_old", "c_new")).collect().head
    assert(one.getLong(1) == 0L && one.isNullAt(6))
  }

  test("clusterStability (x141): containment law — per-doc simhash means evens can only merge") {
    // identical texts form simhash cliques: evens {0,2} pair directly in
    // BOTH snapshots, so the odd bridge doc 1 changes nothing restricted
    // to evens; {4,6} likewise; 8 is a singleton. The law the oracle
    // also encodes: split_by_new = 0, universe = every even doc.
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "one two three four five six seven eight nine",
      6L -> "one two three four five six seven eight nine",
      8L -> "lone wolf text with no copy anywhere at all"))
    val r = Curation.clusterStability(spark, dir).collect().head
    assert(r.getLong(0) == 5L, "universe is the even docs {0,2,4,6,8}")
    assert(r.getLong(3) == 0L, "split_by_new must be zero under the snapshot binding")
    assert(r.getLong(2) == 2L && r.getDouble(6) == 1.0,
      "both even cliques survive intact: pairs (0,2) and (4,6) together in both, rand 1")
  }

  test("dedupSavings (x147): the identical pair is reclaimed by every layer, hand-derived") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f", // exact copy: every layer drops its 6 tokens
      3L -> "p q r s t u v w"))
    val got = Curation.dedupSavings(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set("doc", "chunk", "cluster"))
    assert(got("doc") == ((3L, 1L, 20L, 6L, 0.3)))
    assert(got("cluster") == ((3L, 1L, 20L, 6L, 0.3)),
      "identical texts collide in SimHash: the cluster layer reclaims the same copy")
    val (chunkUnits, chunkDropped, chunkTot, chunkToks, chunkFrac) = got("chunk")
    assert(chunkTot == 20L && chunkUnits >= 3L)
    assert(chunkToks >= 6L && chunkDropped >= 1L,
      "an exact copy duplicates every one of its chunks")
    assert(chunkFrac == math.rint(chunkToks.toDouble / 20 * 10000) / 10000)
  }

  test("dedupSavings: layer ordering laws and the shared denominator on harness data") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.dedupSavings(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val tokTotal = got("doc")._2
    assert(got.values.forall(_._2 == tokTotal),
      "the CDC chunker partitions the token stream: one denominator for all layers")
    assert(got("doc")._3 <= got("chunk")._3,
      "identical docs share all chunks — chunk savings dominate doc savings")
    assert(got("doc")._3 <= got("cluster")._3,
      "identical texts collide in SimHash — cluster savings dominate doc savings")
    assert(got("cluster")._3 > 0L,
      "the corpus carries near-dup clusters, so the cluster layer reclaims something")
  }

  test("qualityAuc (x150): ties credit half; hand-derived from a constructed ordering") {
    // dup pair {1,2}: identical "p q r s" -> quality 0.808 exactly;
    // neg 3 "x y z w" has the SAME stats (ttr 1, stop 0, n 4) -> an
    // exact double tie with every positive; neg 4 "the the the the"
    // (ttr .25, stop 1) sits strictly below. Per positive:
    // 2*1 below + 1 tied = 3 -> u2 = 6, auc = 6/(2*2*2) = 0.75
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "p q r s", 2L -> "p q r s",
      3L -> "x y z w", 4L -> "the the the the"))
    val r = Curation.qualityAuc(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((2L, 2L, 6L, 0.75)))
  }

  test("qualityAuc: bucketed scan equals the naive rank-sum on harness data; bucket-invariant") {
    val dir = "/root/testdata/sf0.001"
    val dup = graft.operators.Dedup.dupDegree(spark, dir).collect().map(_.getLong(0)).toSet
    val qs = graft.operators.TextAnalysis.statsProjection(spark, dir)
      .select("doc_id", "quality").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val pos = qs.filter(x => dup.contains(x._1)).map(_._2)
    val neg = qs.filter(x => !dup.contains(x._1)).map(_._2)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = (pos.length.toLong, neg.length.toLong, u2,
      math.rint(u2.toDouble / (2.0 * pos.length * neg.length) * 10000) / 10000)
    val r = Curation.qualityAuc(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) == expected,
      "the two-level class scan must equal the all-pairs comparison exactly")
    // the bucket count is an internal partitioning choice, never a result knob
    val coarse = Curation.qualityAuc(spark, dir, buckets = 7).collect().head
    assert((coarse.getLong(0), coarse.getLong(1), coarse.getLong(2), coarse.getDouble(3)) == expected)
  }

  test("repPolicyDivergence (x152): identical copies tie both policies to the canonical") {
    // identical texts -> identical quality -> the quality argmax tie
    // breaks to the LOWEST id, which IS the canonical: policies agree
    // with zero gap and zero mass delta
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "the quick brown fox jumps over the lazy dog again today",
      3L -> "completely unrelated content about something else entirely"))
    val rows = Curation.repPolicyDivergence(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
      r.getDouble(4), r.getLong(5)) == ((1L, 2L, 1L, true, 0.0, 0L)))
  }

  test("repPolicyDivergence: equals the driver-side argmax on harness data; gap never negative") {
    val dir = "/root/testdata/sf0.001"
    val members = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val q = graft.operators.TextAnalysis.statsProjection(spark, dir)
      .select("doc_id", "quality", "n_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val expected = members.groupBy(_._2).map { case (cluster, ms) =>
      val ids = ms.map(_._1)
      val pick = ids.maxBy(id => (q(id)._1, -id))
      cluster -> ((ids.length.toLong, pick, pick == cluster,
        math.rint((q(pick)._1 - q(cluster)._1) * 10000) / 10000,
        q(pick)._2 - q(cluster)._2))
    }
    val got = Curation.repPolicyDivergence(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(got == expected, "the struct-max must equal the per-cluster argmax exactly")
    got.values.foreach { case (_, _, same, gap, delta) =>
      assert(gap >= 0.0, "the quality pick can never be worse than the canonical")
      if (same) assert(gap == 0.0 && delta == 0L)
    }
  }

  test("incrementalClusters (x155): merging the delta over tight star edges IS the batch answer") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.incrementalClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val full = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == full,
      "the incremental merge must reproduce the one-shot <=4 clustering bit-for-bit")
    // the tight labels are the genuine sub-clustering: every tight label
    // is <= the merged label's member set (containment via label lookup)
    val tight = graft.operators.Graph.connectedComponents(
      graft.operators.Dedup.simhashNearDupPairs(spark, dir)
        .filter(org.apache.spark.sql.functions.col("hamming") <= 2)
        .select("d1", "d2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (d, (c, ct, newly, rel)) =>
      assert(newly == !tight.contains(d), s"doc $d newly_clustered flag")
      assert(ct == tight.getOrElse(d, -1L), s"doc $d tight label")
      assert(rel == (tight.getOrElse(d, d) != c), s"doc $d relabeled flag")
    }
    // the fixture must exercise the interesting rows, or the law is vacuous:
    // docs entering via the delta exist at sf0.001 (h∈(2,4] pairs), and the
    // tight sub-clustering is non-trivial (some docs ARE tight-clustered);
    // tight-cluster RELABELING needs a delta edge to a lower id, which this
    // fixture happens not to produce — the 10x law test covers that path
    assert(got.values.exists(_._3), "some doc enters clustering only via the delta")
    assert(got.values.exists(v => !v._3), "some doc was already tight-clustered")
  }

  test("canonicalDistance (x157): hops match a driver-side BFS; canonicals at 0, members total") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val labels = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: BFS from each canonical over the collected adjacency
    val expected = labels.values.toSeq.distinct.flatMap { canon =>
      var dist = Map(canon -> 0L)
      var frontier = Set(canon)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> (dist(frontier.head) + 1L)) // frontier is one ring: all equal
        frontier = next
      }
      dist
    }.toMap
    val got = Curation.canonicalDistance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == labels.keySet, "one row per clustered doc, none lost")
    got.foreach { case (d, c, h) =>
      assert(c == labels(d))
      assert(h == expected(d), s"doc $d hops $h vs reference ${expected(d)}")
      if (d == c) assert(h == 0L)
    }
    assert(got.exists(_._3 >= 2L), "the fixture must carry at least one chain-stitched member")
  }

  test("trustRank (x159): seeds are the quality keepers in-graph; seedless clusters rank zero") {
    val dir = "/root/testdata/sf0.001"
    val got = Curation.trustRank(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getLong(3)))).toMap
    val keep = Curation.qualityGate(spark, dir).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    val labels = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == labels.keySet, "rank covers exactly the graph nodes")
    got.foreach { case (d, (isSeed, rank)) =>
      assert(isSeed == keep.contains(d), s"doc $d seed flag")
      assert(rank >= 0L)
    }
    assert(got.values.exists(_._1) && got.values.exists(!_._1),
      "the fixture must carry a seed/non-seed mix")
    // trust is conserved within components: a cluster with no seed holds
    // rank 0 everywhere; a cluster with any seed holds positive mass
    labels.groupBy(_._2).foreach { case (cluster, ms) =>
      val members = ms.keys.toSeq
      val hasSeed = members.exists(keep.contains)
      val mass = members.map(d => got(d)._2).sum
      if (hasSeed) assert(mass > 0L, s"seeded cluster $cluster must carry trust mass")
      else assert(members.forall(d => got(d)._2 == 0L),
        s"seedless cluster $cluster must rank 0 — trust cannot teleport in")
    }
  }

  test("clusterSplit (x160): cluster policy leaks zero; doc policy agrees with x21/x66") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.clusterSplit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (doc, clu) = (rows.filter(_._1._1 == "doc"), rows.filter(_._1._1 == "cluster"))
    // the output law: cluster-keyed assignment cannot straddle a pair
    clu.foreach { case ((_, s), (_, _, _, leaks)) =>
      assert(leaks == 0L, s"cluster policy must leak zero in split $s")
    }
    // doc-policy totals reconcile with the independent x66 audit (each
    // straddling pair counts once at each end) and the x21 distribution
    val leakPairs = Curation.splitLeakage(spark, dir).count()
    assert(doc.values.map(_._4).sum == 2L * leakPairs)
    val x21 = Curation.hashSplit(spark, dir).collect()
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    doc.foreach { case ((_, s), (n, _, _, _)) => assert(n == x21(s), s"split $s docs") }
    // both policies partition the same corpus; the moved set is shared
    val total = Curation.qualityGate(spark, dir).count()
    assert(doc.values.map(_._1).sum == total && clu.values.map(_._1).sum == total)
    assert(doc.values.map(_._3).sum == clu.values.map(_._3).sum,
      "moved docs are the same set counted under either policy's splits")
    assert(doc.values.map(_._3).sum > 0L,
      "the fixture must carry at least one co-assignment move or the audit is vacuous")
  }

  test("sourceCommunities (x161): matches a driver-side synchronous LPA reference") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.simhashNearDupPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    val src = graft.operators.Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lab = nbrs.keys.map(n => n -> src(n)).toMap
    for (_ <- 1 to 4) lab = nbrs.map { case (n, vs) =>
      n -> vs.groupBy(lab).view.mapValues(_.size).toSeq
        .sortBy { case (l, c) => (-c, l) }.head._1
    }
    val got = Curation.sourceCommunities(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(got.keySet == nbrs.keySet, "communities cover exactly the graph nodes")
    got.foreach { case (d, (seed, community, changed)) =>
      assert(seed == src(d))
      assert(community == lab(d), s"doc $d community")
      assert(changed == (community != seed))
    }
    assert(got.values.exists(_._3), "the fixture must carry at least one flipped doc")
  }

  test("semanticClusters (x162): census matches a driver-side union-find reference") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.operators.Tables.embeddings(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def bucket(e: Array[Float]): Int =
      (if (e(0) >= 0) 1 else 0) + (if (e(1) >= 0) 2 else 0)
    val pairs = for {
      a <- emb; b <- emb
      if a._1 < b._1 && bucket(a._2) == bucket(b._2) && dot(a._2, b._2) >= 0.4
    } yield (a._1, b._1)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val labelOf = emb.map(e => e._1 -> e._3).toMap
    val expected = nodes.groupBy(find).map { case (root, ms) =>
      val byLabel = ms.groupBy(labelOf).view.mapValues(_.length).toMap
      val (majL, majC) = byLabel.toSeq.sortBy { case (l, c) => (-c, l) }.head
      root -> ((ms.length.toLong, byLabel.size.toLong, majL,
        math.rint(majC.toDouble / ms.length * 10000) / 10000))
    }
    val got = Curation.semanticClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.exists(_._1 >= 2L),
      "the fixture must carry at least one multi-member semantic cluster")
  }

  test("curationFunnel (x163): stage masses reconcile with x19/x29; fractions exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.curationFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(s => (s._1, s._2)).toSeq ==
      Seq((1, "raw"), (2, "quality"), (3, "dedup"), (4, "train")))
    // cumulative stages only shed mass
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._2} must not grow")
    }
    // reconciliation against the per-doc relations the stages are built from
    val gate = Curation.qualityGate(spark, dir).collect()
    assert(rows(0)._3 == gate.length)
    assert(rows(1)._3 == gate.count(_.getAs[Boolean]("keep")))
    assert(rows(3)._3 == Curation.curatedCorpus(spark, dir).count(),
      "stage 4 IS x29 as a count")
    // fraction arithmetic is the stated rounding of the stage ratios
    rows.foreach { r =>
      assert(r._5 == math.rint(r._3.toDouble / rows(0)._3 * 10000) / 10000)
      assert(r._6 == math.rint(r._4.toDouble / rows(0)._4 * 10000) / 10000)
    }
    assert(rows(3)._3 > 0L, "the fixture must yield a non-empty train stage")
  }

  test("mixtureTemperature (x164): matches a driver-side reference; flattening laws") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.operators.Tables.documents(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text").split(" ").length.toLong))
    val census = docs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val tot = census.values.map(_._2).sum.toDouble
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val expected = Seq(100, 50, 25).flatMap { a =>
      val ws = census.toSeq.sortBy(_._1).map { case (src, (_, nt)) =>
        val share = nt / tot
        val w = a match {
          case 100 => share
          case 50  => math.sqrt(share)
          case 25  => math.sqrt(math.sqrt(share))
        }
        (src, share, w)
      }
      val z = ws.map(_._3).sum
      ws.map { case (src, share, w) =>
        (a, src) -> ((census(src)._1, census(src)._2, r4(share), r4(w / z), r4(w / z / share)))
      }
    }.toMap
    val got = Curation.mixtureTemperature(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (nd, nt, sh, w, b)) =>
      val (end, ent, esh, ew, eb) = expected(k)
      assert(nd == end && nt == ent, s"$k census")
      assert(sh == esh, s"$k share")
      // the normalizer is a float sum whose fold order the engines don't
      // share — allow one rounding quantum on the two normalized columns
      assert(math.abs(w - ew) <= 1e-4 + 1e-12, s"$k weight: $w vs $ew")
      assert(math.abs(b - eb) <= 2e-4 + 1e-12, s"$k boost")
    }
    // at alpha=100 the weight IS the share; lower alpha boosts the tail
    got.filter(_._1._1 == 100).foreach { case (k, v) =>
      assert(math.abs(v._4 - v._3) <= 1e-4, s"$k natural weight equals share")
    }
    val minSrc = census.minBy(_._2._2)._1
    val boosts = Seq(100, 50, 25).map(a => got((a, minSrc))._5)
    assert(boosts == boosts.sorted,
      s"the rarest source's boost must grow as alpha falls: $boosts")
    // a duplicated alpha would double its rows into the normalizer z,
    // silently halving weight/boost — refused loudly instead
    val dupErr = intercept[IllegalArgumentException](
      Curation.mixtureTemperature(spark, dir, Seq(50, 50)))
    assert(dupErr.getMessage.contains("duplicates"))
  }

  test("sourcePairMatrix (x165): cells reconcile with the raw pair relation exactly") {
    val dir = "/root/testdata/sf0.001"
    val src = graft.operators.Tables.documents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pairs = graft.operators.Dedup.simhashNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("hamming")))
    val expected = pairs.groupBy { case (d1, d2, _) =>
      val (s1, s2) = (src(d1), src(d2))
      (if (s1 <= s2) s1 else s2, if (s1 <= s2) s2 else s1)
    }.view.mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val got = Curation.sourcePairMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet)
    val tot = pairs.length.toDouble
    got.foreach { case (k, (n, h, share)) =>
      assert((n, h) == expected(k), s"cell $k")
      assert(share == math.rint(n / tot * 10000) / 10000, s"cell $k share")
    }
    assert(got.keys.exists(k => k._1 == k._2) && got.keys.exists(k => k._1 != k._2),
      "the fixture must carry both within-source and cross-source cells")
  }

  test("semanticThresholdSweep (x166): matches a driver-side sweep; recall only falls") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.operators.Tables.embeddings(spark, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def bucket(e: Array[Float]): Int =
      (if (e(0) >= 0) 1 else 0) + (if (e(1) >= 0) 2 else 0)
    val pairs = for {
      a <- emb; b <- emb
      if a._1 < b._1 && bucket(a._2) == bucket(b._2)
      s = dot(a._2, b._2) if s >= 0.4
    } yield (s, a._3 == b._3)
    val expected = Seq(40, 50, 60, 70).map { t =>
      val surv = pairs.filter(_._1 >= t / 100.0)
      val same = surv.count(_._2).toLong
      t -> ((surv.length.toLong, same,
        if (surv.isEmpty) null
        else java.lang.Double.valueOf(math.rint(same.toDouble / surv.length * 10000) / 10000)))
    }.toMap
    val got = Curation.semanticThresholdSweep(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))).toMap
    assert(got == expected)
    val ns = Seq(40, 50, 60, 70).map(got(_)._1)
    assert(ns == ns.sorted.reverse, s"surviving pairs must fall as tau rises: $ns")
    assert(ns.head > 0L, "the fixture must carry pairs at the loosest threshold")
  }

  test("cluster index (EXT-C55): persisted labels bit-equal to the in-memory contraction") {
    val dir = "/root/testdata/sf0.001"
    val idx = "/tmp/graft-test-cluster-index"
    Curation.writeClusterIndex(spark, dir, idx)
    val want = Curation.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Curation.clustersFromIndex(spark, idx, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty && got == want)
    // the heavy consumer: x47's representatives served from the index,
    // row-for-row equal to the contraction-paying form
    val wantReps = Curation.clusterRepresentatives(spark, dir).collect().map(_.toSeq).toSeq
    val gotReps = Curation.clusterRepresentativesFromIndex(spark, idx, dir)
      .collect().map(_.toSeq).toSeq
    assert(gotReps == wantReps)
    // two more heavy consumers adopted (r13 verdict ask #3): the size
    // histogram (x121) and the purity audit (x129) served from the index
    val wantSizes = Curation.clusterSizes(spark, dir).collect().map(_.toSeq).toSeq
    val gotSizes = Curation.clusterSizesFromIndex(spark, idx, dir).collect().map(_.toSeq).toSeq
    assert(gotSizes == wantSizes && wantSizes.nonEmpty)
    val wantPurity = Curation.clusterPurity(spark, dir).collect().map(_.toSeq).toSeq
    val gotPurity = Curation.clusterPurityFromIndex(spark, idx, dir).collect().map(_.toSeq).toSeq
    assert(gotPurity == wantPurity && wantPurity.nonEmpty)
  }

  test("cluster index: membership probe resolves canonical ids, unclustered docs to themselves") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val idx = "/tmp/graft-test-cluster-index" // written by the previous test
    Curation.writeClusterIndex(spark, dir, idx) // idempotent rebuild (order independence)
    val members = Curation.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val someClustered = members.keys.toSeq.sorted.take(3)
    val unclustered = (0L until 5000L).find(d => !members.contains(d)).get
    val q = (someClustered :+ unclustered).toDF("doc_id")
    val got = Curation.lookupClustersFromIndex(spark, idx, q).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    someClustered.foreach(d => assert(got(d) == ((members(d), true))))
    assert(got(unclustered) == ((unclustered, false)),
      "a never-clustered doc is its own canonical")
  }

  test("cluster index: mismatched banding stamp and drifted corpus are refused loudly") {
    val dir = "/root/testdata/sf0.001"
    val idx = "/tmp/graft-test-cluster-index" // written above
    val bandErr = intercept[IllegalArgumentException](
      Curation.clustersFromIndex(spark, idx, dir, bands = 4))
    assert(bandErr.getMessage.contains("different banding"))
    // same parameters, different corpus: the identity stamp must refuse
    val other = TestTables.documentsDir(spark, Seq(
      1L -> (1 to 40).map(i => s"w$i").mkString(" ")))
    val driftErr = intercept[IllegalArgumentException](
      Curation.clustersFromIndex(spark, idx, other))
    assert(driftErr.getMessage.contains("corpus drifted"))
    val repsErr = intercept[IllegalArgumentException](
      Curation.clusterRepresentativesFromIndex(spark, idx, other))
    assert(repsErr.getMessage.contains("corpus drifted"))
    val sizesErr = intercept[IllegalArgumentException](
      Curation.clusterSizesFromIndex(spark, idx, other))
    assert(sizesErr.getMessage.contains("corpus drifted"))
    val purityErr = intercept[IllegalArgumentException](
      Curation.clusterPurityFromIndex(spark, idx, other))
    assert(purityErr.getMessage.contains("corpus drifted"))
    // CONTENT drift under STABLE doc_ids (a re-crawl that edits text —
    // which moves the SimHash clusters): same count, same id xor, but the
    // content term of the stamp must refuse
    def corpus(secondDoc: String) = Seq(
      1L -> (1 to 40).map(i => s"a$i").mkString(" "),
      2L -> secondDoc)
    val base = TestTables.documentsDir(spark, corpus((1 to 40).map(i => s"b$i").mkString(" ")))
    val idx2 = "/tmp/graft-test-cluster-index-content"
    Curation.writeClusterIndex(spark, base, idx2)
    val edited = TestTables.documentsDir(spark, corpus((1 to 40).map(i => s"c$i").mkString(" ")))
    val contentErr = intercept[IllegalArgumentException](
      Curation.clustersFromIndex(spark, idx2, edited))
    assert(contentErr.getMessage.contains("corpus drifted"))
    // and the unedited corpus still reads back fine
    assert(Curation.clustersFromIndex(spark, idx2, base).collect() != null)
  }

  test("epochAllocation (x167): matches a driver-side reference; budget laws hold") {
    val dir = "/root/testdata/sf0.001"
    val budget = 4000000L
    val docs = graft.operators.Tables.documents(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text").split(" ").length.toLong))
    val census = docs.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val tot = census.values.map(_._2).sum
    def r4(x: Double) = math.rint(x * 10000) / 10000
    val got = Curation.epochAllocation(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(got.keySet == census.keySet)
    got.foreach { case (src, (nd, nt, alloc, epF, eff, left, ep4, util4)) =>
      val (end, ent) = census(src)
      assert(nd == end && nt == ent, s"$src census")
      assert(alloc == math.floor((budget * ent).toDouble / tot).toLong, s"$src alloc")
      assert(epF == math.min(alloc / ent, 4L), s"$src epochs_full")
      assert(eff == math.min(alloc, 4L * ent), s"$src effective")
      assert(left == alloc - eff && left >= 0L, s"$src leftover")
      assert(ep4 == r4(eff.toDouble / ent), s"$src epochs4")
      assert(util4 == (if (alloc == 0) 1.0 else r4(eff.toDouble / alloc)), s"$src util")
    }
    // the allocation never exceeds the budget (floor rounding only sheds)
    assert(got.values.map(_._3).sum <= budget)
    // a budget smaller than any source's mass allocates zero full epochs
    val tiny = Curation.epochAllocation(spark, dir, budget = census.size.toLong)
      .collect().map(_.getLong(4))
    assert(tiny.forall(_ == 0L))
  }

  test("contaminationKSweep (x168): k=5 row reconciles with contaminationScore; hits shrink as k grows") {
    val dir = "/root/testdata/sf0.001"
    val ref = Curation.contaminationScore(spark, dir, k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    val got = Curation.contaminationKSweep(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(3, 5, 7))
    val (nDocs, nHit, nFlag, sumG, sumS, rate) = got(5)
    assert(nDocs == ref.length)
    assert(nHit == ref.count(_._2 > 0))
    assert(nFlag == ref.count(_._3))
    assert(sumG == ref.map(_._1).sum && sumS == ref.map(_._2).sum)
    assert(rate == math.rint(nFlag.toDouble / nDocs * 10000) / 10000)
    // a shared k-gram contains shared (k-2)-grams, so the hit set can
    // only shrink as k grows (the law that makes the sweep a curve)
    assert(got(3)._2 >= got(5)._2 && got(5)._2 >= got(7)._2)
    assert(intercept[IllegalArgumentException](
      Curation.contaminationKSweep(spark, dir, ks = Seq(5, 5))).getMessage.contains("duplicates"))
  }

  test("semanticSplitLeakage (x171): exactly the cross-split subset of the cosine pairs") {
    val dir = "/root/testdata/sf0.001"
    val splits = Curation.hashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = graft.operators.Similarity.cosineNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs.flatMap { case (v1, v2, sim4) =>
      val (s1, s2) = (splits(v1), splits(v2))
      if (s1 != s2) Some((v1, v2, s1, s2, sim4)) else None
    }.sortBy(t => (t._1, t._2))
    val got = Curation.semanticSplitLeakage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getDouble(4)))
      .toSeq
    assert(got == expected.toSeq)
    assert(got.nonEmpty, "the harness corpus must exercise the leak relation")
    assert(got.forall { case (_, _, s1, s2, sim) => s1 != s2 && sim >= 0.4 })
  }

  test("qualityCalibration (x169): bins partition the corpus; dup mass reconciles with the label") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = graft.operators.Tables.documents(spark, dir).count()
    val nDup = graft.operators.Dedup.dupDegree(spark, dir).count()
    val rows = Curation.qualityCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).forall(b => b >= 0L && b <= 9L))
    assert(rows.map(_._3).sum == nDocs, "bins must partition the corpus")
    assert(rows.map(_._4).sum == nDup, "dup mass must reconcile with the label")
    rows.foreach { case (bin, lo, n, d, rate) =>
      assert(lo == bin / 10.0)
      assert(d <= n)
      assert(rate == math.rint(d.toDouble / n * 10000) / 10000)
    }
    // differential: one bin recomputed from the raw projections
    val q = graft.operators.TextAnalysis.statsProjection(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val dup = graft.operators.Dedup.dupDegree(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val someBin = rows.head._1
    val inBin = q.filter { case (_, qu) => math.min(math.floor(qu * 10), 9.0).toLong == someBin }
    assert(rows.head._3 == inBin.size)
    assert(rows.head._4 == inBin.keys.count(dup))
  }

}
