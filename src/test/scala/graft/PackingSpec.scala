package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Context-window chunking and sequence packing (SURVEY.md EXT-P3/P4). */
class PackingSpec extends AnyFunSuite with SparkSuite {

  test("chunkDocuments: stride-overlapped windows with clamped tails") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> (1 to 25).map(i => s"t$i").mkString(" "), // 25 tokens
      2L -> "a b c d e"))                             // shorter than one chunk
    val rows = Packing.chunkDocuments(spark, dir, chunkSize = 20, stride = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.filter(_._1 == 1L).toSeq ==
      Seq((1L, 1L, 20L), (1L, 11L, 15L), (1L, 21L, 5L)))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 5L)))
  }

  test("chunkDocuments: identical token windows get identical digests") {
    val common = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> common, 2L -> common, 3L -> (1 to 20).map(i => s"z$i").mkString(" ")))
    val digests = Packing.chunkDocuments(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(digests(1L) == digests(2L))
    assert(digests(1L) != digests(3L))
  }

  test("packSequences: docs binned by start offset of the per-lang running sum") {
    // 3 docs x 300 tokens: start offsets 0, 300, 600 -> bins 0, 0, 1 at 512
    val doc = (1 to 300).map(i => s"t$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(1L -> doc, 2L -> doc, 3L -> doc))
    val bins = Packing.packSequences(spark, dir, budgetTokens = 512).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.toSeq == Seq(("en", 0L, 2L, 600L), ("en", 1L, 1L, 300L)))
  }

  test("budgetSweep: exact pad/truncate and concat-cut costs at one budget") {
    // toks 5, 10, 3 (one lang); budget 8. Start offsets 0, 5, 15.
    // doc2 spans bins 0|1, doc3 spans bins 1|2 -> 2 split docs.
    // Pads: 3 + 0 + 5 = 8; truncs: 0 + 2 + 0 = 2; used: 5 + 8 + 3 = 16.
    // tot 18 -> 3 bins of 8, tail waste 6; util_packed 18/24.
    def toks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> toks(5, "a"), 2L -> toks(10, "b"), 3L -> toks(3, "c")))
    val got = Packing.budgetSweep(spark, dir, budgets = Seq(8L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8)))
    assert(got.toSeq == Seq((8L, 3L, 8L, 2L, 16.0 / 24.0, 2L, 3L, 6L, 18.0 / 24.0)))
  }

  test("budgetSweep: per-lang packing never splits across langs; sweep rows are per budget") {
    // two langs of 6 tokens each at budget 4: each lang packs alone into
    // 2 bins (tail 2), so n_bins = 4, tail_waste = 4 — a cross-lang
    // concat (12 tokens -> 3 bins) would report 3/0 instead
    def toks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val dir = TestTables.documentsLangDir(spark, Seq(
      (1L, toks(6, "a"), "en"), (2L, toks(6, "b"), "de")))
    val got = Packing.budgetSweep(spark, dir, budgets = Seq(4L, 16L)).collect()
      .map(r => (r.getLong(0), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq((4L, 4L, 4L), (16L, 2L, 20L)))
  }

  test("budgetSweep: conservation laws hold on a generated corpus at every budget") {
    // deterministic pseudo-random corpus: 60 docs, 3 langs, 1-40 tokens
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { id =>
      val lang = Seq("en", "de", "zh")(rnd.nextInt(3))
      (id, (1 to 1 + rnd.nextInt(40)).map(i => s"t$i").mkString(" "), lang)
    }
    val dir = TestTables.documentsLangDir(spark, docs)
    val rows = Packing.budgetSweep(spark, dir, budgets = Seq(1L, 7L, 32L, 1000L)).collect()
    assert(rows.length == 4)
    val totalTok = docs.map(_._2.split(" ").length.toLong).sum
    rows.foreach { r =>
      val (budget, nDocs, pad, trunc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (util1, nSplit, nBins, tail, utilP) =
        (r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8))
      assert(nDocs == 60L)
      // one-doc regime: used = Σ min(tok,L) ⇒ pad + used = n_docs·L and
      // used + trunc = Σtok — both recoverable from the emitted columns
      val used = nDocs * budget - pad
      assert(used + trunc == totalTok, s"budget $budget")
      assert(util1 == used.toDouble / (nDocs * budget))
      // packed regime: bins cover exactly Σtok + tail_waste tokens
      assert(nBins * budget == totalTok + tail, s"budget $budget")
      assert(utilP == totalTok.toDouble / (nBins * budget))
      assert(nSplit >= 0L && nSplit <= nDocs)
      // degenerate budgets: L=1 pads nothing and splits every doc with
      // tok ≥ 2; L=1000 holds every lang in one bin and splits nothing
      if (budget == 1L) assert(pad == 0L && trunc == totalTok - nDocs)
      if (budget == 1000L) assert(nSplit == 0L && trunc == 0L && nBins == 3L)
    }
  }

  test("semanticPacking (x100): per-cell bins match an independent pack model over the trained assignment") {
    // 24 docs with varying token counts; 24 matching 64-dim vectors
    val docs = (0L until 24L).map { i =>
      (i, (0 until (5 + (i % 7)).toInt).map(j => s"d${i}w$j").mkString(" "))
    }
    val vecs = (0L until 24L).map { i =>
      // two loose families so the trained cells are non-trivial
      val base = Array.fill(64)(0.0f)
      base((i % 4).toInt) = 1.0f
      base(((i % 4) + 32).toInt) = if (i % 2 == 0) 0.5f else -0.5f
      (i, base.toSeq)
    }
    val dir = TestTables.corpusDir(spark, docs, vecs)
    val budget = 16L

    val got = Packing.semanticPacking(spark, dir, budget, exactMeans = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

    // reference: the production cell assignment (independently specced in
    // SimilaritySpec) + an independent Scala spelling of the pack
    val cells = graft.operators.Similarity
      .centroidSimProjection(spark, dir, exactMeans = true)
      .selectExpr("CAST(vec_id AS LONG) AS vec_id", "CAST(cell AS LONG) AS cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val ref = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    cells.groupBy(_._2).foreach { case (cell, members) =>
      var cum = 0L
      members.keys.toSeq.sorted.foreach { id =>
        val bin = cum / budget
        val (n, t) = ref.getOrElse((cell, bin), (0L, 0L))
        ref((cell, bin)) = (n + 1, t + toks(id))
        cum += toks(id)
      }
    }
    assert(got == ref.toMap)
    // structural laws: bins are contiguous from 0 per cell; every doc
    // with an embedding lands in exactly one bin
    assert(got.map(_._2._1).sum == 24L)
    got.keys.groupBy(_._1).foreach { case (_, bins) =>
      val ids = bins.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.length.toLong))
    }

    // plan: the cell window is partitioned (never a global sort of the
    // corpus), the token⋈cell join stays equi, nothing goes cartesian
    // (AQE off for the build: AdaptiveSparkPlanExec hides children from
    // collect until finalized)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try Packing.semanticPacking(spark, dir, budget, exactMeans = true)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, p.toString)
    val wins = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty &&
      wins.forall(_.partitionSpec.nonEmpty),
      s"the running sum must window PER CELL, never globally:\n$p")
  }

  test("packBleed (x117): closed-form per-doc bleed, fresh-bin docs never bleed") {
    // toks 5, 10, 3 (one lang); budget 8 -> starts 0, 5, 15; s_b 0, 5, 7;
    // first-segment lengths 5, 3, 1. At W=4: bleed 0, min(3,3)=3, min(1,3)=1;
    // at W=16 the W-1 cap stops binding: 0, 3, 1 (len1-capped) — same total
    def toks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> toks(5, "a"), 2L -> toks(10, "b"), 3L -> toks(3, "c")))
    val got = Packing.packBleed(spark, dir, budgetTokens = 8L, windows = Seq(4L, 16L))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got((4L, "en")) == ((3L, 2L, 4L, 18L, 4.0 / 18.0)))
    assert(got((16L, "en")) == ((3L, 2L, 4L, 18L, 4.0 / 18.0)))
    assert(got.keySet == Set((4L, "en"), (16L, "en")))
  }

  test("packBleed: W=2 counts one boundary position per packed-against doc; sweep is per window") {
    // both docs of lang de fit bin 0 (2 + 3 <= 8): doc 5 starts at s_b=2,
    // so at W=2 exactly its first position sees doc 4's tail
    val dir = TestTables.documentsLangDir(spark, Seq(
      (4L, "x1 x2", "de"), (5L, "y1 y2 y3", "de")))
    val got = Packing.packBleed(spark, dir, budgetTokens = 8L, windows = Seq(2L, 64L))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got((2L, "de")) == ((1L, 1L)), "W=2: one bleeding doc, one position")
    assert(got((64L, "de")) == ((1L, 3L)), "W past the segment: the whole segment bleeds")
  }
}
