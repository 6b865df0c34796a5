package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpaceSavingSummary

/** The SpaceSaving laws (Metwally et al. 2005) the streaming heavy-hitter
  * operator leans on — pinned directly on the summary so a regression
  * names the broken law, not a downstream rank mismatch.
  */
class SpaceSavingSpec extends AnyFunSuite {

  /** Deterministic skewed drive: heavy keys with given counts plus
    * `nSingles` distinct one-shot keys, interleaved by a seeded shuffle.
    */
  private def skewedDrive(heavy: Map[Long, Int], nSingles: Int): Seq[Long] = {
    val arrivals =
      heavy.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) } ++
        (1000L until (1000L + nSingles))
    new scala.util.Random(42).shuffle(arrivals)
  }

  test("estimates bracket the true count: true ∈ [count − err, count]") {
    val heavy = Map(1L -> 100, 2L -> 50, 3L -> 30)
    val drive = skewedDrive(heavy, nSingles = 400)
    val trueCounts = drive.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val s = new SpaceSavingSummary(32)
    drive.foreach(s.offer(_))
    assert(s.size <= 32)
    s.entries.foreach { case (key, count, err) =>
      val t = trueCounts(key)
      assert(t <= count, s"key $key: estimate $count undercounts true $t")
      assert(count - err <= t, s"key $key: err bound violated ($count - $err > $t)")
    }
  }

  test("no heavy hitter goes missing: every key above the summary minimum is monitored") {
    val heavy = Map(1L -> 100, 2L -> 50, 3L -> 30, 4L -> 20)
    val drive = skewedDrive(heavy, nSingles = 500)
    val s = new SpaceSavingSummary(64)
    drive.foreach(s.offer(_))
    val minCount = s.entries.map(_._2).min
    val monitored = s.entries.map(_._1).toSet
    val trueCounts = drive.groupBy(identity).view.mapValues(_.size.toLong).toMap
    trueCounts.foreach { case (key, t) =>
      if (t > minCount)
        assert(monitored.contains(key),
          s"key $key (true $t > min $minCount) must be monitored")
    }
    // and the top-k on this skewed drive is EXACT
    assert(s.topK(4).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("state is bounded by capacity regardless of distinct arrivals") {
    val s = new SpaceSavingSummary(64)
    (1L to 10000L).foreach(s.offer(_)) // 10k distinct keys
    assert(s.size == 64)
    assert(s.entries.length == 64)
  }

  test("fromEntries restore is exact: interrupted run equals uninterrupted run") {
    val drive = skewedDrive(Map(1L -> 40, 2L -> 25), nSingles = 200)
    val (a, b) = drive.splitAt(drive.length / 2)
    val whole = new SpaceSavingSummary(32)
    drive.foreach(whole.offer(_))
    val partial = new SpaceSavingSummary(32)
    a.foreach(partial.offer(_))
    val resumed = SpaceSavingSummary.fromEntries(32, partial.entries) // the state round-trip
    b.foreach(resumed.offer(_))
    assert(resumed.entries.sorted == whole.entries.sorted,
      "state persistence must not change what the summary computes")
  }

  test("eviction is deterministic: same drive, same summary") {
    val drive = skewedDrive(Map(1L -> 10), nSingles = 300)
    val s1 = new SpaceSavingSummary(16)
    val s2 = new SpaceSavingSummary(16)
    drive.foreach { k => s1.offer(k); s2.offer(k) }
    assert(s1.entries.sorted == s2.entries.sorted)
  }

  test("merge: laws survive ANY partitioning of the drive (flat and pairwise)") {
    val heavy = Map(1L -> 100, 2L -> 60, 3L -> 30)
    val drive = skewedDrive(heavy, nSingles = 300)
    val trueCounts = drive.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val nParts = 1 + rng.nextInt(8)
      val parts = drive.grouped(math.max(1, drive.length / nParts)).toSeq
      val partEntries = parts.map { p =>
        val s = new SpaceSavingSummary(32); p.foreach(s.offer(_)); s.entries
      }
      // flat merge (all parts at once) AND pairwise left fold — the
      // order Spark's final aggregate actually applies
      val flat = SpaceSavingSummary.merge(32, partEntries)
      val pairwise = partEntries.foldLeft(Seq.empty[(Long, Long, Long)]) {
        (acc, e) => SpaceSavingSummary.merge(32, Seq(acc, e))
      }
      for ((label, merged) <- Seq("flat" -> flat, "pairwise" -> pairwise)) {
        assert(merged.size <= 32)
        merged.foreach { case (k, c, e) =>
          val t = trueCounts.getOrElse(k, 0L)
          assert(t <= c && c - e <= t,
            s"trial $trial $label key $k: true $t outside [${c - e}, $c]")
        }
        // the implied-estimate law the batch audit leans on: a key the
        // truncation dropped has true count ≤ the minimum kept count
        val minKept = merged.map(_._2).min
        val kept = merged.map(_._1).toSet
        trueCounts.foreach { case (k, t) =>
          if (!kept.contains(k))
            assert(t <= minKept, s"trial $trial $label: dropped $k true $t > m* $minKept")
        }
        // the true heavy hitters head the merged summary
        assert(merged.sortBy { case (k, c, _) => (-c, k) }
          .take(2).map(_._1).toSet == Set(1L, 2L), s"trial $trial $label")
      }
    }
  }

  test("property sweep: laws hold for arbitrary drives, capacities, and partitionings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDrive: Gen[(Int, Int, Seq[Long])] = for {
      capacity <- Gen.chooseNum(1, 64)
      nParts <- Gen.chooseNum(1, 6)
      // Zipf-flavored arrivals: small keys frequent, long tail of singles
      keys <- Gen.nonEmptyListOf(Gen.frequency(
        5 -> Gen.chooseNum(1L, 5L),
        3 -> Gen.chooseNum(6L, 30L),
        2 -> Gen.chooseNum(31L, 500L)))
    } yield (capacity, nParts, keys)
    val prop = Prop.forAll(genDrive) { case (capacity, nParts, drive) =>
      val trueCounts = drive.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = drive.grouped(math.max(1, drive.length / nParts)).toSeq
      val partEntries = parts.map { p =>
        val s = new SpaceSavingSummary(capacity); p.foreach(s.offer(_)); s.entries
      }
      val merged = SpaceSavingSummary.merge(capacity, partEntries)
      val bracketing = merged.forall { case (k, c, e) =>
        val t = trueCounts.getOrElse(k, 0L)
        t <= c && c - e <= t
      }
      val bounded = merged.size <= capacity
      val kept = merged.map(_._1).toSet
      val minKept = if (merged.isEmpty) 0L else merged.map(_._2).min
      val droppedLaw = trueCounts.forall { case (k, t) =>
        kept.contains(k) || t <= minKept
      }
      bracketing && bounded && droppedLaw
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("weighted offers accumulate like repeated singles") {
    val s1 = new SpaceSavingSummary(8)
    val s2 = new SpaceSavingSummary(8)
    Seq(5L, 5L, 5L, 6L).foreach(s1.offer(_))
    s2.offer(5L, 3L); s2.offer(6L)
    assert(s1.entries.sorted == s2.entries.sorted)
  }
}
