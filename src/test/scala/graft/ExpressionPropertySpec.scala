package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountInUtil, MinHashUtil, NgramStatsUtil, ShingleUtil, SimHashUtil}

/** Property tests pinning the custom codegen expressions against
  * independent straight-Scala reference implementations — the expression
  * utils are the highest-risk code in the library (hand-rolled byte/bit
  * arithmetic on the dedup hot path), and the DuckDB oracle only
  * exercises them on the harness corpus' value distribution.
  */
class ExpressionPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genTok: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""), Gen.const("的"),
      Gen.oneOf("the", "a", "data", "spark", "w7"))
  private val genToks: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, genTok))

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference for the oracle's top-60-bit truncation:
    * `('0x' || substr(md5(x), 1, 15))::UBIGINT`.
    */
  private def top60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("SimHashUtil matches a per-distinct-token weighted reference") {
    check(Prop.forAll(genToks) { toks =>
      val weights = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val sums = new Array[Long](60)
      for ((tok, w) <- weights; b <- 0 until 60)
        sums(b) += (if (((top60(tok) >> b) & 1L) == 1L) w else -w)
      val expected = (0 until 60).map(b => if (sums(b) > 0) 1L << b else 0L).sum
      SimHashUtil.simhash(arr(toks), 60) == expected
    })
  }

  test("MinHashUtil matches a per-seed min over md5-hex reference") {
    check(Prop.forAll(genToks) { toks =>
      val got = MinHashUtil.minhashes(arr(toks), 16)
      (0 until 16).forall { seed =>
        val expected =
          if (toks.isEmpty) Long.MaxValue
          else toks.map(t => top60(s"$seed:$t")).min
        got.getLong(seed) == expected
      }
    })
  }

  test("DupGramCoverageUtil matches a naive covered-position reference") {
    val genK = Gen.chooseNum(1, 4)
    check(Prop.forAll(genToks, genK) { (toks, k) =>
      val grams = toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toList
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      val covered = Array.fill(toks.size)(false)
      for ((g, i) <- grams.zipWithIndex if counts(g) >= 2; j <- i until i + k)
        covered(j) = true
      graft.functions.DupGramCoverageUtil.cov(arr(toks), k) ==
        covered.count(identity).toLong
    })
  }

  test("NgramStatsUtil matches naive k-gram multiset statistics") {
    val genK = Gen.chooseNum(1, 4)
    check(Prop.forAll(genToks, genK) { (toks, k) =>
      val grams = toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toList
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val row = NgramStatsUtil.stats(arr(toks), k)
      row.getLong(0) == grams.size.toLong &&
        row.getLong(1) == counts.size.toLong &&
        row.getLong(2) == (if (grams.isEmpty) 0L else counts.values.max.toLong)
    })
  }

  test("CharNgramUtil matches naive distinct code-point bigrams") {
    val genText = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(30)), Gen.const(""), Gen.const("a"),
      Gen.const("的是在有我"), Gen.const("mixed 的 ascii"),
      Gen.const(new String(Array(0x1F600, 0x61, 0x1F601), 0, 3))) // astral plane
    check(Prop.forAll(genText) { text =>
      val cps = text.codePoints().toArray
      val expected = (0 to cps.length - 2).map(i => new String(cps, i, 2)).distinct
      val got = graft.functions.CharNgramUtil.distinctGrams(
        UTF8String.fromString(text), 2)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
    })
  }

  test("IntersectSizeUtil matches distinct-intersection cardinality") {
    check(Prop.forAll(genToks, genToks) { (a, b) =>
      val expected = (a.distinct intersect b.distinct).size.toLong
      graft.functions.IntersectSizeUtil.intersectSize(arr(a), arr(b)) == expected
    })
  }

  test("CountInUtil matches instance-counting set membership") {
    val genWords: Gen[List[String]] = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, genTok))
    check(Prop.forAll(genToks, genWords) { (toks, words) =>
      val expected = toks.count(words.toSet).toLong
      val set = new java.util.HashSet[UTF8String]()
      words.foreach(w => set.add(UTF8String.fromString(w)))
      CountInUtil.countIn(arr(toks), set) == expected
    })
  }

  test("RollingHashUtil matches the naive code-point fold") {
    val genText = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(50)), Gen.const(""), Gen.const("的是在"),
      Gen.const(new String(Array(0x1F600, 0x62), 0, 2)))
    check(Prop.forAll(genText) { text =>
      val expected = text.codePoints().toArray
        .foldLeft(0L)((acc, cp) => (acc * 31 + cp) % 2147483647L)
      graft.functions.RollingHashUtil.hash(UTF8String.fromString(text)) == expected
    })
  }

  test("ShingleUtil matches naive distinct shingles in first-occurrence order") {
    check(Prop.forAll(genToks) { toks =>
      val expected = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toList.distinct
      val got = ShingleUtil.shingles(arr(toks), 3)
      (0 until got.numElements()).map(got.getUTF8String(_).toString).toList == expected
    })
  }

  test("WindowHashUtil matches per-window joined-string md5 top-60-bit reference") {
    check(Prop.forAll(genToks, Gen.chooseNum(1, 6)) { (toks, k) =>
      val expected = toks.sliding(k).filter(_.size == k)
        .map(w => top60(w.mkString(" "))).toList
      val got = graft.functions.WindowHashUtil.windowHashes(arr(toks), k)
      (0 until got.numElements()).map(got.getLong).toList == expected
    })
  }

  test("BloomHash.pos matches the SQL first-8-hex-chars derivation for any digest") {
    // the streaming probe's JVM spelling vs the batch operator's
    // conv(substring(md5("bf<i>:"+digest),1,8),16,10) % m — one drifted
    // bit here and a true duplicate could slip the streaming prefilter
    val genDigest = Gen.oneOf(
      Gen.listOfN(64, Gen.hexChar).map(_.mkString.toLowerCase),
      Gen.alphaNumStr.map(_.take(20)), Gen.const(""))
    val genI = Gen.chooseNum(0, 7)
    val genM = Gen.oneOf(64, 1024, 65536, 1 << 20)
    check(Prop.forAll(genDigest, genI, genM) { (digest, i, m) =>
      val expected = (java.lang.Long.parseLong(
        md5hex(s"bf$i:$digest").take(8), 16) % m).toInt
      graft.operators.Curation.BloomHash.pos(digest, i, m) == expected
    })
  }

  test("MmrGreedyUtil.picks matches a reference greedy MMR under the Catalyst double order") {
    // the r19 row-local kernel replaced k-1 driver-sequenced argmax
    // rounds; this pins the kernel against an independently-spelled
    // reference greedy (same λ arithmetic, (score, rel, -cid) argmax
    // with SQLOrderingUtil's double order), including the
    // fewer-than-k-candidates tail
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val genCand = for {
      cid <- Gen.chooseNum(0L, 6L) // small id space forces rel ties
      rel <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_ / 4.0), Gen.const(0.0), Gen.const(-0.0))
    } yield (cid, rel)
    val genCands = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, genCand).map(_.distinctBy(_._1)))
    val genK = Gen.chooseNum(1, 5)
    val genLam = Gen.oneOf(0, 30, 70, 100)
    check(Prop.forAll(genCands, genK, genLam) { (cands, k, lam) =>
      // complete symmetric pair sims, deterministic from the ids
      val sims = for {
        (c1, _) <- cands; (c2, _) <- cands if c1 != c2
      } yield (c1, c2, ((c1 * 31 + c2 * 17) % 7 - 3) / 3.0)
      val simMap = sims.map(s => (s._1, s._2) -> s._3).toMap
      def cmpD(x: Double, y: Double): Int =
        if (x == y) 0 else java.lang.Double.compare(x, y)
      // reference greedy, spelled independently
      var picked = List.empty[(Long, Double, Double)] // (cid, rel, score)
      var remaining = cands
      var r = 0
      while (r < k && remaining.nonEmpty) {
        val scored = remaining.map { case (cid, rel) =>
          val score =
            if (r == 0) lam.toDouble * rel / 100.0
            else {
              val msim = picked.map(p => simMap((cid, p._1))).reduce((a, b) =>
                if (cmpD(a, b) >= 0) a else b)
              (lam.toDouble * rel - (100 - lam).toDouble * msim) / 100.0
            }
          (cid, rel, score)
        }
        val best = scored.reduce { (a, b) =>
          val c1 = cmpD(a._3, b._3)
          if (c1 != 0) { if (c1 > 0) a else b }
          else {
            val c2 = cmpD(a._2, b._2)
            if (c2 != 0) { if (c2 > 0) a else b }
            else if (a._1 < b._1) a else b
          }
        }
        picked = picked :+ best
        remaining = remaining.filterNot(_._1 == best._1)
        r += 1
      }
      // kernel inputs as Catalyst rows
      val candArr = new GenericArrayData(cands.map { case (cid, rel) =>
        new GenericInternalRow(Array[Any](cid, rel))
      }.toArray[Any])
      val simArr =
        if (sims.isEmpty) null
        else new GenericArrayData(sims.map { case (c1, c2, s) =>
          new GenericInternalRow(Array[Any](c1, c2, s))
        }.toArray[Any])
      val got = graft.functions.MmrGreedyUtil.picks(candArr, simArr, k, lam)
      val gotList = (0 until got.numElements()).map { i =>
        val row = got.getStruct(i, 4)
        (row.getInt(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
      }.toList
      val expList = picked.zipWithIndex.map { case ((cid, rel, score), i) =>
        (i + 1, cid, rel, score)
      }
      gotList == expList
    })
  }
}
