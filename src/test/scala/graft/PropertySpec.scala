package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ReplicatorConfig
import graft.functions.KafkaMurmur2
import graft.model.{KafkaMessage, MessageHeader}
import graft.streaming.Pipeline

/** Property-based invariants (SURVEY.md §5.4): byte-exact envelope
  * round-trip — the core correctness property of a replicator — plus
  * prefix-routing laws and partitioner bounds.
  */
class PropertySpec extends AnyFunSuite with SparkSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge
    * in the offline cache): thrown assertions count as failures.
    */
  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.oneOf(
      Gen.const(null.asInstanceOf[Array[Byte]]),
      Gen.const(Array.empty[Byte]),
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val genHeader: Gen[MessageHeader] = for {
    k <- Gen.oneOf("h", "trace", "", "dup")
    v <- Gen.oneOf(Gen.const(Array.empty[Byte]),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
  } yield MessageHeader(k, v)

  private val genMsg: Gen[KafkaMessage] = for {
    topic <- Gen.oneOf("t1", "app.events", "_internal")
    partition <- Gen.chooseNum(0, 31)
    offset <- Gen.chooseNum(0L, Long.MaxValue / 2)
    tsMs <- Gen.chooseNum(0L, 4102444800000L)
    key <- genBytes
    value <- genBytes
    headers <- Gen.listOfN(3, genHeader).map(_.toArray) // duplicate keys legal
  } yield KafkaMessage(topic, partition, offset, new java.sql.Timestamp(tsMs),
    key, value, headers)

  test("envelope round-trips byte-exactly through the identity pipeline") {
    check(Prop.forAll(Gen.listOfN(8, genMsg)) { msgs =>
      val out = KafkaMessage.toDS(
        Pipeline.transform(KafkaMessage.toDF(spark, msgs), preservePartitioning = true))
        .collect().sortBy(_.offset)
      val exp = msgs.sortBy(_.offset)
      assert(out.length == exp.length)
      out.zip(exp).foreach { case (a, e) =>
        assert(a.topic == e.topic && a.partition == e.partition && a.offset == e.offset)
        assert(a.timestamp == e.timestamp)
        assert(java.util.Arrays.equals(a.key, e.key))
        assert(java.util.Arrays.equals(a.value, e.value))
        assert(a.headers.length == e.headers.length)
        a.headers.zip(e.headers).foreach { case (ah, eh) =>
          assert(ah.key == eh.key && java.util.Arrays.equals(ah.value, eh.value))
        }
      }
      true
    })
  }

  test("prefix routing: consumer.* and producer.* never cross (A5)") {
    val genProps = Gen.mapOf(Gen.zip(
      Gen.identifier.map(_.take(8)), Gen.identifier.map(_.take(8))))
    check(Prop.forAll(genProps, genProps) { (cProps, pProps) =>
      val args = Seq("--topics", "t",
        "--consumer.bootstrap.servers", "s:9092", "--consumer.group.id", "g",
        "--producer.bootstrap.servers", "d:9092") ++
        cProps.flatMap { case (k, v) => Seq(s"--consumer.x$k", v) } ++
        pProps.flatMap { case (k, v) => Seq(s"--producer.y$k", v) }
      val cfg = ReplicatorConfig.fromArgs(args).toOption.get
      cProps.foreach { case (k, v) => assert(cfg.consumerProps(s"x$k") == v) }
      pProps.foreach { case (k, v) => assert(cfg.producerProps(s"y$k") == v) }
      assert(cfg.consumerProps.keySet.intersect(cfg.producerProps.keySet)
        .forall(k => Set("bootstrap.servers").contains(k) || cProps.contains(k.drop(1)) == pProps.contains(k.drop(1))))
      // nothing routed to producer starts with a consumer-only marker
      assert(!cfg.producerProps.contains("group.id"))
      true
    })
  }

  test("quote substitution applies to every arg (A1)") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf("plain", "<<quoted>>", "a<<b>>c"))) { raw =>
      val out = ReplicatorConfig.preprocessArgs(raw)
      out.foreach { s => assert(!s.contains("<<") && !s.contains(">>")) }
      assert(out.map(_.count(_ == '"')) == raw.map(s => s.sliding(2).count(w => w == "<<" || w == ">>")))
      true
    })
  }

  test("kafka partitioner: in range and deterministic for any key bytes") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.chooseNum(1, 64)) { (key, n) =>
      val p = KafkaMurmur2.partitionFor(key, n)
      assert(p >= 0 && p < n)
      assert(p == KafkaMurmur2.partitionFor(key, n))
      true
    })
  }

  test("TopKAggregator: any 2-way partition split merges to the sorted-take-k reference") {
    import graft.functions.{TopKAggregator, TopKEntry}
    // narrow value ranges FORCE sim ties (exercising the cid tie-break)
    // and repeated (sim, cid) pairs (duplicates are kept, not deduped)
    val genEntry = for {
      sim <- Gen.chooseNum(-30, 30).map(_ / 10.0)
      cid <- Gen.chooseNum(0L, 20L)
    } yield TopKEntry(sim, cid)
    val gen = for {
      k <- Gen.chooseNum(1, 6)
      n <- Gen.chooseNum(0, 60)
      entries <- Gen.listOfN(n, genEntry)
      cut <- Gen.chooseNum(0, n)
    } yield (k, entries, cut)
    check(Prop.forAll(gen) { case (k, entries, cut) =>
      val agg = new TopKAggregator(k)
      def fold(es: Seq[TopKEntry]) = es.foldLeft(agg.zero)((b, e) => agg.reduce(b, e))
      val (l, r) = entries.splitAt(cut)
      val merged = agg.finish(agg.merge(fold(l), fold(r))).entries
      val direct = agg.finish(fold(entries)).entries
      // the law every query relies on: partial-agg over ANY partition
      // split == the row_number-window (sort + take k) spelling
      val ref = entries.sortBy(e => (-e.sim, e.cid)).take(k)
      assert(merged == ref, s"merged=$merged ref=$ref")
      assert(direct == ref, s"direct=$direct ref=$ref")
      true
    }, n = 200)
  }

  test("winnowing laws: planted-copy guarantee, subset of gram hashes, density bound") {
    val genTok = Gen.chooseNum(0, 25).map(i => s"t$i")
    val gen = for {
      k <- Gen.chooseNum(1, 5)
      w <- Gen.chooseNum(1, 5)
      a <- Gen.listOfN(30, genTok) // host docs
      b <- Gen.listOfN(30, genTok)
      span <- Gen.listOfN(k + w - 1, Gen.chooseNum(0, 25).map(i => s"s$i")) // the copy, distinct alphabet
      pa <- Gen.chooseNum(0, 30)
      pb <- Gen.chooseNum(0, 30)
    } yield (k, w, a.patch(pa, span, 0), b.patch(pb, span, 0), span)
    check(Prop.forAll(gen) { case (k, w, docA, docB, span) =>
      val fa = RefWinnow.fingerprints(docA, k, w)
      val fb = RefWinnow.fingerprints(docB, k, w)
      // the winnowing theorem: a copied span of >= k+w-1 tokens always
      // shares at least one selected fingerprint between the copies
      assert((fa & fb).nonEmpty, s"no shared fingerprint for planted span $span (k=$k w=$w)")
      // selection is a SAMPLE: subset of the doc's gram hashes, at most
      // one selection per full window
      Seq(docA -> fa, docB -> fb).foreach { case (doc, f) =>
        val grams = doc.sliding(k).map(RefWinnow.gramHash).toVector
        assert(f.subsetOf(grams.toSet))
        assert(f.size <= math.max(0, grams.length - w + 1))
      }
      true
    }, n = 200)
  }
}
