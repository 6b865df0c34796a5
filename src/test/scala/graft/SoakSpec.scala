package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.admin.{InMemoryMetadataClient, TopicSpec}
import graft.streaming.StreamOps

/** End-to-end SOAK: every proven-in-isolation streaming component
  * composed into ONE long drive — `Main.run` (argv → reconcile →
  * exactly-once sink with per-partition commit markers + fixed-delay
  * restart) and a generational LSH index maintainer consuming the SAME
  * arriving corpus — over ~200 microbatches with two planned
  * stop/restart cycles and one INJECTED sink failure recovered by
  * `runWithRestarts` itself.
  *
  * Pinned across the whole drive:
  *  - zero duplicates AND zero loss at the sink (multiset equality of
  *    committed timestamps vs fed records), through both planned
  *    restarts and the injected failure's automatic recovery;
  *  - the index file count stays bounded by compaction (never one file
  *    set per microbatch since stream start);
  *  - the probe relation equals the batch-built signature relation at
  *    every checkpoint boundary, through ≥2 compaction cutovers.
  */
class SoakSpec extends AnyFunSuite with SparkSuite {

  private val args = Array(
    "--topics", "app\\..*",
    "--consumer.bootstrap.servers", "src:9092",
    "--consumer.group.id", "g1",
    "--producer.bootstrap.servers", "dst:9092",
    "--exactly-once",
    // fast trigger: the soak drives ~200 microbatches; the reference
    // cadence (1 s) would make this a 4-minute wall-clock test
    "--checkpoint-interval-ms", "25")

  private def msg(i: Long) =
    graft.model.KafkaMessage("app.events", (i % 2).toInt, i,
      new java.sql.Timestamp(1700000000000L + i),
      s"k$i".getBytes, (s"soak doc $i " +
        (i * 50 until i * 50 + 20).map(w => s"w$w").mkString(" ")).getBytes,
      Array.empty)

  private def awaitCond(timeoutMs: Long = 30000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("soak: 200 microbatches, two restarts, one injected sink failure — zero dup/loss, bounded index, stable probes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val ckptMain = s"$root/ckpt-main"
    val ckptIdx = s"$root/ckpt-idx"
    val indexDir = s"$root/index"
    val clients = (props: Map[String, String]) =>
      new InMemoryMetadataClient(Seq(TopicSpec("app.events", 2)))
    SoakSender.reset()
    val stream = MemoryStream[graft.model.KafkaMessage]
    // the replicated corpus as documents: offset is the doc identity,
    // the value bytes are the text — the same stream feeds both legs
    def docsDf = stream.toDF()
      .select(col("offset").as("doc_id"), col("value").cast("string").as("text"))

    var maintainer: StreamingQuery = null
    def startMaintainer(): Unit = {
      maintainer = StreamOps.maintainLshIndex(
        docsDf, indexDir, ckptIdx, compactEvery = 40L)
    }
    var runThread: Thread = null
    val outcome = new java.util.concurrent.atomic.AtomicReference[Either[Seq[String], Unit]]()
    def startMain(): Unit = {
      runThread = new Thread(() => outcome.set(Main.run(args, spark, clients, ckptMain,
        senderFor = Some(_ =>
          graft.streaming.RecordSenderFactory.uniform(() => new SoakSender)),
        sourceOverride = Some(stream.toDF()))))
      runThread.start()
      assert(awaitCond()(mainQuery.isDefined), "replication query must come up")
    }
    def mainQuery: Option[StreamingQuery] =
      spark.streams.active.find(q => (maintainer eq null) || (q ne maintainer))
    def stopAll(): Unit = {
      mainQuery.foreach(_.stop())
      if (maintainer != null) maintainer.stop()
      runThread.join(30000)
      assert(!runThread.isAlive, "run() must return once its stream stops")
    }
    def drain(): Unit = {
      mainQuery.foreach { q =>
        try q.processAllAvailable()
        catch { case _: Throwable => () } // the injected failure lands here
      }
      maintainer.processAllAvailable()
    }
    var fed = Vector.empty[(Long, String)] // (doc_id, text) so far
    def feed(i: Long): Unit = {
      val m = msg(i)
      fed :+= (m.offset, new String(m.value))
      stream.addData(m)
      drain()
    }
    def probeMatchesBatch(): Unit = {
      val streamed = StreamOps.lshIndex(spark, indexDir).collect()
        .map(_.toSeq.toVector).toVector.sortBy(_.toString)
      val batch = graft.operators.Dedup.bandSignatures(
        fed.toDF("doc_id", "text")).collect()
        .map(_.toSeq.toVector).toVector.sortBy(_.toString)
      assert(streamed == batch,
        s"probe relation diverged from the batch build at ${fed.length} docs")
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def liveGenOf(dir: String): Long = {
      val gens = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isDirectory &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_live")))
        .map(_.getPath.getName.drop(4).toLong).toSeq
      assert(gens.length == 1, s"exactly one live generation expected, got $gens")
      gens.head
    }

    startMaintainer()
    startMain()
    try {
      // ——— segment 1: batches into the first compaction cutovers ———
      (0L until 70L).foreach(feed)
      probeMatchesBatch()
      // planned restart #1: graceful stop, same checkpoints
      stopAll()
      assert(outcome.get == Right(()))
      probeMatchesBatch() // the index serves while the maintainer is down
      startMaintainer()
      startMain()

      // ——— segment 2: includes the INJECTED sink failure ———
      (70L until 100L).foreach(feed)
      SoakSender.failNextFlush.set(true) // next task's commit barrier dies
      feed(100L) // this batch fails, commits nothing, and is replayed
      // runWithRestarts brings the pipeline back by itself (10 s delay);
      // the replayed batch must produce its rows exactly once
      assert(awaitCond(timeoutMs = 60000) {
        drain()
        SoakSender.committedTimestamps().size == 101
      }, "the injected failure must be recovered by the built-in restart")
      (101L until 140L).foreach(feed)
      probeMatchesBatch()
      // planned restart #2
      stopAll()
      assert(outcome.get == Right(()))
      startMaintainer()
      startMain()

      // ——— segment 3: through further cutovers to ~200 batches ———
      (140L until 200L).foreach(feed)
      probeMatchesBatch()

      // ≥2 cutovers happened: 200 maintainer batches / compactEvery=40
      assert(liveGenOf(indexDir) >= 2,
        "the drive must have crossed at least two compaction cutovers")
      // bounded files: last compaction's output plus ≤compactEvery appends
      val liveFiles = fs.listStatus(new org.apache.hadoop.fs.Path(
        indexDir, s"gen-${liveGenOf(indexDir)}"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(liveFiles <= 45,
        s"index file count must stay bounded by compaction, got $liveFiles")

      // ——— the soak's headline: exactly-once over the whole drive ———
      val committed = SoakSender.committedTimestamps()
      val expected = (0L until 200L).map(1700000000000L + _)
      assert(committed.size == 200,
        s"expected 200 committed records, got ${committed.size}")
      assert(committed.toSet == expected.toSet, "no record lost")
      val dup = committed.groupBy(identity).filter(_._2.length > 1).keys.toSeq
      assert(dup.isEmpty, s"duplicated timestamps after replays: $dup")
    } finally {
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      if (runThread != null) runThread.join(30000)
    }
  }

  /** The r9 verdict's composed-soak ask: every curation-side streaming
    * component chained into ONE dataflow — quality gate → watermarked
    * digest dedup → decontamination ([[StreamOps.curateStream]]) →
    * mixture gate — feeding the LSH and segment index maintainers, with
    * the attrition, token-drift, and schema-drift monitors consuming
    * the same stream, ALL checkpoint-restarted mid-drive. The batch
    * composition of the same operators over the full fixture is the
    * oracle: the streamed survivors, both index relations, and every
    * sealed monitor window must equal it exactly, and sealed windows
    * must emit exactly once despite the restart.
    */
  test("composed soak: gates→indexes→monitors through a checkpointed kill/restart equal the batch composition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-composed").toString
    // base aligned to a 10-minute boundary so minutes 0-9 / 10-19 land in
    // exactly two tumbling windows (1700000400000 = 22:20:00.000 UTC)
    def ts(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    val benchGram = "c1 c2 c3 c4 c5"
    def filler(i: Int) = (1 to 28).map(j => s"u${i}w$j").mkString(" ") + " the a of"
    // 40 docs over two 10-min event-time windows (2 docs/minute, fed in
    // doc_id order): per decade — one quality reject (i%10==7), one
    // contaminated (i%10==9), one exact dup of a 2-min-earlier doc
    // (i%10==5); doc 21 duplicates doc 18 ACROSS the restart boundary,
    // so rejecting it requires the dedup state to survive the kill
    def doc(i: Int): (Long, String, String, java.sql.Timestamp, String) = {
      val text =
        if (i == 21) filler(18)
        else if (i % 10 == 7) "too short"
        else if (i % 10 == 9) benchGram + " " + filler(i)
        else if (i % 10 == 5) filler(i - 4)
        else filler(i)
      val props = if (i % 3 == 0) """{"v": 1}""" else """{"k": 1, "n": 2}"""
      (i.toLong, text, if (i % 2 == 0) "A" else "B", ts((i - 1) / 2), props)
    }
    val rates = Seq(("A", 0.5), ("B", 1.0)).toDF("source", "rate")
    // ONE MemoryStream PER QUERY, fed identically. Sharing one instance
    // across checkpointed queries is a recovery hazard in the HARNESS
    // (not the operators): MemoryStream trims its shared buffer on every
    // query's commit, so a stop() landing in some query's
    // offsets-written/commit-missing window makes its restart re-plan
    // that batch against a buffer the OTHER queries already trimmed —
    // the replayed batch comes back EMPTY and commits, silently losing
    // the data (observed once as the LSH maintainer dropping a whole
    // microbatch while every other query agreed with the batch oracle).
    // A real replayable source (Kafka, files) retains data; per-query
    // streams restore that property for MemoryStream.
    val streams = Seq.fill(6)(MemoryStream[(Long, String, String, java.sql.Timestamp, String)])
    def docsDf(i: Int) = streams(i).toDF().toDF("doc_id", "text", "source", "ingest_ts", "props")
    // the composed chain; each sink runs it end to end from its source
    def gatedDf(i: Int) = StreamOps.mixtureGateStream(
      StreamOps.curateStream(docsDf(i), Seq(benchGram), watermarkDelay = "5 minutes"), rates)
    def startAll(): Seq[StreamingQuery] = Seq(
      gatedDf(0).select("doc_id", "source").writeStream.format("parquet")
        .option("path", s"$root/survivors")
        .option("checkpointLocation", s"$root/ckpt-gate").outputMode("append").start(),
      StreamOps.maintainLshIndex(
        gatedDf(1).select("doc_id", "text"), s"$root/lsh", s"$root/ckpt-lsh"),
      StreamOps.maintainSegmentIndex(
        gatedDf(2).select("doc_id", "text"), s"$root/seg", s"$root/ckpt-seg", segTokens = 5),
      StreamOps.gateAttritionStream(
          docsDf(3).select(col("doc_id"), col("text"), col("ingest_ts").as("ts")),
          windowDur = "10 minutes", watermarkDelay = "5 minutes")
        .writeStream.format("parquet").option("path", s"$root/attr")
        .option("checkpointLocation", s"$root/ckpt-attr").outputMode("append").start(),
      StreamOps.driftStream(
          docsDf(4).select(col("doc_id"), col("ingest_ts").as("ts"), col("text"))
            .as[StreamOps.TimedDoc],
          Map("the" -> 2L, "a" -> 1L, "of" -> 1L),
          windowMs = 600000L, watermarkDelay = "5 minutes")
        .writeStream.format("parquet").option("path", s"$root/drift")
        .option("checkpointLocation", s"$root/ckpt-drift").outputMode("append").start(),
      StreamOps.schemaDriftStream(
          docsDf(5).select(col("doc_id").as("event_id"), col("ingest_ts").as("ts"), col("props"))
            .as[StreamOps.TimedPayload],
          Map("k" -> 1.0, "n" -> 1.0),
          windowMs = 600000L, watermarkDelay = "5 minutes")
        .writeStream.format("parquet").option("path", s"$root/schema")
        .option("checkpointLocation", s"$root/ckpt-schema").outputMode("append").start())

    var qs = startAll()
    try {
      def drain(): Unit = qs.foreach(_.processAllAvailable())
      def addAll(rows: Seq[(Long, String, String, java.sql.Timestamp, String)]): Unit =
        streams.foreach(_.addData(rows: _*))
      // phase 1: window-0 docs, two microbatches, then a hard stop
      addAll((1 to 10).map(doc)); drain()
      addAll((11 to 20).map(doc)); drain()
      qs.foreach(_.stop())
      // restart every query from its checkpoint
      qs = startAll()
      // phase 2: window-1 docs (doc 21 = the cross-restart duplicate),
      // then two far-future flushes to seal both windows everywhere
      addAll((21 to 30).map(doc)); drain()
      addAll((31 to 40).map(doc)); drain()
      addAll(Seq((998L, "x", "B", ts(45), null))); drain()
      addAll(Seq((999L, "x", "B", ts(46), null))); drain()
      qs.foreach(_.stop())

      // ——— the batch composition: same operators, full fixture ———
      val all = (1 to 40).map(doc).toDF("doc_id", "text", "source", "ingest_ts", "props")
      val kept = graft.operators.Curation.qualityAnnotated(all)
        .filter(col("keep")).withColumn("digest", sha2(col("text"), 256))
      // streaming dedup keeps first arrival = lowest doc_id (docs fed in order)
      val deduped = kept.join(
        kept.groupBy("digest").agg(min("doc_id").as("doc_id")), Seq("digest", "doc_id"))
      val decon = deduped.filter(!col("text").contains(benchGram))
      val batchSurv = graft.operators.Curation.mixtureGate(decon, rates)
      val expect = batchSurv.select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet

      // survivors: multiset equality (file-sink log = exactly-once
      // delivery through the restart), and the cross-restart duplicate
      // is rejected — the dedup state was restored
      val got = spark.read.parquet(s"$root/survivors").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      assert(got.toSet == expect, s"streamed survivors diverge from the batch composition")
      assert(got.length == expect.size, "file sink must deliver each survivor exactly once")
      assert(!got.map(_._1).contains(21L), "the cross-restart duplicate must be rejected")

      // both indexes equal the batch build over the SAME survivor corpus
      // (distinct: the maintainers' documented at-least-once append)
      val survTexts = all.join(
        batchSurv.select("doc_id"), "doc_id").select("doc_id", "text")
      assert(StreamOps.lshIndex(spark, s"$root/lsh").collect().map(_.toSeq).toSet ==
        graft.operators.Dedup.bandSignatures(survTexts).collect().map(_.toSeq).toSet,
        "LSH index must equal the batch signature relation over the gated corpus")
      assert(StreamOps.segmentIndex(spark, s"$root/seg").drop("seg_tokens")
        .collect().map(_.toSeq).toSet ==
        graft.operators.Dedup.segmentSignatures(survTexts, 5).drop("seg_tokens")
          .collect().map(_.toSeq).toSet,
        "segment index must equal the batch segment relation over the gated corpus")

      // monitors: exactly one emission per sealed window (through the
      // restart), each equal to the batch law over that window's docs
      val winDocs = Map(0 -> (1 to 20), 1 -> (21 to 40))
      val attr = spark.read.parquet(s"$root/attr").collect()
      assert(attr.length == 2, s"one attrition row per sealed window, got ${attr.length}")
      winDocs.foreach { case (w, ids) =>
        val row = attr.find(_.getAs[java.sql.Timestamp]("window_start") == ts(w * 10)).get
        val qa = graft.operators.Curation.qualityAnnotated(
          ids.map(doc).toDF("doc_id", "text", "source", "ingest_ts", "props"))
        assert(row.getAs[Long]("n_in") == ids.size.toLong)
        assert(row.getAs[Long]("s4") == qa.filter(col("keep")).count())
        assert(row.getAs[Long]("d_len") + row.getAs[Long]("d_avg") +
          row.getAs[Long]("d_stop") + row.getAs[Long]("d_rep") ==
          row.getAs[Long]("n_in") - row.getAs[Long]("s4"), "the funnel must telescope")
      }
      val drift = spark.read.parquet(s"$root/drift").collect()
      assert(drift.length == 2, s"one drift row per sealed window, got ${drift.length}")
      winDocs.foreach { case (w, ids) =>
        val row = drift.find(_.getAs[java.sql.Timestamp]("window_start") == ts(w * 10)).get
        val counts = ids.map(doc).flatMap(_._2.split(" ", -1))
          .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val ref = Map("the" -> 2L, "a" -> 1L, "of" -> 1L)
        val nWin = counts.values.sum
        val numer = (counts.keySet ++ ref.keySet).iterator
          .map(t => math.abs(counts.getOrElse(t, 0L) * 4L - ref.getOrElse(t, 0L) * nWin)).sum
        assert(row.getAs[Long]("n_tokens") == nWin)
        assert(row.getAs[Long]("tv_numer") == numer, s"window $w: exact TV numerator law")
      }
      val schema = spark.read.parquet(s"$root/schema").collect()
      assert(schema.length == 6, s"3 keys per sealed window, got ${schema.length}")
      winDocs.foreach { case (w, ids) =>
        val rows = schema.filter(_.getAs[java.sql.Timestamp]("window_start") == ts(w * 10))
          .map(r => r.getAs[String]("key") -> r).toMap
        assert(rows.keySet == Set("k", "n", "v"))
        val nV = ids.count(_ % 3 == 0).toLong
        assert(rows("v").getAs[String]("status") == "new" &&
          rows("v").getAs[Long]("n_key") == nV)
        assert(rows("k").getAs[String]("status") == "stable" &&
          rows("k").getAs[Long]("n_key") == ids.size - nV)
        assert(rows("n").getAs[Long]("n_events") == ids.size.toLong)
      }
    } finally {
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    }
  }
}

/** Transactional-visibility sink for the soak: sends buffer per task
  * attempt and become visible only at the `flush()` commit barrier —
  * read_committed semantics. One flush can be armed to fail, simulating
  * a broker error at the commit barrier: nothing from that attempt may
  * ever surface. Top-level so factory closures don't capture the suite.
  */
class SoakSender extends graft.streaming.RecordSender {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit =
    buf += timestampMs
  override def flush(): Unit = {
    if (SoakSender.failNextFlush.compareAndSet(true, false))
      throw new RuntimeException("soak: injected commit-barrier failure")
    buf.foreach(SoakSender.committed.add)
    buf.clear()
  }
}

object SoakSender {
  val failNextFlush = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val committed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  def reset(): Unit = { failNextFlush.set(false); committed.clear() }
  def committedTimestamps(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    committed.asScala.toSeq
  }
}
