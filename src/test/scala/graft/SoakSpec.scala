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
