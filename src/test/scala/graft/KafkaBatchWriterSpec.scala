package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{KafkaMessage, MessageHeader}
import graft.streaming.{KafkaBatchWriter, RecordSender, RecordSenderFactory}

/** The record-complete sink path (SURVEY.md §7.4 hard parts 1+2):
  * timestamp preservation and exactly-once batch commit, asserted through
  * an in-memory sender.
  */
class KafkaBatchWriterSpec extends AnyFunSuite with SparkSuite {

  private def newSender(): RecordSenderFactory = {
    CollectingSender.clear()
    RecordSenderFactory.uniform(() => new CollectingSender)
  }

  private def msg(offset: Long, partition: Int, tsMs: Long) =
    KafkaMessage("t", partition, offset, new java.sql.Timestamp(tsMs),
      s"k$offset".getBytes, s"v$offset".getBytes,
      Array(MessageHeader("h", Array[Byte](1)), MessageHeader("h", Array.empty)))

  test("write preserves the full envelope including the record timestamp") {
    val msgs = Seq(msg(0, 3, 1700000000123L), msg(1, 5, 1700000000456L))
    KafkaBatchWriter.write(newSender(), preservePartitioning = true)(
      KafkaMessage.toDF(spark, msgs), 0L)
    val sent = CollectingSender.snapshot().sortBy(_.tsMs)
    assert(sent.length == 2)
    assert(sent(0).tsMs == 1700000000123L) // D5: timestamp forwarded, not dropped
    assert(sent(0).partition.contains(3))
    assert(new String(sent(0).key) == "k0" && new String(sent(0).value) == "v0")
    assert(sent(0).headers.map(_._1) == Seq("h", "h")) // dup keys, order kept
    assert(CollectingSender.flushes() >= 1) // commit barrier ran
  }

  test("no-preserve-partitioning delegates partition choice to the producer") {
    KafkaBatchWriter.write(newSender(), preservePartitioning = false)(
      KafkaMessage.toDF(spark, Seq(msg(0, 3, 1L))), 0L)
    assert(CollectingSender.snapshot().head.partition.isEmpty)
  }

  test("exactlyOnceSink skips a replayed batch id end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val commitDir = Files.createTempDirectory("graft-eo").toString
    val sink = KafkaBatchWriter.exactlyOnceSink(newSender(), preservePartitioning = true, commitDir)
    val df = KafkaMessage.toDF(spark, Seq(msg(0, 0, 10L), msg(1, 0, 20L)))
    sink(df, 42L)
    sink(df, 42L) // replay after simulated failure: must not double-produce
    sink(df, 43L)
    assert(CollectingSender.snapshot().length == 4) // 2 batches x 2 records
  }

  test("streaming end-to-end: MemoryStream through foreachBatch sender") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val commitDir = Files.createTempDirectory("graft-eo2").toString
    CollectingSender.clear()
    val stream = MemoryStream[KafkaMessage]
    stream.addData(msg(0, 1, 100L), msg(1, 2, 200L))
    val q = stream.toDF().writeStream
      .foreachBatch(KafkaBatchWriter.exactlyOnceSink(
        RecordSenderFactory.uniform(() => new CollectingSender),
        preservePartitioning = true, commitDir))
      .start()
    try q.processAllAvailable() finally q.stop()
    val sent = CollectingSender.snapshot().sortBy(_.tsMs)
    assert(sent.map(_.tsMs) == Seq(100L, 200L))
    assert(sent.map(_.partition) == Seq(Some(1), Some(2)))
  }

  test("PooledSenderFactory: one producer per partition across batches; failure evicts") {
    import graft.streaming.{PooledSenderFactory, RecordSender, RecordSenderFactory}
    class Probe extends RecordSender {
      var flushes = 0
      var closed = false
      var failNextSend = false
      override def send(topic: String, partition: Option[Int], timestampMs: Long,
          key: Array[Byte], value: Array[Byte],
          headers: Seq[(String, Array[Byte])]): Unit =
        if (failNextSend) throw new RuntimeException("broker hiccup")
      override def flush(): Unit = flushes += 1
      override def close(): Unit = closed = true
    }
    val made = scala.collection.mutable.ArrayBuffer.empty[Probe]
    val pool = new PooledSenderFactory("spec-pool",
      RecordSenderFactory.uniform(() => { val p = new Probe; made += p; p }))
    try {
      // two "batches" on the same partition reuse ONE underlying sender
      val b1 = pool.senderFor(0)
      b1.send("t", None, 1L, null, null, Nil); b1.flush(); b1.close()
      val b2 = pool.senderFor(0)
      b2.flush(); b2.close()
      assert(made.length == 1 && made.head.flushes == 2)
      assert(!made.head.closed, "pooled sender must survive task-end close()")
      // a distinct partition gets its own pooled sender
      pool.senderFor(1).close()
      assert(made.length == 2)
      // a failure marks the wrapper: its close() evicts AND closes the
      // underlying sender, and the next batch builds a fresh one
      made.head.failNextSend = true
      val b3 = pool.senderFor(0)
      intercept[RuntimeException](b3.send("t", None, 2L, null, null, Nil))
      b3.close()
      assert(made.head.closed, "failed sender must be closed on eviction")
      pool.senderFor(0).close()
      assert(made.length == 3, "eviction must force a fresh underlying sender")
    } finally PooledSenderFactory.shutdown("spec-pool")
  }

}

/** Records land in a JVM-static sink (executors share the JVM in local
  * mode). flush() marks the commit barrier. Top-level on purpose: the
  * sender factory closure must not capture the spec instance.
  */
case class Sent(topic: String, partition: Option[Int], tsMs: Long,
    key: Array[Byte], value: Array[Byte], headers: Seq[(String, Array[Byte])])

class CollectingSender extends RecordSender {
  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit =
    CollectingSender.add(Sent(topic, partition, timestampMs, key, value, headers))
  override def flush(): Unit = CollectingSender.bumpFlush()
}

object CollectingSender {
  private val records = new java.util.concurrent.ConcurrentLinkedQueue[Sent]()
  private val nFlush = new java.util.concurrent.atomic.AtomicInteger(0)
  def add(s: Sent): Unit = records.add(s)
  def bumpFlush(): Unit = nFlush.incrementAndGet()
  def flushes(): Int = nFlush.get()
  def clear(): Unit = { records.clear(); nFlush.set(0) }
  def snapshot(): Seq[Sent] = {
    import scala.jdk.CollectionConverters._
    records.asScala.toSeq
  }
}
