package graft.streaming

import java.util.Properties

import org.apache.kafka.clients.producer.{KafkaProducer, ProducerRecord}
import org.apache.kafka.common.header.internals.RecordHeader

/** Production [[RecordSender]] over a kafka-clients `KafkaProducer` —
  * closes the two gaps Spark's built-in Kafka sink leaves (timestamp
  * forwarding, transactional exactly-once; see KafkaBatchWriter's
  * scaladoc and reference: KafkaMessageSerializationSchema.java:16-24,
  * FlinkKafkaReplicator.java:120-124).
  *
  * DEPLOY-TIME SOURCE: compiled only where kafka-clients is on the
  * classpath (see deploy/README.md); the library build never links it.
  * Loaded reflectively by `graft.Main.reflectiveSenderFactory` — the
  * class name and the single `Map[String, String]` constructor are the
  * pinned contract (ReflectiveBindingSpec).
  *
  * Delivery semantics follow the props the factory derived:
  *  - `transactional.id` present (the `--exactly-once` path): the
  *    constructor's `initTransactions()` FENCES any zombie producer
  *    from a previous attempt of the same (sink, partition) task —
  *    the id is deterministic by KafkaBatchWriter.transactionalId —
  *    and `flush()` commits the transaction;
  *  - absent (at-least-once, the reference's default): `flush()` is a
  *    plain producer flush.
  * A sender is single-use per task attempt; `flush()` closes the
  * producer.
  */
final class KafkaProducerRecordSender(props: Map[String, String]) extends RecordSender {

  private val transactional = props.contains("transactional.id")

  private val producer: KafkaProducer[Array[Byte], Array[Byte]] = {
    val p = new Properties()
    p.put("key.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    p.put("value.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    props.foreach { case (k, v) => p.put(k, v) }
    val kp = new KafkaProducer[Array[Byte], Array[Byte]](p)
    if (transactional) kp.initTransactions() // epoch bump = zombie fence
    kp
  }

  private var inTransaction = false

  /** First asynchronous delivery failure, surfaced at the commit
    * barrier: `producer.flush()` waits for outstanding sends but does
    * NOT throw for records that exhausted their delivery attempts — a
    * task that ignored the send futures would "succeed", commit the
    * batch marker, and silently drop records. (The transactional path
    * needs no such latch: `commitTransaction` itself throws if any send
    * in the transaction failed.)
    */
  private val firstSendFailure =
    new java.util.concurrent.atomic.AtomicReference[Exception](null)

  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit = {
    if (transactional && !inTransaction) {
      producer.beginTransaction()
      inTransaction = true
    }
    // envelope-complete ProducerRecord: partition=null delegates to the
    // DefaultPartitioner, timestamp is forwarded — the reference's exact
    // serialize shape (reference: KafkaMessageSerializationSchema.java:16-24)
    val record = new ProducerRecord[Array[Byte], Array[Byte]](
      topic, partition.map(Int.box).orNull, java.lang.Long.valueOf(timestampMs), key, value)
    headers.foreach { case (k, v) => record.headers().add(new RecordHeader(k, v)) }
    producer.send(record, (_, exception) =>
      if (exception != null) firstSendFailure.compareAndSet(null, exception))
    ()
  }

  /** Commit barrier. The producer stays OPEN on success — the sender is
    * reusable across batches (the next `send` begins a fresh
    * transaction), which is what lets [[PooledSenderFactory]] amortize
    * the producer bootstrap + `initTransactions` round trips across the
    * 1-second microbatch cadence. Unpooled callers get the old
    * single-use behavior from [[KafkaBatchWriter.write]]'s task-end
    * `close()`.
    */
  override def flush(): Unit =
    if (transactional) {
      if (inTransaction) {
        producer.commitTransaction()
        inTransaction = false
      }
    } else {
      producer.flush()
      val failure = firstSendFailure.getAndSet(null) // reset for reuse
      if (failure != null)
        throw new RuntimeException(
          "at-least-once delivery failed for at least one record; failing the task so the batch retries",
          failure)
    }

  override def close(): Unit = {
    // abort rather than leak an open transaction: close() without an
    // explicit abort leaves the transaction to time out server-side,
    // stalling read_committed consumers for transaction.timeout.ms
    if (transactional && inTransaction) {
      try producer.abortTransaction()
      catch { case _: Throwable => () } // fenced/failed: broker aborts it
      inTransaction = false
    }
    producer.close()
  }
}
