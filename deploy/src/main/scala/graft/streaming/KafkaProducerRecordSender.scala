package graft.streaming

import java.util.Properties

import org.apache.kafka.clients.consumer.KafkaConsumer
import org.apache.kafka.clients.producer.{KafkaProducer, ProducerRecord}
import org.apache.kafka.common.TopicPartition
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
  *
  * [[OffsetCommittingSender]] capability (transactional path only):
  * per-(batch, partition) progress commits INSIDE the produce
  * transaction — the Kafka-Streams EOS shape, matching the atomicity of
  * the reference's Flink 2PC (offsets and records commit together;
  * reference: FlinkKafkaReplicator.java:120-124). Progress lives on a
  * COMPACTED side topic (`graft.progress.topic` prop, default
  * `__graft_progress`), keyed by `<scope>/<transactional.id>` — the
  * scope (`graft.progress.scope` prop) is the checkpoint's identity
  * marker `graft.Main` mints under the commit dir, so WIPING a
  * checkpoint to reprocess mints a fresh scope and the old high-waters
  * can never mask the new run's batch ids (without the scope, a
  * checkpoint reset would silently SKIP batches 0..N against the
  * surviving compacted topic — data loss, the one failure direction
  * worse than duplicates). Value = the batch id as a decimal string.
  * `stageProgress` sends that record into the open transaction;
  * `progressCommitted` answers from a local high-water cache seeded by
  * ONE `read_committed` scan of the compacted topic at construction —
  * an aborted transaction leaves no visible progress, exactly the
  * required atomicity. Cache staleness is covered by fencing: if
  * another producer instance committed progress we cannot see, our
  * epoch is necessarily stale and the broker fences this producer
  * before its transaction can commit — the stale re-send is aborted,
  * never visible. Per-microbatch cost after construction: zero network
  * for `progressCommitted`, one extra in-transaction record for
  * `stageProgress`.
  *
  * Residual (documented, fails toward DUPLICATES, never loss): the
  * construction scan reads up to the partition's read_committed LSO —
  * another sink partition's in-flight transaction parked below our own
  * later committed progress record hides it from the scan. The window
  * needs a lost marker AND an in-flight foreign transaction at scan
  * time simultaneously; the marker cache is consulted first, so the
  * scan only decides at all when the marker is already gone. The
  * Kafka-Streams design sidesteps this via the group coordinator,
  * which a sink-side protocol cannot reach.
  */
final class KafkaProducerRecordSender(props: Map[String, String]) extends OffsetCommittingSender {

  private val transactional = props.contains("transactional.id")

  /** Compacted progress topic; create it with `cleanup.policy=compact`.
    * Non-producer props are stripped before the producer sees them.
    */
  private val progressTopic =
    props.getOrElse("graft.progress.topic", "__graft_progress")
  private val progressScope = props.getOrElse("graft.progress.scope", "")
  /** Honor pre-scope (bare `<transactional.id>`) progress keys too —
    * set by graft.Main ONLY when the scope was freshly minted over a
    * commit dir that already carries batch markers (an in-flight
    * deployment upgrading mid-stream: same stream identity, so ignoring
    * the legacy high-water would re-open the commit-vs-marker window
    * for the batch in flight at upgrade time). A wiped commit dir never
    * sets this: legacy keys there are stale history and honoring them
    * is the data-loss direction the scope exists to prevent.
    */
  private val includeLegacyKeys =
    props.getOrElse("graft.progress.include.legacy", "false").toBoolean
  private val producerProps =
    props - "graft.progress.topic" - "graft.progress.scope" -
      "graft.progress.include.legacy"

  private val producer: KafkaProducer[Array[Byte], Array[Byte]] = {
    val p = new Properties()
    p.put("key.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    p.put("value.serializer", "org.apache.kafka.common.serialization.ByteArraySerializer")
    producerProps.foreach { case (k, v) => p.put(k, v) }
    val kp = new KafkaProducer[Array[Byte], Array[Byte]](p)
    if (transactional) kp.initTransactions() // epoch bump = zombie fence
    kp
  }

  private val progressKey: Array[Byte] =
    (progressScope + "/" + props.getOrElse("transactional.id", "")).getBytes("UTF-8")

  /** Highest batch id known COMMITTED for this (sink, partition), seeded
    * once from the compacted topic under `read_committed` (bounded by
    * compaction: ~one record per (sink, partition) key), then maintained
    * locally after each of our own commits.
    */
  private var committedHighWater: Long =
    if (transactional) scanCommittedHighWater() else -1L

  private def scanCommittedHighWater(): Long = {
    val p = new Properties()
    // the consumer INHERITS the producer's client props (minus the
    // producer-only ones) so security configs — security.protocol,
    // sasl.*, ssl.* — ride along; a bootstrap-only consumer would fail
    // to even connect on a secured cluster. Consumers WARN on unknown
    // producer tunables rather than fail.
    val producerOnly = Set(
      "transactional.id", "transaction.timeout.ms", "enable.idempotence",
      "key.serializer", "value.serializer", "acks", "linger.ms",
      "batch.size", "buffer.memory", "delivery.timeout.ms",
      "max.in.flight.requests.per.connection", "compression.type",
      // SHARED-NAME configs with producer-typed values: a consumer does
      // not merely warn on these — interceptor.classes naming a
      // ProducerInterceptor makes KafkaConsumer construction THROW
      "interceptor.classes", "partitioner.class")
    producerProps.foreach { case (k, v) => if (!producerOnly(k)) p.put(k, v) }
    p.put("key.deserializer", "org.apache.kafka.common.serialization.ByteArrayDeserializer")
    p.put("value.deserializer", "org.apache.kafka.common.serialization.ByteArrayDeserializer")
    p.put("isolation.level", "read_committed") // aborted progress is invisible
    p.put("enable.auto.commit", "false")
    val consumer = new KafkaConsumer[Array[Byte], Array[Byte]](p)
    try {
      import scala.jdk.CollectionConverters._
      val parts = Option(consumer.partitionsFor(progressTopic))
        .map(_.asScala.toSeq).getOrElse(Seq.empty)
        .map(pi => new TopicPartition(pi.topic(), pi.partition()))
      if (parts.isEmpty) return -1L
      consumer.assign(parts.asJava)
      consumer.seekToBeginning(parts.asJava)
      val end = consumer.endOffsets(parts.asJava).asScala.map { case (tp, o) => tp -> o.longValue() }
      var high = -1L
      val keyStr = new String(progressKey, "UTF-8")
      // legacy (pre-scope) key, honored only on an in-flight upgrade
      val legacyKey = props.getOrElse("transactional.id", "")
      while (parts.exists(tp => consumer.position(tp) < end(tp))) {
        consumer.poll(java.time.Duration.ofMillis(500)).asScala.foreach { rec =>
          if (rec.key != null && rec.value != null) {
            val k = new String(rec.key, "UTF-8")
            if (k == keyStr || (includeLegacyKeys && k == legacyKey))
              high = math.max(high, new String(rec.value, "UTF-8").toLong)
          }
        }
      }
      high
    } finally consumer.close()
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

  private def beginIfNeeded(): Unit =
    if (transactional && !inTransaction) {
      producer.beginTransaction()
      inTransaction = true
    }

  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit = {
    beginIfNeeded()
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

  /** Stage the (batch, partition) progress record into the OPEN
    * transaction: it becomes visible under `read_committed` if and only
    * if the batch's records do.
    */
  override def stageProgress(batchId: Long, partitionId: Int): Unit = {
    require(transactional, "stageProgress requires a transactional.id")
    beginIfNeeded()
    producer.send(new ProducerRecord[Array[Byte], Array[Byte]](
      progressTopic, null, progressKey, batchId.toString.getBytes("UTF-8")))
    stagedBatchId = batchId
  }

  private var stagedBatchId = -1L

  override def progressCommitted(batchId: Long, partitionId: Int): Boolean =
    transactional && batchId <= committedHighWater

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
        if (stagedBatchId >= 0) { // progress committed with the records
          committedHighWater = math.max(committedHighWater, stagedBatchId)
          stagedBatchId = -1L
        }
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
      stagedBatchId = -1L
    }
    producer.close()
  }
}
