package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The record-complete produce surface — closes the two gaps Spark's
  * built-in Kafka sink leaves against the reference (SURVEY.md §7.4):
  *
  *  1. **Timestamp preservation (D5)**: the built-in sink ignores any
  *     timestamp column; the reference forwards the record timestamp
  *     (reference: KafkaMessageSerializationSchema.java:20). A
  *     [[RecordSender]] receives it explicitly.
  *  2. **Exactly-once (D6)**: the built-in sink is at-least-once; the
  *     reference's transactional 2PC (reference:
  *     FlinkKafkaReplicator.java:120-124) maps to `foreachBatch` with a
  *     transactional producer whose commit is tied to the batch id —
  *     compose [[write]] with [[Pipeline.idempotentForeachBatch]].
  *
  * The production sender wraps a transactional
  * `org.apache.kafka.clients.KafkaProducer` and binds at deploy time
  * (kafka-clients is not on this build's classpath); specs use an
  * in-memory sender to assert byte-exact envelope delivery.
  */
trait RecordSender extends Serializable {
  /** One record, envelope-complete. `partition == None` delegates to the
    * producer's DefaultPartitioner (murmur2 of key — see
    * [[graft.functions.KafkaMurmur2]]), exactly the reference's
    * `--no-preserve-partitioning` behavior (reference:
    * KafkaMessageSerializationSchema.java:19).
    */
  def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit

  /** Commit barrier: flush (at-least-once) or commit the transaction
    * (exactly-once). Called once per task after its rows are sent. The
    * sender stays USABLE after a successful flush — the next batch may
    * reuse it (a transactional implementation begins a fresh
    * transaction on the next `send`).
    */
  def flush(): Unit

  /** Release the underlying resources (abort any open transaction,
    * close the producer). [[KafkaBatchWriter.write]] calls this at task
    * end for unpooled senders; [[PooledSenderFactory]]'s wrappers
    * intercept it so pooled producers survive across batches. Default
    * no-op for stateless test senders.
    */
  def close(): Unit = ()
}

/** Per-task sender creation, keyed by the task's batch partition id —
  * the zombie-fencing hook for exactly-once delivery.
  *
  * A transactional producer's `transactional.id` must be DETERMINISTIC
  * per (sink, partition) across attempts: when a task retries, its new
  * producer calls `initTransactions()` under the same id, which bumps
  * the epoch and FENCES the previous attempt's producer — a zombie
  * still holding an OPEN transaction can no longer commit, and that
  * transaction is aborted (invisible under `read_committed`). Fencing
  * is the concurrent-zombie defense ONLY: it cannot revoke a
  * transaction the first attempt already COMMITTED — that replay
  * window is closed by the per-partition commit markers in
  * [[KafkaBatchWriter.write]] (see [[KafkaBatchWriter.exactlyOnceSink]]
  * for how the two compose). Derive the id with
  * [[KafkaBatchWriter.transactionalId]]; never use a random or
  * per-attempt id, which would make every retry a new producer identity
  * with nothing to fence. Production deployments should also POOL one
  * producer per transactional.id per executor across batches (begin a
  * new transaction per batch) — constructing and `initTransactions()`ing
  * a fresh producer per task per 1 s microbatch is multiple coordinator
  * round trips per partition per second.
  */
trait RecordSenderFactory extends Serializable {
  def senderFor(partitionId: Int): RecordSender
}

object RecordSenderFactory {
  /** Lift a partition-oblivious factory (at-least-once senders don't
    * need the fencing key).
    */
  def uniform(f: () => RecordSender): RecordSenderFactory =
    new RecordSenderFactory {
      override def senderFor(partitionId: Int): RecordSender = f()
    }
}

/** Executor-lifetime sender pooling: one underlying sender per
  * (pool token, partition) per JVM, reused across microbatches.
  *
  * Why: a transactional producer costs a bootstrap + `initTransactions`
  * (multiple transaction-coordinator round trips) — paying that per
  * task per 1-second microbatch floors batch latency and churns broker
  * connections forever. The [[RecordSender]] contract already permits
  * reuse (a successful `flush()` leaves the sender usable; the next
  * `send` begins a fresh transaction), so the pool simply keeps the
  * sender alive between batches.
  *
  * Fencing is unchanged: the pool key preserves the deterministic
  * (sink, partition) → `transactional.id` mapping, so a retry scheduled
  * on ANOTHER executor creates its own producer under the same id and
  * fences this one; the next use here then fails, which EVICTS and
  * closes the fenced producer (see below) — exactly the hand-off
  * fencing is for.
  *
  * Failure protocol: any exception from `send`/`flush` marks the
  * wrapper failed; its task-end `close()` then evicts the pool entry
  * and closes the underlying sender (aborting any open transaction), so
  * the retry builds a fresh producer. On success `close()` is a no-op
  * and the producer survives for the next batch.
  *
  * The pool is JVM-global keyed by `token` (Spark deserializes a new
  * factory instance per task — an instance field would never be shared),
  * so one `token` names one logical sink across all its tasks in an
  * executor.
  */
final class PooledSenderFactory(
    token: String,
    underlying: RecordSenderFactory) extends RecordSenderFactory {

  override def senderFor(partitionId: Int): RecordSender = {
    val key = (token, partitionId)
    val base = PooledSenderFactory.pool.computeIfAbsent(
      key, _ => underlying.senderFor(partitionId))
    new RecordSender {
      private var failed = false
      private def guarded[A](op: => A): A =
        try op
        catch { case e: Throwable => failed = true; throw e }
      override def send(topic: String, partition: Option[Int], timestampMs: Long,
          key2: Array[Byte], value: Array[Byte],
          headers: Seq[(String, Array[Byte])]): Unit =
        guarded(base.send(topic, partition, timestampMs, key2, value, headers))
      override def flush(): Unit = guarded(base.flush())
      override def close(): Unit =
        if (failed) {
          PooledSenderFactory.pool.remove(key, base)
          try base.close() catch { case _: Throwable => () }
        }
    }
  }
}

object PooledSenderFactory {
  private val pool =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), RecordSender]()

  /** Test/shutdown hook: close and drop every pooled sender for a token. */
  def shutdown(token: String): Unit = {
    val it = pool.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == token) {
        try e.getValue.close() catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}

object KafkaBatchWriter {

  /** Deterministic `transactional.id` for a sink task: `base` names the
    * sink (one replication pipeline = one base), the partition id pins
    * the task — same task on retry ⇒ same id ⇒ `initTransactions()`
    * fences the zombie attempt (see [[RecordSenderFactory]]).
    */
  def transactionalId(base: String, partitionId: Int): String =
    s"$base-p$partitionId"

  /** A `foreachBatch` body: stream the batch's envelope rows through a
    * per-task [[RecordSender]]. No shuffle — each task drains its own
    * partition of the microbatch; `senders` runs on the executor (one
    * sender per task attempt, keyed by the task's partition id so a
    * transactional sender can zombie-fence, flushed at task end).
    *
    * With `commitDir` set, each task also keeps a PER-PARTITION commit
    * marker (`batch-<id>/p<partition>.committed`, written only after
    * its `flush()` commit barrier returns): when a batch fails after
    * some tasks committed and replays, the committed partitions SKIP —
    * they are not re-produced. Fencing alone cannot give this: a
    * deterministic `transactional.id` aborts a zombie's OPEN
    * transaction, but a transaction that already COMMITTED on the first
    * attempt is beyond revoking, so without the marker every committed
    * task would duplicate on replay. Residual window: a crash BETWEEN
    * the transaction commit and the marker write replays that one
    * partition — closing it entirely requires storing the source
    * offsets inside the Kafka transaction itself (the Kafka Streams
    * EOS design), which a file-marker protocol cannot express. The
    * marker path must be resolvable from EXECUTORS (same requirement
    * as any checkpoint location).
    */
  def write(
      senders: RecordSenderFactory,
      preservePartitioning: Boolean,
      commitDir: Option[String] = None)(
      df: DataFrame, batchId: Long): Unit = {
    val cols = df.select(
      col("topic"), col("partition"), col("timestamp").as("ts"),
      col("key"), col("value"), col("headers"))
    cols.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val marker = commitDir.map { d =>
          val p = new org.apache.hadoop.fs.Path(d, s"batch-$batchId/p$pid.committed")
          (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
        }
        val alreadyCommitted = marker.exists { case (fs, p) => fs.exists(p) }
        if (!alreadyCommitted) {
          val sender = senders.senderFor(pid)
          try {
            rows.foreach { r =>
              val headers = Option(r.getSeq[Row](r.fieldIndex("headers")))
                .getOrElse(Seq.empty)
                .map(h => (h.getString(0), h.getAs[Array[Byte]](1)))
              sender.send(
                r.getString(r.fieldIndex("topic")),
                if (preservePartitioning) Some(r.getInt(r.fieldIndex("partition"))) else None,
                r.getTimestamp(r.fieldIndex("ts")).getTime,
                r.getAs[Array[Byte]]("key"),
                r.getAs[Array[Byte]]("value"),
                headers)
            }
            sender.flush()
            // AFTER the commit barrier: the marker records "this
            // partition's transaction committed for this batch"
            marker.foreach { case (fs, p) =>
              fs.mkdirs(p.getParent)
              fs.create(p, true).close()
            }
          } finally sender.close() // no-op for pooled wrappers
        }
      }
    }
  }

  /** The full exactly-once sink: record-complete produce + two-level
    * idempotent commit.
    *
    * Precise guarantee, per level:
    *  - the BATCH marker ([[Pipeline.idempotentForeachBatch]]) makes a
    *    fully-committed batch replay a no-op without touching executors;
    *  - the PER-PARTITION markers ([[write]]) make a PARTIALLY-committed
    *    batch replay re-produce only the partitions that never
    *    committed — committed partitions skip, so a mid-batch failure
    *    no longer duplicates the tasks that had already flushed;
    *  - the deterministic `transactional.id` ([[RecordSenderFactory]])
    *    fences CONCURRENT zombies: a hung first attempt still holding an
    *    open transaction is aborted the moment its retry calls
    *    `initTransactions()` — fencing handles the still-running
    *    attempt, the markers handle the already-committed one; the two
    *    mechanisms close different windows and both are needed.
    *
    * Residual window (documented, not hidden): a crash between a task's
    * transaction commit and its marker write replays that single
    * partition; full closure requires offsets-inside-the-transaction
    * (the Kafka Streams EOS design). PipelineSpec's partial-batch
    * replay case pins the strengthened behavior: committed partitions
    * do NOT re-produce on replay.
    */
  def exactlyOnceSink(
      senders: RecordSenderFactory,
      preservePartitioning: Boolean,
      commitDir: String): (DataFrame, Long) => Unit =
    Pipeline.idempotentForeachBatch(
      commitDir, write(senders, preservePartitioning, Some(commitDir)))
}
