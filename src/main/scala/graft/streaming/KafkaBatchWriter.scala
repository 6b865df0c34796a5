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
    * (exactly-once). Called once per task after its rows are sent; a
    * sender is single-use — one task attempt, one commit.
    */
  def flush(): Unit
}

/** Per-task sender creation, keyed by the task's batch partition id —
  * the zombie-fencing hook for exactly-once delivery.
  *
  * A transactional producer's `transactional.id` must be DETERMINISTIC
  * per (sink, partition) across attempts: when a task retries, its new
  * producer calls `initTransactions()` under the same id, which bumps
  * the epoch and FENCES the previous attempt's producer — the zombie can
  * no longer commit, and its open transaction is aborted. Combined with
  * `read_committed` consumers downstream, this closes the
  * some-tasks-flushed replay window that per-task atomicity leaves open
  * (see [[KafkaBatchWriter.exactlyOnceSink]]). Derive the id with
  * [[KafkaBatchWriter.transactionalId]]; never use a random or
  * per-attempt id, which would make every retry a new producer identity
  * with nothing to fence.
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
    */
  def write(senders: RecordSenderFactory, preservePartitioning: Boolean)(
      df: DataFrame, batchId: Long): Unit = {
    val cols = df.select(
      col("topic"), col("partition"), col("timestamp").as("ts"),
      col("key"), col("value"), col("headers"))
    cols.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val sender = senders.senderFor(org.apache.spark.TaskContext.getPartitionId())
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
      }
    }
  }

  /** The full exactly-once sink: record-complete produce + idempotent
    * batch commit. Replayed microbatches (failure/restart) are skipped
    * once marked committed.
    *
    * Precise guarantee: the batch marker makes a FULLY-committed batch
    * replay a no-op. Within a failing batch, each task commits its own
    * sender in `flush()`, so a batch that dies after some tasks flushed
    * will re-produce those tasks' records on retry — per-task atomicity,
    * not per-batch. Closing that window is exactly what the
    * [[RecordSenderFactory]] contract provides: deterministic
    * `transactional.id` per (sink, partition) so a retrying task
    * zombie-fences its previous attempt, plus `read_committed` consumers
    * downstream. The production sender
    * (`graft.streaming.KafkaProducerRecordSender`, deploy-time binding)
    * configures exactly that; with the in-memory test sender the
    * asserted property is per-task atomicity + replayed-batch
    * idempotence + deterministic fencing ids (PipelineSpec's
    * partial-batch replay case).
    */
  def exactlyOnceSink(
      senders: RecordSenderFactory,
      preservePartitioning: Boolean,
      commitDir: String): (DataFrame, Long) => Unit =
    Pipeline.idempotentForeachBatch(commitDir, write(senders, preservePartitioning))
}
