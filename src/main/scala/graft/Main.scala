package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.admin.{TopicAdmin, TopicMetadataClient}
import graft.config.ReplicatorConfig
import graft.streaming.Pipeline

/** The replicator entry point — the reference's `main` re-expressed as
  * the three-phase lifecycle of SURVEY.md §3 (reference:
  * FlinkKafkaReplicator.java:70-137):
  *
  *   A. configuration: argv → validated [[ReplicatorConfig]] (A1–A5, D8)
  *   B. control plane: pre-flight topic reconciliation, fail-fast (C1–C7)
  *   C. dataflow: Kafka→Kafka structured-streaming pipeline with
  *      fixed-delay restart (D1–D7)
  *
  * The topic-metadata client is injected so phase B is testable without
  * brokers ([[graft.admin.InMemoryMetadataClient]]); the production
  * binding wraps `org.apache.kafka.clients.admin.AdminClient` — the same
  * client API the reference uses (reference: pom.xml:97-101) — and binds
  * at deploy time where kafka-clients is on the classpath (this build
  * environment ships neither Kafka jars nor brokers).
  */
object Main {

  /** Phases A+B: parse/validate args and reconcile topics. Returns the
    * config if the stream is safe to start, or the error lines to print.
    * (`fromArgs` runs the `<<`/`>>` preprocessing itself — no outer call.)
    */
  def preflight(
      args: Array[String],
      clientFor: Map[String, String] => TopicMetadataClient): Either[Seq[String], ReplicatorConfig] =
    ReplicatorConfig.fromArgs(args.toSeq).flatMap { cfg =>
      val failures = TopicAdmin.reconcile(
        clientFor(cfg.consumerProps), clientFor(cfg.producerProps), cfg)
      if (failures.isEmpty) Right(cfg) else Left(failures)
    }

  /** Phase C: start the replication stream (D1–D7) — the built-in
    * at-least-once sink by default; the transactional record-complete
    * path when `--exactly-once` was requested (D6, reference:
    * FlinkKafkaReplicator.java:120-124); drain-and-stop when
    * `--backfill` was requested (extension — uses the at-least-once
    * sink; the `--backfill --exactly-once` combination is rejected by
    * [[ReplicatorConfig.fromArgs]], so no silent downgrade can occur
    * here).
    */
  def startStream(
      spark: SparkSession,
      cfg: ReplicatorConfig,
      checkpointLocation: String,
      senderFor: ReplicatorConfig => () => graft.streaming.RecordSender): StreamingQuery =
    if (cfg.backfill)
      Pipeline.startBackfill(spark, cfg, checkpointLocation)
    else if (cfg.exactlyOnce)
      Pipeline.startExactlyOnce(spark, cfg, checkpointLocation,
        s"$checkpointLocation/graft-commits", senderFor(cfg))
    else
      Pipeline.start(spark, cfg, checkpointLocation)

  /** Full lifecycle with the reference's fixed-delay restart policy
    * (4 attempts / 10 s, reference: FlinkKafkaReplicator.java:99).
    */
  def run(
      args: Array[String],
      spark: SparkSession,
      clientFor: Map[String, String] => TopicMetadataClient,
      checkpointLocation: String,
      senderFor: ReplicatorConfig => () => graft.streaming.RecordSender = reflectiveSender): Either[Seq[String], Unit] =
    preflight(args, clientFor).map { cfg =>
      Pipeline.runWithRestarts()(() => startStream(spark, cfg, checkpointLocation, senderFor))
    }

  /** Deploy-time transactional-producer binding, loaded reflectively like
    * the admin client (kafka-clients is absent at build time). Receives
    * the producer props WITH `transaction.timeout.ms` injected — the
    * reference does the same unconditionally (reference:
    * FlinkKafkaReplicator.java:106).
    */
  def reflectiveSender(cfg: ReplicatorConfig): () => graft.streaming.RecordSender = () =>
    Class.forName("graft.streaming.KafkaProducerRecordSender")
      .getConstructor(classOf[Map[String, String]])
      .newInstance(cfg.effectiveProducerProps)
      .asInstanceOf[graft.streaming.RecordSender]

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-replicator")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    val checkpoint = sys.env.getOrElse("GRAFT_CHECKPOINT_DIR", "/tmp/graft-checkpoint")
    // Production metadata binding is injected via reflection so this
    // module never links against kafka-clients (absent in this build
    // environment); deployments place graft-kafka-admin on the classpath.
    val clientFor: Map[String, String] => TopicMetadataClient = props =>
      Class.forName("graft.admin.AdminClientMetadataClient")
        .getConstructor(classOf[Map[String, String]])
        .newInstance(props).asInstanceOf[TopicMetadataClient]
    val outcome =
      try run(args, spark, clientFor, checkpoint)
      catch { // e.g. missing deploy-time admin binding, unreachable brokers
        case e: Throwable => Left(Seq(s"fatal: ${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    outcome match {
      case Left(errors) =>
        errors.foreach(System.err.println)
        System.err.println(ReplicatorConfig.usage)
        sys.exit(1)
      case Right(_) => ()
    }
  }
}
