package graft.admin

import graft.config.ReplicatorConfig

/** Kafka topic metadata — the control plane's record type (reference:
  * Topic.java:7-10).
  */
final case class TopicSpec(
    name: String,
    partitions: Int,
    config: Map[String, String] = Map.empty)

/** One admin mutation or diagnostic the reconciliation decides on.
  * Splitting decision (pure) from execution (I/O) makes the whole C2–C7
  * decision table unit-testable — the reference interleaves them
  * (reference: FlinkKafkaReplicator.java:198-277).
  */
sealed trait AdminAction
object AdminAction {
  /** C3 — create missing target topic with the source's partition count,
    * RF=1, full source config (reference: FlinkKafkaReplicator.java:209-221).
    */
  final case class CreateTopic(spec: TopicSpec, replicationFactor: Short) extends AdminAction
  /** C4 — grow target partitions to the source count (reference:
    * FlinkKafkaReplicator.java:236-241).
    */
  final case class GrowPartitions(topic: String, increaseTo: Int) extends AdminAction
  /** C6 — set one target config property to the source value (reference:
    * FlinkKafkaReplicator.java:258-266).
    */
  final case class AlterConfig(topic: String, key: String, value: String) extends AdminAction
  /** C5/C6 — log-only outcomes. */
  final case class Warn(message: String) extends AdminAction
  /** C2/C4/C7 — fail-fast errors, aggregated then thrown before the stream
    * starts (reference: FlinkKafkaReplicator.java:207,274-275).
    */
  final case class Fail(message: String) extends AdminAction
}

/** Abstract Kafka admin surface. The production binding wraps
  * `org.apache.kafka.clients.admin.AdminClient` (same client API the
  * reference uses via Flink, reference: pom.xml:97-101) and lives where
  * the kafka-clients jar is on the classpath; tests and this zero-egress
  * environment use [[InMemoryMetadataClient]].
  */
trait TopicMetadataClient {
  def listTopicNames(): Seq[String]
  def describe(names: Seq[String]): Map[String, TopicSpec]
  def createTopic(spec: TopicSpec, replicationFactor: Short): Unit
  def growPartitions(topic: String, increaseTo: Int): Unit
  def alterConfig(topic: String, key: String, value: String): Unit
  /** Release broker connections/threads. The pre-flight is the only
    * consumer and closes both clients once reconciliation ends — a
    * production AdminClient would otherwise leak its network threads for
    * the whole stream lifetime. No-op default for in-memory clients.
    */
  def close(): Unit = ()
}

final class InMemoryMetadataClient(initial: Seq[TopicSpec]) extends TopicMetadataClient {
  private var topics: Map[String, TopicSpec] =
    initial.map(t => t.name -> t).toMap
  def snapshot: Map[String, TopicSpec] = topics
  override def listTopicNames(): Seq[String] = topics.keys.toSeq.sorted
  override def describe(names: Seq[String]): Map[String, TopicSpec] =
    names.flatMap(topics.get).map(t => t.name -> t).toMap
  override def createTopic(spec: TopicSpec, rf: Short): Unit =
    topics += spec.name -> spec
  override def growPartitions(topic: String, increaseTo: Int): Unit =
    topics += topic -> topics(topic).copy(partitions = increaseTo)
  override def alterConfig(topic: String, key: String, value: String): Unit = {
    val t = topics(topic)
    topics += topic -> t.copy(config = t.config + (key -> value))
  }
}

/** Pre-flight topic reconciliation (SURVEY.md §2.2, C1–C7): discover by
  * regex, diff source vs target, decide mutations. Runs once in the driver
  * before the stream starts (reference: FlinkKafkaReplicator.java:108) —
  * never inside a DataFrame.
  */
object TopicAdmin {

  /** C1 — topic discovery: list, regex-filter (full match, like the
    * reference's `regex.matcher(s).matches()`), describe (reference:
    * FlinkKafkaReplicator.java:179-196).
    */
  def discover(client: TopicMetadataClient, pattern: String): Map[String, TopicSpec] = {
    val re = java.util.regex.Pattern.compile(pattern)
    val names = client.listTopicNames().filter(n => re.matcher(n).matches())
    client.describe(names)
  }

  /** C2–C7 — the pure reconciliation decision table over one source/target
    * snapshot pair (reference: FlinkKafkaReplicator.java:202-271).
    */
  def plan(
      src: Map[String, TopicSpec],
      dst: Map[String, TopicSpec],
      cfg: ReplicatorConfig): Seq[AdminAction] = {
    import AdminAction._
    src.toSeq.sortBy(_._1).flatMap { case (name, s) =>
      dst.get(name) match {
        case None =>
          // C2/C3 — missing on target (reference: :209-221)
          if (cfg.createTopics)
            Seq(CreateTopic(s, ReplicatorConfig.DefaultReplicationFactor))
          else
            Seq(Fail(s"topic $name does not exist on the target cluster (use --create-topics)"))
        case Some(d) =>
          // C4/C5 — partition-count comparison (reference: :223-245)
          val partitionActions: Seq[AdminAction] =
            if (d.partitions < s.partitions) {
              if (cfg.createPartitions)
                Seq(GrowPartitions(name, s.partitions))
              else if (!cfg.preservePartitioning)
                Seq(Warn(s"topic $name has fewer partitions on target " +
                  s"(${d.partitions} < ${s.partitions}); messages will be redistributed"))
              else
                Seq(Fail(s"topic $name has fewer partitions on target " +
                  s"(${d.partitions} < ${s.partitions}) (use --create-partitions)"))
            } else if (d.partitions > s.partitions) {
              Seq(Warn(s"topic $name has more partitions on target " +
                s"(${d.partitions} > ${s.partitions})"))
            } else Nil
          // C6 — null-aware config diff (reference: :247-269): for every
          // source property whose value differs on the target (missing
          // counts as different), warn or alter.
          val configActions: Seq[AdminAction] = s.config.toSeq.sortBy(_._1).flatMap {
            case (k, v) if !d.config.get(k).contains(v) =>
              if (cfg.syncProperties) Seq(AlterConfig(name, k, v))
              else Seq(Warn(s"topic $name config $k differs: " +
                s"source=$v target=${d.config.get(k).orNull}"))
            case _ => Nil
          }
          partitionActions ++ configActions
      }
    }
  }

  /** C7 — execute the plan; aggregate failures and throw after the full
    * loop, never mid-way (reference: FlinkKafkaReplicator.java:207,274-275).
    * Warn actions are the reference's log-only outcomes (reference:
    * FlinkKafkaReplicator.java:228-229,243-245,253-257) — they must reach
    * the operator's console, not be silently discarded.
    */
  def execute(client: TopicMetadataClient, actions: Seq[AdminAction]): Seq[String] = {
    import AdminAction._
    actions.foreach { case Warn(m) => System.err.println(s"[graft] WARN: $m"); case _ => () }
    val failures = actions.collect { case Fail(m) => m }
    if (failures.isEmpty) actions.foreach {
      case CreateTopic(spec, rf) => client.createTopic(spec, rf)
      case GrowPartitions(t, n) => client.growPartitions(t, n)
      case AlterConfig(t, k, v) => client.alterConfig(t, k, v)
      case Warn(_) | Fail(_) => ()
    }
    failures
  }

  /** Full pre-flight: discover both clusters, plan, execute; returns the
    * aggregated failures (empty = safe to start the stream).
    */
  def reconcile(
      source: TopicMetadataClient,
      target: TopicMetadataClient,
      cfg: ReplicatorConfig): Seq[String] =
    try {
      val src = discover(source, cfg.topics)
      val dst = discover(target, cfg.topics)
      execute(target, plan(src, dst, cfg))
    } finally {
      // a client close() may itself throw (pending-call interruption);
      // the other client must still be closed
      try source.close()
      finally target.close()
    }
}
