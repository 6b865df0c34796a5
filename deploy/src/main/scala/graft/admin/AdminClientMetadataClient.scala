package graft.admin

import java.util.Properties
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.kafka.clients.admin.{AdminClient, AlterConfigOp, ConfigEntry, NewPartitions, NewTopic}
import org.apache.kafka.common.config.ConfigResource

/** Production [[TopicMetadataClient]] over the kafka-clients
  * `AdminClient` — the same client API the reference drives
  * (reference: FlinkKafkaReplicator.java:179-196, pom.xml:97-101).
  *
  * DEPLOY-TIME SOURCE: compiled only where kafka-clients is on the
  * classpath (see deploy/README.md); the library build never links it.
  * Loaded reflectively by `graft.Main` — the class name and the single
  * `Map[String, String]` constructor are the pinned contract
  * (ReflectiveBindingSpec).
  */
final class AdminClientMetadataClient(props: Map[String, String]) extends TopicMetadataClient {

  /** reference: FlinkKafkaReplicator.java:40 */
  private val requestTimeoutMs = 30000L

  private val admin: AdminClient = {
    val p = new Properties()
    props.foreach { case (k, v) => p.put(k, v) }
    AdminClient.create(p)
  }

  override def listTopicNames(): Seq[String] =
    admin.listTopics().names()
      .get(requestTimeoutMs, TimeUnit.MILLISECONDS).asScala.toSeq.sorted

  /** Partition counts via `describeTopics`, config via `describeConfigs`
    * — ALL config entries, like the reference (which copies every entry
    * into the Topic's Properties, reference:
    * FlinkKafkaReplicator.java:188-194).
    */
  override def describe(names: Seq[String]): Map[String, TopicSpec] = {
    if (names.isEmpty) return Map.empty
    val descriptions = admin.describeTopics(names.asJava).allTopicNames()
      .get(requestTimeoutMs, TimeUnit.MILLISECONDS).asScala
    val resources = names.map(n => new ConfigResource(ConfigResource.Type.TOPIC, n))
    val configs = admin.describeConfigs(resources.asJava).all()
      .get(requestTimeoutMs, TimeUnit.MILLISECONDS).asScala
    names.map { n =>
      val config = configs(new ConfigResource(ConfigResource.Type.TOPIC, n))
        .entries().asScala
        .map((e: ConfigEntry) => e.name() -> e.value())
        .toMap
      n -> TopicSpec(n, descriptions(n).partitions().size(), config)
    }.toMap
  }

  /** reference: FlinkKafkaReplicator.java:209-221 (C3). */
  override def createTopic(spec: TopicSpec, replicationFactor: Short): Unit = {
    val topic = new NewTopic(spec.name, spec.partitions, replicationFactor)
      .configs(spec.config.asJava)
    admin.createTopics(java.util.Collections.singleton(topic)).all()
      .get(requestTimeoutMs, TimeUnit.MILLISECONDS)
  }

  /** reference: FlinkKafkaReplicator.java:236-241 (C4). */
  override def growPartitions(topic: String, increaseTo: Int): Unit =
    admin.createPartitions(
      java.util.Collections.singletonMap(topic, NewPartitions.increaseTo(increaseTo)))
      .all().get(requestTimeoutMs, TimeUnit.MILLISECONDS)

  /** reference: FlinkKafkaReplicator.java:258-266 (C6) — modern
    * `incrementalAlterConfigs` replacing the deprecated `alterConfigs`.
    */
  override def alterConfig(topic: String, key: String, value: String): Unit = {
    val op = new AlterConfigOp(new ConfigEntry(key, value), AlterConfigOp.OpType.SET)
    admin.incrementalAlterConfigs(
      java.util.Collections.singletonMap(
        new ConfigResource(ConfigResource.Type.TOPIC, topic),
        java.util.Collections.singleton(op): java.util.Collection[AlterConfigOp]))
      .all().get(requestTimeoutMs, TimeUnit.MILLISECONDS)
  }

  override def close(): Unit = admin.close()
}
