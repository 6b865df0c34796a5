package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.admin._
import graft.admin.AdminAction._
import graft.config.ReplicatorConfig

/** C1–C7 decision tables from FIXTURES.md §3. */
class TopicAdminSpec extends AnyFunSuite {

  private def cfg(createTopics: Boolean = false, createPartitions: Boolean = false,
      syncProperties: Boolean = false, preservePartitioning: Boolean = true) =
    ReplicatorConfig("t.*", createTopics = createTopics,
      createPartitions = createPartitions, syncProperties = syncProperties,
      preservePartitioning = preservePartitioning)

  test("missing topic: error without flag, create with flag") {
    val src = Map("t1" -> TopicSpec("t1", 4, Map("retention.ms" -> "100")))
    assert(TopicAdmin.plan(src, Map.empty, cfg()) ==
      Seq(Fail("topic t1 does not exist on the target cluster (use --create-topics)")))
    assert(TopicAdmin.plan(src, Map.empty, cfg(createTopics = true)) ==
      Seq(CreateTopic(TopicSpec("t1", 4, Map("retention.ms" -> "100")), 1)))
  }

  test("fewer target partitions: error / warn with no-preserve / grow with flag") {
    val src = Map("t2" -> TopicSpec("t2", 8))
    val dst = Map("t2" -> TopicSpec("t2", 4))
    assert(TopicAdmin.plan(src, dst, cfg()).collect { case f: Fail => f }.nonEmpty)
    assert(TopicAdmin.plan(src, dst, cfg(preservePartitioning = false))
      .collect { case w: Warn => w }.nonEmpty)
    assert(TopicAdmin.plan(src, dst, cfg(createPartitions = true)) ==
      Seq(GrowPartitions("t2", 8)))
  }

  test("more target partitions: warn only") {
    val actions = TopicAdmin.plan(
      Map("t3" -> TopicSpec("t3", 2)), Map("t3" -> TopicSpec("t3", 6)), cfg())
    assert(actions.length == 1 && actions.head.isInstanceOf[Warn])
  }

  test("config drift: warn without flag, alter with flag; null-aware") {
    val src = Map("t4" -> TopicSpec("t4", 2,
      Map("retention.ms" -> "100", "cleanup.policy" -> "compact", "same" -> "x")))
    val dst = Map("t4" -> TopicSpec("t4", 2,
      Map("retention.ms" -> "200", "max.message.bytes" -> "1048576", "same" -> "x")))
    val warns = TopicAdmin.plan(src, dst, cfg())
    // cleanup.policy missing on target + retention.ms differs; "same" silent;
    // target-only keys are not the source's concern (reference iterates
    // source config only, FlinkKafkaReplicator.java:249).
    assert(warns.collect { case w: Warn => w }.size == 2)
    val alters = TopicAdmin.plan(src, dst, cfg(syncProperties = true))
    assert(alters.toSet == Set(
      AlterConfig("t4", "cleanup.policy", "compact"),
      AlterConfig("t4", "retention.ms", "100")))
  }

  test("C7 fail-fast: failures suppress all mutations, are aggregated") {
    val src = Map(
      "t1" -> TopicSpec("t1", 4),
      "t2" -> TopicSpec("t2", 8, Map("k" -> "v")))
    val dst = Map("t2" -> TopicSpec("t2", 4))
    val client = new InMemoryMetadataClient(Seq(TopicSpec("t2", 4)))
    // t1 missing (no --create-topics) and t2 shrunk (no --create-partitions)
    val failures = TopicAdmin.execute(client,
      TopicAdmin.plan(src, dst, cfg(syncProperties = true)))
    assert(failures.size == 2)
    assert(client.snapshot("t2").partitions == 4, "no mutation on failure")
    assert(client.snapshot("t2").config.isEmpty, "no alter on failure")
  }

  test("C1 discovery: full-match regex, excludes internal topics") {
    val client = new InMemoryMetadataClient(Seq(
      TopicSpec("mytopic", 1), TopicSpec("foo", 2),
      TopicSpec("_internal_offsets", 50), TopicSpec("my.topic-2", 3)))
    assert(TopicAdmin.discover(client, "^[^_].*").keySet ==
      Set("mytopic", "foo", "my.topic-2"))
    assert(TopicAdmin.discover(client, "mytopic").keySet == Set("mytopic"))
    assert(TopicAdmin.discover(client, "my").isEmpty, "full match, not prefix")
  }

  test("end-to-end reconcile mutates the target cluster") {
    val source = new InMemoryMetadataClient(Seq(
      TopicSpec("t1", 4, Map("retention.ms" -> "100")),
      TopicSpec("t2", 8, Map("cleanup.policy" -> "compact"))))
    val target = new InMemoryMetadataClient(Seq(TopicSpec("t2", 4)))
    val failures = TopicAdmin.reconcile(source, target,
      cfg(createTopics = true, createPartitions = true, syncProperties = true))
    assert(failures.isEmpty)
    assert(target.snapshot("t1") == TopicSpec("t1", 4, Map("retention.ms" -> "100")))
    assert(target.snapshot("t2").partitions == 8)
    assert(target.snapshot("t2").config("cleanup.policy") == "compact")
  }

  test("reconcile closes both metadata clients, even when the plan fails") {
    class ClosingClient(ts: Seq[TopicSpec]) extends TopicMetadataClient {
      private val inner = new InMemoryMetadataClient(ts)
      var closed = false
      override def listTopicNames(): Seq[String] = inner.listTopicNames()
      override def describe(names: Seq[String]): Map[String, TopicSpec] = inner.describe(names)
      override def createTopic(spec: TopicSpec, rf: Short): Unit = inner.createTopic(spec, rf)
      override def growPartitions(topic: String, n: Int): Unit = inner.growPartitions(topic, n)
      override def alterConfig(topic: String, k: String, v: String): Unit = inner.alterConfig(topic, k, v)
      override def close(): Unit = closed = true
    }
    val okSrc = new ClosingClient(Seq(TopicSpec("t1", 4)))
    val okDst = new ClosingClient(Seq(TopicSpec("t1", 4)))
    assert(TopicAdmin.reconcile(okSrc, okDst, cfg()).isEmpty)
    assert(okSrc.closed && okDst.closed)
    // failing path (missing target topic, no --create-topics): still closed
    val failSrc = new ClosingClient(Seq(TopicSpec("t1", 4)))
    val failDst = new ClosingClient(Seq.empty)
    assert(TopicAdmin.reconcile(failSrc, failDst, cfg()).nonEmpty)
    assert(failSrc.closed && failDst.closed)
  }
}
