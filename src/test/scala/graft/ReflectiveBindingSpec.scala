package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.{TopicMetadataClient, TopicSpec}
import graft.config.ReplicatorConfig
import graft.streaming.{KafkaBatchWriter, RecordSender}

/** Pins the deploy-time reflective contract (SURVEY.md §7.4 #6): the
  * class names `graft.Main` loads, their single `Map[String, String]`
  * constructor, and the traits they implement — exercised through
  * in-memory fixture classes loaded via the SAME reflective helpers, and
  * textually against the real deploy sources in `deploy/src` (which this
  * broker-free build cannot compile: they link kafka-clients).
  */
class ReflectiveBindingSpec extends AnyFunSuite {

  private val minimal = Seq(
    "--topics", "t",
    "--consumer.bootstrap.servers", "s:9092",
    "--consumer.group.id", "g",
    "--producer.bootstrap.servers", "d:9092")

  test("loadMetadataClient constructs a TopicMetadataClient from (Map[String, String])") {
    FixtureMetadataClient.constructed = Nil
    val props = Map("bootstrap.servers" -> "b:9092", "client.id" -> "c1")
    val client = Main.loadMetadataClient(classOf[FixtureMetadataClient].getName)(props)
    assert(FixtureMetadataClient.constructed == Seq(props)) // props reached the ctor
    assert(client.listTopicNames() == Seq("fixture"))       // and the instance works
    assert(client.describe(Seq("fixture"))("fixture").partitions == 3)
  }

  test("reflectiveSenderFactory derives deterministic per-partition fencing ids under --exactly-once") {
    import graft.streaming.PooledSenderFactory
    val cfg = ReplicatorConfig.fromArgs(minimal :+ "--exactly-once").toOption.get
    val token = Main.poolToken(cfg) // base + producer-props digest
    assert(token.startsWith("graft-sink-graft-replicator-"),
      "token must carry the base plus a props digest")
    PooledSenderFactory.shutdown(token) // isolate from other specs
    FixtureSender.constructed.clear()
    val factory = Main.reflectiveSenderFactory(cfg, classOf[FixtureSender].getName)
    try {
      factory.senderFor(3)
      factory.senderFor(3) // a same-JVM retry REUSES the pooled producer
      factory.senderFor(4)
      val ids = FixtureSender.snapshot().map(_("transactional.id"))
      assert(ids == Seq("graft-replicator-p3", "graft-replicator-p4"),
        "one producer per partition — the pool must not rebuild on a same-JVM retry")
      // a rebuild (eviction / another executor) derives the SAME id, so
      // initTransactions fences whatever producer held it before
      PooledSenderFactory.shutdown(token)
      factory.senderFor(3)
      assert(FixtureSender.snapshot().last("transactional.id") == "graft-replicator-p3")
      // the injected transaction.timeout.ms rides along (reference:
      // FlinkKafkaReplicator.java:106)
      assert(FixtureSender.snapshot().head("transaction.timeout.ms") == "870000")
    } finally PooledSenderFactory.shutdown(token)
  }

  test("an explicit --producer.transactional.id passthrough becomes the fencing-id base") {
    FixtureSender.constructed.clear()
    val cfg = ReplicatorConfig.fromArgs(
      minimal ++ Seq("--exactly-once", "--producer.transactional.id", "myrepl")).toOption.get
    Main.reflectiveSenderFactory(cfg, classOf[FixtureSender].getName).senderFor(0)
    assert(FixtureSender.snapshot().head("transactional.id") == "myrepl-p0")
  }

  test("poolToken separates sinks that differ only in producer props") {
    val a = ReplicatorConfig.fromArgs(minimal :+ "--exactly-once").toOption.get
    val b = ReplicatorConfig.fromArgs(Seq(
      "--topics", "t",
      "--consumer.bootstrap.servers", "s:9092",
      "--consumer.group.id", "g",
      "--producer.bootstrap.servers", "other:9092",
      "--exactly-once")).toOption.get
    assert(Main.poolToken(a) != Main.poolToken(b),
      "two sinks on different clusters must never share pooled producers")
    assert(Main.poolToken(a) == Main.poolToken(a), "token must be deterministic")
  }

  test("at-least-once senders get no transactional.id injected") {
    FixtureSender.constructed.clear()
    val cfg = ReplicatorConfig.fromArgs(minimal).toOption.get
    Main.reflectiveSenderFactory(cfg, classOf[FixtureSender].getName).senderFor(7)
    assert(!FixtureSender.snapshot().head.contains("transactional.id"))
  }

  test("transactionalId derivation is pure and collision-free across partitions") {
    assert(KafkaBatchWriter.transactionalId("base", 0) == "base-p0")
    val ids = (0 until 64).map(KafkaBatchWriter.transactionalId("graft", _))
    assert(ids.distinct.length == ids.length)
  }

  test("a missing binding fails with ClassNotFoundException naming the class") {
    val e = intercept[ClassNotFoundException] {
      Main.loadMetadataClient("graft.admin.NoSuchBinding")(Map.empty)
    }
    assert(e.getMessage.contains("NoSuchBinding"))
  }

  /** The deploy sources must declare EXACTLY the contract Main loads:
    * package + class name matching the binding constant, a
    * `(props: Map[String, String])` primary constructor, and the trait.
    * A rename or signature change there without updating Main must fail
    * here, not at a user's first production run.
    */
  private def pinDeploySource(bindingClass: String, trait_ : String): Unit = {
    val Array(pkg, cls) =
      Array(bindingClass.substring(0, bindingClass.lastIndexOf('.')),
        bindingClass.substring(bindingClass.lastIndexOf('.') + 1))
    val path = Paths.get("deploy/src/main/scala", pkg.replace('.', '/'), s"$cls.scala")
    assert(Files.exists(path), s"deploy source missing: $path")
    val src = Files.readString(path)
    assert(src.contains(s"package $pkg"), s"$path: wrong package")
    val decl = raw"class\s+$cls\s*\(props:\s*Map\[String,\s*String\]\)\s+extends\s+$trait_".r
    assert(decl.findFirstIn(src).isDefined,
      s"$path: expected `class $cls(props: Map[String, String]) extends $trait_`")
  }

  test("deploy source pins: AdminClientMetadataClient") {
    pinDeploySource(Main.AdminBindingClass, "TopicMetadataClient")
  }

  test("deploy source pins: KafkaProducerRecordSender") {
    // OffsetCommittingSender extends RecordSender: the production sender
    // carries the offsets-in-transaction capability (stageProgress /
    // progressCommitted) that closes the marker protocol's residual window
    pinDeploySource(Main.SenderBindingClass, "OffsetCommittingSender")
  }
}

/** Reflective fixture: the same constructor shape as the deploy-time
  * `AdminClientMetadataClient`, backed by in-memory state.
  */
class FixtureMetadataClient(props: Map[String, String]) extends TopicMetadataClient {
  FixtureMetadataClient.constructed :+= props
  private val inner = new graft.admin.InMemoryMetadataClient(Seq(TopicSpec("fixture", 3)))
  override def listTopicNames(): Seq[String] = inner.listTopicNames()
  override def describe(names: Seq[String]): Map[String, TopicSpec] = inner.describe(names)
  override def createTopic(spec: TopicSpec, rf: Short): Unit = inner.createTopic(spec, rf)
  override def growPartitions(topic: String, increaseTo: Int): Unit =
    inner.growPartitions(topic, increaseTo)
  override def alterConfig(topic: String, key: String, value: String): Unit =
    inner.alterConfig(topic, key, value)
}

object FixtureMetadataClient {
  @volatile var constructed: Seq[Map[String, String]] = Nil
}

/** Reflective fixture: the same constructor shape as the deploy-time
  * `KafkaProducerRecordSender`; records the props each instance got.
  */
class FixtureSender(props: Map[String, String]) extends RecordSender {
  FixtureSender.constructed.add(props)
  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit = ()
  override def flush(): Unit = ()
}

object FixtureSender {
  val constructed = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
  def snapshot(): Seq[Map[String, String]] = {
    import scala.jdk.CollectionConverters._
    constructed.asScala.toSeq
  }
}
