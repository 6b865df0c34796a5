package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.admin.{InMemoryMetadataClient, TopicSpec}

/** The three-phase lifecycle wiring (SURVEY.md §3): argv → config →
  * reconciliation verdict.
  */
class MainSpec extends AnyFunSuite {

  private val baseArgs = Array(
    "--topics", "app\\..*",
    "--consumer.bootstrap.servers", "src:9092",
    "--consumer.group.id", "g1",
    "--producer.bootstrap.servers", "dst:9092")

  private def clients(src: Seq[TopicSpec], dst: Seq[TopicSpec]) = {
    val bySrv = Map(
      "src:9092" -> new InMemoryMetadataClient(src),
      "dst:9092" -> new InMemoryMetadataClient(dst))
    (props: Map[String, String]) => bySrv(props("bootstrap.servers"))
  }

  test("preflight passes when topics match") {
    val c = clients(
      Seq(TopicSpec("app.events", 4)), Seq(TopicSpec("app.events", 4)))
    val r = Main.preflight(baseArgs, c)
    assert(r.isRight)
    assert(r.toOption.get.topics == "app\\..*")
  }

  test("preflight fails fast on a missing target topic without --create-topics") {
    val c = clients(Seq(TopicSpec("app.events", 4)), Seq.empty)
    val r = Main.preflight(baseArgs, c)
    assert(r.isLeft)
    assert(r.left.toOption.get.exists(_.contains("does not exist")))
  }

  test("preflight with --create-topics creates the topic and succeeds") {
    val dst = new InMemoryMetadataClient(Seq.empty)
    val c = (props: Map[String, String]) =>
      if (props("bootstrap.servers") == "src:9092")
        new InMemoryMetadataClient(Seq(TopicSpec("app.events", 4, Map("retention.ms" -> "100"))))
      else dst
    val r = Main.preflight(baseArgs :+ "--create-topics", c)
    assert(r.isRight)
    assert(dst.snapshot("app.events").partitions == 4)
    assert(dst.snapshot("app.events").config == Map("retention.ms" -> "100"))
  }

  test("preflight rejects invalid args before touching any cluster") {
    var touched = false
    val c = (_: Map[String, String]) => { touched = true; new InMemoryMetadataClient(Seq.empty) }
    val r = Main.preflight(Array("--topics", "t", "--bogus", "x"), c)
    assert(r.isLeft && !touched)
  }

  test("D8 constraint: exactly-once requires txn timeout >= checkpoint interval") {
    val c = clients(Seq.empty, Seq.empty)
    val r = Main.preflight(baseArgs ++ Array(
      "--exactly-once", "--transaction-timeout-ms", "500",
      "--checkpoint-interval-ms", "1000"), c)
    assert(r.isLeft)
  }
}
