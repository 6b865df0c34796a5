package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.config.ReplicatorConfig
import graft.streaming.{Pipeline, RecordSender, RecordSenderFactory}

/** Counts delivered envelope rows and bytes on the executor; the bench
  * polls the JVM-global counters (local-mode: executors share the JVM).
  * Top-level so the factory closure serializes without capturing the
  * bench object graph.
  */
class CountingSender extends RecordSender {
  override def send(topic: String, partition: Option[Int], timestampMs: Long,
      key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit = {
    CountingSender.rows.incrementAndGet()
    CountingSender.bytes.addAndGet(
      (if (key == null) 0 else key.length) + (if (value == null) 0 else value.length))
  }
  override def flush(): Unit = ()
}
object CountingSender {
  val rows = new AtomicLong(0L)
  val bytes = new AtomicLong(0L)
  def reset(): Unit = { rows.set(0L); bytes.set(0L) }
}

/** Replication-throughput benchmark — the engine's actual job (D1–D5
  * identity pipeline) has no recorded rows/s number; every other bench
  * row is an analytics query. This main measures sustained delivery rate
  * over a generated envelope fixture at the reference's 1 s
  * checkpoint/trigger cadence (reference: FlinkKafkaReplicator.java:99),
  * with and without `--max-offsets-per-trigger`:
  *
  *  - UNCAPPED: every remaining file lands in the first microbatch —
  *    measures raw pipeline throughput (source scan → envelope transform
  *    → per-task sender drain), the number a capacity plan starts from.
  *  - CAPPED: bounded microbatches at the 1 s trigger — measures the
  *    rate-limited steady state a backfill actually runs at, where
  *    throughput ≈ min(cap/trigger, raw) and the gap to the cap is the
  *    per-microbatch scheduling overhead.
  *
  * The fixture is broker-free on purpose (zero-egress environment): the
  * file source drives the IDENTICAL transform + sender sink; only the
  * source connector differs from production. Payloads are ~200-byte
  * values / 16-byte keys — the reference's CDC-ish envelope shape.
  *
  * Prints ONE JSON line and writes the same JSON to
  * `SPARK_GRAFT_REPLBENCH_OUT` (default `repl_bench.json`).
  */
object ReplBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_REPLBENCH_OUT", "repl_bench.json")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_REPL_FILES", "32").toInt
    val rowsPerFile = sys.env.getOrElse("SPARK_GRAFT_REPL_ROWS_PER_FILE", "25000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-replbench-src").toString
    val total = nFiles * rowsPerFile
    // uniform files (the fileSource cap contract) of envelope rows:
    // deterministic ~200 B values via repeated md5 hex, 16 B binary keys
    (0 until nFiles).foreach { i =>
      spark.range(i * rowsPerFile, (i + 1) * rowsPerFile).toDF("id")
        .select(
          lit("repl-bench").as("topic"),
          (col("id") % 8).cast("int").as("partition"),
          col("id").as("offset"),
          timestamp_seconds(lit(1700000000L) + col("id") / 1000).as("timestamp"),
          unhex(md5(col("id").cast("string"))).as("key"),
          encode(concat_ws("", (0 until 6).map(j =>
            md5(concat(col("id").cast("string"), lit(s"-$j")))): _*), "UTF-8")
            .as("value"),
          array(struct(lit("src").as("key"),
            encode(lit("bench"), "UTF-8").as("value"))).as("headers"))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val schema = spark.read.parquet(dir).schema
    val senders = RecordSenderFactory.uniform(() => new CountingSender)

    /** Drain the whole fixture through the at-least-once record-complete
      * pipeline at the 1 s trigger; rows/s = total / (last-row time −
      * first-row time is unknowable from outside, so wall time from
      * query start to delivered==total — the operationally honest
      * number, scheduling overhead included).
      */
    def run(cfg: ReplicatorConfig): (Double, Double, Long) = {
      CountingSender.reset()
      val ck = Files.createTempDirectory("graft-replbench-ck").toString
      val src = Pipeline.fileSource(spark, cfg, dir, schema, rowsPerFile)
      val t0 = System.nanoTime()
      val q = Pipeline.startAtLeastOnceComplete(
        spark, cfg, ck, senders, sourceOverride = Some(src),
        trigger = Some(Trigger.ProcessingTime(1000L)))
      val deadline = System.currentTimeMillis() + 600000L
      while (CountingSender.rows.get() < total &&
          System.currentTimeMillis() < deadline && q.isActive) {
        Thread.sleep(50)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      q.stop()
      q.awaitTermination()
      val delivered = CountingSender.rows.get()
      val mbytes = CountingSender.bytes.get() / 1e6
      (elapsed, mbytes, delivered)
    }

    val base = ReplicatorConfig(topics = "repl-bench")
    // cap = 4 files/trigger -> steady state of ~nFiles/4 one-second
    // trigger cycles; the measured rate vs cap/trigger is the overhead
    val capRows = 4 * rowsPerFile
    val (uncappedSec, mb1, n1) = run(base)
    val (cappedSec, _, n2) = run(base.copy(maxOffsetsPerTrigger = Some(capRows)))

    val uncappedRps = n1 / uncappedSec
    val cappedRps = n2 / cappedSec
    val json =
      s"""{"metric":"repl_rows_per_sec","rows":$total,"payload_mb":${f"$mb1%.1f"},""" +
      s""""uncapped_sec":${f"$uncappedSec%.2f"},"uncapped_rows_per_sec":${f"$uncappedRps%.0f"},""" +
      s""""cap_rows_per_trigger":$capRows,"capped_sec":${f"$cappedSec%.2f"},""" +
      s""""capped_rows_per_sec":${f"$cappedRps%.0f"},"delivered":[$n1,$n2],""" +
      // a deadline-expired partial run must be distinguishable from a
      // slow-but-complete one: rows/s over a truncated delivery is not
      // comparable across rounds
      s""""complete":${n1 == total && n2 == total},"cpus":$cpus}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
