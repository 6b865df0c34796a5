package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Similarity, Tables, TextAnalysis}

/** Serving-latency benchmark for the five persisted indexes (VERDICT r9
  * task 7; cluster rows added per VERDICT r14 task 7): IVF,
  * sign-signature, BM25, PQ, and the near-dup cluster index (the
  * EXT-6aj gate's batch face plus its report consumers). The correctness specs
  * already pin probe results and pruning; this records the missing SLO
  * number — per-probe-BATCH wall time against an index built once —
  * next to the build cost, because "train once, probe forever" is only
  * an argument if the probe side is actually cheap.
  *
  * Method: each index is built once into a temp dir (timed — the
  * amortized corpus pass), then the SAME deterministic query batch
  * (embeddings with vec_id % 100 == 0; for BM25 the corpus's top-5
  * tokens by (count desc, token asc)) is probed once untimed (plan
  * warm-up, mirroring Bench's discipline) and five timed passes report
  * the MEDIAN — serving latency is a steady-state number, so the median
  * of repeated probes is the honest statistic where Bench's cold
  * first-run is the honest batch one.
  *
  * Output: ONE JSON line `{"metric":"serve","sf":...,"builds":{...},
  * "probes":{...}}` (seconds), also written to
  * `SPARK_GRAFT_SERVE_OUT` (default `serve_bench.json`). BASELINE.md
  * records the rows; >1.3× drift on a probe column is the same
  * flag-threshold the query table uses.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SERVE_OUT", "serve_bench.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-serve").toString

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def medianProbe(mk: () => DataFrame): Double = {
      exec(mk()) // warm-up: plan + code cache, untimed
      val ts = (1 to 5).map(_ => time(exec(mk()))).sorted
      ts(ts.length / 2)
    }

    val queries = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint() // the probe should time the INDEX scan, not the query-batch read
    val nQueries = queries.count()

    // BM25 probe terms: the corpus's top-5 tokens, deterministic tie-break
    val terms = Tables.documents(spark, sfDir)
      .select(explode(Tables.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(5)
      .collect().map(_.getString(0)).toSeq

    val builds = scala.collection.mutable.LinkedHashMap[String, Double]()
    val probes = scala.collection.mutable.LinkedHashMap[String, Double]()

    builds("ivf") = time(Similarity.writeIvfIndex(spark, sfDir, s"$root/ivf"))
    probes("ivf_nprobe1") = medianProbe(() =>
      Similarity.ivfTopKFromIndex(spark, s"$root/ivf", queries, k = 3, nprobe = 1))
    probes("ivf_nprobe2") = medianProbe(() =>
      Similarity.ivfTopKFromIndex(spark, s"$root/ivf", queries, k = 3, nprobe = 2))

    builds("sign") = time(Similarity.writeSignIndex(spark, sfDir, s"$root/sign"))
    probes("sign_hamming") = medianProbe(() =>
      Similarity.hammingTopKFromIndex(spark, s"$root/sign", sfDir, queries))

    builds("bm25") = time(TextAnalysis.writeBm25Index(spark, sfDir, s"$root/bm25"))
    probes("bm25_top5") = medianProbe(() =>
      TextAnalysis.bm25TopKFromIndex(spark, s"$root/bm25", terms))

    // the GENERATIONAL BM25 layout (EXT-6at): meta stamped, postings +
    // doclens appended as one maintainer "microbatch" covering the
    // corpus, then the live probe deriving df/n_docs/avgdl exactly from
    // the generational rows — the derive-at-probe tax next to the
    // static layout's baked-stats row
    builds("bm25_gen") = time {
      TextAnalysis.initBm25Index(spark, s"$root/bm25gen")
      val nb = 64
      val docs = Tables.documents(spark, sfDir)
      val tf = TextAnalysis.termFreq(docs)
      docs.select(col("doc_id"))
        .join(tf.groupBy("doc_id").agg(sum("tf").as("dl")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"))
        .write.mode("append").parquet(s"$root/bm25gen/gen-0/doclens")
      tf.withColumn("bucket", TextAnalysis.bm25Bucket(col("token"), nb))
        .write.mode("append").partitionBy("bucket").parquet(s"$root/bm25gen/gen-0/postings")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/bm25gen/gen-0/_geom"),
        s"bm25:nbuckets=$nb".getBytes("UTF-8"))
      new java.io.File(s"$root/bm25gen/gen-0/_live").createNewFile()
      ()
    }
    probes("bm25_live") = medianProbe(() =>
      graft.streaming.StreamOps.bm25ProbeLive(spark, s"$root/bm25gen", terms))

    builds("pq") = time(Similarity.writePqIndex(spark, sfDir, s"$root/pq"))
    probes("pq_adc") = medianProbe(() =>
      Similarity.pqTopKFromIndex(spark, s"$root/pq", queries))

    // the IVF-PQ composite (x179's probe): static-pruned 8-byte code
    // scan under the coarse probe fan-out — the cheapest serving path
    // in the family by construction (cells bound rows, codes bound bytes)
    builds("ivfpq") = time(Similarity.writeIvfPqIndex(spark, sfDir, s"$root/ivfpq"))
    probes("ivfpq_nprobe2") = medianProbe(() =>
      Similarity.ivfPqTopKFromIndex(spark, s"$root/ivfpq", queries, k = 3, nprobe = 2))
    // the refined serving recipe (EXT-S34b): pruned code-scan shortlist
    // + the bounded by-id float re-rank — what a recall-budgeted
    // deployment actually runs
    probes("ivfpq_refined") = medianProbe(() =>
      Similarity.ivfPqTopKRefinedFromIndex(spark, s"$root/ivfpq", sfDir, queries,
        k = 3, nprobe = 2, shortlist = 32))

    // the TUNED production-geometry index (EXT-S37b/S38): build at
    // (m 16, ksub 128), tune once (the sweep + selection + stamp — the
    // amortized half, priced in the build column), then serve at the
    // stamped point with no hand-carried knobs — the steady-state
    // latency of the FULL chosen recipe next to the hand-knobbed row
    builds("ivfpq_tuned") = time {
      Similarity.writeIvfPqIndex(spark, sfDir, s"$root/ivfpqprod",
        m = 16, ksub = 128)
      Similarity.tuneIvfPqIndex(spark, s"$root/ivfpqprod", sfDir,
        budget = 0.9, nprobes = Seq(2, 4, 8, 12), shortlists = Seq(16, 32, 64))
      ()
    }
    probes("ivfpq_refined_auto") = medianProbe(() =>
      Similarity.ivfPqTopKRefinedFromIndexAuto(
        spark, s"$root/ivfpqprod", sfDir, queries, k = 3))

    // the GENERATIONAL composite layout (EXT-6ao): sidecars stamped by
    // initIvfPqIndex, code rows appended cell-partitioned into the live
    // generation (one maintainer "microbatch" covering the corpus), then
    // probed through the live-generation resolver + replay dedup — the
    // self-maintaining index's steady-state serving number next to the
    // static layout's, pricing the dedup pass over the pruned rows
    builds("ivfpq_gen") = time {
      Similarity.initIvfPqIndex(spark, sfDir, s"$root/ivfpqgen")
      val (cents, cb, dim, dsub) = Similarity.loadIvfPqGeometry(spark, s"$root/ivfpqgen")
      Similarity.ivfPqAssignProjection(Tables.embeddings(spark, sfDir), cents, cb, dsub)
        .select(col("vec_id"), col("codes"), col("cell"))
        .write.mode("append").partitionBy("cell").parquet(s"$root/ivfpqgen/gen-0")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/ivfpqgen/gen-0/_geom"),
        Similarity.ivfPqGeometryStamp(cents, cb, dim).getBytes("UTF-8"))
      new java.io.File(s"$root/ivfpqgen/gen-0/_live").createNewFile()
      ()
    }
    probes("ivfpq_live") = medianProbe(() =>
      graft.streaming.StreamOps.ivfPqProbeLive(
        spark, s"$root/ivfpqgen", queries, k = 3, nprobe = 2))

    // the cluster index (EXT-6aj's batch face): the gate's membership
    // lookup over a doc_id batch (bucket-pruned), plus the two
    // report-every-run consumers the FromIndex adoption serves
    val docProbe = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id"))
      .localCheckpoint() // time the INDEX probe, not the id-batch read
    builds("cluster") = time(Curation.writeClusterIndex(spark, sfDir, s"$root/cluster"))
    probes("cluster_gate") = medianProbe(() =>
      Curation.lookupClustersFromIndex(spark, s"$root/cluster", docProbe))
    probes("cluster_sizes") = medianProbe(() =>
      Curation.clusterSizesFromIndex(spark, s"$root/cluster", sfDir))

    def js(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"serve","sf":"$sfDir","cpus":$cpus,"n_queries":$nQueries,""" +
        s""""bm25_terms":${terms.size},"builds":${js(builds)},"probes":${js(probes)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
