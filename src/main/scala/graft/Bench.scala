package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Contract (driver): prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * The stdout line is additionally written IN FULL to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `bench_full.json` in the working
  * directory) together with per-pass times — the driver's log capture
  * keeps only the tail of stdout, which truncated the per-query head of
  * BENCH_r06–r08 beyond recovery (`"parsed": null` three rounds
  * running). The file is the lossless record; the stdout line remains
  * the driver contract.
  *
  * A LOADED session is flagged, not silently recorded: seven canary
  * queries (stable, ≥1 s, code-untouched for rounds) run after warm-up
  * and their median ratio against the recorded BASELINE.md driver
  * column is reported as `load_ratio`; `"loaded": true` when it
  * exceeds 1.3× — BASELINE.md's own regression threshold. Cross-session
  * machine load moves the whole pack together (measured in r03/r06/r08),
  * so a loaded session must not become the round's performance record
  * without the flag saying so. Three further gates (r14/r15, each one
  * closing a way a polluted session certified itself): ANY single
  * pre-run canary above 1.5× (or failed) flips `canary_hot`; a canary
  * probe re-runs INSIDE the main passes every ~25 queries and any probe
  * above 1.5× (or failed, or none run) flips `mid_hot`; and every
  * per-query row records the 1-min loadavg at its finish so a hot row
  * is adjudicable load-vs-regression from the artifact alone.
  * `record_ok` requires all three gates clean.
  */
object Bench {
  /** sf0.1 driver-session seconds from BASELINE.md's per-query table
    * (r05 driver column — the column VERDICT r8 names as "the actual
    * bar"). Canaries are ≥0.8 s (sub-0.5 s rows are noise-dominated by
    * BASELINE.md's rule) and their operator code has been untouched
    * since r05. Used only to FLAG load, never to alter measurements.
    *
    * r14 additions (the r13 canary blind spot: scan-shaped canaries
    * read 1.22× while the contraction-family x161 moved 13.9× in the
    * hot driver session): one CONTRACTION-family canary (x121 — the
    * x22 localCheckpoint-loop regime, the class that amplifies load
    * worst) and one BRUTE-family canary (x91 — the n·m integer scan
    * regime). Their columns are the medians of the named quiet local
    * sessions in BASELINE.md §r14L (x105 was the verdict's suggestion
    * for the brute slot but its code gained codebook training in r14 —
    * a canary must be code-stable, so x91, untouched since r8 and the
    * same regime, holds the slot). x121's column is its r10 recorded
    * BASELINE.md value (3.03) — the column the judge's 2x bar
    * references; a tighter quiet-median baseline (2.6) flagged a
    * measured-quiet session in r14, which inverts the canary's job.
    */
  private val canaryBaseline: Map[String, Double] = Map(
    "x40_boilerplate_ngrams" -> 1.04,
    "x41_tfidf_terms" -> 1.04,
    "x43_source_similarity" -> 1.28,
    "x52_lsh_calibration" -> 1.24,
    "x53_dup_spans" -> 1.12,
    "x91_quantized_recall" -> 1.7,
    "x121_cluster_sizes" -> 3.03)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: consumes every column, so the FULL operator pipeline
    // executes. A count() would let Catalyst prune projection-only query
    // bodies down to a bare row-count scan — 9 of the row-local operators
    // were being "benchmarked" as parquet scans.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // untimed warmup ON THE BENCH DATASET: initializes its parquet
    // footers and the scan machinery so the first timed query doesn't
    // absorb session startup
    try exec(SparkEntry.queries("d4_identity")(spark, sfDir))
    catch { case _: Throwable => () }
    // untimed canary warm-up: d4 touches none of the text machinery, so
    // without this the FIRST canary (x40, alphabetically) absorbs the
    // whole-stage-codegen JIT of the shingle/token pipeline — measured at
    // ~2.4 s canary vs ~1.0 s main-pass best in the same QUIET session
    // (r8 and r9 both), a 2.3× phantom that biases the load verdict the
    // canaries exist to keep honest
    canaryBaseline.keys.toSeq.sorted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
    }
    // canary pass: best-of-2 on the five stable queries, ratio'd against
    // the recorded BASELINE driver column → the session's load verdict
    val canaries = canaryBaseline.toSeq.sortBy(_._1).flatMap { case (name, base) =>
      SparkEntry.queries.get(name).map { fn =>
        val t = try math.min(time(exec(fn(spark, sfDir))), time(exec(fn(spark, sfDir))))
                catch { case _: Throwable => -1.0 }
        (name, t, base, if (t > 0) t / base else -1.0)
      }
    }
    val ratios = canaries.map(_._4).filter(_ > 0).sorted
    val loadRatio = if (ratios.isEmpty) -1.0 else ratios(ratios.length / 2)
    val loaded = loadRatio > 1.3
    // r15: the median alone CERTIFIED a polluted session in r14 — the
    // pre-run median read 1.21 while two individual canaries sat at
    // 1.71× and 1.62×, above the very 1.5× line the mid-probes enforce,
    // and 22 main-pass rows then read >2× their quiet columns. A single
    // canary above 1.5× (or a canary that fails outright) now
    // disqualifies the record on its own.
    val canaryHot = canaries.exists(c => c._4 > 1.5 || c._4 <= 0)
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // MID-RUN canary re-probes (r14, widened r15): the pre-run canary
    // table cannot see load that arrives DURING the ~2×180-query main
    // passes (the r13 hot session read canaries 1.22× while x161 moved
    // 13.9× mid-run; the r14 hot session's TWO post-pass probes landed
    // in a quiet burst and cleared it). A probe now runs INSIDE the
    // passes every ~25 queries — alternating one scan-shaped and one
    // contraction-shaped canary — so bursty load has ~14 chances to be
    // seen, not 2. Single-query noise band is wider than the 5-canary
    // median's, so the flag line is 1.5×, not 1.3×. A probe that FAILS
    // is disqualifying, not filtered: a gate whose probes all crashed
    // has not probed anything.
    val probeNames = Seq("x41_tfidf_terms", "x121_cluster_sizes")
    val midProbes = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    var probeIdx = 0
    def midProbe(): Unit = {
      val name = probeNames(probeIdx % probeNames.length)
      probeIdx += 1
      SparkEntry.queries.get(name).foreach { fn =>
        val t = try math.min(time(exec(fn(spark, sfDir))), time(exec(fn(spark, sfDir))))
                catch { case _: Throwable => -1.0 }
        midProbes += ((name, t, if (t > 0) t / canaryBaseline(name) else -1.0))
      }
    }
    // two passes, best-of per query: single-run times vary ±30% in this
    // shared environment (GC, JIT, page cache); min is the stable signal.
    // A failed query records -1 — a breakage must never read as a
    // performance win. Each query also records the 1-min loadavg at its
    // finish, so load-vs-regression on any single row is adjudicable
    // from the artifact without a re-run.
    def pass(): Seq[(String, Double, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map { case ((name, fn), i) =>
        if (i > 0 && i % 25 == 0) midProbe()
        val t = try time(exec(fn(spark, sfDir)))
        catch { case _: Throwable => -1.0 }
        (name, t, loadavg())
      }
    val (p1, p2) = (pass(), pass())
    val results = p1.zip(p2).map { case ((n, a, la), (_, b, lb)) =>
      (n, a, b, if (a < 0 || b < 0) -1.0 else math.min(a, b), la, lb)
    }
    val midHot =
      midProbes.isEmpty || midProbes.exists(p => p._3 > 1.5 || p._2 <= 0)
    val qs = results.map { case (k, _, _, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // any failed query poisons the total: summing the -1 sentinels would
    // LOWER it, making a breakage read as a performance win
    val total =
      if (results.exists(_._4 < 0)) -1.0 else results.map(_._4).sum
    val loadavg1 = loadavg()
    // lossless artifact: every per-pass time (with its loadavg), the
    // canary table, every mid-run probe, and the load verdict —
    // machine-readable regardless of stdout truncation.
    // the session's record verdict: the pre-run canary median AND every
    // individual canary AND every mid-run probe must sit under their
    // flag lines — and the probes must have actually run and succeeded —
    // or this session must not become the round's performance record
    val recordOk = !loaded && !canaryHot && !midHot
    val fileJson = {
      val canaryJson = canaries.map { case (n, t, b, r) =>
        s"""    "$n": {"sec": $t, "baseline": $b, "ratio": $r}"""
      }.mkString("{\n", ",\n", "\n  }")
      val midJson = midProbes.zipWithIndex.map { case ((n, t, r), i) =>
        s"""    "probe$i": {"name": "$n", "sec": $t, "ratio": $r}"""
      }.mkString("{\n", ",\n", "\n  }")
      val perQuery = results.map { case (n, a, b, best, la, lb) =>
        s"""    "$n": {"p1": $a, "p2": $b, "best": $best, "load1": $la, "load2": $lb}"""
      }.mkString("{\n", ",\n", "\n  }")
      s"""{
  "sf": "$sfDir",
  "cpus": $cpus,
  "epoch_ms": ${System.currentTimeMillis()},
  "loadavg1": $loadavg1,
  "load_ratio": $loadRatio,
  "loaded": $loaded,
  "canary_hot": $canaryHot,
  "mid_probes": $midJson,
  "mid_hot": $midHot,
  "record_ok": $recordOk,
  "canaries": $canaryJson,
  "total_best": $total,
  "queries": $perQuery
}
"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      fileJson.getBytes("UTF-8"))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_ratio":$loadRatio,"loaded":$loaded,"canary_hot":$canaryHot,"mid_hot":$midHot,"record_ok":$recordOk,"out":"$outPath"}""")
    spark.stop()
  }
}
