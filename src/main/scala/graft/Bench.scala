package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // untimed warmup ON THE BENCH DATASET: initializes its parquet
    // footers and the scan machinery so the first timed query doesn't
    // absorb session startup
    try exec(SparkEntry.queries("d4_identity")(spark, sfDir))
    catch { case _: Throwable => () }
    // two passes, best-of per query: single-run times vary ±30% in this
    // shared environment (GC, JIT, page cache); min is the stable signal.
    // A failed query records -1 — a breakage must never read as a
    // performance win.
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)); name -> (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => name -> -1.0 }
      }
    val (p1, p2) = (pass(), pass())
    val results = p1.zip(p2).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // any failed query poisons the total: summing the -1 sentinels would
    // LOWER it, making a breakage read as a performance win
    val total =
      if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
