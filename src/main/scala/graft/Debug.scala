package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspector: `runMain graft.Debug <queryName> [sfDir]`. */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    // rebuild per run (iterative operators do their work at build time)
    // and execute via the noop sink — count() would prune projection-only
    // bodies to a bare scan and time nothing (same fix as Bench)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(s"run$i: executed in ${(System.nanoTime() - t0) / 1e9}s")
    }
    df.collect()
    println("=== executed plan (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
