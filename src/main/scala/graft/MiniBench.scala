package graft
import org.apache.spark.sql.SparkSession

/** Subset bench for optimization iteration (r18): time a comma-list of
  * queries with graft.Bench's exact methodology (noop sink, rebuild per
  * run, best-of-N) in one JVM. NOT the driver contract — `graft.Bench`
  * remains the only artifact-emitting bench.
  * Usage: runMain graft.MiniBench <q1,q2,...> [sfDir] [passes]
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // one untimed warmup per query (JIT/codegen), then best-of-N
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        exec(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[minibench] $name%-40s best ${times.min}%7.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
