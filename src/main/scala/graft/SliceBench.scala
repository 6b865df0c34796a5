package graft
import org.apache.spark.sql.SparkSession

/** Batch slice-timing harness for the BASELINE.md 10× exponent table:
  * `runMain graft.SliceBench <sfDir> <query>[,<query>...]` times each
  * named query against ONE dir in ONE JVM (vs `graft.Debug`'s
  * JVM-per-query), with the same contract the table's header
  * prescribes: noop-sink full-plan executions, local[32], best-of-2
  * warm runs (3 executions, first discarded as warm-up, min of the
  * last 2 reported). Output: one `name best_s runs...` line per query.
  */
object SliceBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SLICE $name%-28s best=${times.tail.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
