package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiler (r18 optimization round): run one query via the
  * bench's noop sink with a listener recording every Spark job's wall
  * time and description — the breakdown `Debug`'s total hides. Usage:
  *   runMain graft.JobProfile <queryName> [sfDir] [runs]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.map(si =>
          s"${si.stageId}:${si.name.takeWhile(_ != '(').trim}[${si.numTasks}]")
          .mkString(" ")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"job ${je.jobId}%4d ${(je.time - t0) / 1000.0}%8.3fs  $desc")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
          .getOrElse(-1L)
        if (wall > 300 && m != null) {
          lines.add(f"    stage ${si.stageId}%4d wall ${wall / 1000.0}%7.3fs " +
            f"run ${m.executorRunTime / 1000.0}%7.3fs cpu ${m.executorCpuTime / 1e9}%7.3fs " +
            f"deser ${m.executorDeserializeTime / 1000.0}%6.3fs " +
            f"gc ${m.jvmGCTime / 1000.0}%6.3fs tasks ${si.numTasks} " +
            si.name.takeWhile(_ != '(').trim)
        }
      }
    })
    for (i <- 1 to runs) {
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(s"=== $name run$i: $total%s s ===")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
