package graft
import org.apache.spark.sql.SparkSession

/** Micro-harness for the persisted-index adoption delta (BASELINE.md
  * r14L): `runMain graft.IndexBench <sfDir> <indexPath>` — builds the
  * cluster index once, then times each heavy consumer in its
  * contraction-paying form vs its FromIndex form (noop-sink, best-of-2
  * warm runs, graft.SliceBench's contract). The delta IS the
  * contraction loop: the number every report-every-run consumer saves
  * per run once the index is materialized.
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val idx = if (args.length > 1) args(1) else "/tmp/graft-index-bench"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def best(df: => org.apache.spark.sql.DataFrame): Double = {
      def run() = time(df.write.mode("overwrite").format("noop").save())
      run(); math.min(run(), run())
    }
    val tBuild = time(graft.operators.Curation.writeClusterIndex(spark, dir, idx))
    println(f"INDEX build=$tBuild%.2f")
    val pairs: Seq[(String, () => org.apache.spark.sql.DataFrame, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("clusterSizes",
        () => graft.operators.Curation.clusterSizes(spark, dir),
        () => graft.operators.Curation.clusterSizesFromIndex(spark, idx, dir)),
      ("clusterPurity",
        () => graft.operators.Curation.clusterPurity(spark, dir),
        () => graft.operators.Curation.clusterPurityFromIndex(spark, idx, dir)),
      ("clusterReps",
        () => graft.operators.Curation.clusterRepresentatives(spark, dir),
        () => graft.operators.Curation.clusterRepresentativesFromIndex(spark, idx, dir)))
    pairs.foreach { case (name, mem, fi) =>
      val (a, b) = (best(mem()), best(fi()))
      println(f"INDEX $name%-14s in_memory=$a%.2f from_index=$b%.2f speedup=${a / b}%.1fx")
    }
    spark.stop()
  }
}
