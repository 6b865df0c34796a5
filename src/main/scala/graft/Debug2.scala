package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


object Debug2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val arr = Dedup.shingleArrays(spark, sfDir)
    time("warm")(arr.count())
    time("shingleArrays.count")(arr.count())
    time("shingleArrays.count again")(arr.count())
    println(arr.queryExecution.optimizedPlan.treeString.take(2500))
    val sh = arr.select(col("doc_id"), explode(col("shs")).as("shingle"))
    time("explode.count")(sh.count())
    val mh = sh.select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("seed"), col("shingle"))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle")))).as("mh"))
    time("minhash.count")(mh.count())
    time("minhash.count 2nd")(mh.count())
    spark.stop()
  }
}
