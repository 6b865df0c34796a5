package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf experiment (r18): isolate the per-pair cost of the
  * brute-force scoring pipeline — expansion join vs dot vs TopK udaf.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(fn: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = broadcast(emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val corpus = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .repartition(32)
    def scored = queries.join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.DotProduct.dot_f(col("qe"), col("ce")).as("sim"))
    // a) expansion + count only (no dot evaluated — column pruned)
    time("a_expand_count") { noop(queries.join(corpus, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))) }
    // b) expansion + dot + 1-row sum (no TopK)
    time("b_dot_sum") { noop(scored.groupBy().agg(sum("sim"))) }
    // c) expansion + dot + TopK udaf per qid
    time("c_topk_udaf") { noop(scored.groupBy("qid")
      .agg(graft.functions.TopK.topk(5)(col("sim"), col("cid")).as("nb"))) }
    // d) expansion + dot + declarative max_by per qid (codegen path)
    time("d_maxby") { noop(scored.groupBy("qid")
      .agg(max(struct(col("sim"), col("cid"))).as("m"))) }
    // e) same as c with the ObjectHashAggregate sort-based fallback
    //    threshold raised above the group count
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    time("e_topk_udaf_nofallback") { noop(scored.groupBy("qid")
      .agg(graft.functions.TopK.topk(5)(col("sim"), col("cid")).as("nb"))) }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    // f) pure codegen alternative: collect k best via sort_array(slice)?
    //    no — instead measure the BNLJ expansion floor with a wider filter
    time("f_expand_sum_cid") { noop(queries.join(corpus, col("qid") =!= col("cid"))
      .groupBy().agg(sum(col("cid")))) }
    spark.stop()
  }
}
