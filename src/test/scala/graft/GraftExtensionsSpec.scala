package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{functions => gf, _}

/** The SQL spelling of every graft expression must resolve to the SAME
  * Catalyst expression as the Column API — one implementation, two
  * surfaces.
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkSuite {

  private lazy val df = {
    import spark.implicits._
    GraftExtensions.register(spark)
    val d = Seq(
      ("the quick brown fox the quick", Seq(0.5f, -0.25f, 0.125f), Seq(1.0f, 0.5f, -1.0f), "k1"),
      ("a b a b a", Seq(0f, 0f, 1f), Seq(0f, 1f, 0f), "k2"))
      .toDF("text", "fa", "fb", "key")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("kb", col("key").cast("binary"))
    d.createOrReplaceTempView("g_docs")
    d
  }

  test("every registered SQL function equals its Column-API twin") {
    val api = df.select(
      DotProduct.dot_f(col("fa"), col("fb")).as("dot"),
      IntersectSize.intersectSize(col("toks"), array(lit("the"), lit("a"))).as("isz"),
      gf.kafka_partition(col("kb"), lit(8)).as("part"),
      RollingHash.rollingHash(col("text")).as("rh"),
      Shingles.shingles(col("toks"), 2).as("sh"),
      CharNgrams.charNgrams(col("text"), 2).as("cng"),
      MinHashes.minhashes(Shingles.shingles(col("toks"), 2), 4).as("mh"),
      NgramStats.ngramStats(col("toks"), 2).as("st"),
      SimHash.simhash(col("toks")).as("simh"),
      CountIn.countIn(col("toks"), Seq("the", "a")).as("nstop")).collect()
    val sql = spark.sql(
      """SELECT graft_dot(fa, fb) AS dot,
        |       graft_intersect_size(toks, array('the', 'a')) AS isz,
        |       graft_kafka_partition(kb, 8) AS part,
        |       graft_rolling_hash(text) AS rh,
        |       graft_shingles(toks, 2) AS sh,
        |       graft_char_ngrams(text, 2) AS cng,
        |       graft_minhashes(graft_shingles(toks, 2), 4) AS mh,
        |       graft_ngram_stats(toks, 2) AS st,
        |       graft_simhash(toks, 60) AS simh,
        |       graft_count_in(toks, array('the', 'a')) AS nstop
        |FROM g_docs""".stripMargin).collect()
    assert(api.length == sql.length)
    api.zip(sql).foreach { case (a, s) => assert(a == s) }
  }

  test("wrong arity fails analysis with the function name") {
    df // force registration
    val e = intercept[Exception](spark.sql("SELECT graft_dot(fa) FROM g_docs").collect())
    assert(e.getMessage.contains("graft_dot"))
  }

  test("non-literal hyper-parameters are rejected (they are compiled into codegen)") {
    df
    val e = intercept[Exception](
      spark.sql("SELECT graft_shingles(toks, length(text)) FROM g_docs").collect())
    assert(e.getMessage.contains("INT literal"))
  }
}
