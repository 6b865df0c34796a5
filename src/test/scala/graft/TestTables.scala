package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Synthetic table fixtures for operator specs: writes `documents` /
  * `embeddings` parquet files shaped exactly like the harness tables
  * (TESTDATA.md) into a temp dir usable as an operator `dir` argument.
  */
/** An independently-spelled reference winnow (Schleimer et al.): md5
  * top-60-bit gram hashes via `sliding`, window minima via `sliding`
  * again — shares no code with the production WindowHashesExpression /
  * window-function pipeline, so differential tests catch either side.
  */
object RefWinnow {
  def gramHash(gram: Seq[String]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.mkString(" ").getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def fingerprints(tokens: Seq[String], k: Int, wWin: Int): Set[Long] = {
    if (tokens.length < k) return Set.empty
    val grams = tokens.sliding(k).map(gramHash).toVector
    if (grams.length < wWin) Set.empty
    else grams.sliding(wWin).map(_.min).toSet
  }
}

object TestTables {

  /** documents(doc_id, text, lang, source, n_chars) from (id, text). */
  def documentsDir(spark: SparkSession, docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** events(event_id, ts, user_id, event_type, value, props) from
    * (event_id, ts micros, user_id, event_type). The ts column is written
    * as a raw nanosecond LONG — the shape `Replication.events` expects
    * from the harness's TIMESTAMP(NANOS) parquet under `nanosAsLong`.
    */
  def eventsDir(spark: SparkSession, rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-events").toString
    rows.map { case (id, tsUs, uid, et) => (id, tsUs * 1000L, uid, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** documents with explicit per-doc lang, from (id, text, lang). */
  def documentsLangDir(spark: SparkSession, docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    docs.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** documents with explicit per-doc source, from (id, text, source). */
  def documentsSourcedDir(spark: SparkSession, docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** embeddings(vec_id, embedding, label) from (id, vector). */
  def embeddingsDir(spark: SparkSession, vecs: Seq[(Long, Seq[Float])]): String =
    embeddingsLabeledDir(spark, vecs.map { case (id, v) => (id, v, 0) })

  /** documents AND embeddings in one dir, for cross-table operators
    * (rank fusion, cross-modal curation).
    */
  def corpusDir(spark: SparkSession,
      docs: Seq[(Long, String)], vecs: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-corpus").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** embeddings with explicit labels, from (id, vector, label). */
  def embeddingsLabeledDir(spark: SparkSession, vecs: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-embs").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** documents with explicit lang AND source, from (id, text, lang, source). */
  def documentsLangSourcedDir(
      spark: SparkSession, docs: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docs").toString
    docs.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** part(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice) from
    * (key, name, brand, size) — the harness `part` shape (TESTDATA.md)
    * with filler type/price, for the linkage specs.
    */
  def partDir(spark: SparkSession, rows: Seq[(Long, String, String, Int)]): String =
    partDirTyped(spark, rows.map { case (k, n, b, s) => (k, n, b, s, "STANDARD", 900.0) })

  /** Full-width part fixture — (key, name, brand, size, type, price) —
    * for the linkage purity audit, whose output reads the attributes
    * the blocking key does NOT pin.
    */
  def partDirTyped(
      spark: SparkSession,
      rows: Seq[(Long, String, String, Int, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    rows.map { case (k, n, b, s, t, pr) => (k, n, b, t, s, pr) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }
}
