package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Synthetic table fixtures for operator specs: writes `documents` /
  * `embeddings` parquet files shaped exactly like the harness tables
  * (TESTDATA.md) into a temp dir usable as an operator `dir` argument.
  */
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
}
