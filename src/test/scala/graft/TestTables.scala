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

  /** embeddings(vec_id, embedding, label) from (id, vector). */
  def embeddingsDir(spark: SparkSession, vecs: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-embs").toString
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }
}
