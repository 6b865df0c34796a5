package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** Context-window chunking and sequence packing (SURVEY.md EXT-P3/P4). */
class PackingSpec extends AnyFunSuite with SparkSuite {

  test("chunkDocuments: stride-overlapped windows with clamped tails") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> (1 to 25).map(i => s"t$i").mkString(" "), // 25 tokens
      2L -> "a b c d e"))                             // shorter than one chunk
    val rows = Packing.chunkDocuments(spark, dir, chunkSize = 20, stride = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.filter(_._1 == 1L).toSeq ==
      Seq((1L, 1L, 20L), (1L, 11L, 15L), (1L, 21L, 5L)))
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 5L)))
  }

  test("chunkDocuments: identical token windows get identical digests") {
    val common = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> common, 2L -> common, 3L -> (1 to 20).map(i => s"z$i").mkString(" ")))
    val digests = Packing.chunkDocuments(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(digests(1L) == digests(2L))
    assert(digests(1L) != digests(3L))
  }

  test("packSequences: docs binned by start offset of the per-lang running sum") {
    // 3 docs x 300 tokens: start offsets 0, 300, 600 -> bins 0, 0, 1 at 512
    val doc = (1 to 300).map(i => s"t$i").mkString(" ")
    val dir = TestTables.documentsDir(spark, Seq(1L -> doc, 2L -> doc, 3L -> doc))
    val bins = Packing.packSequences(spark, dir, budgetTokens = 512).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.toSeq == Seq(("en", 0L, 2L, 600L), ("en", 1L, 1L, 300L)))
  }
}
