package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Payload}

/** SURVEY.md §2b multimodal plumbing + payload decode/windows. */
class MultimodalPayloadSpec extends AnyFunSuite with SparkSuite {

  test("media features: byte length, sha256, stubbed decode dims") {
    val dir = TestTables.documentsDir(spark, Seq(1L -> "abc", 2L -> "héllo"))
    val byId = Multimodal.mediaFeatures(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = byId(1L)
    assert(r1.getLong(1) == 3L)
    assert(r1.getString(2) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r1.getInt(3) == 16 * (1 + 'a' % 64) && r1.getInt(4) == 16 * (1 + 'b' % 64))
    assert(byId(2L).getLong(1) == 6L) // é is 2 bytes in UTF-8
  }

  test("FakeDecode is deterministic and total on edge inputs") {
    assert(Multimodal.FakeDecode.decode(Array.empty) == (16, 16))
    // invalid UTF-8 maps to the replacement char (U+FFFD) — total, stable
    val repl = 16 * (1 + 0xfffd % 64)
    assert(Multimodal.FakeDecode.decode(Array(0xff.toByte)) == (repl, 16))
    // multi-byte first char: width from the CODEPOINT (matches the oracle)
    assert(Multimodal.FakeDecode.decode("é!".getBytes("UTF-8")) ==
      (16 * (1 + 0xe9 % 64), 16 * (1 + '!' % 64)))
  }

  test("resize stub: bounded output size, metadata carried") {
    val dir = TestTables.documentsDir(spark, Seq(1L -> ("x" * 100)))
    val out = Multimodal.resize(Multimodal.asMedia(spark, dir), 16, 16).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.width == 16 && r.height == 16)
    assert(r.payload.length <= 100 && r.payload.length >= 1)
  }

  test("frame sampling stub: stride, offsets, bounded frame count") {
    val dir = TestTables.documentsDir(spark, Seq(1L -> ("abcd" * 64))) // 256 bytes
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(spark, dir)).collect()
    assert(frames.length == 4) // 16 frames, stride 4
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 4, 8, 12))
    frames.foreach { f =>
      assert(f.offset == f.frame_idx * 16 && f.frame.length == 16)
    }
  }

  test("embedBatched: one model call per micro-batch, deterministic vectors") {
    import graft.operators.Multimodal
    val dir = TestTables.documentsDir(spark, (1L to 5L).map(i => i -> s"payload $i"))
    val media = Multimodal.asMedia(spark, dir).coalesce(1)
    val got = Multimodal.embedBatched(media, dim = 4, batchSize = 2).collect()
      .sortBy(_.doc_id)
    assert(got.length == 5 && got.forall(_.embedding.length == 4))
    // 5 records through batchSize=2 on one partition: batches of 2, 2, 1
    assert(got.map(_.batch_size).sorted.sameElements(Array(1, 2, 2, 2, 2)))
    // deterministic: a second run produces identical vectors
    val again = Multimodal.embedBatched(media, dim = 4, batchSize = 2).collect()
      .sortBy(_.doc_id)
    got.zip(again).foreach { case (a, b) => assert(a.embedding.sameElements(b.embedding)) }
  }

  test("jsonDecode extracts k for every event (sf0.001)") {
    val df = Payload.jsonDecode(spark, "/root/testdata/sf0.001")
    val total = df.count()
    assert(total > 0 && df.filter("k IS NULL").count() == 0)
  }

  test("eventWindows partitions all events into 10-minute buckets") {
    val sfDir = "/root/testdata/sf0.001"
    val win = Payload.eventWindows(spark, sfDir)
    val total = graft.operators.Replication.events(spark, sfDir).count()
    assert(win.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == total)
    win.collect().foreach(r => assert(r.getLong(0) % 600 == 0))
  }
}
