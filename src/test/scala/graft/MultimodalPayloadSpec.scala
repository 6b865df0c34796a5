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

  test("frameSample (x177): frame bytes pinned as hex, offsets and truncation exact") {
    val dir = TestTables.documentsDir(spark, Seq(
      1L -> ("abcd" * 64), // 256 bytes -> 16 full frames -> idx 0,4,8,12
      2L -> "tiny"))       // 4 bytes < frameSize -> zero frames
    val rows = Multimodal.frameSample(spark, dir).collect()
    assert(rows.map(_.getLong(0)).forall(_ == 1L), "sub-frame payloads emit nothing")
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 4L, 8L, 12L))
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 16) // offset = frame_idx * frameSize
      // every frame of "abcd"*64 at a 16-byte boundary is "abcdabcdabcdabcd"
      assert(r.getString(3) == "61626364" * 4)
    }
  }

  test("resizeCensus (x178): per-type byte economics, hand-derived") {
    // decode dims come from the first two code points: '@' (64) -> 64%64=0
    // -> dim 16; 'a' (97) -> 97%64=33 -> dim 544. Area 16*16=256 <= 4096
    // keeps every byte (ratio 1); 544*544 shrinks to floor(len*4096/295936)
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> ("@@" + "x" * 6),   // image/png: 8 bytes, no shrink
      1L -> ("aa" + "x" * 98),  // audio/wav: 100 bytes -> floor(1.384) = 1
      2L -> ("aa" + "x" * 48),  // video/mp4: 50 bytes -> max(1, floor(0.69)) = 1
      3L -> ""))                // image/png: EMPTY payload -> 0 bytes out
    // (the 1-byte floor guards degenerate nonempty shrinks; an empty
    // payload physically emits nothing — take(1) of an empty array)
    val got = Multimodal.resizeCensus(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got("image/png") == ((2L, 8L, 8L, 0L, 0.0)))
    assert(got("audio/wav") == ((1L, 100L, 1L, 1L, 0.99)))
    assert(got("video/mp4") == ((1L, 50L, 1L, 1L, 0.98)))
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

  test("AvroCodec: byte-exact wire format pinned against hand-built reference bytes") {
    // (event_id=1, event_type="click", value=1.5) per the Avro spec:
    // zigzag(1)=2 -> [0x02]; "click" length 5 -> zigzag 10 -> [0x0A] +
    // UTF-8 bytes; double 1.5 -> Double.doubleToLongBits little-endian.
    // An independent hand spelling: field order, varint coding, and
    // endianness are each pinned — a schema or codec drift breaks this.
    val expected = Array[Byte](0x02, 0x0A) ++ "click".getBytes("UTF-8") ++ {
      val bits = java.lang.Double.doubleToLongBits(1.5)
      (0 until 8).map(i => ((bits >>> (8 * i)) & 0xFF).toByte)
    }
    val got = Payload.AvroCodec.encode(1L, "click", 1.5)
    assert(got.sameElements(expected),
      s"got ${got.map("%02x".format(_)).mkString(" ")}")
    // multi-byte varint boundary: zigzag(64) = 128 -> [0x80, 0x01]
    val big = Payload.AvroCodec.encode(64L, "", 0.0)
    assert((big(0) & 0xFF) == 0x80 && big(1) == 0x01 && big(2) == 0x00)
    val rt = Payload.AvroCodec.decode(got)
    assert(rt == Payload.AvroEvent(1L, "click", 1.5))
  }

  test("avroRoundTrip: decoded columns equal the source, avro_len matches the format arithmetic (sf0.001)") {
    val sfDir = "/root/testdata/sf0.001"
    val src = graft.operators.Replication.events(spark, sfDir)
      .select("event_id", "event_type", "value").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val got = Payload.avroRoundTrip(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == src.size)
    got.foreach { r =>
      val (tpe, v) = src(r.getLong(0))
      assert(r.getString(1) == tpe && r.getDouble(2) == v)
      // independent JVM-side spelling of the oracle's length arithmetic:
      // true zigzag ((n << 1) ^ (n >> 63)) then unsigned varint — exact
      // for negative ids and ids >= 2^62, unlike a bare 2*n product
      def varintLen(n: Long): Long = {
        var z = ((n << 1) ^ (n >> 63)) >>> 7; var c = 1L
        while (z != 0) { c += 1; z >>>= 7 }; c
      }
      val tlen = tpe.getBytes("UTF-8").length.toLong
      val expectLen = varintLen(r.getLong(0)) + varintLen(tlen) + tlen + 8
      assert(r.getLong(3) == expectLen, s"event ${r.getLong(0)}: ${r.getLong(3)} vs $expectLen")
    }
  }

  test("schemaDrift (x102): new/gone/stable key census with exact rates") {
    import spark.implicits._
    // old snap (even ids): keys a, b; new snap (odd ids): a always,
    // c on ids 5/7/9 — so a is stable, b gone, c new at rate 0.6
    val events = (0L until 10L).map { id =>
      val props =
        if (id % 2 == 0) """{"a": 1, "b": 2}"""
        else if (id >= 5) """{"a": 1, "c": 3}"""
        else """{"a": 1}"""
      (id, props)
    }.toDF("event_id", "props")
    val rows = graft.operators.Payload.schemaDrift(events).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b", "c"))
    val a = rows("a")
    assert((a.getLong(1), a.getLong(2), a.getString(3)) == ((5L, 5L, "stable")))
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 1.0 && a.getDouble(6) == 0.0)
    val b = rows("b")
    assert((b.getLong(1), b.getLong(2), b.getString(3)) == ((5L, 0L, "gone")))
    assert(b.getDouble(6) == -1.0)
    val c = rows("c")
    assert((c.getLong(1), c.getLong(2), c.getString(3)) == ((0L, 3L, "new")))
    assert(c.getDouble(5) == 0.6 && c.getDouble(6) == 0.6)
  }

  test("mediaDedupCensus (x151): per-type byte economics, hand-derived") {
    // type = doc_id % 3: image {0, 3}, audio {1}, video {2, 5};
    // the image pair and the video pair are bit-identical payloads
    val dir = TestTables.documentsDir(spark, Seq(
      0L -> "a b", 3L -> "a b",
      1L -> "xyz",
      2L -> "qq r", 5L -> "qq r"))
    val got = Multimodal.mediaDedupCensus(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set("image/png", "audio/wav", "video/mp4"))
    assert(got("image/png") == ((2L, 1L, 1L, 6L, 3L, 0.5)))
    assert(got("audio/wav") == ((1L, 1L, 0L, 3L, 0L, 0.0)))
    assert(got("video/mp4") == ((2L, 1L, 1L, 8L, 4L, 0.5)))
  }

  test("dHash60 + phashNearDup (x185): hand-exact fingerprints, pigeonhole candidates, byte_equal classes") {
    import spark.implicits._
    // dHash60 unit laws: empty -> 0; a monotonically increasing byte
    // grid never sets a bit (s_i > s_{i+1} never); a decreasing grid
    // sets all 60 (and never touches the BIGINT sign bit)
    assert(Multimodal.dHash60(Array.empty[Byte]) == 0L)
    assert(Multimodal.dHash60(Array.tabulate(61)(_.toByte)) == 0L)
    assert(Multimodal.dHash60(Array.tabulate(61)(i => (60 - i).toByte)) == (1L << 60) - 1)
    // fixture: A (increasing, hash 0), B (constant, hash 0), C
    // (decreasing, hash 2^60-1), D (byte-exact copy of A). {A,B,D}
    // collide on every band; C shares no band with them (4095 vs 0
    // everywhere), so it reaches no candidate pair — the pigeonhole
    // filter working as the exactness law says it may (ham 60 > 4)
    val a = Array.tabulate(61)(_.toByte)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, a, "image/png"),
      Multimodal.MediaRecord(2L, Array.fill(61)(7.toByte), "image/png"),
      Multimodal.MediaRecord(3L, Array.tabulate(61)(i => (60 - i).toByte), "image/png"),
      Multimodal.MediaRecord(4L, a.clone(), "image/png")))
    val got = Multimodal.phashNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq((1L, 2L, 0L, false), (1L, 4L, 0L, true), (2L, 4L, 0L, false)))
    // harness + variants: the driven re-encode copies surface as
    // PERCEPTUAL-only pairs (byte_equal false — the class x151's
    // byte-digest census structurally misses)
    val pairs = Multimodal.phashNearDup(
      Multimodal.mediaWithReencodedVariants(spark, "/root/testdata/sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(pairs.exists(p => p._2 == p._1 + 1000000L && !p._4),
      "expected at least one (doc, re-encoded variant) pair within the banding radius")
    pairs.foreach(p => assert(p._3 <= 4 && p._1 < p._2))
  }

  test("phashNearDup: count-first saturation guard refuses a degenerate bucket with the knob named") {
    import spark.implicits._
    // constant payloads all hash to 0 — every row lands in ONE bucket
    // per band; the eager counting pass must refuse BEFORE any
    // collect_list buffers the bucket (the r16 audit note)
    val media = spark.createDataset((1L to 6L).map(i =>
      Multimodal.MediaRecord(i, Array.fill(61)(9.toByte), "image/png")))
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(media, maxBucket = 3).collect()
    }
    assert(e.getMessage.contains("bucket saturated") &&
      e.getMessage.contains("maxBucket"), e.getMessage)
  }

  test("phashCandidates (EXT-6ap probe): exact + re-encoded copies match the index; replay duplicates collapse; mis-stamped index refused") {
    import spark.implicits._
    // payloads long enough that an 8-char prefix reversal moves only the
    // first couple of grid samples — the re-encode class by construction
    val base = (1 to 300).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val variant = base.take(8).reverse + base.drop(8)
    val hamDirect = java.lang.Long.bitCount(
      Multimodal.dHash60(base.getBytes("UTF-8")) ^
        Multimodal.dHash60(variant.getBytes("UTF-8")))
    assert(hamDirect >= 1 && hamDirect <= 4,
      s"fixture precondition: prefix reversal must stay within the radius (got $hamDirect)")
    val other = (1 to 300).map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString
    def mediaDf(rows: (Long, String)*) =
      rows.toDF("doc_id", "text").selectExpr(
        "doc_id", "encode(text, 'UTF-8') AS payload", "'text/plain' AS media_type")
    val index = Multimodal.phashSignatures(mediaDf(1L -> base, 2L -> other))
    val arrivals = mediaDf(100L -> base, 101L -> variant, 102L -> other.reverse)
    val got = Multimodal.phashCandidates(arrivals, index).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    // 100 is a byte-exact copy of 1; 101 the perceptual-only re-encode;
    // 102 (reversed other) shares no banding with anything indexed
    assert(got == Seq((100L, 1L, 0L, true), (101L, 1L, hamDirect.toLong, false)), got.toString)
    // replay immunity: duplicated index rows must not duplicate matches
    val replayed = Multimodal.phashCandidates(arrivals, index.unionAll(index)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(replayed == got, "replay-duplicated index rows inflated the match set")
    // stamp refusal: an index fingerprinted under different banding
    val bad = index.withColumn("n_bands", org.apache.spark.sql.functions.lit(4))
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashCandidates(arrivals, bad).collect()
    }
    assert(e.getMessage.contains("fingerprinted under banding"), e.getMessage)
  }

  test("jsonEnvelope (x153): roundtrip identity and the hand-computed wire lengths") {
    val dir = TestTables.eventsDir(spark, Seq(
      (7L, 1000000L, 1L, "click"),   // 29 + 1 digit + 5 = 35
      (1234L, 2000000L, 1L, "view"))) // 29 + 4 + 4 = 37
    val got = Payload.jsonEnvelope(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(got(7L) == ((7L, "click", 35L)))
    assert(got(1234L) == ((1234L, "view", 37L)))
  }

  test("jsonEnvelope: escaping breaks the arithmetic law by exactly the escape bytes") {
    // the law's domain, pinned precisely: a quote in the type still
    // roundtrips exactly, but costs one extra wire byte (the backslash)
    // — the loud divergence the oracle is designed to raise on a corpus
    // that needs escaping
    val dir = TestTables.eventsDir(spark, Seq((1L, 1000000L, 1L, "a\"b")))
    val r = Payload.jsonEnvelope(spark, dir).collect().head
    assert(r.getString(2) == "a\"b", "roundtrip is exact regardless of escaping")
    assert(r.getLong(3) == 29L + 1L + 3L + 1L,
      "one escaped quote costs exactly one extra byte over the clean-law length")
  }

  test("mediaDedupCensus: identities and the corpus partition on harness data") {
    val rows = Multimodal.mediaDedupCensus(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val total = graft.operators.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(rows.map(_._1).sum == total, "the three types partition the corpus")
    rows.foreach { case (files, distinct, dups, bt, bd) =>
      assert(files - dups == distinct, "dup files are exactly the beyond-first instances")
      assert(bd <= bt && bd >= 0L)
    }
  }
}
