package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import graft.functions.KafkaMurmur2
import graft.functions.functions.kafka_partition

class KafkaPartitionSpec extends AnyFunSuite with SparkSuite {

  test("murmur2 matches Kafka's published test vectors") {
    // From Kafka's UtilsTest.testMurmur2 (apache/kafka, public):
    val vectors = Map(
      "21".getBytes -> -973932308,
      "foobar".getBytes -> -790332482,
      "a-little-bit-long-string".getBytes -> -985981536,
      "a-little-bit-longer-string".getBytes -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes -> -58897971,
      Array[Byte]('a', 'b', 'c') -> 479470107)
    vectors.foreach { case (in, exp) =>
      assert(KafkaMurmur2.hash(in) == exp, s"murmur2(${new String(in)})")
    }
  }

  test("partitionFor is always in [0, n) (seeded random property)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt().toByte)
      val n = 1 + rnd.nextInt(512)
      val p = KafkaMurmur2.partitionFor(bytes, n)
      assert(p >= 0 && p < n)
    }
  }

  test("kafka_partition expression agrees with the Scala function and codegens") {
    import spark.implicits._
    val df = Seq("21", "foobar", "abc", "x").toDF("s")
      .select($"s", kafka_partition($"s".cast("binary"), lit(8)).as("p"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    got.foreach { case (s, p) =>
      assert(p == KafkaMurmur2.partitionFor(s.getBytes, 8))
    }
    // null key → null partition (DefaultPartitioner gets no key)
    val withNull = Seq(Some("a"), None).toDF("s")
      .select(kafka_partition($"s".cast("binary"), lit(8)).as("p"))
    assert(withNull.collect().count(_.isNullAt(0)) == 1)
  }
}
