package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.graft.shim

/** Kafka's murmur2 hash — the algorithm `DefaultPartitioner` applies to a
  * record key when no explicit partition is set. Implemented from the
  * published Kafka algorithm (org.apache.kafka.common.utils.Utils.murmur2,
  * seed 0x9747b28c), so the engine can reproduce the reference's
  * key→partition routing (reference: KafkaMessageSerializationSchema.java:19
  * falls back to the producer's DefaultPartitioner when partitioning is not
  * preserved) without a Kafka dependency.
  */
object KafkaMurmur2 {
  def hash(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    var i = 0
    val length4 = length / 4
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4 + 0) & 0xff) +
        ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) +
        ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    (length % 4) match {
      case 3 =>
        h ^= (data((length & ~3) + 2) & 0xff) << 16
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 2 =>
        h ^= (data((length & ~3) + 1) & 0xff) << 8
        h ^= data(length & ~3) & 0xff
        h *= m
      case 1 =>
        h ^= data(length & ~3) & 0xff
        h *= m
      case _ =>
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** DefaultPartitioner routing for a keyed record. */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    (hash(key) & 0x7fffffff) % numPartitions
  }
}

/** `kafka_partition(key, numPartitions)` as a codegen'd Catalyst expression
  * so partition routing stays inside whole-stage codegen on the hot path.
  */
case class KafkaPartitionExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time check (same rationale as DotProductExpression): a
  // mistyped key column must fail the query at analysis, not throw
  // ClassCastException per row inside a task
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kafka_partition expects (binary, int), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(key: Any, n: Any): Any =
    KafkaMurmur2.partitionFor(key.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = KafkaMurmur2.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (k, n) => s"$m.partitionFor($k, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KafkaPartitionExpression =
    copy(left = newLeft, right = newRight)
}

object functions {
  /** Partition a record key the way Kafka's DefaultPartitioner would. */
  def kafka_partition(key: Column, numPartitions: Column): Column =
    shim.column(KafkaPartitionExpression(
      shim.expression(key), shim.expression(numPartitions)))
}
