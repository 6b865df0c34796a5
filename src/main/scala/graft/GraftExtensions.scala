package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** SQL surface for the graft codegen expressions: registered through
  * `SparkSessionExtensions`, so a SQL-first user runs
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT graft_simhash(toks, 60) FROM docs")
  * }}}
  *
  * The Column API (`graft.functions.*`) remains the primary surface and
  * each SQL function resolves to the IDENTICAL Catalyst expression — one
  * implementation, two spellings (asserted by GraftExtensionsSpec).
  * Integer hyper-parameters (shingle size, hash count, bits) must be INT
  * literals: they are compiled into the generated code, not read per row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registry.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, arity: Int, usage: String)(
      build: Seq[Expression] => Expression): FunctionDescription = (
    FunctionIdentifier(name),
    // the full (non-deprecated) constructor: (className, db, NAME, usage,
    // arguments, examples, note, group, since, deprecated, source) — the
    // 3-arg one is (className, db, name) and would register the usage
    // text as the function name
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in"),
    (args: Seq[Expression]) => {
      if (args.length != arity)
        throw new IllegalArgumentException(
          s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    })

  private def intLit(e: Expression, fn: String, param: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be an INT literal (it is compiled into codegen), got $other")
  }

  /** Every graft expression, by SQL name. */
  val registry: Seq[FunctionDescription] = Seq(
    fn("graft_dot", 2, "graft_dot(a, b) - left-fold double dot product of float/double vectors")(
      a => DotProductExpression(a(0), a(1))),
    fn("graft_intersect_size", 2, "graft_intersect_size(a, b) - distinct-intersection cardinality")(
      a => IntersectSizeExpression(a(0), a(1))),
    fn("graft_kafka_partition", 2, "graft_kafka_partition(key, n) - Kafka DefaultPartitioner (murmur2) routing")(
      a => KafkaPartitionExpression(a(0), a(1))),
    fn("graft_rolling_hash", 1, "graft_rolling_hash(text) - polynomial code-point fingerprint")(
      a => RollingHashExpression(a(0))),
    fn("graft_shingles", 2, "graft_shingles(toks, k) - distinct k-token shingles")(
      a => ShinglesExpression(a(0), intLit(a(1), "graft_shingles", "k"))),
    fn("graft_char_ngrams", 2, "graft_char_ngrams(text, n) - distinct character n-grams")(
      a => CharNgramsExpression(a(0), intLit(a(1), "graft_char_ngrams", "n"))),
    fn("graft_minhashes", 2, "graft_minhashes(shingles, n) - n seeded min-hashes in one pass")(
      a => MinHashesExpression(a(0), intLit(a(1), "graft_minhashes", "n"))),
    fn("graft_ngram_stats", 2, "graft_ngram_stats(toks, k) - k-gram multiset (count, distinct, mode) in one pass")(
      a => NgramStatsExpression(a(0), intLit(a(1), "graft_ngram_stats", "k"))),
    fn("graft_simhash", 2, "graft_simhash(toks, bits) - SimHash fingerprint")(
      a => SimHashExpression(a(0), intLit(a(1), "graft_simhash", "bits"))),
    fn("graft_count_in", 2, "graft_count_in(toks, array(...)) - element instances within a fixed word set")(
      a => CountInExpression(a(0), stringArrayLit(a(1), "graft_count_in", "words"))),
    fn("graft_window_hashes", 2, "graft_window_hashes(toks, k) - 60-bit hash of every k-token window, position order")(
      a => WindowHashesExpression(a(0), intLit(a(1), "graft_window_hashes", "k"))))

  /** Foldable array<string> hyper-parameter (evaluated at plan time —
    * like [[intLit]], the set is compiled into the plan, not per-row).
    */
  private def stringArrayLit(e: Expression, fn: String, param: String): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$fn: $param must be a foldable array<string> (e.g. array('the', 'a')), got $e")
    e.eval() match {
      case ad: org.apache.spark.sql.catalyst.util.ArrayData =>
        ad.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(v => if (v == null) null else v.toString).toSeq
      case other => throw new IllegalArgumentException(
        s"$fn: $param evaluated to unexpected $other")
    }
  }

  /** Register into an already-built session — the test path (an existing
    * session cannot re-run `spark.sql.extensions`), and the escape hatch
    * for notebook users who did not control session construction.
    */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
