package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into the top-k accumulator. */
final case class TopKEntry(sim: Double, cid: Long)

/** Wrapper for the finished result (a plain `Seq` output type has no
  * public `Encoders` constructor; a one-field product does).
  */
final case class TopKResult(entries: Seq[TopKEntry])

/** Bounded accumulator: the best `k` entries seen so far, kept sorted by
  * (sim desc, cid asc). `n` is the filled prefix length of the arrays.
  */
final case class TopKBuf(sims: Array[Double], cids: Array[Long], var n: Int)

/** Map-side bounded top-k per group — the scale-safe spelling of
  * "rank per query, keep the first k".
  *
  * A `row_number` window over the scored stream shuffles EVERY scored
  * pair by qid before any row is discarded: for brute-force similarity
  * that is an n·m-row exchange that dwarfs everything else at 100×
  * scale. As a typed aggregate the accumulator is a k-bounded sorted
  * buffer, Spark runs it in partial mode BEFORE the exchange
  * (ObjectHashAggregate partial → shuffle → final merge), and the
  * exchange carries at most |queries|·k rows per map partition instead
  * of the full scored stream.
  *
  * Ordering contract (must match the DuckDB oracles' `ORDER BY sim
  * DESC, cid`): higher sim first; IEEE `==` equality (so 0.0 and -0.0
  * tie, as in both engines' SQL comparisons) breaks ties by lower cid.
  * Dot products never produce NaN here (inputs are finite floats).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, TopKBuf, TopKResult] {

  require(k > 0, s"top-k requires k > 0, got $k")

  /** a strictly better than b under (sim desc, cid asc)? */
  @inline private def better(aSim: Double, aCid: Long, bSim: Double, bCid: Long): Boolean =
    if (aSim == bSim) aCid < bCid else aSim > bSim

  override def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)

  /** Insert one entry, keeping the buffer sorted; O(k) shift only when
    * the entry beats the current worst, O(1) reject otherwise — the
    * common case once the buffer is warm.
    */
  override def reduce(b: TopKBuf, e: TopKEntry): TopKBuf = {
    if (b.n < k || better(e.sim, e.cid, b.sims(b.n - 1), b.cids(b.n - 1))) {
      var i = math.min(b.n, k - 1) // insertion slot, walking left
      while (i > 0 && better(e.sim, e.cid, b.sims(i - 1), b.cids(i - 1))) {
        b.sims(i) = b.sims(i - 1); b.cids(i) = b.cids(i - 1); i -= 1
      }
      b.sims(i) = e.sim; b.cids(i) = e.cid
      if (b.n < k) b.n += 1
    }
    b
  }

  /** Merge two sorted buffers — the classic two-pointer merge, bounded
    * at k (runs once per (group, map partition) at the final aggregate).
    */
  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    if (b2.n == 0) return b1
    if (b1.n == 0) return b2
    val out = zero
    var i = 0; var j = 0
    while (out.n < k && (i < b1.n || j < b2.n)) {
      val takeLeft = j >= b2.n ||
        (i < b1.n && better(b1.sims(i), b1.cids(i), b2.sims(j), b2.cids(j)))
      if (takeLeft) { out.sims(out.n) = b1.sims(i); out.cids(out.n) = b1.cids(i); i += 1 }
      else { out.sims(out.n) = b2.sims(j); out.cids(out.n) = b2.cids(j); j += 1 }
      out.n += 1
    }
    out
  }

  override def finish(b: TopKBuf): TopKResult =
    TopKResult((0 until b.n).map(i => TopKEntry(b.sims(i), b.cids(i))))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKResult] = Encoders.product[TopKResult]
}

object TopK {
  /** The aggregate as a two-column function: `topk(k)(sim, cid)` returns
    * `struct<entries: array<struct<sim, cid>>>` sorted best-first.
    */
  def topk(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[TopKEntry])
}
