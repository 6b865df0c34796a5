package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §2b infrastructure).
  *
  * AQE's skew-join handling (OptimizeSkewedJoin) is the FIRST answer to
  * skew — on by default, it splits an oversized sort-merge partition by
  * map-output ranges, which spreads even a single hot key across tasks.
  * Salting is the explicit fallback for the joins AQE leaves alone:
  * joins inside STREAMING queries (AQE does not re-plan a streaming
  * microbatch's stateful plan), shuffled-hash joins, downstream
  * aggregations that inherit the skewed partitioning, and plans that
  * must be deterministic/rerun-stable rather than runtime-adapted.
  */
object Skew {

  /** Salted equi-join: the BIG (skew-prone) side gets a deterministic
    * per-row salt in [0, salts); the small side is replicated once per
    * salt; the join key becomes (key, salt), so one hot key spreads over
    * `salts` shuffle partitions instead of melting one.
    *
    * Correct for `inner`, `left_outer`, `left_semi`, and `left_anti`
    * joins (the replicated side is on the right, and every big-side row
    * joins the full dim slice for its salt). Right/full joins would
    * duplicate unmatched dim rows once per salt and are rejected.
    *
    * The salt is a hash of the big side's FULL row, not `rand()`: reruns
    * salt identically (auditable plans, stable tests). Rows that are
    * byte-identical duplicates share a salt — skew from duplicated whole
    * rows needs a uid column in the hash, which callers get by adding
    * one before the join. Cost: |dim| × salts replication — choose
    * `salts` ≈ the hot key's multiple of a healthy partition, not a
    * large constant.
    */
  def saltedJoin(
      big: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val supported = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")
    require(supported(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins (dim side is replicated), got $joinType")
    require(!big.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(salts)))
    val repDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** EXT-I2 — hot-key skew report over the event stream: the top-N
    * `user_id`s by event count, each with its share of all events
    * (`event_frac`) and its multiple of the mean per-key load
    * (`skew_ratio` = count · n_keys / total — 1.0 is a perfectly even
    * key). The MEASUREMENT that decides whether a join or aggregation
    * keyed on `user_id` needs [[saltedJoin]] (and with how many salts:
    * a healthy `salts` ≈ the hottest key's `skew_ratio` rounded up) or
    * can be left to AQE's skew split.
    *
    * Scale: one partial-agg shuffle on the key (map-side combine folds
    * each partition to its distinct keys before the exchange), a 1-row
    * totals broadcast, and a TakeOrdered top-N (per-partition heads
    * fold map-side; the key relation never re-shuffles). Output is N
    * rows. Deterministic: ties break to the smaller key.
    */
  def hotKeys(spark: SparkSession, dir: String, n: Int = 15): DataFrame = {
    val counts = Replication.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val totals = counts.agg(
      sum("n_events").as("total_events"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("user_id"), col("n_events"),
        (col("n_events").cast("double") / col("total_events")).as("event_frac"),
        (col("n_events").cast("double") * col("n_keys") / col("total_events"))
          .as("skew_ratio"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(n)
  }

  /** EXT-I3 — frequency-sketch audit: Count-Min estimates for the hot
    * keys, bracketed by their exact counts. Completes the sketch-audit
    * trilogy (x59 cardinality/HLL++, x67 quantiles/`approx_percentile`):
    * at 100 TB the per-key frequency monitor runs the SKETCH (the
    * `count_min_sketch` aggregate is partial-mergeable — every map
    * partition folds to one fixed-size `depth×width` table, the exchange
    * carries sketches, never keys), and this audit proves on eval-scale
    * data that the sketch respects its laws against [[hotKeys]]' exact
    * relation:
    *  - `ok_never_under`: CMS can only OVERcount (each row of the table
    *    is truth + collisions) — a hard guarantee, never probabilistic;
    *  - `ok_within_eps`: estimate ≤ truth + ⌈ε·total⌉ — the ε-bound,
    *    held with probability ≥ `confidence` per key; with a fixed seed
    *    and fixed data the verdict is deterministic, so the oracle can
    *    assert it (x59's contract: deterministic columns + law verdicts
    *    are oracle-checked; the implementation-defined estimate itself
    *    never leaves the plan).
    *
    * The one driver `head` collects a single sketch bounded by
    * (ε, confidence) — ~depth·width longs, a few hundred KB at
    * ε=0.001 — the bounded-by-construction pattern of the centroid
    * tables and Bloom index; the probe side is the N-row hot-key
    * relation with the sketch broadcast in the UDF closure
    * (CountMinSketchImpl is Serializable). A UDF is the right tool:
    * probing a serialized sketch has no Catalyst spelling.
    */
  /** EXT-I4 — SpaceSaving heavy-hitter audit: completes the sketch-audit
    * QUARTET (x59 cardinality/HLL++, x67 quantiles, x73 frequency/CMS)
    * with the top-k-structure sketch — the batch twin of the streaming
    * `trendingStreamApprox` state, under the same oracle contract as
    * x73: deterministic columns (the exact hot-key relation) plus LAW
    * verdicts that are theorem-true, while the implementation-defined
    * estimates never leave the plan (monitored-key sets and exact
    * estimate values depend on partition layout; the laws do not).
    *
    * Laws audited per hot key, against [[SpaceSavingSummary]]'s merged
    * relation (see its scaladoc for why they survive the distributed
    * merge):
    *  - `ok_never_under`: estimate ≥ true count. For a hot key ABSENT
    *    from the truncated summary, the implied estimate is the
    *    summary's minimum kept count m* (a dropped or evicted key's true
    *    count never exceeds the minimum it lost to), so the law still
    *    closes — and an UNSATURATED summary has no absent keys at all.
    *  - `ok_within_err`: estimate − err ≤ true count (err = m* for
    *    implied estimates, where the bound is immediate).
    *
    * Scale shape: the aggregate is partial-merged (one ≤-capacity entry
    * list per map partition crosses the exchange — the key stream never
    * shuffles, exactly the `count_min_sketch` shape x73 uses); the probe
    * side is the N-row hot-key relation; the 1-row m* relation rides a
    * bounded broadcast like hotKeys' totals.
    */
  def heavyHitterAudit(
      spark: SparkSession,
      dir: String,
      n: Int = 15,
      capacity: Int = 256): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new SpaceSavingAggregator(capacity),
      org.apache.spark.sql.Encoders.scalaLong)
    val hh = Replication.events(spark, dir)
      .agg(agg(col("user_id")).as("hh"))
      .select(explode(col("hh.entries")).as("e"))
      .select(col("e.key").as("user_id"),
        col("e.count").as("ss_est"), col("e.err").as("ss_err"))
    // m*: the minimum kept count — the implied (estimate, err) for any
    // hot key the truncation dropped; 1 row, bounded broadcast
    val minKept = hh.agg(min(col("ss_est")).as("m_star"))
    hotKeys(spark, dir, n)
      .join(hh, Seq("user_id"), "left")
      .crossJoin(broadcast(minKept))
      .withColumn("est", coalesce(col("ss_est"), col("m_star")))
      .withColumn("err", coalesce(col("ss_err"), col("m_star")))
      .withColumn("ok_never_under", col("est") >= col("n_events"))
      .withColumn("ok_within_err", col("est") - col("err") <= col("n_events"))
      .select("user_id", "n_events", "event_frac", "skew_ratio",
        "ok_never_under", "ok_within_err")
      .orderBy(col("n_events").desc, col("user_id"))
  }

  def freqSketchAudit(
      spark: SparkSession,
      dir: String,
      n: Int = 15,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val bytes = Replication.events(spark, dir)
      .agg(expr(s"count_min_sketch(user_id, ${eps}d, ${confidence}d, $seed)").as("cms"))
      .head.getAs[Array[Byte]](0)
    // empty input: the aggregate yields a null sketch and hotKeys yields
    // zero rows — the audit relation is vacuously empty, never an NPE
    if (bytes == null)
      return hotKeys(spark, dir, n)
        .withColumn("ok_never_under", lit(true))
        .withColumn("ok_within_eps", lit(true))
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val est = udf { (uid: Long) => cms.estimateCount(java.lang.Long.valueOf(uid)) }
    hotKeys(spark, dir, n)
      .withColumn("cms_est", est(col("user_id")))
      .withColumn("ok_never_under", col("cms_est") >= col("n_events"))
      .withColumn("ok_within_eps", col("cms_est") <= col("n_events") + lit(slack))
      .select("user_id", "n_events", "event_frac", "skew_ratio",
        "ok_never_under", "ok_within_eps")
  }
}
