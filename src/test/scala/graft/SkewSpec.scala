package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join equivalence and plan shape. */
class SkewSpec extends AnyFunSuite with SparkSuite {

  import org.apache.spark.sql.DataFrame

  private lazy val big: DataFrame = {
    import spark.implicits._
    // one melting-hot key (90%) + a healthy tail
    (1 to 2000).map(i => (if (i % 10 != 0) 7L else i.toLong, i.toLong))
      .toDF("k", "payload")
  }

  private lazy val dim: DataFrame = {
    import spark.implicits._
    (1 to 2000 by 100).map(i => (i.toLong, s"d$i")).toDF("k", "attr")
      .union(Seq((7L, "hot")).toDF("k", "attr"))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("saltedJoin(inner) equals the plain join row-for-row") {
    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("saltedJoin(left_outer) preserves unmatched big-side rows exactly once") {
    val plain = big.join(dim, Seq("k"), "left_outer")
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8, joinType = "left_outer")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("saltedJoin(left_semi) equals the plain semi join (no replication duplicates)") {
    val plain = big.join(dim, Seq("k"), "left_semi")
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8, joinType = "left_semi")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("saltedJoin(left_anti) equals the plain anti join") {
    val plain = big.join(dim, Seq("k"), "left_anti")
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8, joinType = "left_anti")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("the exchange partitions on (key, salt) — the hot key actually spreads") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // disable auto-broadcast so the join SHUFFLES (the scenario salting exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Skew.saltedJoin(big, dim, "k", salts = 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("__salt"), p)
      assert("hashpartitioning\\(k#\\d+L, __salt".r.findFirstIn(p).isDefined, p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("right/full joins and __salt collisions are rejected") {
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, dim, "k", 8, joinType = "right"))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big.withColumn("__salt", lit(1)), dim, "k", 8))
    intercept[IllegalArgumentException](Skew.saltedJoin(big, dim, "k", 0))
  }

  test("hotKeys: top-N by count with deterministic ties; share/ratio arithmetic exact") {
    val dir = "/root/testdata/sf0.001"
    val counts = graft.operators.Replication.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val nKeys = counts.length.toLong
    val expected = counts.sortBy(t => (-t._2, t._1)).take(15).toSeq
    val got = Skew.hotKeys(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == expected)
    got.foreach { case (_, n, frac, ratio) =>
      assert(frac == n.toDouble / total) // one IEEE division
      assert(ratio == n.toDouble * nKeys / total) // one product, one division
    }
    // the report orders a salts choice: the hottest key leads
    assert(got.head._2 == got.map(_._2).max)
  }

  test("hotKeys: a synthetic hot key reports its share and skew multiple exactly") {
    // key 7 takes 90 of 100 events; keys 91..100 take 1 each → 11 keys
    val rows = (1L to 90L).map(i => (i, i * 1000L, 7L, "click")) ++
      (91L to 100L).map(i => (i, i * 1000L, i, "click"))
    val dir = TestTables.eventsDir(spark, rows)
    val got = Skew.hotKeys(spark, dir, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 3)
    assert(got.head == ((7L, 90L, 0.9, 90.0 * 11 / 100))) // skew_ratio 9.9
    // the tail ties (1 event each) break to the smaller key
    assert(got(1)._1 == 91L && got(2)._1 == 92L)
    assert(got(1)._4 == 1.0 * 11 / 100 * 1) // 1·n_keys/total = 0.11
  }

  test("freqSketchAudit: deterministic columns match hotKeys; both CMS laws hold") {
    val dir = "/root/testdata/sf0.001"
    val got = Skew.freqSketchAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5)))
    val exact = Skew.hotKeys(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // the audit view is the exact report plus verdicts — nothing drifts
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == exact.toSeq)
    assert(got.forall(_._5), "CMS undercounted — impossible by construction")
    assert(got.forall(_._6), "eps bound violated at fixed seed on fixed data")
    // white-box: an independently built sketch with the same parameters
    // yields estimates obeying the never-under law for every hot key
    val events = graft.operators.Replication.events(spark, dir)
      .select("user_id").collect().map(_.getLong(0))
    val ref = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    events.foreach(ref.addLong)
    exact.foreach { case (uid, n, _, _) =>
      assert(ref.estimateCount(java.lang.Long.valueOf(uid)) >= n)
    }
  }

  test("freqSketchAudit: an empty event stream audits to the empty relation, not an NPE") {
    val dir = TestTables.eventsDir(spark, Seq.empty[(Long, Long, Long, String)])
    assert(Skew.freqSketchAudit(spark, dir).collect().isEmpty)
  }

  test("heavyHitterAudit: deterministic columns match hotKeys; SpaceSaving laws hold at full and tiny capacity") {
    val dir = "/root/testdata/sf0.001"
    val exact = Skew.hotKeys(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // default capacity (unsaturated or mildly saturated) AND a capacity
    // small enough that truncation/absent-key implied estimates engage —
    // the LAW verdicts must be true in both regimes; the estimates
    // themselves are implementation-defined and never leave the plan
    for (cap <- Seq(256, 4)) {
      val got = Skew.heavyHitterAudit(spark, dir, capacity = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5)))
      assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == exact.toSeq,
        s"cap=$cap: the audit view must be the exact report plus verdicts")
      assert(got.forall(_._5), s"cap=$cap: SpaceSaving undercounted — impossible by its laws")
      assert(got.forall(_._6), s"cap=$cap: err bracket violated")
    }
  }

  test("heavyHitterAudit: empty events audit to the empty relation") {
    val dir = TestTables.eventsDir(spark, Seq.empty[(Long, Long, Long, String)])
    assert(Skew.heavyHitterAudit(spark, dir).collect().isEmpty)
  }

  test("freqSketchAudit: a single-key stream is exact — no collisions possible") {
    val dir = TestTables.eventsDir(spark,
      (1L to 5L).map(i => (i, i * 1000L, 42L, "click")))
    val got = Skew.freqSketchAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSeq == Seq((42L, 5L, 1.0, true, true)))
  }
}
