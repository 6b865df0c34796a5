package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** SURVEY.md §2b temporal operators: batch sessionization, as-of join,
  * range join.
  */
class TemporalSpec extends AnyFunSuite with SparkSuite {

  private def us(s: Long): Long = s * 1000000L

  test("sessionize: gap > threshold starts a new session") {
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(0), 1L, "click"),
      (1L, us(10), 1L, "click"),
      (2L, us(2000), 1L, "click"), // 1990s gap > 1800s -> new session
      (3L, us(5), 2L, "view"))) // other user: own session numbering
    val got = Temporal.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.sameElements(Array((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L))))
  }

  test("asofJoin: latest prior view per user; equal timestamps match; no-view clicks drop") {
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(5), 1L, "click"), // before any view -> dropped
      (1L, us(10), 1L, "view"),
      (2L, us(15), 1L, "click"), // -> view 1
      (3L, us(20), 1L, "view"),
      (4L, us(20), 1L, "click"), // tie: equal-ts view 3 is visible
      (5L, us(30), 2L, "click"))) // other user, no views -> dropped
    val got = Temporal.asofJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(2L -> 1L, 4L -> 3L))
  }

  test("rangeJoin: in-band pair found when the lower-id event is LATER and straddles a bucket") {
    // id 1 sits just past the 5s bucket boundary, id 2 just before it:
    // bucket(1)=1, bucket(2)=0, and the only e1<e2 orientation has the
    // partner in the EARLIER adjacent bucket — the {b-1} explode case
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, 5000001L, 1L, "click"),
      (2L, 4999999L, 1L, "click")))
    val got = Temporal.rangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(Array((1L, 2L, -0.000002))))
  }

  test("rangeJoin: pairs within the band, including across adjacent buckets") {
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(0), 1L, "click"),
      (1L, us(3), 1L, "click"), // pair (0,1): 3s
      (2L, us(8), 1L, "click"), // pair (1,2): 5s exactly, crosses bucket 0|1
      (3L, us(20), 1L, "click"))) // isolated
    val got = Temporal.rangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(Array((0L, 1L, 3.0), (1L, 2L, 5.0))))
  }

  test("funnel: steps count only strictly-ordered completions") {
    val dir = TestTables.eventsDir(spark, Seq(
      // user 1 completes the whole funnel in order
      (0L, us(0), 1L, "view"), (1L, us(10), 1L, "click"), (2L, us(20), 1L, "purchase"),
      // user 2's click PRECEDES their view: step 1 only
      (3L, us(5), 2L, "click"), (4L, us(10), 2L, "view"),
      // user 3 views only
      (5L, us(0), 3L, "view"),
      // user 4 purchases without ever viewing: no stage at all
      (6L, us(0), 4L, "purchase"),
      // user 5's click is SIMULTANEOUS with the view: not strictly after
      (7L, us(7), 5L, "view"), (8L, us(7), 5L, "click")))
    val got = Temporal.funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sameElements(Array(
      (1L, "view", 4L), (2L, "click", 1L), (3L, "purchase", 1L))))
  }

  test("funnel: a later re-view never resets progress (earliest-completion semantics)") {
    // click sits between the first and second view: counted against the
    // EARLIEST view, so the funnel completes
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(0), 1L, "view"), (1L, us(10), 1L, "click"),
      (2L, us(20), 1L, "view"), (3L, us(30), 1L, "purchase")))
    val got = Temporal.funnel(spark, dir).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.sameElements(Array((1L, 1L), (2L, 1L), (3L, 1L))))
  }

  test("retentionCohorts: Monday-anchored weeks, offsets from the cohort week") {
    val day = 86400L
    // epoch day 0 was a Thursday: days 0-3 are week 0, day 4 starts week 1
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(0), 1L, "view"),            // user 1 cohort week 0
      (1L, us(11 * day), 1L, "view"),     // day 11 -> week 2: offset 2
      (2L, us(1 * day), 2L, "view"),      // user 2 cohort week 0, week-0 only
      (3L, us(4 * day), 3L, "view"),      // user 3 cohort week 1 (Monday boundary)
      (4L, us(4 * day + 10), 3L, "view"))) // same week: ONE active-week row
    val got = Temporal.retentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(Array((0L, 0L, 2L), (0L, 2L, 1L), (1L, 0L, 1L))))
  }

  test("trendingKeys: per-window top-k by count, ties to the smaller key, epoch-aligned") {
    // window [0,600): user 1 x3, user 2 x2, users 3/4/5 x1 (tie -> 3)
    // window [600,1200): users 7/8 x1 each -> under k, ties ordered
    val rows = Seq(
      (1L, 10L, 1L), (2L, 20L, 1L), (3L, 30L, 1L),
      (4L, 40L, 2L), (5L, 50L, 2L),
      (6L, 60L, 3L), (7L, 70L, 4L), (8L, 80L, 5L),
      (9L, 700L, 7L), (10L, 710L, 8L)
    ).map { case (id, sec, uid) => (id, sec * 1000000L, uid, "click") }
    val dir = TestTables.eventsDir(spark, rows)
    val got = Temporal.trendingKeys(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.filter(_._1 == 0L).toSeq ==
      Seq((0L, 1, 1L, 3L), (0L, 2, 2L, 2L), (0L, 3, 3L, 1L)))
    assert(got.filter(_._1 == 600L).toSeq ==
      Seq((600L, 1, 7L, 1L), (600L, 2, 8L, 1L)))
    assert(got.map(_._1).distinct.sorted.toSeq == Seq(0L, 600L))
  }

  test("transitions: per-user adjacency, exact conditionals, event_id breaks timestamp ties") {
    // user 1: view -> click -> view ; user 2: view -> purchase, where the
    // purchase shares its timestamp with the view — only the event_id
    // tie-break makes (view -> purchase) the sequence, not the reverse
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, 1000000L, 1L, "view"),
      (2L, 2000000L, 1L, "click"),
      (3L, 3000000L, 1L, "view"),
      (4L, 5000000L, 2L, "view"),
      (5L, 5000000L, 2L, "purchase")))
    val got = Temporal.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "purchase", 1L, 0.5)))
    // conditionals per from_type sum to exactly 1
    got.groupBy(_._1).foreach { case (_, rows) => assert(rows.map(_._4).sum == 1.0) }
  }

  test("journeyScores: per-user min/pooled vs the corpus matrix, exact quotients") {
    // same drive as transitions: matrix is (click->view)=1/1,
    // (view->click)=1/2, (view->purchase)=1/2
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, 1000000L, 1L, "view"),
      (2L, 2000000L, 1L, "click"),
      (3L, 3000000L, 1L, "view"),
      (4L, 5000000L, 2L, "view"),
      (5L, 5000000L, 2L, "purchase")))
    val got = Temporal.journeyScores(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // user 1: steps view->click (1/2) and click->view (1/1):
    //   min_p = 0.5, pooled = (1+1)/(2+1) = 2/3 exactly
    // user 2: one step view->purchase (1/2): min = pooled = 0.5
    assert(got.toSeq == Seq(
      (1L, 2L, 0.5, 2.0 / 3.0),
      (2L, 1L, 0.5, 0.5)))
  }

  test("journeyScores: single-event users emit no row; every pr is a matrix entry") {
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, 1000000L, 1L, "view"),
      (2L, 2000000L, 2L, "view"),
      (3L, 3000000L, 2L, "click")))
    val got = Temporal.journeyScores(spark, dir).collect()
    // user 1 has one event -> no transition -> absent from the output
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    assert(got.head.getLong(1) == 1L && got.head.getDouble(2) == 1.0 &&
      got.head.getDouble(3) == 1.0)
  }

  test("disorderAudit (x101): per-type lateness histogram against hand-computed lags") {
    def us(ms: Long) = ms * 1000L
    // user 1 / type A: in-order, 5s-late, in-order, 1s-late, in-order,
    // 65s-late, 500ms-late — lags 0, 5000, 0, 1000, 0, 65000, 500
    // user 2 / type B: fully in order
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, us(10000L), 1L, "A"),
      (2L, us(5000L), 1L, "A"),
      (3L, us(20000L), 1L, "A"),
      (4L, us(19000L), 1L, "A"),
      (5L, us(90000L), 1L, "A"),
      (6L, us(25000L), 1L, "A"),
      (7L, us(89500L), 1L, "A"),
      (10L, us(1000L), 2L, "B"),
      (11L, us(2000L), 2L, "B"),
      (12L, us(3000L), 2L, "B")))
    val rows = graft.operators.Temporal.disorderAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("A")
    // (n, in_order, lt1s, lt10s, lt60s, ge60s, max, frac)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4),
      a.getLong(5), a.getLong(6), a.getLong(7)) ==
      ((7L, 3L, 1L, 2L, 0L, 1L, 65000L)))
    assert(a.getDouble(8) == 4.0 / 7.0)
    val b = rows("B")
    assert((b.getLong(1), b.getLong(2), b.getLong(7), b.getDouble(8)) ==
      ((3L, 3L, 0L, 0.0)))
  }

  test("burstiness (x110): exact CV² per type — constant gaps 0, bursty > 0, zero-sum NULL") {
    val dir = TestTables.eventsDir(spark, Seq(
      // user 1 / type A: constant 10 s gaps -> cv2 = 0
      (1L, us(0L), 1L, "A"), (2L, us(10L), 1L, "A"), (3L, us(20L), 1L, "A"),
      // user 2 / type A: one more constant-10 gap (pooled across users)
      (4L, us(100L), 2L, "A"), (5L, us(110L), 2L, "A"),
      // user 1 / type B: gaps 1 s and 9 s -> mean 5 s, var 16 s² -> cv2 = 0.64
      (6L, us(0L), 1L, "B"), (7L, us(1L), 1L, "B"), (8L, us(10L), 1L, "B"),
      // user 3 / type C: two same-µs events -> one zero gap, sum 0 -> cv2 NULL
      (9L, us(50L), 3L, "C"), (10L, us(50L), 3L, "C"),
      // user 4 / type D: a single event -> no gaps, type absent
      (11L, us(0L), 4L, "D")))
    val got = Temporal.burstiness(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("A", "B", "C"))
    val a = got("A") // 3 gaps, all 10 s
    assert((a.getLong(1), a.getLong(2)) == ((3L, us(30L))))
    assert(a.getDouble(4) == us(10L).toDouble && a.getDouble(5) == 0.0)
    val b = got("B") // gaps [1 s, 9 s]: cv2 = (2·82e12 − 1e14)/1e14 = 0.64
    assert((b.getLong(1), b.getLong(2)) == ((2L, us(10L))))
    assert(b.getDouble(4) == us(5L).toDouble && b.getDouble(5) == 0.64)
    val c = got("C") // the div-guard row: Σg = 0 -> NULL, not NaN
    assert((c.getLong(1), c.getLong(2)) == ((1L, 0L)))
    assert(c.isNullAt(5))
    // interleaved types on one user never manufacture phantom gaps:
    // the (user, type) partition means A's count ignores B's events
    assert(got("A").getLong(1) == 3L)
  }

  test("cusumDrift (x122): dense grid, scaled-integer cusum, peak ties to the earliest hour") {
    def us(s: Long): Long = s * 1000000L
    // grid: hours 0..3 (the union span — A alone would end at hour 0).
    // A: counts [4,0,0,0], T=4 -> dev = 4c-4 = [12,-4,-4,-4], cusum
    //    [12,8,4,0] -> peak +12 at hour 0 (the burst-then-silence ramp).
    // B: counts [0,0,0,2], T=2 -> dev = [-2,-2,-2,6], cusum [-2,-4,-6,0]
    //    -> peak -6 at hour 2: CUSUM flags the silence BEFORE the late
    //    burst, which is the change-point reading.
    // C: counts [1,1,1,1] -> dev 0 everywhere -> all-zero cusum; the
    //    all-tied peak must break to the EARLIEST hour.
    val dir = TestTables.eventsDir(spark,
      (1L to 4L).map(i => (i, us(i * 10), 1L, "A")) ++
        Seq((5L, us(10810), 1L, "B"), (6L, us(10820), 2L, "B")) ++
        Seq((7L, us(100), 3L, "C"), (8L, us(3700), 3L, "C"),
          (9L, us(7300), 3L, "C"), (10L, us(10900), 3L, "C")))
    val got = Temporal.cusumDrift(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") == ((4L, 4L, 0L, 12L, 12L)))
    assert(got("B") == ((4L, 2L, 7200L, -6L, 6L)))
    assert(got("C") == ((4L, 4L, 0L, 0L, 0L)),
      "an all-tied (flat) cusum must report the earliest grid hour")
  }

  test("periodicity (x135): exact Pearson at each lag over the dense grid; constant series NULL") {
    def us(s: Long): Long = s * 1000000L
    // 8-hour grid. P alternates [2,0,2,0,2,0,2,0] (events at even hours,
    // 2 per hour) -> the dense grid must supply the zero hours, giving
    // lag-1 corr EXACTLY -1 (n=7: num = 7*0 - 8*6 = -48, vx = 7*16-64
    // = 48, vy = 7*12-36 = 48) and lag-2 corr EXACTLY +1.
    // C is one event every hour -> both windows constant -> NULL.
    val pEvents = Seq(0, 2, 4, 6).flatMap { h =>
      Seq((100L + h * 2, us(h * 3600L + 10), 1L, "P"),
        (101L + h * 2, us(h * 3600L + 20), 1L, "P"))
    }
    val cEvents = (0 to 7).map(h => (200L + h, us(h * 3600L + 30), 2L, "C"))
    val dir = TestTables.eventsDir(spark, pEvents ++ cEvents)
    val got = Temporal.periodicity(spark, dir, lags = Seq(1, 2)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    assert(got.keySet == Set(("P", 1L), ("P", 2L), ("C", 1L), ("C", 2L)))
    assert(got(("P", 1L)) == ((7L, -48L, 48L, 48L, Some(-1.0))),
      "an alternating series anti-correlates exactly at lag 1")
    assert(got(("P", 2L)) == ((6L, 36L, 36L, 36L, Some(1.0))),
      "the period-2 series correlates exactly at its period")
    assert(got(("C", 1L))._5.isEmpty && got(("C", 2L))._5.isEmpty,
      "a constant series has zero variance and reports NULL, never NaN")
  }

  test("windowedBurstinessAudit (x137): gaps never cross a window; moments exact per cell") {
    def us(s: Long): Long = s * 1000000L
    // user 1 / A: 0s, 100s (window 0), then 610s, 620s (window 600) —
    // the 100s -> 610s pair straddles the boundary and must form NO gap
    // on either side. user 2 / B: a same-µs replay pair -> Σg = 0 ->
    // cv2 NULL. user 3 / C: one event per window -> no gap, no row.
    val dir = TestTables.eventsDir(spark, Seq(
      (1L, us(0), 1L, "A"), (2L, us(100), 1L, "A"),
      (3L, us(610), 1L, "A"), (4L, us(620), 1L, "A"),
      (5L, us(50), 2L, "B"), (6L, us(50), 2L, "B"),
      (7L, us(40), 3L, "C"), (8L, us(640), 3L, "C")))
    val got = Temporal.windowedBurstinessAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    assert(got.keySet == Set((0L, "A"), (600L, "A"), (0L, "B")),
      "only (window, type) cells with an in-window gap emit; boundary pairs don't")
    assert(got((0L, "A")) == ((1L, 100000000L, "10000000000000000", 1.0e8, Some(0.0))))
    assert(got((600L, "A")) == ((1L, 10000000L, "100000000000000", 1.0e7, Some(0.0))))
    assert(got((0L, "B")) == ((1L, 0L, "0", 0.0, None)),
      "an all-zero-gap cell reports cv2 NULL, never NaN")
  }

  test("peakConcurrency (x148): cross-day session carries; touching instants count, hand-derived") {
    val dir = TestTables.eventsDir(spark, Seq(
      (0L, us(100), 1L, "a"), (1L, us(200), 1L, "a"), // u1 session [100, 200]
      (2L, us(150), 2L, "a"), // u2 point session [150, 150] inside u1's
      (3L, us(86000), 4L, "a"), (4L, us(86900), 4L, "a"), // u4 straddles midnight
      (5L, us(86450), 3L, "a"), (6L, us(86500), 3L, "a"))) // u3 day-2 session
    // day 1 sweep (+1 first at equal instants): 1, 2, 1, 0, 1 -> peak 2
    // day 2 enters with u4 open: 2, 1, 0 -> peak 2
    val got = Temporal.peakConcurrency(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set(0L, 86400L))
    assert(got(0L) == ((3L, 2L, 0L, 1L, 2L)),
      "the point session peaks concurrency at 2 and u4 stays open into day 2")
    assert(got(86400L) == ((1L, 2L, 1L, 0L, 2L)),
      "day 2 opens with the straddling session standing")
  }

  test("peakConcurrency: three-level scan equals the single global sweep on harness data") {
    val dir = "/root/testdata/sf0.001"
    val sess = Temporal.sessionize(spark, dir).collect()
      .map(r => (r.getTimestamp(2).getTime * 1000L + (r.getTimestamp(2).getNanos / 1000) % 1000L,
        r.getTimestamp(3).getTime * 1000L + (r.getTimestamp(3).getNanos / 1000) % 1000L))
    // reference: one driver-side global sweep, +1 before -1 at ties
    val deltas = sess.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy { case (t, d) => (t, -d) }
    var conc = 0L
    val byDay = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, Long, Long, Long)]()
    deltas.foreach { case (t, d) =>
      val day = t / 1000000L / 86400L * 86400L
      val openAtStart = conc
      conc += d
      val cur = byDay.getOrElseUpdate(day, (0L, 0L, openAtStart, 0L, Long.MinValue))
      byDay(day) = (cur._1 + (if (d > 0) 1L else 0L), cur._2 + (if (d < 0) 1L else 0L),
        cur._3, conc, math.max(cur._5, conc))
    }
    val got = Temporal.peakConcurrency(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == byDay.toMap, "the decomposed scan must equal the global sweep exactly")
    // chain law: each day opens with what the previous day left standing
    val days = got.keys.toSeq.sorted
    days.sliding(2).foreach {
      case Seq(a, b) => assert(got(a)._4 == got(b)._3)
      case _ =>
    }
  }
}
