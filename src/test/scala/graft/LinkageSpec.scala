package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

class LinkageSpec extends AnyFunSuite with SparkSuite {

  test("entityResolution (x118): blocked best match, ties to the lower key, singletons kept") {
    // block (B1, 10): a 3-record block — 1 "abc" and 2 "abd" are each
    // other's best (lev 1, sim 1 - 1/3 = 0.6667); 3 "xyz" matches both
    // at sim 0 and must tie-break to the LOWER candidate key 1.
    // block (B1, 20): singleton — record 4 survives with a NULL match.
    // block (B2, 10): 5 "hello" / 6 "help" (lev 2, sim 1 - 2/5 = 0.6).
    // blocking, not distance, decides candidacy: 4's name is identical
    // to 1's, but they share no block, so they are never compared.
    val dir = TestTables.partDir(spark, Seq(
      (1L, "abc", "B1", 10), (2L, "abd", "B1", 10), (3L, "xyz", "B1", 10),
      (4L, "abc", "B1", 20),
      (5L, "hello", "B2", 10), (6L, "help", "B2", 10)))
    val got = Linkage.entityResolution(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val byKey = got.map(r => r.getLong(0) -> r).toMap
    def m(id: Long): (Long, Long, Long, Double) = {
      val r = byKey(id)
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
    }
    assert(m(1L) == ((3L, 2L, 1L, 0.6667)))
    assert(m(2L) == ((3L, 1L, 1L, 0.6667)))
    assert(m(3L) == ((3L, 1L, 3L, 0.0)), "sim-0 tie must break to the lower candidate key")
    val r4 = byKey(4L)
    assert(r4.getLong(3) == 1L && r4.isNullAt(4) && r4.isNullAt(5) && r4.isNullAt(6),
      "a singleton block reports no match, not a dropped record")
    assert(m(5L) == ((2L, 6L, 2L, 0.6)))
    assert(m(6L) == ((2L, 5L, 2L, 0.6)))
  }

  test("entityResolution: both-empty names score sim 1.0 (the x111 div-guard corner)") {
    val dir = TestTables.partDir(spark, Seq(
      (7L, "", "B3", 5), (8L, "", "B3", 5)))
    val got = Linkage.entityResolution(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got(7L) == ((8L, 0L, 1.0)) && got(8L) == ((7L, 0L, 1.0)))
  }

  test("entityResolution: block columns report the record's own block") {
    val dir = TestTables.partDir(spark, Seq(
      (1L, "aa", "B9", 3), (2L, "ab", "B9", 3)))
    val got = Linkage.entityResolution(spark, dir).collect()
    got.foreach { r =>
      assert(r.getString(1) == "B9" && r.getInt(2) == 3)
    }
  }

  test("entityClusters (x133): transitive closure over thresholded pairs; purity over unblocked attrs") {
    // block (B1, 10): 1 "abcd" ~ 2 "abcx" (lev 1, sim 0.75 ≥ 0.7) and
    // 2 "abcx" ~ 3 "abxx" (0.75) but 1 ~ 3 only 0.5 — the CHAIN must
    // still cluster {1,2,3} (best-match can't see this; the component
    // can). 4 "qqqq" pairs with nobody ≥ 0.7 → absent (a singleton is
    // not an entity). block (B1, 20): 5 "abcd" — name-identical to 1
    // but never compared (blocking decides candidacy). block (B2, 10):
    // 6/7 "hello" exact (sim 1.0).
    val dir = TestTables.partDirTyped(spark, Seq(
      (1L, "abcd", "B1", 10, "T1", 10.0),
      (2L, "abcx", "B1", 10, "T1", 30.0),
      (3L, "abxx", "B1", 10, "T2", 25.5),
      (4L, "qqqq", "B1", 10, "T1", 5.0),
      (5L, "abcd", "B1", 20, "T1", 10.0),
      (6L, "hello", "B2", 10, "T3", 10.75),
      (7L, "hello", "B2", 10, "T3", 12.25)))
    val got = Linkage.entityClusters(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getBoolean(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(1L, 6L), "components label by min member key; singletons absent")
    assert(got(1L) == ((3L, 2L, "T1", 0.6667, true, 20.0)),
      "the chained cluster reads majority type T1 (2 of 3) and the full price span")
    assert(got(6L) == ((2L, 1L, "T3", 1.0, false, 1.5)))
  }

  test("entityClusters: a tied type census breaks to the DESC type (the x129 majority spelling)") {
    val dir = TestTables.partDirTyped(spark, Seq(
      (10L, "same", "B3", 1, "TA", 1.0),
      (11L, "same", "B3", 1, "TB", 2.0)))
    val got = Linkage.entityClusters(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getString(3) == "TB" && r.getDouble(4) == 0.5 && r.getBoolean(5))
    assert(r.getDouble(6) == 1.0)
  }
}
