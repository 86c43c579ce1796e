package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Exact order statistics (`RobustStats`): lower-median semantics
  * against sorted-seq references, k-th-smallest bounds, and the
  * hand-computed median/MAD outlier report.
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("lowerMedian is the (n+1)/2-th smallest: odd, even, ties, single") {
    for (vs <- Seq(Seq(3L, 1L, 2L), Seq(4L, 1L, 3L, 2L), Seq(5L),
        Seq(2L, 1L, 2L, 1L, 3L), Seq(7L, 7L, 7L))) {
      val expect = vs.sorted.apply((vs.size + 1) / 2 - 1)
      assert(RobustStats.lowerMedian(df(vs), "v") == expect,
        s"median of $vs")
    }
  }

  test("exactKth: k=1 is the min, k=n the max; out-of-range and empty " +
      "inputs throw") {
    val d = df(Seq(30L, 10L, 20L))
    assert(RobustStats.exactKth(d, "v", _ => 1L) == 10L)
    assert(RobustStats.exactKth(d, "v", n => n) == 30L)
    intercept[IllegalArgumentException] {
      RobustStats.exactKth(d, "v", n => n + 1)
    }
    intercept[IllegalArgumentException] {
      RobustStats.exactKth(df(Nil), "v", _ => 1L)
    }
  }

  test("madOutliers: a zero MAD (majority identical) flags any nonzero " +
      "deviation — the single spike is the only outlier") {
    val got = RobustStats.madOutliers(
        df(Seq(10L, 10L, 10L, 10L, 100L)), "id", "v")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toSeq
    assert(got.filter(_._1 == 10L).forall(_._2 == ((0L, false))))
    assert(got.find(_._1 == 100L).get._2 == ((90L, true)))
  }

  test("madOutliers with symmetric spread: dev ≤ 3·MAD is never flagged; " +
      "negative values are fine") {
    val got = RobustStats.madOutliers(df(Seq(-5L, 0L, 5L)), "id", "v")
      .as[(Long, Long, Long, Boolean)].collect()
    // median 0, devs {5,0,5}, MAD 5 -> threshold 15: nothing flagged
    assert(got.forall(!_._4), s"got: ${got.toSeq}")
  }

  test("groupedLowerMedian matches the per-group sorted reference " +
      "(odd/even/tied groups, one pass)") {
    val rows = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L),             // odd -> 2
      ("b", 4L), ("b", 1L), ("b", 3L), ("b", 2L),  // even -> lower = 2
      ("c", 7L), ("c", 7L), ("c", 9L),             // ties -> 7
      ("d", 5L))                                   // single -> 5
    val got = RobustStats.groupedLowerMedian(
        rows.toDF("g", "v"), Seq("g"), "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      val s = vs.map(_._2).sorted
      g -> ((s.size.toLong, s((s.size + 1) / 2 - 1)))
    }
    assert(got == ref)
  }

  test("groupedMadOutliers: each group keeps its own center — the value " +
      "that is an outlier in one group is typical in the other") {
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 11L),
      ("a", 5L, 100L),  // spike within a's tight distribution
      ("b", 6L, 100L), ("b", 7L, 100L), ("b", 8L, 110L)) // 100 is typical
    val got = RobustStats.groupedMadOutliers(
        rows.toDF("g", "id", "v"), Seq("g"), "id", "v")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> r._5).toMap
    // a: med 10, devs {0,0,0,1,90}, MAD 0 -> ids 4 (dev 1) and 5 flagged
    assert(got(5L) && got(4L) && !got(1L) && !got(2L) && !got(3L))
    // b: med 100, devs {0,0,10}, MAD 0 -> only 8 flagged
    assert(got(8L) && !got(6L) && !got(7L))
  }

  test("groupedQuantilesDisc: p10/p50/p90 in one pass match the " +
      "k = ceil(n*q) sorted reference for every group size 1..25") {
    val rows = (1 to 25).flatMap(n =>
      (1 to n).map(v => (s"g$n", (v * 7 % n + 1).toLong)))
    val got = RobustStats.groupedQuantilesDisc(rows.toDF("g", "v"),
        Seq("g"), "v",
        Seq(("p10", 1L, 10L), ("p50", 1L, 2L), ("p90", 9L, 10L)))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val ref = rows.groupBy(_._1).map { case (g, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.size.toLong
      def k(qn: Long, qd: Long) = s(((n * qn + qd - 1) / qd - 1).toInt)
      g -> ((n, k(1, 10), k(1, 2), k(9, 10)))
    }
    assert(got == ref)
  }

  test("rankNormalize: exact at-or-below micro fractions, ties share a " +
      "percentile, groups independent; matches a sorted-seq reference") {
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 7L)
    )
    val got = RobustStats.rankNormalize(rows.toDF("id", "g", "v"),
        "g", "v", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // group a: 10 -> 1/4, 20 -> 3/4 (both tied rows), 30 -> 4/4
    assert(got(1L) == 250000L && got(2L) == 750000L &&
      got(3L) == 750000L && got(4L) == 1000000L)
    assert(got(5L) == 1000000L, "a singleton group maps to 100%")
    // reference: fraction at-or-below for every row
    val ref = rows.map { case (id, g, v) =>
      val vs = rows.filter(_._2 == g).map(_._3)
      id -> vs.count(_ <= v).toLong * 1000000L / vs.size
    }.toMap
    assert(got == ref)
  }
}
