package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Exact prefix-filter similarity join (`Dedup.prefixFilterNearDups`):
  * completeness and exactness against a brute-force all-pairs Jaccard
  * over a corpus built to stress the filters — near-identical pairs,
  * just-under-threshold pairs, disjoint-prefix-but-low-similarity
  * pairs, and size-mismatched pairs the length filter must drop
  * WITHOUT dropping true positives.
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size.toDouble

  test("matches brute-force all-pairs word Jaccard >= 3/5 exactly — " +
      "no false negatives (completeness), no false positives") {
    // 40 docs over a 25-token vocabulary with deterministic overlap
    // structure: doc i holds 6 tokens starting at i%20, plus doc pairs
    // (i, i+40) sharing 5 of 6 tokens (J = 5/7 ≥ 3/5)
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 6).map(j => s"w${(i % 20) + j}").mkString(" "))
    }
    val nearDups = (0 until 10).map { i =>
      (100L + i, ((0 until 5).map(j => s"w${(i % 20) + j}") :+ s"z$i")
        .mkString(" "))
    }
    val corpus = base ++ nearDups
    val docs = corpus.toDF("doc_id", "text")
    val want = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      j = jaccard(ta.split(" ").toSet, tb.split(" ").toSet) if j >= 0.6
    } yield (ia, ib, j)).toSet
    assert(want.nonEmpty, "fixture must contain qualifying pairs")
    val got = Dedup.prefixFilterNearDups(docs, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want)
  }

  test("threshold is rational-exact at the boundary: J = 3/5 kept, " +
      "just-below dropped; blank docs ignored") {
    // A={a b c d e f}, B=A-{f}+{g}+{h}... construct J exactly 3/5:
    // |A∩B|=3, |A∪B|=5: A={a,b,c,d}, B={a,b,c,e} → 3/5 ✓
    // and a pair at 3/6 = 0.5 < 3/5 that must be dropped
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"),          // J = 3/5 — boundary keep
      (3L, "p q r s"), (4L, "p q r x y"),        // J = 3/6 — drop
      (5L, "   ")                                 // blank — ignored
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterNearDups(docs, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.6)))
  }

  test("custom threshold 1/2 widens the accepted set consistently " +
      "with brute force") {
    val corpus = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "a b x y"),
      (4L, "m n o p"))
    val docs = corpus.toDF("doc_id", "text")
    val want = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
      j = jaccard(ta.split(" ").toSet, tb.split(" ").toSet) if j >= 0.5
    } yield (ia, ib)).toSet
    val got = Dedup.prefixFilterNearDups(docs, "doc_id", col("text"),
      tNum = 1, tDen = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.contains((1L, 2L)))
  }
}
