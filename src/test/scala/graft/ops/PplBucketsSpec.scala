package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Perplexity terciles (`TextAnalysis.perplexityBuckets`): differential
  * against an independent in-test reference (sort the micro scores,
  * take the N/3-th / 2N/3-th smallest as cutoffs, label by comparison),
  * plus the tie, monotone-boundary, and degenerate-input contracts.
  */
class PplBucketsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, String)] =
    TextAnalysis.perplexityBuckets(
        docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  /** Independent cutoff reference over the RESULT's own scores. */
  private def refBuckets(scores: Map[Long, Long]): Map[Long, String] = {
    val sorted = scores.values.toSeq.sorted
    val n = sorted.size
    val c1 = sorted(math.max(n / 3, 1) - 1)
    val c2 = sorted(math.max(2 * n / 3, 1) - 1)
    scores.map { case (id, s) =>
      id -> (if (s <= c1) "tail" else if (s <= c2) "middle" else "head")
    }
  }

  // varied texts: shared bigrams ("x y") are corpus-frequent, so docs
  // repeating them score high; rare-continuation docs score low
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "x y x y x y x y",
    2L -> "x y x y q r",
    3L -> "x y q r s t",
    4L -> "q r s t u v",
    5L -> "u v w a b c",
    6L -> "a b c d e f",
    7L -> "x y x y x y",
    8L -> "d e f g h i",
    9L -> "g h i j k l")

  test("bucket labels match the independent sort-based cutoff reference") {
    val got = run(corpus)
    assert(got.keySet == corpus.map(_._1).toSet)
    val ref = refBuckets(got.map { case (id, (s, _)) => id -> s })
    got.foreach { case (id, (_, b)) =>
      assert(b == ref(id), s"doc $id: got $b, ref ${ref(id)}")
    }
  }

  test("boundaries are monotone: max(tail) < min(middle) <= max(middle) " +
      "< min(head) when all three buckets are non-empty") {
    val got = run(corpus)
    val by = got.values.groupBy(_._2).map { case (b, v) => b -> v.map(_._1) }
    for (t <- by.get("tail"); m <- by.get("middle"))
      assert(t.max < m.min, s"tail/middle overlap: $by")
    for (m <- by.get("middle"); h <- by.get("head"))
      assert(m.max < h.min, s"middle/head overlap: $by")
  }

  test("identical docs tie on score and always share one bucket") {
    val dup = "x y z w v u"
    val got = run(corpus ++ Seq(20L -> dup, 21L -> dup, 22L -> dup))
    val buckets = Seq(20L, 21L, 22L).map(got(_)).distinct
    assert(buckets.size == 1, s"tied docs split: $buckets")
  }

  test("docs with fewer than two tokens are unscored and absent") {
    val got = run(corpus ++ Seq(30L -> "solo", 31L -> "  "))
    assert(!got.contains(30L) && !got.contains(31L))
  }

  test("single scored doc lands in tail (cutoffs collapse to its score)") {
    val got = run(Seq(1L -> "a b"))
    assert(got(1L)._2 == "tail")
  }

  test("empty / unscorable input yields an empty result") {
    assert(run(Seq(1L -> " ")).isEmpty)
  }
}
