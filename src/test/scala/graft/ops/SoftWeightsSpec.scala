package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Soft dedup weights (`Dedup.softWeights`): 1/|component| per doc over
  * a caller-supplied pair graph, singletons at weight 1, and the
  * per-component weight-sum invariant (each cluster counts once in
  * expectation).
  */
class SoftWeightsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(ids: Seq[Long], pairs: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    val df = ids.toDF("doc_id")
    val p = pairs.toDF("doc_a", "doc_b")
    Dedup.softWeights(df, "doc_id", p)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
  }

  test("chain A~B, B~C collapses to one component of size 3; the " +
      "untouched doc keeps (own id, 1, 1.0)") {
    val got = run(Seq(1L, 2L, 3L, 4L), Seq(1L -> 2L, 2L -> 3L))
    assert(got(1L) == ((1L, 3L, 1.0 / 3)))
    assert(got(2L) == ((1L, 3L, 1.0 / 3)))
    assert(got(3L) == ((1L, 3L, 1.0 / 3)))
    assert(got(4L) == ((4L, 1L, 1.0)))
  }

  test("weights within every component sum to exactly one cluster-count") {
    val got = run(1L to 10L,
      Seq(1L -> 2L, 3L -> 4L, 4L -> 5L, 5L -> 6L, 8L -> 9L))
    val byComp = got.values.groupBy(_._1)
    byComp.foreach { case (comp, members) =>
      val sz = members.head._2
      assert(members.size.toLong == sz, s"comp $comp size mismatch")
      assert(math.abs(members.map(_._3).sum - 1.0) < 1e-9,
        s"comp $comp weights don't sum to 1")
    }
    assert(byComp.size == 3 + 2) // {1,2} {3,4,5,6} {8,9} + singletons 7, 10
  }

  test("empty pair graph: every doc is its own component at weight 1") {
    val got = run(Seq(7L, 8L), Nil)
    assert(got == Map(7L -> ((7L, 1L, 1.0)), 8L -> ((8L, 1L, 1.0))))
  }

  test("every input doc appears exactly once and weight · sz == 1 " +
      "(exact-integer quotient)") {
    val got = run(1L to 6L, Seq(1L -> 2L, 2L -> 3L, 5L -> 6L))
    assert(got.keySet == (1L to 6L).toSet)
    got.values.foreach { case (_, sz, w) => assert(w * sz == 1.0) }
  }
}
