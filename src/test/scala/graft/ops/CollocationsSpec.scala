package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Dice collocations (`TextAnalysis.collocationsTopK`): hand-computed
  * micro-unit scores, the min-count floor, k-truncation, and the
  * bigram-string tie-break.
  */
class CollocationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[String], k: Int = 20, minCount: Long = 2L)
      : Seq[(String, Long, Long, Long, Long)] =
    TextAnalysis.collocationsTopK(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        col("text"), k, minCount)
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("micro-unit dice matches hand computation, ranked desc") {
    val got = run(Seq(
      "new york new york new jersey", // bigrams: ny, yn, ny, yn, nj
      "new york city"))               // ny, yc
    // c(new)=4, c(york)=3; c12(new york)=3 -> 6e6/7; c12(york new)=2 -> 4e6/7
    assert(got == Seq(
      ("new york", 3L, 4L, 3L, 6000000L / 7),
      ("york new", 2L, 3L, 4L, 4000000L / 7)))
  }

  test("pairs under the count floor never appear") {
    val got = run(Seq("new york new york", "rare pair"), minCount = 2L)
    assert(!got.exists(_._1 == "rare pair"))
    assert(got.exists(_._1 == "new york"))
  }

  test("k truncates after the (dice desc, bigram asc) order — equal " +
      "scores keep the lexicographically smaller bigram") {
    // two disjoint pairs with identical counts -> identical dice
    val docs = Seq.fill(3)("aa bb").map(identity) ++ Seq.fill(3)("cc dd")
    val got = run(docs, k = 1)
    assert(got.map(_._1) == Seq("aa bb"), s"got: $got")
  }

  test("a bigram of a repeated token joins the same unigram on both " +
      "sides (c1 == c2)") {
    val got = run(Seq("go go go go"), minCount = 3L)
    // c12(go go)=3, c(go)=4 -> 2*3e6/8
    assert(got == Seq(("go go", 3L, 4L, 4L, 750000L)))
  }
}
