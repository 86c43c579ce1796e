package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Stupid Backoff trigram scoring (`TextAnalysis.stupidBackoffScore`):
  * hand-computed tiers — seen trigram, bigram backoff (×2/5), unigram
  * backoff (×4/25), and the unseen-w3 zero — in exact micro-units.
  *
  * Train: "a b c a b c", "a b d" → unigrams a:3 b:3 c:2 d:1 (N=9);
  * bigrams "a b":3 "b c":2 "c a":1 "b d":1; trigrams "a b c":2
  * "b c a":1 "c a b":1 "a b d":1.
  */
class StupidBackoffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val train = Seq((1L, "a b c a b c"), (2L, "a b d"))
  private def run(test: Seq[(Long, String)]) =
    TextAnalysis.stupidBackoffScore(train.toDF("doc_id", "text"),
        test.toDF("doc_id", "text"), "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq

  test("seen trigram scores c3/c12; an unseen w3 scores zero") {
    // "a b c": (2·1e6) div 3 = 666666; "b c x": x unseen everywhere → 0
    assert(run(Seq(10L -> "a b c x")) ==
      Seq((10L, 2L, 666666L, 333333.0)))
  }

  test("all four tiers in one doc: tri, oov, unigram (4/25), bigram (2/5)") {
    // "b c a q b d":
    //   "b c a" tri: (1·1e6) div c("b c")=2      = 500000
    //   "c a q" w3=q unseen                       = 0
    //   "a q b" uni: (c(b)=3 ·4·1e6) div (9·25)   = 53333
    //   "q b d" bi:  (c("b d")=1 ·2·1e6) div (c(b)=3 ·5) = 133333
    assert(run(Seq(15L -> "b c a q b d")) ==
      Seq((15L, 4L, 686666L, 171666.5)))
  }

  test("test docs with fewer than 3 tokens drop; blank docs drop") {
    assert(run(Seq(20L -> "a b", 21L -> "  ")).isEmpty)
  }
}
