package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** N-gram type growth (`TextAnalysis.vocabGrowth`): first-occurrence
  * bucketing, gap deciles, cumulative counts, and sub-n-gram docs.
  */
class VocabGrowthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    TextAnalysis.vocabGrowth(docs.toDF("doc_id", "text"), "doc_id",
        col("text"))
      .orderBy("decile").as[(Long, Long, Long)].collect().toSeq

  test("types bucket by FIRST occurrence; empty deciles are absent and " +
      "the cumulative jumps across them") {
    // ids 0..9 -> decile == fdoc
    val got = run(Seq(
      0L -> "a b c d",  // "a b c", "b c d" new at 0
      5L -> "a b c x",  // "a b c" already seen; "b c x" new at 5
      9L -> "z z z"))   // "z z z" new at 9
    assert(got == Seq((0L, 2L, 2L), (5L, 1L, 3L), (9L, 1L, 4L)))
  }

  test("docs under the n-gram length contribute no types") {
    val got = run(Seq(0L -> "a b", 9L -> "a b c"))
    assert(got == Seq((9L, 1L, 1L)))
  }

  test("a repeated corpus adds nothing after its first appearance " +
      "(the saturating-crawl shape)") {
    val text = "the quick brown fox jumps"
    val got = run((0L to 9L).map(_ -> text))
    assert(got == Seq((0L, 3L, 3L)))
  }

  test("empty / unscorable input yields an empty curve") {
    assert(run(Seq(1L -> "  ")).isEmpty)
  }
}
