package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** TF-IDF keywords (`TextAnalysis.tfidfTopK`): hand-computed micro-unit
  * scores, k-truncation, token tie-break, and blank docs neither scored
  * nor counted in N.
  */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3)
      : Seq[(Long, String, Long, Long)] =
    TextAnalysis.tfidfTopK(docs.toDF("doc_id", "text"), "doc_id",
        col("text"), k)
      .orderBy(col("doc_id"), col("score").desc, col("tok"))
      .as[(Long, String, Long, Long)].collect().toSeq

  private val corpus = Seq(
    1L -> "apple apple banana",
    2L -> "banana cherry",
    3L -> "cherry cherry cherry durian")

  test("micro-unit scores match hand computation: tf · ((N·10⁶) div df)") {
    // N=3; df: apple 1, banana 2, cherry 2, durian 1
    assert(run(corpus) == Seq(
      (1L, "apple", 2L, 6000000L), (1L, "banana", 1L, 1500000L),
      (2L, "banana", 1L, 1500000L), (2L, "cherry", 1L, 1500000L),
      (3L, "cherry", 3L, 4500000L), (3L, "durian", 1L, 3000000L)))
  }

  test("equal scores break ties by token ascending (deterministic top-k)") {
    val got = run(corpus, k = 1)
    // doc 2: banana and cherry tie at 1500000 -> banana wins
    assert(got.filter(_._1 == 2L) == Seq((2L, "banana", 1L, 1500000L)))
  }

  test("k truncates each document independently") {
    val got = run(corpus :+ (4L -> "a b c d e"), k = 2)
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.size <= 2, s"doc $id overflowed k: $rows")
    }
    assert(got.count(_._1 == 4L) == 2)
  }

  test("blank docs are unscored AND excluded from N (idf unchanged)") {
    val withBlank = run(corpus :+ (9L -> "   "))
    assert(withBlank == run(corpus))
  }
}
