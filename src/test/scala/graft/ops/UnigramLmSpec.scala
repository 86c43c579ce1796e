package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Unigram-LM tokenizer training (`UnigramLm`): hand-computed hard-EM
  * rounds, Viterbi product scoring with the shortest-piece tie-break,
  * vocabulary pruning across rounds, and the apply-time unknown floor.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def path(word: String, probs: Map[String, Long],
      unk: Option[Long] = None): String =
    Seq(Tuple1(word)).toDF("w")
      .select(UnigramLm.viterbiPath(col("w"), probs, unkMicro = unk))
      .as[String].head()

  test("two hand-computed EM rounds: seed probs pick 'ab' whole, round 2 " +
      "prunes the unused pieces") {
    // words: ab×4, b×2. seed subs: a=4, b=6, ab=4; total 14
    //   p0: a=285714, b=428571, ab=285714
    // round 1 on "ab": a·b = .285714×.428571 < .285714 = ab -> |ab|
    //   counts: ab=4, b=2; total 6 -> p1: ab=666666, b=333333
    // round 2: same segmentations (a is gone; boundary path survives)
    val words = Seq(("ab", 4L), ("b", 2L)).toDF("w", "cnt")
    val m = UnigramLm.train(words, rounds = 2, vocabSize = 10, maxPiece = 2)
    assert(m.counts == Seq(("ab", 4L), ("b", 2L)))
    assert(m.probs == Map("ab" -> 666666L, "b" -> 333333L))
    assert(m.total == 6L)
  }

  test("Viterbi prefers the higher-probability segmentation and breaks " +
      "exact score ties toward the SHORTER last piece") {
    val tied = Map("a" -> 500000L, "b" -> 500000L, "ab" -> 250000L)
    // a·b = 0.5*0.5 = 0.25 = ab exactly -> k=1 candidate wins the tie
    assert(path("ab", tied) == "|a||b|")
    val whole = Map("a" -> 400000L, "b" -> 400000L, "ab" -> 250000L)
    // a·b = 0.16 < 0.25 -> whole piece wins
    assert(path("ab", whole) == "|ab|")
  }

  test("a word unsegmentable under the vocab yields null without a " +
      "floor and a single-char fallback with one") {
    val m = Map("a" -> 500000L)
    assert(Seq(Tuple1("ax")).toDF("w")
      .select(UnigramLm.viterbiPath(col("w"), m)).head().isNullAt(0))
    assert(path("ax", m, unk = Some(1L)) == "|a||x|")
  }

  test("seedCounts keeps top-N by (count desc, piece asc) plus ALL " +
      "single chars") {
    val words = Seq(("abc", 1L)).toDF("w", "cnt")
    // subs: a,b,c,ab,bc,abc (+abc len 4 none), all count 1; top-2 by
    // piece asc = a, ab; single chars b, c force-included
    val got = UnigramLm.seedCounts(words, maxPiece = 3, vocabSize = 2)
      .orderBy("piece").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 1L), ("ab", 1L), ("b", 1L), ("c", 1L)))
  }

  test("wordTable keeps only alphabetic tokens with multiplicities") {
    val docs = Seq((1L, "aa bb aa x1 --"), (2L, "bb")).toDF("doc_id", "text")
    val got = UnigramLm.wordTable(docs, col("text"))
      .orderBy("w").as[(String, Long)].collect().toSeq
    assert(got == Seq(("aa", 2L), ("bb", 2L)))
  }

  test("pieceCounts weights by word frequency") {
    val words = Seq(("ab", 4L), ("b", 2L)).toDF("w", "cnt")
    val probs = Map("a" -> 100000L, "b" -> 400000L, "ab" -> 500000L)
    val got = UnigramLm.pieceCounts(words, probs)
      .orderBy("piece").as[(String, Long)].collect().toSeq
    // "ab" -> |ab| (0.5 > 0.1*0.4); "b" -> |b|
    assert(got == Seq(("ab", 4L), ("b", 2L)))
  }
}
