package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** WordPiece merge training (`WordPiece`): likelihood-gain selection
  * (where it disagrees with BPE's count argmax), exact pico-unit floor
  * division, tie-breaks, and exhaustion.
  */
class WordPieceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def seg(pairs: (String, Long)*) =
    pairs.toDF("w", "cnt")
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("seg"), col("cnt"))

  test("likelihood gain picks the cohesive rare pair where BPE's count " +
      "argmax would pick the frequent one; training stops when no pairs " +
      "remain") {
    // ab x2, cd x10: counts a=b=2, c=d=10
    //   score(a,b) = 2/(2*2)  = 0.5  -> 500000000000
    //   score(c,d) = 10/(10*10) = 0.1 -> 100000000000
    // BPE would merge (c,d) first (count 10 > 2); WordPiece merges (a,b).
    // Round 2 merges (c,d); round 3 finds no pairs -> 2 merges out.
    val (ms, fin) = WordPiece.train(seg(("ab", 2L), ("cd", 10L)), 3)
    fin.unpersist()
    assert(ms.map(m => (m.round, m.a, m.b, m.pairCount, m.scorePico)) ==
      Seq((1, "a", "b", 2L, 500000000000L), (2, "c", "d", 10L, 100000000000L)))
  }

  test("exact score ties break toward the higher pair count") {
    // ab x4 (4/(4*4) = 0.25) vs cd x1 with extra c,d singletons
    // (1/(2*2) = 0.25): tied score, pair count 4 > 1 -> (a,b)
    val words = seg(("ab", 4L), ("cd", 1L), ("c", 1L), ("d", 1L))
    val (ms, fin) = WordPiece.train(words, 1)
    fin.unpersist()
    assert(ms.head.a == "a" && ms.head.b == "b" && ms.head.pairCount == 4L
      && ms.head.scorePico == 250000000000L)
  }

  test("score is FLOOR division in pico-units") {
    // aab x1, b x1: counts a=2, b=2; pairs (a,a)=1, (a,b)=1
    //   score(a,a) = 1/4 = 0.25; score(a,b) = 1/(2*2) = 0.25
    // tie on score AND count -> lexicographic: (a,a)
    val (ms, fin) = WordPiece.train(seg(("aab", 1L), ("b", 1L)), 1)
    fin.unpersist()
    assert(ms.head.a == "a" && ms.head.b == "a")
    // ab x2, b x1: counts a=2, b=3; score(a,b) = (2*1e12)//6 floor
    val (ms2, fin2) = WordPiece.train(seg(("ab", 2L), ("b", 1L)), 1)
    fin2.unpersist()
    assert(ms2.head.scorePico == 333333333333L)
  }

  test("merged segmentation feeds the next round (counts re-derived " +
      "under the merge)") {
    // abc x3: round 1 symbols a=b=c=3; (a,b) and (b,c) tie everywhere
    //   -> lexicographic (a,b). Round 2: |ab||c| -> pair (ab,c)=3,
    //   counts ab=3, c=3 -> score 3/9
    val (ms, fin) = WordPiece.train(seg(("abc", 3L)), 2)
    fin.unpersist()
    assert(ms.map(m => (m.a, m.b)) == Seq(("a", "b"), ("ab", "c")))
    assert(ms(1).scorePico == 333333333333L)
    val got = fin.select("seg").as[String].collect().toSeq
    assert(got == Seq("|abc|"))
  }
}
