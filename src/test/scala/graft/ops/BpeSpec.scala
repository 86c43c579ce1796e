package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed BPE trainer ([[Bpe]]) against hand-computed
  * merges: classic word-frequency behavior, greedy left-to-right apply on
  * overlapping chains (the property the delimited-string `replace`
  * representation must get right), deterministic tie-breaks, and the
  * apply-side [[Bpe.segment]] in merge order.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("merges follow weighted pair counts with deterministic tie-break") {
    // 5x "aab" + 3x "abc": pairs aa=5, ab=5+3=8, bc=3 -> merge 1 = (a,b).
    // After: aab -> |a||ab|, abc -> |ab||c|; pairs a,ab=5; ab,c=3 ->
    // merge 2 = (a,ab) count 5.
    val docs = (Seq.fill(5)("aab") ++ Seq.fill(3)("abc"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, fin) = Bpe.train(Bpe.wordTable(docs, col("text")), 2)
    try {
      assert(merges == Seq(Bpe.Merge(1, "a", "b", 8L), Bpe.Merge(2, "a", "ab", 5L)))
      val segs = fin.orderBy("seg").select("seg", "cnt")
        .as[(String, Long)].collect().toSeq
      assert(segs == Seq(("|aab|", 5L), ("|ab||c|", 3L)))
    } finally fin.unpersist()
  }

  test("overlapping chains merge greedily left-to-right (aaa -> aa,a)") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val (merges, fin) = Bpe.train(Bpe.wordTable(docs, col("text")), 2)
    try {
      // one word "aaa": adjacent (a,a) twice -> count 2; greedy apply
      // consumes the FIRST pair, leaving |aa||a| (never |a||aa|)
      assert(merges.head == Bpe.Merge(1, "a", "a", 2L))
      assert(merges(1) == Bpe.Merge(2, "aa", "a", 1L))
      assert(fin.select("seg").as[String].head() == "|aaa|")
    } finally fin.unpersist()
  }

  test("segment applies the merge table in order; disjoint occurrences " +
      "all merge in one pass") {
    val merges = Seq(Bpe.Merge(1, "a", "b", 0L), Bpe.Merge(2, "ab", "c", 0L))
    val got = spark.range(1)
      .select(Bpe.segment(lit("xababcx"), merges).as("s"))
      .as[String].head()
    // round 1: x ab ab c x (both disjoint ab's merge); round 2: second ab
    // + c -> abc
    assert(got == "|x||ab||abc||x|")
  }

  test("single-symbol words produce no pairs; training past exhaustion " +
      "stops emitting merges") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val (merges, fin) = Bpe.train(Bpe.wordTable(docs, col("text")), 3)
    try assert(merges.isEmpty)
    finally fin.unpersist()
  }
}
