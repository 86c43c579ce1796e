package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Containment decontamination (`Dedup.containmentDecontaminate`):
  * the snippet-in-long-doc shape Jaccard misses, the exact threshold
  * boundary under integer cross-multiplication, multi-eval hit counting,
  * and broadcast-guard fallback parity.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // eval doc = a 5-token snippet (3 shingles); train doc 1 embeds it
  // verbatim inside 20 tokens of padding. Containment = 3/3 = 1.0;
  // Jaccard = 3 / (21 + 3 - 3) ≈ 0.14 — far under fuzzyDecontaminate's
  // 0.5 bar. Train doc 2 shares nothing.
  private val pad =
    "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 x1 x2 x3 x4 x5 x6 x7 x8"
  private val docs = Seq(
    (100L, s"$pad quick brown fox jumps high", false),
    (101L, "totally unrelated training text here", false),
    (1L, "quick brown fox jumps high", true))

  private def run(rows: Seq[(Long, String, Boolean)],
      thresholdMicro: Long = 500000L, maxBroadcast: Long = 1000000L) = {
    val df = rows.toDF("doc_id", "text", "is_eval")
    val r = Dedup.containmentDecontaminate(df, "doc_id", col("text"),
      col("is_eval"), thresholdMicro, maxBroadcastEvalDocs = maxBroadcast)
    val got = r.orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    r.unpersist()
    got
  }

  test("a verbatim eval snippet inside a long train doc is caught at " +
      "containment 1.0 (the shape Jaccard maps to ~0.14)") {
    assert(run(docs) == Seq((100L, 1L, 1.0)))
    // confirm the premise: the Jaccard-based operator does NOT flag it
    val jac = Dedup.fuzzyDecontaminate(docs.toDF("doc_id", "text", "is_eval"),
      "doc_id", col("text"), col("is_eval"))
    assert(jac.collect().isEmpty)
    jac.unpersist()
  }

  test("shingle_hits observation counts the inverted-index fan-out " +
      "(train-shingle x eval-doc matches, pre-aggregation)") {
    val obs = org.apache.spark.sql.Observation("containment_hits")
    val df = docs.toDF("doc_id", "text", "is_eval")
    val r = Dedup.containmentDecontaminate(df, "doc_id", col("text"),
      col("is_eval"), hitObs = Some(obs))
    try {
      // containmentAgainst materializes internally, so the observation
      // is already resolved: exactly the 3 embedded snippet shingles
      // match, once each, against the single eval doc
      assert(obs.get("shingle_hits").asInstanceOf[Long] == 3L)
      assert(r.count() == 1)
    } finally { r.unpersist(); () }
  }

  test("threshold is an exact >= boundary via integer cross-" +
      "multiplication") {
    // eval has 4 shingles (6 tokens); train shares exactly 2 -> 1/2
    val rows = Seq(
      (200L, "a b c d padpad other words entirely", false),
      (2L, "a b c d e f", true))
    // shared shingles: "a b c", "b c d" = 2 of 4 -> 500000 micro exactly
    assert(run(rows, thresholdMicro = 500000L) == Seq((200L, 1L, 0.5)))
    assert(run(rows, thresholdMicro = 500001L).isEmpty)
  }

  test("n_eval_hits counts eval docs over the bar; max_containment " +
      "takes the best") {
    val rows = Seq(
      (300L, s"$pad quick brown fox jumps high", false),
      (3L, "quick brown fox jumps high", true),         // containment 1.0
      (4L, "brown fox jumps high and away then gone", true)) // 2/6 shared
    val got = run(rows, thresholdMicro = 300000L)
    assert(got.size == 1)
    val (id, hits, maxC) = got.head
    assert(id == 300L && hits == 2L && maxC == 1.0)
  }

  test("above the broadcast guard the shuffle path returns identical " +
      "results") {
    assert(run(docs, maxBroadcast = 0L) == run(docs))
  }
}
