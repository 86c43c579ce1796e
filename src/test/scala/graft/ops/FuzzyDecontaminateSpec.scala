package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
    (3L, "completely different content about spark engines and scala"),
    (4L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
    (5L, "short text"), // < 3 tokens: no shingles, must be dropped
    (6L, "spark engines and scala are completely different content about"))
    .toDF("doc_id", "text")

  test("map-side minhash signature equals the aggregate form") {
    val viaAgg = Dedup.minhashAgg(
        Dedup.shingleHashes(docs, "doc_id", col("text")), "doc_id")
      .orderBy("doc_id")
    val viaMap = Dedup.withMinhashCols(docs.select(col("doc_id"), col("text")), col("text"))
      .select(viaAgg.columns.map(col): _*)
      .orderBy("doc_id")
    assert(viaMap.collect().toSeq == viaAgg.collect().toSeq)
  }

  test("fuzzy decontamination flags banded train docs above threshold") {
    // doc 1 is eval; docs 2 (near-dup) and 4 (exact dup) are train
    val out = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
        isEval = col("doc_id") === 1L, threshold = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "n_eval_hits").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1).contains(4L), "exact dup must be flagged")
    assert(out.map(_._1).contains(2L), "near dup sharing most shingles must be flagged")
    assert(!out.map(_._1).contains(3L) && !out.map(_._1).contains(6L),
      "unrelated docs must not be flagged")
    val exact = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
        isEval = col("doc_id") === 1L, threshold = 0.5)
      .filter(col("doc_id") === 4L).select("max_jaccard").as[Double].head()
    assert(exact == 1.0, "exact dup has jaccard 1.0")
  }

  test("all joins broadcast; only bounded aggregations hash-shuffle") {
    // the operator contract: train-wide relations never shuffle — every
    // join against them broadcasts its candidate/eval-bounded side; the
    // only hash exchanges are the three candidate-bounded aggregations
    // (pair distinct, common-shingle count, final per-doc rollup)
    val out = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
      isEval = col("doc_id") === 1L)
    // NOTE: counting exchange substrings is unreliable here — the
    // persisted `pairs` subtree reprints its own exchanges at every
    // reuse — so the pin is join-type based: a shuffle join anywhere
    // would mean a train-wide relation was hash-partitioned.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$plan")
    assert(!plan.contains("ShuffledHashJoin"), s"unexpected shuffled hash join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins in plan")
  }

  test("no eval docs yields empty result, not an error") {
    val out = Dedup.fuzzyDecontaminate(docs, "doc_id", col("text"),
      isEval = lit(false))
    assert(out.count() == 0)
  }
}
