package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Batch incremental dedup against a persisted claim store
  * (`Dedup.buildClaimStore` + `Dedup.dedupAgainstStore`): equivalence
  * with the one-shot greedy step on an in-order corpus split, snapshot
  * chaining through the store, store interop with the streaming writer's
  * layout, and the no-store bootstrap case.
  */
class DedupAgainstStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ≥3 tokens so every doc shingles; identical text ⇒ identical
  // signature ⇒ all bands collide (deterministic, no probabilistic LSH)
  private val prior = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "one two three four five six")
  private val snapshot = Seq(
    10L -> "alpha beta gamma delta epsilon", // dup of stored doc 1
    11L -> "eleven twelve thirteen fourteen",
    12L -> "eleven twelve thirteen fourteen", // in-snapshot dup of 11
    13L -> "tiny doc")                        // <3 tokens: no buckets
  private val snapshot2 = Seq(
    20L -> "eleven twelve thirteen fourteen", // dup of snapshot-1 doc 11
    21L -> "twenty one and some more words")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().toSeq.sorted

  test("store-built-then-dedup equals one-shot greedy over the combined " +
      "corpus when prior ids precede snapshot ids") {
    val store = tmp("das") + "/claims"
    Dedup.buildClaimStore(prior.toDF("doc_id", "text"), "doc_id",
      col("text"), store)
    val surv = Dedup.dedupAgainstStore(snapshot.toDF("doc_id", "text"),
      "doc_id", col("text"), store)
    try {
      val (oneShot, _) = Dedup.greedyNearDupStep(
        (prior ++ snapshot).toDF("doc_id", "text"), "doc_id", col("text"), None)
      val wantSnap = ids(oneShot).filter(_ >= 10L)
      assert(wantSnap == Seq(11L, 13L), s"one-shot sanity: $wantSnap")
      assert(ids(surv) == wantSnap,
        "store path must equal one-shot greedy on the snapshot slice")
    } finally surv.unpersist()
  }

  test("snapshots chain: run N sees the claims of runs 0..N-1; each run " +
      "appends exactly one claim_batch partition") {
    val store = tmp("das") + "/claims"
    Dedup.buildClaimStore(prior.toDF("doc_id", "text"), "doc_id",
      col("text"), store)
    val s1 = Dedup.dedupAgainstStore(snapshot.toDF("doc_id", "text"),
      "doc_id", col("text"), store)
    try assert(ids(s1) == Seq(11L, 13L)) finally s1.unpersist()
    val s2 = Dedup.dedupAgainstStore(snapshot2.toDF("doc_id", "text"),
      "doc_id", col("text"), store)
    // doc 20 is blocked by snapshot-1's doc-11 claims, which live only
    // in the STORE — proof the chain flows through it
    try assert(ids(s2) == Seq(21L)) finally s2.unpersist()
    val batches = spark.read.option("basePath", store).parquet(store)
      .select("claim_batch").distinct().as[Long].collect().toSeq.sorted
    assert(batches == Seq(0L, 1L, 2L), s"claim_batch layout: $batches")
    // per-batch claim sets stay disjoint (newClaims excludes stored)
    val all = spark.read.option("basePath", store).parquet(store)
    assert(all.select("band", "bkey").count() ==
      all.select("band", "bkey").distinct().count())
  }

  test("no store yet: dedupAgainstStore bootstraps — plain greedy over " +
      "the snapshot, claims land under claim_batch=0") {
    val store = tmp("das") + "/claims"
    val surv = Dedup.dedupAgainstStore(snapshot.toDF("doc_id", "text"),
      "doc_id", col("text"), store)
    try assert(ids(surv) == Seq(10L, 11L, 13L)) finally surv.unpersist()
    val batches = spark.read.option("basePath", store).parquet(store)
      .select("claim_batch").distinct().as[Long].collect().toSeq
    assert(batches == Seq(0L))
  }

  test("a store written by the STREAMING path blocks a later batch " +
      "snapshot (one layout, two writers)") {
    val base = tmp("das")
    val src = tmp("das_src")
    prior.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b0")
    val q = Dedup.streamingNearDup(
      spark.readStream.schema(
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string")).parquet(s"$src/*"),
      "doc_id", col("text"), s"$base/claims", s"$base/out", s"$base/ckpt")
    try assert(q.awaitTermination(120000), "stream did not drain")
    finally q.stop()
    val surv = Dedup.dedupAgainstStore(snapshot.toDF("doc_id", "text"),
      "doc_id", col("text"), s"$base/claims")
    try assert(ids(surv) == Seq(11L, 13L),
      "doc 10 must be blocked by the stream-written claims")
    finally surv.unpersist()
  }
}
