package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkTestSession

/** Streaming greedy near-dedup (banded minhash, claim store): batch
  * equivalence on an in-order replay, cross-batch blocking through the
  * persisted claims, restart continuation from the same checkpoint/store,
  * and the within-batch determinism the per-bucket-min semantics promise.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docSchema = new StructType().add("doc_id", "long").add("text", "string")

  // ≥3 tokens so every doc shingles; identical text ⇒ identical signature
  // ⇒ all bands collide (deterministic — no probabilistic banding in play)
  private val corpusA = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "alpha beta gamma delta epsilon", // exact near-dup of 1
    3L -> "one two three four five six",
    4L -> "tiny doc") // < 3 tokens: no shingles, always survives
  private val corpusB = Seq(
    5L -> "one two three four five six", // dup of 3 ACROSS batches
    6L -> "seven eight nine ten eleven")

  private def writeDocs(dir: String, name: String, docs: Seq[(Long, String)],
      mtime: Long): Unit = {
    val p = s"$dir/$name"
    docs.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(p)
    // file-source ordering is by modification time: pin it per batch
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach { f =>
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def runStream(src: String, base: String, maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val q = Dedup.streamingNearDup(reader.parquet(s"$src/*"), "doc_id", col("text"),
      s"$base/claims", s"$base/out", s"$base/ckpt")
    try assert(q.awaitTermination(120000), "stream did not drain") finally q.stop()
  }

  private def survivors(base: String): Seq[Long] =
    spark.read.parquet(s"$base/out").select("doc_id").as[Long].collect().toSeq.sorted

  test("in-order multi-batch replay equals one-shot batch greedy") {
    val src = tmp("snd_src"); val base = tmp("snd")
    writeDocs(src, "b0", corpusA, 1000000L)
    writeDocs(src, "b1", corpusB, 2000000L)
    runStream(src, base, maxFilesPerTrigger = Some(1))
    val all = (corpusA ++ corpusB).toDF("doc_id", "text")
    val (oneShot, _) = Dedup.greedyNearDupStep(all, "doc_id", col("text"), None)
    val want = oneShot.select("doc_id").as[Long].collect().toSeq.sorted
    assert(want == Seq(1L, 3L, 4L, 6L), s"one-shot sanity: $want")
    assert(survivors(base) == want, "streamed vs one-shot divergence")
  }

  test("claims persist across restarts: later batch blocked by stored buckets") {
    val src = tmp("snd_src"); val base = tmp("snd")
    writeDocs(src, "b0", corpusA, 1000000L)
    runStream(src, base)
    assert(survivors(base) == Seq(1L, 3L, 4L))
    // new file arrives; a NEW query continues from checkpoint + store
    writeDocs(src, "b1", corpusB, 2000000L)
    runStream(src, base)
    assert(survivors(base) == Seq(1L, 3L, 4L, 6L),
      "doc 5 must be blocked by batch-0's stored claim for doc 3's buckets")
    // the store kept exactly one claim set per batch (idempotent layout)
    val batches = spark.read.option("basePath", s"$base/claims")
      .parquet(s"$base/claims").select("claim_batch").distinct()
      .as[Long].collect().toSeq.sorted
    assert(batches.size == batches.distinct.size && batches.nonEmpty)
  }

  test("within-batch winner is id-min regardless of input row order") {
    val shuffled = (corpusA.reverse ++ corpusB).toDF("doc_id", "text")
      .repartition(7)
    val (surv, claims) = Dedup.greedyNearDupStep(shuffled, "doc_id", col("text"), None)
    assert(surv.select("doc_id").as[Long].collect().toSeq.sorted == Seq(1L, 3L, 4L, 6L))
    // claims are distinct buckets (store stays duplicate-free)
    val c = claims.collect()
    assert(c.length == claims.distinct().count().toInt)
  }

  test("compaction folds the store into one negative base; blocking survives") {
    val src = tmp("snd_src"); val base = tmp("snd")
    writeDocs(src, "b0", corpusA, 1000000L)
    writeDocs(src, "b1", corpusB, 2000000L)
    // a third batch so compaction has ≥2 FINALIZED batches to fold (the
    // latest batch is deliberately never folded — replay safety)
    writeDocs(src, "b2",
      Seq(9L -> "sixteen seventeen eighteen nineteen twenty"), 2500000L)
    runStream(src, base, maxFilesPerTrigger = Some(1)) // ≥3 claim batches
    val before = spark.read.option("basePath", s"$base/claims")
      .parquet(s"$base/claims").select("band", "bkey").distinct().count()
    val maxLive = spark.read.option("basePath", s"$base/claims")
      .parquet(s"$base/claims").select("claim_batch").distinct()
      .as[Long].collect().max
    Dedup.compactClaims(spark, s"$base/claims")
    val after = spark.read.option("basePath", s"$base/claims")
      .parquet(s"$base/claims")
    // the HIGHEST live batch stays under its own id: it is the only batch
    // a checkpoint replay can re-run, and a replayed batch must not see
    // its own claims as prior (claim_batch < batchId would include a
    // folded base) — everything below it folds into the negative base
    val afterIds = after.select("claim_batch").distinct().as[Long].collect().toSeq
    assert(afterIds.count(_ >= 0) == 1 && afterIds.contains(maxLive),
      s"latest batch partition must survive compaction, got $afterIds")
    assert(afterIds.forall(id => id < 0 || id == maxLive),
      s"all finalized batches must fold into the base, got $afterIds")
    // raw count, not distinct: per-batch claim sets are disjoint by
    // construction (newClaims excludes stored buckets), so folding must
    // neither drop claims NOR duplicate any into the surviving partition
    assert(after.select("band", "bkey").count() == before,
      "compaction must keep exactly the distinct claim set, no duplication")
    // a post-compaction batch is still blocked by the compacted base
    writeDocs(src, "b3", Seq(
      7L -> "alpha beta gamma delta epsilon", // dup of compacted doc 1
      8L -> "twelve thirteen fourteen fifteen"), 3000000L)
    runStream(src, base)
    assert(survivors(base) == Seq(1L, 3L, 4L, 6L, 8L, 9L),
      "doc 7 must be blocked by the compacted claims")
  }

  test("prior claims block, and newClaims excludes already-stored buckets") {
    val first = corpusA.toDF("doc_id", "text")
    val (_, claims1) = Dedup.greedyNearDupStep(first, "doc_id", col("text"), None)
    val second = corpusB.toDF("doc_id", "text")
    val (surv2, claims2) =
      Dedup.greedyNearDupStep(second, "doc_id", col("text"), Some(claims1))
    assert(surv2.select("doc_id").as[Long].collect().toSeq.sorted == Seq(6L))
    // doc 5's buckets are already stored; only doc 6's are new
    assert(claims2.join(claims1, Seq("band", "bkey"), "left_semi").count() == 0)
  }
}
