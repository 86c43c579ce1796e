package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins [[Dedup.streamingSegmentDedup]]'s contract:
  *
  *  1. a single pass equals the batch [[Dedup.segmentDedup]] rewrite;
  *  2. in-order multi-batch processing ALSO equals the one-shot batch
  *     rewrite (a hash's first batch holds its global (doc, pos) min);
  *  3. claims persist across restarts — a later run's duplicates of
  *     already-claimed segments are dropped;
  *  4. replaying a batch against an existing store/output is idempotent
  *     (partition overwrite, no duplicated rows).
  */
class StreamingSegmentDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docSchema = new org.apache.spark.sql.types.StructType()
    .add("doc_id", "long").add("text", "string")

  // seg size 3 inside the operator default is 10 — use texts long enough
  // that the default segmentation still produces multiple segments
  private val tenA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"   // one full segment
  private val tenB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
  private val corpusA = Seq(
    1L -> s"$tenA $tenB",   // two segments, both first here
    2L -> s"$tenA x y z")   // repeats doc 1's first segment + a tail
  private val corpusB = Seq(
    3L -> s"$tenB c1 c2",   // repeats doc 1's second segment ACROSS batches
    4L -> "fresh unique words only here")

  private def writeDocs(dir: String, name: String, docs: Seq[(Long, String)],
      mtime: Long): Unit = {
    val p = s"$dir/$name"
    docs.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(p)
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach { f =>
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def runStream(src: String, base: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val q = Dedup.streamingSegmentDedup(reader.parquet(s"$src/*"),
      "doc_id", "text", s"$base/claims", s"$base/out", s"$base/ckpt")
    try assert(q.awaitTermination(120000), "stream did not drain") finally q.stop()
  }

  private def outRows(base: String): Seq[(Long, String, Long, Long)] =
    spark.read.parquet(s"$base/out")
      .select("doc_id", "clean_text", "n_kept", "n_total")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)

  private def batchRows(docs: Seq[(Long, String)]): Seq[(Long, String, Long, Long)] = {
    val r = Dedup.segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
    try r.as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    finally { r.unpersist(); () }
  }

  test("in-order multi-batch processing equals the one-shot batch rewrite") {
    val src = tmp("ssd_src"); val base = tmp("ssd")
    writeDocs(src, "b0", corpusA, 1000000L)
    writeDocs(src, "b1", corpusB, 2000000L)
    runStream(src, base, maxFilesPerTrigger = Some(1))
    assert(outRows(base) == batchRows(corpusA ++ corpusB))
    // the cross-batch repeat was really claimed away: doc 3 lost tenB
    val d3 = outRows(base).find(_._1 == 3L).get
    assert(d3._2 == "c1 c2" && d3._3 == 1L && d3._4 == 2L)
  }

  test("claims persist across restarts: a later run is blocked by the store") {
    val src = tmp("ssd_src1"); val base = tmp("ssd2")
    writeDocs(src, "b0", corpusA, 1000000L)
    runStream(src, base)
    // new file arrives; a NEW query continues from checkpoint + store —
    // doc 9 repeats doc 1's first segment and must lose it to the claim
    writeDocs(src, "b1", Seq(9L -> s"$tenA q1 q2"), 3000000L)
    runStream(src, base)
    val d9 = outRows(base).find(_._1 == 9L).get
    assert(d9._2 == "q1 q2" && d9._3 == 1L && d9._4 == 2L,
      s"stored claim did not block the repeat: $d9")
  }

  test("replay with a fresh checkpoint is idempotent: no duplicated rows, " +
      "same result") {
    val src = tmp("ssd_src3"); val base = tmp("ssd3")
    writeDocs(src, "b0", corpusA, 1000000L)
    runStream(src, base)
    val first = outRows(base)
    // crash-and-replay model: same input reprocessed from scratch (fresh
    // checkpoint, existing store + output) must overwrite, not append —
    // and the already-stored claims must not make the replayed docs lose
    // their own segments (batch 0 sees only claims from batches < 0)
    val reader = spark.readStream.schema(docSchema)
    val q = Dedup.streamingSegmentDedup(reader.parquet(s"$src/*"),
      "doc_id", "text", s"$base/claims", s"$base/out", s"$base/ckpt_replay")
    try assert(q.awaitTermination(120000)) finally q.stop()
    assert(outRows(base) == first, "replay changed or duplicated the output")
  }
}
