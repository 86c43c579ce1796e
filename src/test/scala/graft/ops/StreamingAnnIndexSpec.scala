package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins [[Similarity.streamingLshQuantized]]'s contract:
  *
  *  1. a streamed index (any number of micro-batches) serves
  *     [[Similarity.quantizedTopKPruned]] with EXACTLY the batch
  *     [[Similarity.writeLshQuantized]] layout's result, before AND
  *     after [[Similarity.compactLshIndex]];
  *  2. compaction preserves the `bucket=N` partition dirs (probe pruning
  *     still prunes) and bounds the file count;
  *  3. fresh-checkpoint replay over the same input is idempotent
  *     (out_batch overwrite — no duplicated vectors).
  */
class StreamingAnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dims = 8
  private val embSchema = new org.apache.spark.sql.types.StructType()
    .add("vec_id", "long")
    .add("embedding", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))

  // deterministic clustered corpus: 60 vectors in 3 loose clusters
  private val corpus: Seq[(Long, Seq[Float])] = (0L until 60L).map { i =>
    val c = (i % 3).toInt
    val v = (0 until dims).map { j =>
      val base = if (j % 3 == c) 1.0f else 0.1f
      base + ((i * 31 + j * 7) % 13).toFloat / 100f
    }
    (i, v)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def stage(dir: String, nFiles: Int): Unit =
    corpus.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(embSchema("embedding").dataType))
      .repartition(nFiles).write.mode("overwrite").parquet(dir)

  private def drain(src: String, base: String): Unit = {
    val q = Similarity.streamingLshQuantized(
      spark.readStream.schema(embSchema).option("maxFilesPerTrigger", "1")
        .parquet(src),
      s"$base/idx", s"$base/ckpt")
    try assert(q.awaitTermination(120000), "stream did not drain") finally q.stop()
  }

  private def query(path: String): Seq[(Long, Double)] = {
    val qv = corpus.find(_._1 == 0L).get._2.map(x => math.round(x * 1000).toLong)
    Similarity.quantizedTopKPruned(spark, path, qv, excludeId = 0L, k = 5)
      .as[(Long, Double)].collect().toSeq
  }

  test("streamed (multi-batch) + compacted index equals the batch layout") {
    val src = tmp("sai_src"); val base = tmp("sai"); val bat = tmp("sai_batch")
    stage(src, 4)
    val embDf = corpus.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(embSchema("embedding").dataType))
    Similarity.writeLshQuantized(embDf, s"$bat/idx")
    val expected = query(s"$bat/idx")
    assert(expected.nonEmpty)

    drain(src, base)
    val batches = new java.io.File(s"$base/idx").listFiles()
      .filter(_.getName.startsWith("out_batch=")).map(_.getName).toSeq
    assert(batches.length == 4, s"expected 4 micro-batch partitions: $batches")
    assert(query(s"$base/idx") == expected, "live (uncompacted) index serves")

    Similarity.compactLshIndex(spark, s"$base/idx")
    val after = new java.io.File(s"$base/idx").listFiles()
      .filter(_.getName.startsWith("out_batch=")).map(_.getName).toSeq
    assert(after.length == 2, // compacted base + highest live batch
      s"expected compacted base + newest batch, got $after")
    assert(query(s"$base/idx") == expected, "compacted index serves")
    // bucket dirs survived the fold (the pruning the layout exists for)
    val compacted = after.filter(_.stripPrefix("out_batch=").toLong < 0).head
    val bucketDirs = new java.io.File(s"$base/idx/$compacted").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty, "compacted base must keep bucket=N dirs")
    // probe pruning still engages on the compacted tree
    val qv = corpus.head._2.map(x => math.round(x * 1000).toLong)
    val plan = Similarity.quantizedTopKPruned(spark, s"$base/idx", qv, 0L, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [bucket"),
      s"probe set must prune bucket partitions:\n$plan")
  }

  test("fresh-checkpoint replay over the same input is idempotent") {
    val src = tmp("sai2_src"); val base = tmp("sai2")
    stage(src, 3)
    drain(src, base)
    val first = spark.read.parquet(s"$base/idx").drop("out_batch")
      .orderBy("vec_id").collect().toSeq
    assert(first.length == corpus.length)
    // wipe the checkpoint only: every batch re-lands on its own
    // out_batch partition by overwrite — no duplicates
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$base/ckpt"))
    drain(src, base)
    val second = spark.read.parquet(s"$base/idx").drop("out_batch")
      .orderBy("vec_id").collect().toSeq
    assert(second == first, "replay must overwrite, not append")
  }

  test("resuming with a mismatched numPlanes fails loudly, sidecar intact") {
    // streaming APPENDS to an existing layout, so the sidecar is the
    // authority on how the existing bucket dirs were keyed — a resume
    // with a different numPlanes must fail BEFORE starting (and must not
    // rewrite the sidecar, which would let readers probe wrong buckets)
    val src = tmp("sai3_src"); val base = tmp("sai3")
    stage(src, 2)
    drain(src, base) // writes the default-planes sidecar
    val sidecar = new java.io.File(s"$base/idx/_graft_num_planes")
    assert(sidecar.exists())
    val before = new String(
      java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
    val e = intercept[IllegalArgumentException] {
      Similarity.streamingLshQuantized(
        spark.readStream.schema(embSchema).parquet(src),
        s"$base/idx", s"$base/ckpt2", numPlanes = Similarity.NumPlanes + 2)
    }
    assert(e.getMessage.contains("numPlanes"), e.getMessage)
    val after = new String(
      java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
    assert(after == before, "a refused resume must not rewrite the sidecar")
  }
}
