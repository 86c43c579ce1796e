package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the small-files story of the compactable streaming parquet sink
  * ([[CanStream.partitionedParquetSink]] + [[CanStream.compactParquetSink]]):
  * N micro-batches produce N file sets; compaction folds every finalized
  * batch into one bounded base while (1) the data stays row-identical,
  * (2) the highest live batch partition survives untouched (replay
  * safety), and (3) an interrupted compaction converges on the next run
  * in both crash windows (before and after the base rename).
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def partDirs(path: String): Seq[String] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("out_batch="))
      .map(_.getName).sorted

  private def dataFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("out_batch="))
      .flatMap(_.listFiles().toSeq)
      .filter(f => f.getName.endsWith(".parquet"))

  private def rowsOf(path: String): Seq[(Long, String)] =
    spark.read.parquet(path).select("id", "payload")
      .as[(Long, String)].collect().toSeq.sorted

  test("N micro-batches fold to a bounded base; data identical; highest " +
      "batch survives; repeated compaction keeps folding") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val docs = (0L until 400L).map(i => (i, s"payload_$i"))
    docs.toDF("id", "payload").repartition(8).write.parquet(s"$root/src")

    def drain(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("id", "long").add("payload", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/src")
      CanStream.partitionedParquetSink(stream, s"$root/out", ckpt)
        .awaitTermination()
    }
    drain(s"$root/ckpt")
    val before = rowsOf(s"$root/out")
    assert(before == docs.sorted)
    val nBatches = partDirs(s"$root/out").size
    assert(nBatches > 2, s"expected several micro-batches, got $nBatches")
    val filesBefore = dataFiles(s"$root/out").size

    CanStream.compactParquetSink(spark, s"$root/out")
    val after = partDirs(s"$root/out")
    // one negative base + the highest live batch, nothing else
    assert(after == Seq(s"out_batch=-1", s"out_batch=${nBatches - 1}").sorted,
      s"unexpected partitions after compaction: $after")
    assert(rowsOf(s"$root/out") == before, "compaction changed the data")
    val filesAfter = dataFiles(s"$root/out").size
    assert(filesAfter < filesBefore,
      s"compaction did not reduce file count: $filesBefore -> $filesAfter")

    // more batches arrive (fresh source files, fresh checkpoint reads all
    // again into NEW batch ids is not how checkpoints work — instead
    // append new source files and re-drain the SAME checkpoint)
    (1000L until 1100L).map(i => (i, s"payload_$i")).toDF("id", "payload")
      .repartition(2).write.mode("append").parquet(s"$root/src")
    drain(s"$root/ckpt")
    val allRows = docs ++ (1000L until 1100L).map(i => (i, s"payload_$i"))
    assert(rowsOf(s"$root/out") == allRows.sorted)

    // second compaction folds the old base AND the newly finalized batches
    CanStream.compactParquetSink(spark, s"$root/out")
    val after2 = partDirs(s"$root/out")
    assert(after2.size == 2, s"expected base + highest live, got $after2")
    assert(after2.contains("out_batch=-2"), s"expected new base -2 in $after2")
    assert(rowsOf(s"$root/out") == allRows.sorted,
      "second compaction changed the data")
  }

  test("interrupted compaction converges: crash-before-rename rolls back, " +
      "crash-after-rename completes the deletes") {
    val root = java.nio.file.Files.createTempDirectory("compact_rec").toString
    val out = s"$root/out"
    // two finalized batches + one live
    Seq((1L, "a")).toDF("id", "payload").write.parquet(s"$out/out_batch=0")
    Seq((2L, "b")).toDF("id", "payload").write.parquet(s"$out/out_batch=1")
    Seq((3L, "c")).toDF("id", "payload").write.parquet(s"$out/out_batch=2")
    val expected = Seq((1L, "a"), (2L, "b"), (3L, "c"))

    // CRASH WINDOW 1: temp written, manifest written, rename never ran.
    // Simulate by hand-writing the exact on-disk state.
    Seq((9L, "stale")).toDF("id", "payload").write.parquet(s"$out/_compact_tmp_-1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/_compact_manifest"),
      "-1\nout_batch=0\nout_batch=1".getBytes("UTF-8"))
    CanStream.compactParquetSink(spark, out)
    // rollback happened (stale temp dropped, no stale rows), then the
    // normal fold ran: base -1 from batches 0+1, batch 2 untouched
    assert(rowsOf(out) == expected)
    assert(partDirs(out) == Seq("out_batch=-1", "out_batch=2"))
    assert(!new java.io.File(s"$out/_compact_manifest").exists())

    // CRASH WINDOW 2: base renamed into place, folded partitions not yet
    // deleted (duplicates on disk), manifest still present.
    val root2 = java.nio.file.Files.createTempDirectory("compact_rec2").toString
    val out2 = s"$root2/out"
    Seq((1L, "a")).toDF("id", "payload").write.parquet(s"$out2/out_batch=0")
    Seq((2L, "b")).toDF("id", "payload").write.parquet(s"$out2/out_batch=1")
    Seq((3L, "c")).toDF("id", "payload").write.parquet(s"$out2/out_batch=2")
    // the renamed base already holds the folded rows
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.parquet(s"$out2/out_batch=-1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out2/_compact_manifest"),
      "-1\nout_batch=0\nout_batch=1".getBytes("UTF-8"))
    CanStream.compactParquetSink(spark, out2)
    assert(rowsOf(out2) == expected,
      "roll-forward left duplicates or lost rows")
    assert(!new java.io.File(s"$out2/_compact_manifest").exists())
  }

  test("a FALSE fs.rename aborts loudly BEFORE the fold deletion; the fold " +
      "set survives and recovery converges once the cause clears") {
    // fs.rename reports dest-exists / object-store quirks by RETURNING
    // false, not throwing — the r18-fixed data-loss window was exactly
    // this branch falling through to the fold deletion. Force it with a
    // local filesystem whose data renames return false (the only way to
    // drive the branch: within one compact call the dest id is freshly
    // computed from the listing, so a real collision needs a racing
    // writer or a listing-lagging object store).
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.renamefail.impl", classOf[RenameFailFs].getName)
    val local = java.nio.file.Files.createTempDirectory("compact_rf").toString
    val out = s"renamefail://$local/out"
    RenameFailFs.failDataRenames = false // staging writes rename freely
    try {
      Seq((1L, "a")).toDF("id", "payload").write.parquet(s"$out/out_batch=0")
      Seq((2L, "b")).toDF("id", "payload").write.parquet(s"$out/out_batch=1")
      Seq((3L, "c")).toDF("id", "payload").write.parquet(s"$out/out_batch=2")
      val expected = Seq((1L, "a"), (2L, "b"), (3L, "c"))

      RenameFailFs.failDataRenames = true
      val e = intercept[IllegalArgumentException] {
        CanStream.compactParquetSink(spark, out)
      }
      assert(e.getMessage.contains("aborting before deleting the fold set"),
        e.getMessage)
      // nothing destructive happened: every original partition is intact
      // and row-identical (the staged temp + manifest may linger — that
      // is recovery's job, not the abort's)
      assert(partDirs(s"$local/out") ==
        Seq("out_batch=0", "out_batch=1", "out_batch=2"))
      assert(spark.read.parquet(s"$out/out_batch=0", s"$out/out_batch=1",
          s"$out/out_batch=2").select("id", "payload")
        .as[(Long, String)].collect().toSeq.sorted == expected)

      // cause clears (renames work again): the next run rolls the staged
      // state back and completes a clean fold
      RenameFailFs.failDataRenames = false
      CanStream.compactParquetSink(spark, out)
      assert(partDirs(s"$local/out") == Seq("out_batch=-1", "out_batch=2"))
      assert(rowsOf(s"$local/out") == expected)
      assert(!new java.io.File(s"$local/out/_compact_manifest").exists())
    } finally {
      RenameFailFs.failDataRenames = false
      conf.unset("fs.renamefail.impl")
    }
  }
}

/** A local filesystem whose `out_batch=*` renames return FALSE on demand —
  * the silent failure mode of object-store renames, undrivable through a
  * real local FS (see the rename-false test above). Registered under the
  * `renamefail://` scheme via `fs.renamefail.impl`.
  */
class RenameFailFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("renamefail:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (RenameFailFs.failDataRenames && dst.getName.startsWith("out_batch="))
      false
    else super.rename(src, dst)
}

object RenameFailFs {
  @volatile var failDataRenames = false
}
