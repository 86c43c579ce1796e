package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins [[CorpusSelect.streamingShardAssign]]'s contract:
  *
  *  1. in-order multi-batch processing equals the batch
  *     [[CorpusSelect.shardAssign]] over the concatenated input —
  *     the carry ledger makes shard ids GLOBAL across batches;
  *  2. a later run continues the sequence from the stored total
  *     (restart with new data does not restart shard numbering);
  *  3. replaying from a fresh checkpoint against the existing
  *     output/state is idempotent — including when the re-drive batches
  *     the source MORE COARSELY, which must sweep the previous run's
  *     higher out_batch/state partitions instead of double-counting.
  */
class StreamingShardAssignSpec extends AnyFunSuite with StreamingFixture {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("id", "long").add("w", "long")

  // weights sized so shard boundaries STRADDLE the batch boundary:
  // budget 10, batch A ends mid-shard (total 17 → shard 1 open), so
  // batch B's first row must land in shard 1, not restart at 0
  private val batchA = Seq((1L, 4L), (2L, 6L), (3L, 7L))
  private val batchB = Seq((4L, 5L), (5L, 9L), (6L, 2L))

  private def writeRows(dir: String, name: String, rows: Seq[(Long, Long)],
      mtime: Long): Unit =
    writeBatchFile(dir, name, rows.toDF("id", "w"), mtime)

  private def runStream(src: String, base: String, ckpt: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    drain(CorpusSelect.streamingShardAssign(reader.parquet(s"$src/*"),
      "w", 10L, Seq(col("id").asc), s"$base/out", s"$base/$ckpt"))
  }

  private def outShards(base: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(s"$base/out")
      .select("id", "w", "shard").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)

  private def batchShards(rows: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val r = CorpusSelect.shardAssign(rows.toDF("id", "w"), "w", 10L,
      Seq(col("id").asc))
    try r.select("id", "w", "shard").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    finally { r.unpersist(); () }
  }

  test("in-order multi-batch equals batch shardAssign; shard ids are " +
      "global across the batch boundary") {
    val src = tmpDir("ssa_src"); val base = tmpDir("ssa")
    writeRows(src, "b0", batchA, 1000000L)
    writeRows(src, "b1", batchB, 2000000L)
    runStream(src, base, "ckpt", maxFilesPerTrigger = Some(1))
    val got = outShards(base)
    assert(got == batchShards(batchA ++ batchB))
    // the straddle really happened: batch B's first row continued the
    // open shard (preceding cum 17 → shard 1), not shard 0
    assert(got.find(_._1 == 4L).get._3 == 1L)
    // and the state ledger is invisible to plain readers of the out dir
    assert(!spark.read.parquet(s"$base/out").columns.contains("total_after"))
  }

  test("a later run continues the stored sequence instead of restarting " +
      "at zero") {
    val src = tmpDir("ssa_src2"); val base = tmpDir("ssa2")
    writeRows(src, "b0", batchA, 1000000L)
    runStream(src, base, "ckpt")
    writeRows(src, "b1", batchB, 3000000L)
    runStream(src, base, "ckpt")
    assert(outShards(base) == batchShards(batchA ++ batchB))
  }

  test("fresh-checkpoint replay is idempotent: overwrite, not append") {
    val src = tmpDir("ssa_src3"); val base = tmpDir("ssa3")
    writeRows(src, "b0", batchA, 1000000L)
    runStream(src, base, "ckpt")
    val first = outShards(base)
    runStream(src, base, "ckpt_replay")
    assert(outShards(base) == first, "replay changed or duplicated output")
  }

  test("fresh-checkpoint re-drive with COARSER batching sweeps the " +
      "previous run's higher partitions — no double-counted rows") {
    val src = tmpDir("ssa_src4"); val base = tmpDir("ssa4")
    writeRows(src, "b0", batchA, 1000000L)
    writeRows(src, "b1", batchB, 2000000L)
    // first run: two batches → out_batch=0 and out_batch=1
    runStream(src, base, "ckpt", maxFilesPerTrigger = Some(1))
    // re-drive from scratch: BOTH files land in batch 0; without the
    // stale sweep, out_batch=1 would still hold batch B's rows and the
    // plain read would return them twice with conflicting shard ids
    runStream(src, base, "ckpt2")
    assert(outShards(base) == batchShards(batchA ++ batchB),
      "stale out_batch partitions survived the coarser re-drive")
  }
}
