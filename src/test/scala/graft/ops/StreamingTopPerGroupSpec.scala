package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins [[CorpusSelect.streamingTopPerGroup]]'s contract:
  *
  *  1. multi-batch folding equals the batch [[CorpusSelect.topPerGroup]]
  *     over the concatenated input;
  *  2. ARRIVAL-ORDER INVARIANCE — bounded top-n is associative and
  *     commutative, so reversing the batch order produces the identical
  *     final ledger (the property in-order-only streaming ops lack);
  *  3. restart continues the ledger; fresh-checkpoint replay is
  *     idempotent (partition overwrite);
  *  4. retention — at most the committed ledger and its crash-replay
  *     predecessor survive, and a coarser fresh-checkpoint re-drive
  *     sweeps the previous run's higher stale generations.
  */
class StreamingTopPerGroupSpec extends AnyFunSuite with StreamingFixture {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = new org.apache.spark.sql.types.StructType()
    .add("id", "long").add("grp", "string").add("q", "double")

  // scores chosen so each batch alone would pick DIFFERENT winners than
  // the union: the fold must genuinely displace earlier winners
  private val batchA = Seq((1L, "x", 0.3), (2L, "x", 0.2), (3L, "x", 0.1),
    (4L, "y", 0.9))
  private val batchB = Seq((5L, "x", 0.8), (6L, "x", 0.05), (7L, "y", 0.4),
    (8L, "y", 0.5))

  private def writeRows(dir: String, name: String,
      rows: Seq[(Long, String, Double)], mtime: Long): Unit =
    writeBatchFile(dir, name, rows.toDF("id", "grp", "q"), mtime)

  private def runStream(src: String, base: String, ckpt: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    drain(CorpusSelect.streamingTopPerGroup(reader.parquet(s"$src/*"),
      "grp", col("q"), "id", n = 2, s"$base/out", s"$base/$ckpt"))
  }

  private def ledger(base: String): Seq[(String, Long, Double)] = {
    val last = CorpusSelect.winnersBatches(spark, s"$base/out").max
    spark.read.parquet(s"$base/out/winners_batch=$last")
      .select("grp", "id", "score").as[(String, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
  }

  private def batchTop(rows: Seq[(Long, String, Double)])
      : Seq[(String, Long, Double)] =
    CorpusSelect.topPerGroup(rows.toDF("id", "grp", "q"), "grp", col("q"),
        "id", n = 2)
      .select("grp", "id", "score").as[(String, Long, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  test("multi-batch fold equals batch topPerGroup; later batches displace " +
      "earlier winners; history is retained only one generation deep") {
    val src = tmpDir("stg_src"); val base = tmpDir("stg")
    writeRows(src, "b0", batchA, 1000000L)
    writeRows(src, "b1", batchB, 2000000L)
    runStream(src, base, "ckpt", maxFilesPerTrigger = Some(1))
    val got = ledger(base)
    assert(got == batchTop(batchA ++ batchB))
    // doc 5 (arrived second) displaced doc 2 from group x's top-2
    assert(got.map(_._2).contains(5L) && !got.map(_._2).contains(2L))
    // retention: committed ledger + crash-replay predecessor, nothing more
    assert(CorpusSelect.winnersBatches(spark, s"$base/out").sorted == Seq(0L, 1L))
  }

  test("arrival order does not matter: reversed batches give the " +
      "identical ledger") {
    val fwd = tmpDir("stg_f"); val rev = tmpDir("stg_r")
    val srcF = tmpDir("stg_srcf"); val srcR = tmpDir("stg_srcr")
    writeRows(srcF, "b0", batchA, 1000000L)
    writeRows(srcF, "b1", batchB, 2000000L)
    writeRows(srcR, "b0", batchB, 1000000L)
    writeRows(srcR, "b1", batchA, 2000000L)
    runStream(srcF, fwd, "ckpt", maxFilesPerTrigger = Some(1))
    runStream(srcR, rev, "ckpt", maxFilesPerTrigger = Some(1))
    assert(ledger(fwd) == ledger(rev))
  }

  test("restart continues the ledger; fresh-checkpoint replay idempotent; " +
      "a coarser re-drive sweeps stale generations") {
    val src = tmpDir("stg_src2"); val base = tmpDir("stg2")
    writeRows(src, "b0", batchA, 1000000L)
    writeRows(src, "b1", batchB, 2000000L)
    runStream(src, base, "ckpt", maxFilesPerTrigger = Some(1)) // ledgers 0, 1
    val after = ledger(base)
    assert(after == batchTop(batchA ++ batchB))
    // coarser fresh-checkpoint re-drive: one batch 0 — the previous
    // run's winners_batch=1 would otherwise be served by .max forever
    runStream(src, base, "ckpt_replay")
    assert(CorpusSelect.winnersBatches(spark, s"$base/out").max == 0L,
      "stale higher ledger generation survived the coarser re-drive")
    assert(ledger(base) == after, "replay changed the ledger")
  }
}
