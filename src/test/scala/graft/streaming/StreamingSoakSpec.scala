package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession
import graft.dbc.DbcParser

/** End-to-end streaming soak with fault injection (VERDICT r18 item 7):
  * the full production composition — candump file source → decode →
  * keyless [[CanStream.exactStream]] on RocksDB state →
  * [[CanStream.partitionedParquetSink]] — driven over many micro-batches
  * with a HARD mid-run kill (`stop()` while batches are still draining,
  * not a clean between-drain stop) and TWO offline compactions
  * interleaved between drains. The assertion is exact end-to-end row
  * conservation: the final compacted output equals one uninterrupted run
  * over the same frames, row for row.
  *
  * What this adds over the existing isolation specs: RecoverySpec proves
  * checkpoint restart on a clean drain boundary, CompactionSpec proves
  * fold convergence on hand-staged states — this proves the composition
  * (kill at an arbitrary point, replay-by-overwrite into out_batch
  * partitions, fold, more data, fold again) conserves rows as a system.
  */
class StreamingSoakSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val net = DbcParser.parseFile("fixtures/mini.dbc")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Writes a log file with an EXPLICIT modification time: the file
    * stream source orders files by mtime, and files written within the
    * same millisecond arrive in undefined order — which would feed the
    * keyless exact fold out-of-order input it does not claim to handle
    * (a capture pipeline's log files arrive in time order).
    */
  private def writeLog(dir: String, name: String, lines: Seq[String],
      mtimeMs: Long): Unit = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath,
      lines.mkString("\n").getBytes("UTF-8")): Unit
    assert(f.setLastModified(mtimeMs))
  }

  private def engineLine(tsUs: Long, rawSpeed: Int): String = {
    val hex = f"${rawSpeed & 0xFF}%02X${(rawSpeed >> 8) & 0xFF}%02X0000"
    f"(${tsUs / 1000000}%d.${tsUs % 1000000}%06d) vcan0 100#$hex"
  }

  /** 600 frames, 5 ms apart, cacheMs=12 ⇒ ~200 closed buckets; 8 files
    * of 75 so maxFilesPerTrigger=1 yields 8 micro-batches per full drain.
    */
  private val allLines = (0 until 600).map(i => engineLine(i * 5000L, 100 + i))
  private val files = allLines.grouped(75).toSeq

  private def pipeline(logDir: String): DataFrame =
    CanStream.exactStream(
      CanStream.decoded(net,
        CanStream.framesFromTextFiles(spark, logDir, maxFilesPerTrigger = Some(1)))
        .drop("ts"),
      cacheMs = 12.0)

  private def rowsOf(path: String): Seq[Seq[Any]] =
    spark.read.parquet(path).drop("out_batch").collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)

  test("soak: kill mid-drain + two compactions conserve rows exactly " +
      "(exactStream → partitioned sink, RocksDB)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    CanStream.StateBackend.configure(spark, CanStream.StateBackend.RocksDB)
    try {
      // reference: one uninterrupted run over all 8 files
      val refLog = tmp("soak_ref_log"); val refOut = tmp("soak_ref_out")
      val t0 = System.currentTimeMillis() - 3600000
      files.zipWithIndex.foreach { case (ls, i) =>
        writeLog(refLog, f"f$i%02d.log", ls, t0 + i * 1000)
      }
      val refQ = CanStream.partitionedParquetSink(pipeline(refLog),
        refOut, tmp("soak_ref_ck"))
      try assert(refQ.awaitTermination(180000)) finally refQ.stop()
      val ref = rowsOf(refOut)
      assert(ref.size > 100, s"reference run too small: ${ref.size} rows")

      // system under test, phase 1: files 0..3 arrive, HARD KILL the
      // query as soon as at least one batch partition is visible —
      // batches still queued (and possibly one in flight) die with it
      val log = tmp("soak_log"); val out = tmp("soak_out"); val ck = tmp("soak_ck")
      files.take(4).zipWithIndex.foreach { case (ls, i) =>
        writeLog(log, f"f$i%02d.log", ls, t0 + i * 1000)
      }
      val q1 = CanStream.partitionedParquetSink(pipeline(log), out, ck)
      val deadline = System.nanoTime() + 120e9.toLong
      while (!new java.io.File(out).exists() ||
          new java.io.File(out).listFiles() == null ||
          !new java.io.File(out).listFiles().exists(f =>
            f.getName.startsWith("out_batch=") &&
              new java.io.File(f, "_SUCCESS").exists())) {
        assert(System.nanoTime() < deadline, "no batch landed before kill window")
        Thread.sleep(50)
      }
      q1.stop() // kill: not a drain boundary — whatever is in flight dies

      // restart from the same checkpoint: the killed/unprocessed batches
      // replay into their OWN out_batch partitions by overwrite
      val q2 = CanStream.partitionedParquetSink(pipeline(log), out, ck)
      try assert(q2.awaitTermination(180000)) finally q2.stop()

      // compaction #1 (run-while-stopped contract): fold finalized batches
      val beforeFold = rowsOf(out)
      CanStream.compactParquetSink(spark, out)
      assert(rowsOf(out) == beforeFold, "compaction #1 changed the data")

      // phase 2: the remaining files arrive, same checkpoint drains them
      files.drop(4).zipWithIndex.foreach { case (ls, i) =>
        writeLog(log, f"f${i + 4}%02d.log", ls, t0 + (i + 4) * 1000)
      }
      val q3 = CanStream.partitionedParquetSink(pipeline(log), out, ck)
      try assert(q3.awaitTermination(180000)) finally q3.stop()

      // compaction #2 folds the previous base AND the new finalized batches
      val beforeFold2 = rowsOf(out)
      CanStream.compactParquetSink(spark, out)
      assert(rowsOf(out) == beforeFold2, "compaction #2 changed the data")
      val parts = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("out_batch="))
        .map(_.getName).sorted
      assert(parts.count(_.stripPrefix("out_batch=").toLong < 0) == 1,
        s"expected exactly one compacted base, got: ${parts.mkString(", ")}")

      // the whole soak — kill, replay, two folds — conserved every row
      val got = rowsOf(out)
      assert(got.size == ref.size,
        s"row conservation broken: ${got.size} vs reference ${ref.size}")
      assert(got == ref, "soak output differs from the uninterrupted run")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
