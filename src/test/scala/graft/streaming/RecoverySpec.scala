package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession
import graft.dbc.DbcParser

/** Checkpoint-restart recovery: the exactly-once property every §2.9
  * stateful operator silently relies on, asserted end-to-end for both
  * state backends. A query is run to completion on a first batch of
  * files, STOPPED, new files (including a mid-open-bucket continuation
  * and cross-restart duplicates) arrive, and an identical query restarts
  * from the same checkpoint. The restarted run must produce exactly what
  * one uninterrupted run over all files produces: no reprocessed (= no
  * duplicate) rows from before the stop, no lost rows, and keyed state —
  * the open bucket, the seen-signature set — recovered, not reset.
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val net = DbcParser.parseFile("fixtures/mini.dbc")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeLog(dir: String, name: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
      lines.mkString("\n").getBytes("UTF-8")): Unit

  /** candump line for ENGINE (id 0x100): u16 speed at raw*0.25 rpm. */
  private def engineLine(tsUs: Long, rawSpeed: Int): String = {
    val hex = f"${rawSpeed & 0xFF}%02X${(rawSpeed >> 8) & 0xFF}%02X0000"
    f"(${tsUs / 1000000}%d.${tsUs % 1000000}%06d) vcan0 100#$hex"
  }

  private def withBackend(backend: CanStream.StateBackend)(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    CanStream.StateBackend.configure(spark, backend)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Runs `mk(logDir)`'s stream to a parquet sink until no input remains. */
  private def drain(mk: String => DataFrame, logDir: String, out: String,
      ckpt: String): Unit = {
    val q = mk(logDir).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
  }

  /** 30 frames, 5 ms apart, cacheMs=12 ⇒ buckets of 3; the stop lands
    * mid-bucket (file boundary at frame 10, bucket boundary every 3).
    */
  private val allLines = (0 until 30).map(i => engineLine(i * 5000L, 100 + i))

  private def exactPipeline(logDir: String): DataFrame =
    CanStream.exactStream(
      CanStream.decoded(net, CanStream.framesFromTextFiles(spark, logDir)).drop("ts"),
      cacheMs = 12.0)

  for (backend <- Seq(CanStream.StateBackend.InHeap, CanStream.StateBackend.RocksDB))
    test(s"exactStream restart from checkpoint loses nothing, duplicates " +
        s"nothing, and keeps the open bucket ($backend)") {
      withBackend(backend) {
        // reference: one uninterrupted run over all the data
        val refLog = tmp("rec_ref_log"); val refOut = tmp("rec_ref_out")
        writeLog(refLog, "all.log", allLines)
        drain(exactPipeline, refLog, refOut, tmp("rec_ref_ck"))

        // system under test: run files 1, stop, add file 2 (mid-bucket
        // continuation), restart from the SAME checkpoint
        val log = tmp("rec_log"); val out = tmp("rec_out"); val ck = tmp("rec_ck")
        writeLog(log, "part0.log", allLines.take(10))
        drain(exactPipeline, log, out, ck)
        writeLog(log, "part1.log", allLines.drop(10))
        drain(exactPipeline, log, out, ck)

        val ref = spark.read.parquet(refOut).collect().map(_.toSeq).sortBy(_.toString)
        val got = spark.read.parquet(out).collect().map(_.toSeq).sortBy(_.toString)
        assert(got.length == ref.length,
          s"restart run emitted ${got.length} rows vs uninterrupted ${ref.length}")
        assert(got.toSeq == ref.toSeq,
          "restarted output differs from the uninterrupted run")
        // and the run produced real buckets spanning the restart boundary
        assert(ref.nonEmpty)
      }
    }

  for (backend <- Seq(CanStream.StateBackend.InHeap, CanStream.StateBackend.RocksDB))
    test(s"frame-level tumbling (chained aggregation) restart recovers BOTH " +
        s"stateful operators' windows ($backend)") {
      withBackend(backend) {
        // sentinel far past the data closes every real window in append
        // mode; its own window never emits (watermark never passes it)
        val sentinel = engineLine(3600L * 1000000L, 1)
        def pipeline(dir: String): DataFrame =
          CanStream.bucketedStreamFromFrames(net,
            CanStream.framesFromTextFiles(spark, dir), cacheMs = 12L)

        // reference: one uninterrupted run
        val refLog = tmp("flr_ref_log"); val refOut = tmp("flr_ref_out")
        writeLog(refLog, "all.log", allLines :+ sentinel)
        drain(pipeline, refLog, refOut, tmp("flr_ref_ck"))

        // SUT: first 10 frames (stop lands mid-window: 5 ms spacing,
        // 12 ms windows), restart from the same checkpoint with the rest
        val log = tmp("flr_log"); val out = tmp("flr_out"); val ck = tmp("flr_ck")
        writeLog(log, "part0.log", allLines.take(10))
        drain(pipeline, log, out, ck)
        writeLog(log, "part1.log", allLines.drop(10) :+ sentinel)
        drain(pipeline, log, out, ck)

        val ref = spark.read.parquet(refOut).collect().map(_.toSeq).sortBy(_.toString)
        val got = spark.read.parquet(out).collect().map(_.toSeq).sortBy(_.toString)
        assert(got.length == ref.length,
          s"restart run emitted ${got.length} rows vs uninterrupted ${ref.length}")
        assert(got.toSeq == ref.toSeq,
          "restarted output differs from the uninterrupted run")

        // and both equal the BATCH frame-level path over the same frames
        val batch = graft.can.Bucketer.tumblingFromFrames(net,
          graft.can.CandumpParser.withTsMs(
            graft.can.CandumpParser.parseLines(allLines.toDF("value")),
            adjust = false), 12.0)
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(got.toSeq == batch.toSeq,
          "streaming restart output differs from batch tumblingFromFrames")
      }
    }

  for (backend <- Seq(CanStream.StateBackend.InHeap, CanStream.StateBackend.RocksDB))
    test(s"streaming dedup state survives restart: cross-restart duplicates " +
        s"still dropped ($backend)") {
      withBackend(backend) {
        val log = tmp("ded_log"); val out = tmp("ded_out"); val ck = tmp("ded_ck")
        def pipeline(dir: String): DataFrame =
          graft.ops.Dedup.streamingExact(
            CanStream.framesFromTextFiles(spark, dir)
              .withColumn("ts", timestamp_micros(col("ts_us"))),
            sigCols = Seq("can_id", "data"), eventTimeCol = "ts",
            watermarkDelay = "10 seconds")

        // batch 1: frames A B A' (A' = same payload as A, later ts)
        val a = engineLine(1000L, 500); val b = engineLine(2000L, 600)
        val aDup = engineLine(3000L, 500)
        writeLog(log, "p0.log", Seq(a, b, aDup))
        drain(pipeline, log, out, ck)
        // batch 2 after restart: duplicates of A and B from BEFORE the
        // restart, plus one genuinely new frame C
        val c = engineLine(4000L, 700)
        writeLog(log, "p1.log", Seq(engineLine(5000L, 500), engineLine(6000L, 600), c))
        drain(pipeline, log, out, ck)

        val got = spark.read.parquet(out).select("can_id", "data").collect()
          .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
        assert(got.length == 3, // A, B, C — every cross-restart dup dropped
          s"expected 3 unique frames, got ${got.length}: restart reset dedup state")
        assert(got.toSet.size == 3)
      }
    }
}
