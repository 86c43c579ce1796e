package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession
import graft.dbc.DbcParser

/** Checkpoint state-format versioning for [[CanStream.exactStream]]
  * (VERDICT r19 item 3): the round-18 injective key encoding changed the
  * flatMapGroupsWithState group keys, so a keyed stream restarted from a
  * pre-r18 checkpoint does not FAIL — it silently orphans every
  * open-bucket state entry (buckets that never close or emit). Because
  * the old and new keys are disjoint, no in-state version field can ever
  * detect it (the orphaned entries are simply never read); detection has
  * to be out-of-band, at the checkpoint. [[CanStream
  * .requireExactStateFormat]] stamps `_graft_state_format` into fresh
  * checkpoints and refuses (a) an existing checkpoint with no marker —
  * the synthesized-old-format case — and (b) a marker from a different
  * format version.
  */
class StateFormatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val net = DbcParser.parseFile("fixtures/mini.dbc")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFile(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, content.getBytes("UTF-8")): Unit
  }

  private def marker(ckpt: String): String = s"$ckpt/_graft_state_format"

  test("fresh checkpoint is stamped with the current version; a " +
      "same-version restart passes") {
    val ck = tmp("sf_fresh")
    CanStream.requireExactStateFormat(spark, ck)
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(marker(ck))), "UTF-8").trim
    assert(written == CanStream.ExactStateFormatVersion.toString)
    // idempotent: the restart path reads the marker it just wrote
    CanStream.requireExactStateFormat(spark, ck)
  }

  test("a synthesized OLD-FORMAT checkpoint (offsets history, no marker) " +
      "is refused loudly, with the escape hatch spelled out") {
    val ck = tmp("sf_old")
    // what a pre-marker (v1-keyed) run leaves behind: committed offsets,
    // state dirs, no _graft_state_format
    writeFile(s"$ck/offsets/0", """{"batchWatermarkMs":0}""")
    writeFile(s"$ck/commits/0", "{}")
    val e = intercept[IllegalStateException] {
      CanStream.requireExactStateFormat(spark, ck)
    }
    assert(e.getMessage.contains("SILENTLY ORPHANED"), e.getMessage)
    assert(e.getMessage.contains("_graft_state_format"), e.getMessage)
    // the documented escape hatch: a checkpoint KNOWN to be current-format
    // (from a pre-marker build of the same encoding) is accepted after the
    // user writes the marker by hand
    writeFile(marker(ck), CanStream.ExactStateFormatVersion.toString)
    CanStream.requireExactStateFormat(spark, ck)
  }

  test("a marker from a different format version is refused") {
    val ck = tmp("sf_vers")
    writeFile(marker(ck), "1")
    val e = intercept[IllegalStateException] {
      CanStream.requireExactStateFormat(spark, ck)
    }
    assert(e.getMessage.contains("state format '1'"), e.getMessage)
    assert(e.getMessage.contains(CanStream.ExactStateFormatVersion.toString),
      e.getMessage)
  }

  /** candump line for ENGINE (id 0x100): u16 speed at raw*0.25 rpm. */
  private def engineLine(tsUs: Long, rawSpeed: Int): String = {
    val hex = f"${rawSpeed & 0xFF}%02X${(rawSpeed >> 8) & 0xFF}%02X0000"
    f"(${tsUs / 1000000}%d.${tsUs % 1000000}%06d) vcan0 100#$hex"
  }

  private def exactPipeline(logDir: String): DataFrame =
    CanStream.exactStream(
      CanStream.decoded(net,
        CanStream.framesFromTextFiles(spark, logDir)).drop("ts"),
      cacheMs = 12.0)

  private def drain(logDir: String, out: String, ckpt: String): Unit = {
    val q = exactPipeline(logDir).writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
  }

  test("end-to-end lifecycle: gate + run + gated restart succeed; a " +
      "version flip between runs refuses the restart") {
    val log = tmp("sf_log"); val out = tmp("sf_out"); val ck = tmp("sf_ck")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$log/a.log"),
      (0 until 12).map(i => engineLine(i * 5000L, 100 + i))
        .mkString("\n").getBytes("UTF-8"))
    CanStream.requireExactStateFormat(spark, ck)
    drain(log, out, ck)
    // restart on the real checkpoint (offsets now exist + marker matches)
    CanStream.requireExactStateFormat(spark, ck)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$log/b.log"),
      (12 until 24).map(i => engineLine(i * 5000L, 100 + i))
        .mkString("\n").getBytes("UTF-8"))
    drain(log, out, ck)
    assert(spark.read.parquet(out).count() > 0)
    // an operator upgrade that bumps the format must refuse this
    // checkpoint. Overwrite through the Hadoop fs (not java.nio): the
    // local ChecksumFileSystem wrote a .crc sidecar when the gate created
    // the marker, and a raw overwrite would leave it stale — in reality
    // the flipped version comes from the NEW build's own fs.create.
    val p = new org.apache.hadoop.fs.Path(marker(ck))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    try o.write((CanStream.ExactStateFormatVersion + 1).toString.getBytes("UTF-8"))
    finally o.close()
    val e = intercept[IllegalStateException] {
      CanStream.requireExactStateFormat(spark, ck)
    }
    assert(e.getMessage.contains("restarting would orphan"), e.getMessage)
  }
}
