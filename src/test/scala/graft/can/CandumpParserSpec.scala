package graft.can

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class CandumpParserSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def parse(lines: String*) =
    CandumpParser.parseLines(lines.toDF("value")).collect()

  test("good line parses: ts, iface, id, payload") {
    val r = parse("(1694651234.123456) can0 123#DEADBEEF")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("ts_us") == 1694651234123456L)
    assert(row.getAs[String]("iface") == "can0")
    assert(row.getAs[Long]("can_id") == 0x123L)
    assert(row.getAs[Array[Byte]]("data").toSeq == Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
  }

  test("malformed, blank, truncated lines dropped (F2)") {
    val r = parse("", "not a can line", "(abc) can0 123#00", "(1.0) can0", "(1.0) can0 xyz#00")
    assert(r.isEmpty)
  }

  test("overflow-scale epoch seconds are malformed, not wrapped/thrown") {
    // 12+ second digits would overflow sec*1e6 past 2^63 (ANSI throw or
    // silent wrap) — the RLIKE gate must drop them like any corruption,
    // while an 11-digit epoch (year 5138) still parses exactly
    val r = parse("(9999999999999.000000) can0 123#00",
      "(999999999999.5) can0 123#00", "(99999999999.000001) can0 123#00")
    assert(r.length == 1)
    assert(r.head.getAs[Long]("ts_us") == 99999999999000001L)
  }

  test("empty payload and remote frame allowed") {
    val r = parse("(1.0) can0 1FF#", "(2.0) can0 200#R")
    assert(r.length == 2)
    assert(r.forall(_.getAs[Array[Byte]]("data").isEmpty))
  }

  test("payload capped at 8 bytes, odd trailing nibble dropped") {
    val r = parse("(1.0) can0 100#00112233445566778899", "(2.0) can0 100#ABC")
    assert(r(0).getAs[Array[Byte]]("data").length == 8)
    assert(r(1).getAs[Array[Byte]]("data").toSeq == Seq(0xAB.toByte))
  }

  test("extended hex ids and CRLF endings") {
    val r = parse("(1.0) can0 18FF50E5#0102\r")
    assert(r.head.getAs[Long]("can_id") == 0x18FF50E5L)
  }

  test("timestamp normalization: subtract first ts, ms scale (P8)") {
    val df = CandumpParser.parseLines(Seq(
      "(1700000000.000000) can0 100#00",
      "(1700000000.004000) can0 100#01",
      "(1700000001.500000) can0 100#02").toDF("value"))
    val ts = CandumpParser.withTsMs(df).select("ts_ms").as[Double].collect().sorted
    assert(ts.toSeq == Seq(0.0, 4.0, 1500.0))
    val raw = CandumpParser.withTsMs(df, adjust = false)
      .select("ts_ms").as[Double].collect().sorted
    assert(raw.head == 1700000000000.0)
  }

  test("readLog end-to-end on fixture: 6 parseable known-format lines") {
    val df = CandumpParser.readLog(spark, "fixtures/mini.log")
    // 8 lines: 6 good + 1 blank + 1 garbage; 7FF is well-formed (F1 filtering
    // of unknown ids happens in the decoder, not the parser)
    assert(df.count() == 7)
    assert(df.agg(min("ts_ms")).as[Double].head() == 0.0)
  }

  test("fidelity replay: first-frame discard, single bad line survives, 5-run EOF") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fid")
    val log = dir.resolve("f.log")
    java.nio.file.Files.write(log, java.util.Arrays.asList(
      "leading garbage", "more leading garbage", // skipped unboundedly (initialize)
      "(100.000000) can0 100#01", // first good: sets t0, discarded
      "(100.010000) can0 100#02",
      "one bad line",             // < 5-run: reader steps over it
      "(100.020000) can0 100#03",
      "bad1", "bad2", "bad3", "bad4", "bad5", // 5-run: EOF
      "(100.030000) can0 100#04")) // after EOF: dropped
    val ts = CandumpParser.readLogFidelity(spark, log.toString)
      .select("ts_ms").as[Double].collect().sorted.toSeq
    assert(ts == Seq(10.0, 20.0))
    // keep-first variant: frame 1 emitted at t0 → 0.0
    val keep = CandumpParser.readLogFidelity(spark, log.toString,
      discardFirstFrame = false).select("ts_ms").as[Double].collect().sorted.toSeq
    assert(keep == Seq(0.0, 10.0, 20.0))
    // no-adjust keeps raw epoch ms but still truncates + discards
    val raw = CandumpParser.readLogFidelity(spark, log.toString,
      adjustTimestamp = false).select("ts_ms").as[Double].collect().sorted.toSeq
    assert(raw == Seq(100010.0, 100020.0))
    // default distributed path is NOT truncated: all 4 good lines parse
    assert(CandumpParser.readLog(spark, log.toString).count() == 4)
  }

  test("fidelity replay: no bad run → only the first frame differs from readLog") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fid2")
    val log = dir.resolve("g.log")
    java.nio.file.Files.write(log, java.util.Arrays.asList(
      "(5.000000) can0 100#01", "(5.001000) can0 100#02", "(5.002500) can0 100#03"))
    val ts = CandumpParser.readLogFidelity(spark, log.toString)
      .select("ts_ms").as[Double].collect().sorted.toSeq
    assert(ts == Seq(1.0, 2.5))
  }
}
