package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.SparkTestSession
import graft.can.{Bucketer, CandumpParser, DbcColumns}
import graft.dbc.DbcParser

/** Fleet-width tumbling in STREAMING ([[CanStream.bucketedStreamFromFrames]]):
  * the chained-aggregation mirror of the batch frame-level path. Asserts the
  * two invariants the width depends on — the ONE full-volume stateful
  * aggregation (grouped by window, can_id, mux) stays `HashAggregateExec`
  * inside whole-stage codegen at 512 signals (where the wide-table streaming
  * combine degrades to the interpreted struct form), and the emitted rows are
  * identical to the batch [[Bucketer.tumblingFromFrames]] on a replay of the
  * same frames.
  *
  * Append-mode emission: a window only emits once the watermark passes its
  * end, so each test feeds far-future sentinel frames until the real windows
  * have drained (the sentinels' own windows never close and are filtered out
  * of the comparison by timestamp).
  */
class StreamingWideSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // same fleet shape as WideDbcSpec: N messages × (u16 scaled, s8, bool,
  // motorola u12)
  private def dbcText(msgs: Int): String = (0 until msgs).map { m =>
    s"""BO_ ${512 + m} MSG$m: 8 E
       | SG_ M${m}_A : 0|16@1+ (0.5,-100) [0|0] "" X
       | SG_ M${m}_B : 16|8@1- (1,0) [0|0] "" X
       | SG_ M${m}_C : 24|1@1+ (1,0) [0|0] "" X
       | SG_ M${m}_D : 39|12@0+ (1,0) [0|0] "" X
       |""".stripMargin
  }.mkString("\n")

  /** Pump sentinels (ever-increasing event times) until the memory sink has
    * drained `expected` rows below the sentinel horizon — append mode emits
    * a window only in a batch after the watermark passed it.
    */
  private def drain(q: StreamingQuery, table: String, expected: Long,
      horizonMs: Double, feed: Int => Unit): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var round = 0
    def emitted(): Long =
      spark.table(table).filter(col(DbcColumns.TimeCol) < horizonMs).count()
    q.processAllAvailable()
    while (emitted() < expected && System.nanoTime() < deadline) {
      round += 1
      feed(round)
      q.processAllAvailable()
    }
    assert(emitted() == expected,
      s"memory sink drained ${emitted()} of $expected closed windows")
  }

  private def streamingQueryPlan(q: StreamingQuery) =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution.executedPlan

  test("bucketedStreamFromFrames matches batch tumblingFromFrames on the " +
      "mini fixture (narrow width, absolute time)") {
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    val lines = scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq
    val input = MemoryStream[String](spark)
    input.addData(lines)
    val frames = CandumpParser.parseLines(input.toDF())
    val bucketed = CanStream.bucketedStreamFromFrames(net, frames, cacheMs = 10L)
    val q = bucketed.writeStream.format("memory").queryName("sff_mini")
      .outputMode("append").start()
    try {
      // batch reference on the same absolute-time frames
      val batchFrames = CandumpParser.withTsMs(
        CandumpParser.parseLines(lines.toDF("value")), adjust = false)
      val batch = Bucketer.tumblingFromFrames(net, batchFrames, 10.0)
        .orderBy(DbcColumns.TimeCol).collect()
      val horizon = 1750000000000.0 // fixture is at epoch ~1.7e12 ms
      drain(q, "sff_mini", batch.length, horizon, round =>
        input.addData(s"(${1800000000 + round * 100}.000000) can0 100#0000000000000000"))
      val got = spark.table("sff_mini")
        .filter(col(DbcColumns.TimeCol) < horizon)
        .orderBy(DbcColumns.TimeCol).collect()
      assert(got.length == batch.length)
      got.zip(batch).zipWithIndex.foreach { case ((g, b), i) =>
        assert(g == b, s"row $i diverges:\n streaming $g\n batch     $b")
      }
    } finally q.stop()
  }

  test("512-signal streaming tumbling: full-volume aggregation stays " +
      "HashAggregate in codegen; rows match the batch frame-level path") {
    val net = DbcParser.parseString(dbcText(128))
    assert(net.signalsInOrder.size == 512)
    val n = 2000L
    val input = MemoryStream[Long](spark)
    input.addData(0L until n)
    val frames = input.toDS().toDF("id").select(
      (col("id") * 1000L).as("ts_us"), // µs → ts_ms = id
      (lit(512) + col("id") % 128).as("can_id"),
      // pmod keeps the payload multiply inside Long for the far-future
      // sentinel ids (identity for all real ids < 1e6)
      unhex(lpad(hex(pmod(col("id"), lit(1000000L)) * 2654435761L), 16, "0")).as("data"))
    val bucketed = CanStream.bucketedStreamFromFrames(net, frames, cacheMs = 100L)
    val q = bucketed.writeStream.format("memory").queryName("sff_wide")
      .outputMode("append").start()
    try {
      val batch = Bucketer.tumblingFromFrames(net,
        spark.range(n).select(
          (col("id") * 1.0).as("ts_ms"),
          (lit(512) + col("id") % 128).as("can_id"),
          unhex(lpad(hex(col("id") * 2654435761L), 16, "0")).as("data")),
        100.0).orderBy(DbcColumns.TimeCol).collect()
      // sentinels must stay ABOVE the horizon: a second drain round closes
      // the first sentinel's window, and its decoded row (id % 128 = 0 →
      // known can_id 512) would otherwise count as a real emitted row
      val horizon = 1.0e9 // real data lives in [0, 2000) ms
      drain(q, "sff_wide", batch.length, horizon, round =>
        input.addData(Seq((round + 1) * 2000000000L)))

      // execution mode: every stateful aggregate phase that touches full
      // frame volume (grouping on can_id) must be HashAggregateExec — the
      // whole point of the frame-level path; the stage-3 reassembly above
      // the width gate is deliberately the interpreted struct combine but
      // only ever sees the winner set (no can_id in its grouping)
      val plan = streamingQueryPlan(q)
      def onCanId(gs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]) =
        gs.exists(_.references.exists(_.name == "can_id"))
      val fullVolumeHash = plan.collect {
        case h: HashAggregateExec if onCanId(h.groupingExpressions) => h
      }
      assert(fullVolumeHash.nonEmpty,
        s"no HashAggregateExec grouped on can_id in the streaming plan:\n$plan")
      val fullVolumeSlow = plan.collect {
        case o: ObjectHashAggregateExec if onCanId(o.groupingExpressions) => o
        case s: SortAggregateExec if onCanId(s.groupingExpressions) => s
      }
      assert(fullVolumeSlow.isEmpty,
        s"full-volume aggregation fell out of hash aggregation:\n$plan")
      // and the hash phases sit inside whole-stage codegen spans
      val codegenHash = plan.collect { case w: WholeStageCodegenExec =>
        w.collect { case h: HashAggregateExec if onCanId(h.groupingExpressions) => h }
      }.flatten
      assert(codegenHash.nonEmpty,
        s"full-volume HashAggregate phases are outside WholeStageCodegen:\n$plan")

      val got = spark.table("sff_wide")
        .filter(col(DbcColumns.TimeCol) < horizon)
        .orderBy(DbcColumns.TimeCol).collect()
      assert(got.length == batch.length)
      got.zip(batch).zipWithIndex.foreach { case ((g, b), i) =>
        assert(g == b, s"row $i diverges:\n streaming $g\n batch     $b")
      }
    } finally q.stop()
  }
}
