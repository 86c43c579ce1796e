package graft.can

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestSession
import graft.dbc._

/** Independent reference packer/unpacker for property tests (SURVEY §5.2):
  * bit-by-bit, structured nothing like the shift/mask expression trees.
  */
object BitRef {
  /** Extract raw unsigned value; data is the 8-byte payload. */
  def extract(data: Array[Byte], startBit: Int, len: Int, littleEndian: Boolean): BigInt = {
    def bit(i: Int): Int = (data(i / 8) >> (i % 8)) & 1
    if (littleEndian) {
      var v = BigInt(0)
      for (k <- 0 until len) v |= BigInt(bit(startBit + k)) << k
      v
    } else {
      var v = BigInt(0)
      var b = startBit / 8
      var j = startBit % 8
      for (_ <- 0 until len) {
        v = (v << 1) | bit(b * 8 + j)
        j -= 1
        if (j < 0) { b += 1; j = 7 }
      }
      v
    }
  }
  def signExtend(v: BigInt, len: Int): BigInt =
    if (v.testBit(len - 1)) v - (BigInt(1) << len) else v
}

class SignalDecoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def sig(start: Int, len: Int, le: Boolean, signed: Boolean,
      factor: Double = 1.0, offset: Double = 0.0, mux: Mux = Mux.None,
      flt32: Boolean = false, name: String = "S") =
    Signal(name, start, len, le, signed, factor, offset, 0, 0, "", mux, flt32)

  /** Evaluate rawExpr over one payload. */
  def rawOf(data: Array[Byte], s: Signal): Long = {
    val df = Seq(Tuple1(data)).toDF("data")
    val be = SignalDecoder.beU64(col("data"))
    df.select(SignalDecoder.rawExpr(s, SignalDecoder.leU64(be), be).as("r"))
      .as[Long].head()
  }

  test("intel unsigned: Engine_Speed fixture golden") {
    // payload 40 1F 4B 01 → le u64 low 16 bits = 0x1F40 = 8000
    val d = Array[Byte](0x40, 0x1F, 0x4B, 0x01)
    assert(rawOf(d, sig(0, 16, le = true, signed = false)) == 0x1F40L)
  }

  test("motorola signed: Pressure_BE fixture golden") {
    val d = Array[Byte](0x02, 0xE8.toByte, 0x03, 0, 0, 0, 0, 0)
    // start 16 len 12 @0-: raw 0x800 → sign-extended -2048
    assert(rawOf(d, sig(16, 12, le = false, signed = true)) == -2048L)
  }

  test("full 64-bit fields, both endians") {
    val d = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val beVal = BigInt("0102030405060708", 16).toLong
    val leVal = BigInt("0807060504030201", 16).toLong
    assert(rawOf(d, sig(0, 64, le = true, signed = false)) == leVal)
    // motorola 64-bit starts at DBC bit 7 (MSB of byte 0)
    assert(rawOf(d, sig(7, 64, le = false, signed = false)) == beVal)
    assert(rawOf(d, sig(7, 64, le = false, signed = true)) == beVal)
  }

  test("unsigned 64-bit with high bit set survives (no ANSI overflow)") {
    val d = Array.fill[Byte](8)(0xFF.toByte)
    assert(rawOf(d, sig(0, 64, le = true, signed = false)) == -1L) // u64 max as Long bits
  }

  test("property: extraction matches independent bit-reference") {
    val gen = for {
      le <- Gen.oneOf(true, false)
      len <- Gen.choose(1, 64)
      // motorola: pick the left-position p then map back to DBC sawtooth numbering
      start <-
        if (le) Gen.choose(0, 64 - len)
        else Gen.choose(0, 64 - len).map(p => (p / 8) * 8 + (7 - p % 8))
      signed <- Gen.oneOf(true, false)
      bytes <- Gen.containerOfN[Array, Byte](8, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (le, start, len, signed, bytes)

    // batch the cases into one DataFrame pass for speed
    val cases = Gen.listOfN(120, gen).sample.get
    val df = cases.zipWithIndex.map { case ((_, _, _, _, bytes), i) => (i, bytes) }.toDF("i", "data")
    val be = SignalDecoder.beU64(col("data"))
    val le64 = SignalDecoder.leU64(be)
    val cols = cases.zipWithIndex.map { case ((le, start, len, signed, _), i) =>
      SignalDecoder.rawExpr(sig(start, len, le, signed), le64, be).as(s"r$i")
    }
    val nativeCols = cases.zipWithIndex.map { case ((le, start, len, signed, _), i) =>
      SignalDecoder.rawNative(col("data"),
        sig(start, len, le, signed)).as(s"n$i")
    }
    val row = df.orderBy("i").select(cols: _*).collect()
    val nrow = df.orderBy("i").select(nativeCols: _*).collect()
    val m64 = (BigInt(1) << 64) - 1
    cases.zipWithIndex.foreach { case ((le, start, len, signed, bytes), i) =>
      val exp0 = BitRef.extract(bytes, start, len, le)
      val exp = if (signed) BitRef.signExtend(exp0, len) else exp0
      val got = row(i).getAs[Long](s"r$i")
      val gotNative = nrow(i).getAs[Long](s"n$i")
      // compare as 64-bit bit patterns (covers u64-max-as-negative-Long)
      assert((BigInt(got) & m64) == (exp & m64),
        s"case $i: le=$le start=$start len=$len signed=$signed bytes=${bytes.map("%02X".format(_)).mkString}")
      assert(gotNative == got,
        s"native mismatch case $i: le=$le start=$start len=$len signed=$signed")
    }
  }

  test("scaling, offset, typing (P4/P7)") {
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    val frames = Seq(
      (0.0, 0x100L, Array[Byte](0x40, 0x1F, 0x4B, 0x01)), // ENGINE
      (4.0, 0x200L, Array[Byte](0x02, 0xE8.toByte, 0x03, 0, 0, 0, 0, 0)) // SENSORS
    ).toDF("ts_ms", "can_id", "data")
    val wide = SignalDecoder.wideFrame(net, frames)
    val rows = wide.orderBy("ts_ms").collect()
    val engine = rows(0)
    assert(engine.getAs[Float]("Engine_Speed") == 2000.0f) // 0x1F40 * 0.25
    assert(engine.getAs[Int]("Engine_Temp") == 0x4B - 40) // 75 - 40 = 35
    assert(engine.getAs[Boolean]("Engine_On") == true) // bit 24 of 0x014B1F40
    assert(engine.isNullAt(engine.fieldIndex("Mode"))) // other message's signals null
    val sensors = rows(1)
    assert(sensors.getAs[Int]("Mode") == 2)
    assert(sensors.getAs[Int]("Counter_A") == 1000)
    assert(sensors.getAs[Float]("Pressure_BE") == -204.8f)
  }

  test("flt32 reinterpret (P6): 0x3F800000 -> 1.0f") {
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    val frames = Seq((8.0, 0x300L, Array[Byte](0, 0, 0x80.toByte, 0x3F))).toDF("ts_ms", "can_id", "data")
    val r = SignalDecoder.wideFrame(net, frames).select("GPS_Speed").as[Float].head()
    assert(r == 1.0f)
  }

  test("flt32 round-trip property vs floatToIntBits") {
    val floats = Seq(0.0f, 1.0f, -1.5f, 3.14159f, Float.MaxValue, Float.MinPositiveValue, 1e-38f)
    val net = DbcParser.parseString(
      "BO_ 768 G: 8 E\n SG_ flt32_V : 0|32@1+ (1,0) [0|0] \"\" T\n")
    val frames = floats.zipWithIndex.map { case (f, i) =>
      val bits = java.lang.Float.floatToIntBits(f)
      val d = Array[Byte](bits.toByte, (bits >> 8).toByte, (bits >> 16).toByte, (bits >> 24).toByte)
      (i.toDouble, 768L, d)
    }.toDF("ts_ms", "can_id", "data")
    val got = SignalDecoder.wideFrame(net, frames).orderBy("ts_ms").select("V").as[Float].collect()
    assert(got.toSeq == floats)
  }

  test("SIG_VALTYPE_ round-trip property vs Float/Double bit casts") {
    // both endians for float32, both endians for float64, plus a scaled
    // float32 — the full SIG_VALTYPE_ decode matrix over random bits
    val net = DbcParser.parseString(
      """BO_ 100 F: 8 E
        | SG_ FV : 0|32@1+ (1,0) [0|0] "" T
        | SG_ FB : 39|32@0+ (1,0) [0|0] "" T
        |BO_ 101 D: 8 E
        | SG_ DV : 0|64@1+ (1,0) [0|0] "" T
        |BO_ 102 DM: 8 E
        | SG_ DB : 7|64@0- (1,0) [0|0] "" T
        |BO_ 103 FS: 8 E
        | SG_ FX : 0|32@1- (0.5,3) [0|0] "" T
        |
        |SIG_VALTYPE_ 100 FV : 1;
        |SIG_VALTYPE_ 100 FB : 1;
        |SIG_VALTYPE_ 101 DV : 2;
        |SIG_VALTYPE_ 102 DB : 2;
        |SIG_VALTYPE_ 103 FX : 1;
        |""".stripMargin)
    val rnd = new scala.util.Random(0xC0FFEE)
    // random payloads + IEEE edge patterns in the low word / full word
    val edges = Seq(0L, 0x7F800000L, 0xFF800000L, 0x7FC00000L, 0x80000000L,
      0x7FF0000000000000L, 0xFFF0000000000000L, 0x7FF8000000000000L, Long.MinValue, -1L)
    val payloads = (edges ++ Seq.fill(200)(rnd.nextLong())).zipWithIndex
    val frames = payloads.flatMap { case (bits, i) =>
      val le = (0 until 8).map(b => ((bits >>> (8 * b)) & 0xFF).toByte).toArray
      Seq(100L, 101L, 102L, 103L).zipWithIndex.map { case (id, k) =>
        ((i * 4 + k).toDouble, id, le)
      }
    }.toDF("ts_ms", "can_id", "data")
    val rows = SignalDecoder.wideFrame(net, frames).orderBy("ts_ms").collect()
    def checkF(got: Float, bits: Int): Unit =
      if (java.lang.Float.intBitsToFloat(bits).isNaN) assert(got.isNaN)
      else assert(got == java.lang.Float.intBitsToFloat(bits))
    def checkD(got: Double, bits: Long): Unit =
      if (java.lang.Double.longBitsToDouble(bits).isNaN) assert(got.isNaN)
      else assert(got == java.lang.Double.longBitsToDouble(bits))
    payloads.foreach { case (bits, i) =>
      val fRow = rows(i * 4) // id 100
      checkF(fRow.getAs[Float]("FV"), bits.toInt) // LE u32 = low word
      // Motorola start 39 len 32 → wire bytes 4..7 big-endian; LE payload
      // byte b holds bits >>> 8b, so the BE read reassembles:
      val beBits = ((bits >>> 32) & 0xFFL) << 24 | ((bits >>> 40) & 0xFFL) << 16 |
        ((bits >>> 48) & 0xFFL) << 8 | (bits >>> 56) & 0xFFL
      checkF(fRow.getAs[Float]("FB"), beBits.toInt)
      checkD(rows(i * 4 + 1).getAs[Double]("DV"), bits) // LE u64 = the word
      val beD = java.lang.Long.reverseBytes(bits) // moto 7|64 = BE byte string
      checkD(rows(i * 4 + 2).getAs[Double]("DB"), beD)
      // scaled float32 (signed extract — sign extension must not matter):
      val f = java.lang.Float.intBitsToFloat(bits.toInt)
      val expected = (f.toDouble * 0.5 + 3).toFloat
      val got = rows(i * 4 + 3).getAs[Float]("FX")
      if (expected.isNaN) assert(got.isNaN) else assert(got == expected)
    }
  }

  test("mux gating (P5): value signals only when switch matches") {
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    val frames = Seq(
      (12.0, 0x400L, Array[Byte](0x00, 0xD0.toByte, 0x07)), // MuxSel=0 → Val_A = 0x07D0*0.5
      (16.0, 0x400L, Array[Byte](0x01, 0xFF.toByte, 0x7F)) // MuxSel=1 → Val_B = 0x7FFF
    ).toDF("ts_ms", "can_id", "data")
    val rows = SignalDecoder.wideFrame(net, frames).orderBy("ts_ms").collect()
    assert(rows(0).getAs[Int]("MuxSel") == 0)
    assert(rows(0).getAs[Float]("Val_A") == 1000.0f)
    assert(rows(0).isNullAt(rows(0).fieldIndex("Val_B")))
    assert(rows(1).getAs[Int]("MuxSel") == 1)
    assert(rows(1).isNullAt(rows(1).fieldIndex("Val_A")))
    assert(rows(1).getAs[Int]("Val_B") == 0x7FFF)
  }

  test("extended mux gating (SG_MUL_VAL_): signal decodes across its ranges") {
    val net = DbcParser.parseString(
      """BO_ 6 M: 8 ECU
        | SG_ Sel M : 0|8@1+ (1,0) [0|0] "" T
        | SG_ A m1 : 8|8@1+ (1,0) [0|0] "" T
        | SG_ B m2 : 16|8@1+ (1,0) [0|0] "" T
        |
        |SG_MUL_VAL_ 6 A Sel 1-3, 7-7;
        |""".stripMargin)
    // payload bytes: [Sel, A-field, B-field]
    def f(ts: Double, sel: Int) =
      (ts, 6L, Array[Byte](sel.toByte, 0x2A, 0x55))
    val frames = Seq(f(0.0, 0), f(1.0, 1), f(2.0, 2), f(3.0, 3), f(4.0, 4),
      f(7.0, 7)).toDF("ts_ms", "can_id", "data")
    val rows = SignalDecoder.wideFrame(net, frames).orderBy("ts_ms").collect()
    val aIdx = rows.head.fieldIndex("A")
    val bIdx = rows.head.fieldIndex("B")
    // A decodes for Sel ∈ {1,2,3} ∪ {7} — not just its m1 value
    assert(rows.map(r => !r.isNullAt(aIdx)).toSeq ==
      Seq(false, true, true, true, false, true))
    rows.filter(!_.isNullAt(aIdx)).foreach(r => assert(r.getAs[Int](aIdx) == 0x2A))
    // B keeps plain m2 semantics
    assert(rows.map(r => !r.isNullAt(bIdx)).toSeq ==
      Seq(false, false, true, false, false, false))

    // frame-level tumbling groups by switch raw — must agree with the wide
    // path under extended mux too
    val viaFrames = Bucketer.tumblingFromFrames(net, frames, 2.0)
      .orderBy(DbcColumns.TimeCol).collect()
    val viaWide = Bucketer.bucket(SignalDecoder.wideFrame(net, frames),
      BucketMode.Tumbling(2.0)).orderBy(DbcColumns.TimeCol).collect()
    assert(viaFrames.toSeq == viaWide.toSeq)
  }

  test("unknown ids dropped (F1) and short payloads zero-padded") {
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    val frames = Seq(
      (20.0, 0x7FFL, Array[Byte](0xDE.toByte, 0xAD.toByte)),
      (50.0, 0x100L, Array[Byte](0x00)) // 1-byte payload: rest reads as 0
    ).toDF("ts_ms", "can_id", "data")
    val rows = SignalDecoder.wideFrame(net, frames).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Float]("Engine_Speed") == 0.0f)
    assert(rows(0).getAs[Int]("Engine_Temp") == -40)
  }

  test("outline threshold: inline (narrow default) and outlined decode agree") {
    // mini.dbc is far below OutlineSignalThreshold, so the default path
    // inlines; forcing outlineThreshold=0 outlines every tree. Both must
    // produce identical rows — the threshold is a pure execution-mode knob.
    val net = DbcParser.parseFile("fixtures/mini.dbc")
    // spark.range (not a local Seq): ConvertToLocalRelation would evaluate
    // a LocalRelation projection at optimization time and erase the plan
    // shape this test asserts
    val frames = spark.range(200).select(
      col("id").cast("double").as("ts_ms"),
      when(col("id") % 2 === 0, 0x100L).otherwise(0x200L).as("can_id"),
      unhex(lpad(hex(col("id") * 2654435761L), 16, "0")).as("data"))
    val inline = SignalDecoder.wideFrame(net, frames)
    val outlined = SignalDecoder.wideFrame(net, frames, outlineThreshold = 0)
    // default narrow plan carries no Outline expression
    def hasOutline(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect { case p => p.expressions }
        .flatten.exists(_.exists(_.isInstanceOf[graft.plans.Outline]))
    assert(!hasOutline(inline), "narrow decode must inline its signal trees")
    assert(hasOutline(outlined), "outlineThreshold=0 must outline")
    assert(inline.exceptAll(outlined).count() == 0 &&
      outlined.exceptAll(inline).count() == 0)
  }

  test("withLabels: VAL_ tables attach as map-only label columns; unlisted " +
      "values null; scaled labeled signals rejected") {
    val net = DbcParser.parseString(
      """BO_ 16 G: 8 E
        | SG_ Gear : 0|8@1+ (1,0) [0|0] "" T
        | SG_ Plain : 8|8@1+ (1,0) [0|0] "" T
        |
        |VAL_ 16 Gear 0 "neutral" 1 "first" 2 "second" ;
        |""".stripMargin)
    val frames = Seq(
      (0.0, 16L, Array[Byte](0, 5)),
      (1.0, 16L, Array[Byte](2, 6)),
      (2.0, 16L, Array[Byte](9, 7)) // 9 unlisted -> null label
    ).toDF("ts_ms", "can_id", "data")
    val out = SignalDecoder.withLabels(net, SignalDecoder.wideFrame(net, frames))
      .orderBy("ts_ms")
      .select("Gear", "Gear_label", "Plain").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((0, "neutral", 5), (2, "second", 6), (9, null, 7)))
    // no stray label columns for unlabeled signals
    assert(!SignalDecoder.withLabels(net, SignalDecoder.wideFrame(net, frames))
      .columns.contains("Plain_label"))
    // labels address RAW values: a scaled labeled signal would silently
    // mislabel — rejected
    val scaled = DbcParser.parseString(
      """BO_ 16 G: 8 E
        | SG_ Gear : 0|8@1+ (0.5,0) [0|0] "" T
        |
        |VAL_ 16 Gear 0 "neutral" ;
        |""".stripMargin)
    assertThrows[IllegalArgumentException](
      SignalDecoder.withLabels(scaled, SignalDecoder.wideFrame(scaled, frames)))
  }
}
