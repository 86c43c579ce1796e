package graft.dbc

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class DbcParserSpec extends AnyFunSuite {

  lazy val net: Network = DbcParser.parseFile("fixtures/mini.dbc")

  test("parses all messages in file order") {
    assert(net.messages.map(_.name) == Seq("ENGINE", "SENSORS", "VDM_GPS", "MUXED"))
    assert(net.messages.map(_.id) == Seq(256L, 512L, 1024L).patch(2, Seq(768L, 1024L), 1))
    assert(net.messageById(256L).dlc == 8)
  }

  test("signal fields: intel unsigned scaled") {
    val s = net.messageById(256L).signals.head
    assert(s.name == "Engine_Speed")
    assert(s.startBit == 0 && s.bitLen == 16 && s.littleEndian && !s.signed)
    assert(s.factor == 0.25 && s.offset == 0.0)
    assert(s.unit == "rpm")
    assert(s.mux == Mux.None)
  }

  test("signal fields: offset and 1-bit") {
    val Seq(_, temp, on) = net.messageById(256L).signals
    assert(temp.name == "Engine_Temp" && temp.factor == 1.0 && temp.offset == -40.0)
    assert(on.name == "Engine_On" && on.bitLen == 1)
  }

  test("motorola signed signal + sawtooth MSB position") {
    val p = net.messageById(512L).signals.find(_.name == "Pressure_BE").get
    assert(!p.littleEndian && p.signed && p.bitLen == 12)
    // DBC start 16 (byte 2, bit-in-byte 0=LSB) → 16 + (7-0) = 23 from the left
    assert(p.motorolaMsbPos == 23)
  }

  test("flt32_ prefix stripped and flagged") {
    val g = net.messageById(768L).signals.head
    assert(g.name == "GPS_Speed" && g.isFlt32)
    assert(g.bitLen == 32 && g.littleEndian)
  }

  test("multiplex markers") {
    val m = net.messageById(1024L)
    assert(m.muxSwitch.map(_.name).contains("MuxSel"))
    assert(m.signals.find(_.name == "Val_A").get.mux == Mux.Value(0))
    assert(m.signals.find(_.name == "Val_B").get.mux == Mux.Value(1))
    assert(m.signals.find(_.name == "Val_B").get.signed)
  }

  test("extended-frame id flag masked") {
    val n = DbcParser.parseString(
      "BO_ 2566857156 EXT_MSG: 8 ECU\n SG_ X : 0|8@1+ (1,0) [0|255] \"\" T\n")
    assert(n.messages.head.id == (2566857156L & 0x1FFFFFFFL))
  }

  test("wide schema: Time_ms first, message then signal order, nullable") {
    val sch = DbcSchema.wideSchema(net, TypingMode.Intended)
    assert(sch.fields.head == StructField("Time_ms", DoubleType, nullable = false))
    assert(sch.fieldNames.toSeq == Seq("Time_ms",
      "Engine_Speed", "Engine_Temp", "Engine_On",
      "Mode", "Counter_A", "Pressure_BE",
      "GPS_Speed", "MuxSel", "Val_A", "Val_B"))
    assert(sch.fields.tail.forall(_.nullable))
  }

  test("typing: intended mode") {
    val sch = DbcSchema.wideSchema(net, TypingMode.Intended)
    def t(n: String) = sch(n).dataType
    assert(t("Engine_Speed") == FloatType)   // scaled, <32 bits
    assert(t("Engine_Temp") == IntegerType)  // factor 1 → int (intended)
    assert(t("Engine_On") == BooleanType)    // 1-bit
    assert(t("Counter_A") == IntegerType)
    assert(t("Pressure_BE") == FloatType)    // scaled 0.1, <32 bits
    assert(t("GPS_Speed") == FloatType)      // flt32 reinterpret
    assert(t("Val_B") == IntegerType)        // factor 1 signed
  }

  test("typing: de-facto mode (dead integer branches)") {
    val sch = DbcSchema.wideSchema(net, TypingMode.DeFacto)
    def t(n: String) = sch(n).dataType
    assert(t("Engine_Temp") == FloatType)    // <32 bits → float, not int
    assert(t("Counter_A") == FloatType)
    assert(t("Engine_On") == BooleanType)    // bool branch still live
    assert(t("GPS_Speed") == FloatType)
  }

  test("typing: ANSI-soundness — u32 factor-1 is Long; fractional offset is float") {
    val n = DbcParser.parseString(
      """BO_ 1 W: 8 ECU
        | SG_ U32 : 0|32@1+ (1,0) [0|0] "" T
        | SG_ S32 : 0|32@1- (1,0) [0|0] "" T
        | SG_ HalfOff : 0|8@1+ (1,0.5) [0|0] "" T
        |""".stripMargin)
    val sch = DbcSchema.wideSchema(n, TypingMode.Intended)
    assert(sch("U32").dataType == LongType)    // raw up to 2^32-1 overflows int
    assert(sch("S32").dataType == IntegerType) // signed 32-bit fits
    assert(sch("HalfOff").dataType == FloatType) // int column would truncate +0.5
  }

  test("typing: factor-1 long and scaled double for wide signals") {
    val n = DbcParser.parseString(
      """BO_ 1 W: 8 ECU
        | SG_ Big_Int : 0|48@1+ (1,0) [0|0] "" T
        | SG_ Big_Scaled : 0|48@1+ (0.5,0) [0|0] "" T
        |""".stripMargin)
    val sch = DbcSchema.wideSchema(n, TypingMode.Intended)
    assert(sch("Big_Int").dataType == LongType)
    assert(sch("Big_Scaled").dataType == DoubleType)
  }

  test("SIG_VALTYPE_ attaches IEEE types, masks extended ids, types the schema") {
    val n = DbcParser.parseString(
      """BO_ 2147484672 V: 8 ECU
        | SG_ F : 0|32@1+ (0.5,3) [0|0] "" T
        | SG_ K : 32|32@1+ (1,0) [0|0] "" T
        |BO_ 2 W: 8 ECU
        | SG_ D : 0|64@1+ (1,0) [0|0] "" T
        |
        |SIG_VALTYPE_ 2147484672 F : 1;
        |SIG_VALTYPE_ 2 D : 2;
        |""".stripMargin) // 2147484672 = 0x80000400 → masked id 1024
    val v = n.messageById(1024L)
    assert(v.signals.find(_.name == "F").get.valType == ValType.Float32)
    assert(v.signals.find(_.name == "K").get.valType == ValType.Integer)
    assert(n.messageById(2L).signals.head.valType == ValType.Float64)
    val sch = DbcSchema.wideSchema(n, TypingMode.Intended)
    assert(sch("F").dataType == FloatType) // declared type wins over scaled table
    assert(sch("K").dataType == LongType)
    assert(sch("D").dataType == DoubleType)
    // DeFacto mode: declaration still wins (it IS the wire format)
    assert(DbcSchema.wideSchema(n, TypingMode.DeFacto)("D").dataType == DoubleType)
  }

  test("SIG_VALTYPE_ matches flt32_-stripped names; explicit 0 is a no-op") {
    val n = DbcParser.parseString(
      """BO_ 3 X: 8 ECU
        | SG_ flt32_G : 0|32@1+ (1,0) [0|0] "" T
        | SG_ H : 32|16@1+ (1,0) [0|0] "" T
        |
        |SIG_VALTYPE_ 3 flt32_G : 1;
        |SIG_VALTYPE_ 3 H : 0;
        |""".stripMargin)
    val g = n.messageById(3L).signals.head
    assert(g.name == "G" && g.isFlt32 && g.valType == ValType.Float32)
    assert(n.messageById(3L).signals(1).valType == ValType.Integer)
  }

  test("SIG_VALTYPE_ width validation: float32 needs 32 bits, float64 needs 64") {
    def dbc(len: Int, t: Int) =
      s"""BO_ 4 Y: 8 ECU
         | SG_ Z : 0|$len@1+ (1,0) [0|0] "" T
         |
         |SIG_VALTYPE_ 4 Z : $t;
         |""".stripMargin
    assertThrows[IllegalArgumentException](DbcParser.parseString(dbc(16, 1)))
    assertThrows[IllegalArgumentException](DbcParser.parseString(dbc(32, 2)))
    DbcParser.parseString(dbc(32, 1)) // sane declarations parse
    DbcParser.parseString(dbc(64, 2)): Unit
  }

  test("SIG_VALTYPE_ rejects unmatched declarations and non-[012] type codes") {
    val base =
      """BO_ 5 W: 8 ECU
        | SG_ V : 0|32@1+ (1,0) [0|0] "" T
        |
        |""".stripMargin
    // typo'd signal name: would silently decode V as integer if dropped
    val badName = intercept[IllegalArgumentException](
      DbcParser.parseString(base + "SIG_VALTYPE_ 5 Vv : 1;\n"))
    assert(badName.getMessage.contains("Vv"))
    // wrong message id
    assertThrows[IllegalArgumentException](
      DbcParser.parseString(base + "SIG_VALTYPE_ 99 V : 1;\n"))
    // type code outside 0/1/2 fails the strict regex — must throw, not skip
    val badType = intercept[IllegalArgumentException](
      DbcParser.parseString(base + "SIG_VALTYPE_ 5 V : 3;\n"))
    assert(badType.getMessage.contains("SIG_VALTYPE_"))
  }

  test("lenient parse downgrades unmatched declarations, still rejects mistyped") {
    val base =
      """BO_ 5 W: 8 ECU
        | SG_ V : 0|32@1+ (1,0) [0|0] "" T
        |
        |""".stripMargin
    // orphaned declarations (vendor DBC referencing an unparsed subset):
    // lenient loads, strict throws
    val n = DbcParser.parseString(base + "SIG_VALTYPE_ 99 X : 1;\n", lenient = true)
    assert(n.messageById(5L).signals.head.valType == ValType.Integer)
    val n2 = DbcParser.parseString(base + "SG_MUL_VAL_ 99 X Sel 1-3;\n", lenient = true)
    assert(n2.messageById(5L).signals.head.mux == Mux.None)
    // mistyped declarations change the decode of a PRESENT signal — always fatal
    assertThrows[IllegalArgumentException](
      DbcParser.parseString(base + "SIG_VALTYPE_ 5 V : 3;\n", lenient = true))
    assertThrows[IllegalArgumentException](
      DbcParser.parseString(base + "SIG_VALTYPE_ 5 V : 1;\nSIG_VALTYPE_ 5 V : 2;\n",
        lenient = true).messageById(5L).signals: Unit) // width mismatch still throws
  }

  private val extMuxDbc =
    """BO_ 6 M: 8 ECU
      | SG_ Sel M : 0|8@1+ (1,0) [0|0] "" T
      | SG_ A m1 : 8|8@1+ (1,0) [0|0] "" T
      | SG_ B m2 : 16|8@1+ (1,0) [0|0] "" T
      |
      |SG_MUL_VAL_ 6 A Sel 1-3, 7-7;
      |""".stripMargin

  test("SG_MUL_VAL_ parses into ExtRanges replacing the simple m<N> gate") {
    val n = DbcParser.parseString(extMuxDbc)
    val m = n.messageById(6L)
    assert(m.signals.find(_.name == "A").get.mux ==
      Mux.ExtRanges(Seq((1L, 3L), (7L, 7L))))
    assert(m.signals.find(_.name == "B").get.mux == Mux.Value(2L)) // untouched
  }

  test("SG_MUL_VAL_ rejects nested/unknown switch, non-muxed targets, bad ranges") {
    // switch that is not the message's M signal → nested extended mux,
    // unsupported — must throw even lenient (silently simple-gating a
    // range-gated signal is the wrong answer the round-10 precedent bans)
    val nested = extMuxDbc.replace("SG_MUL_VAL_ 6 A Sel", "SG_MUL_VAL_ 6 A B")
    assertThrows[IllegalArgumentException](DbcParser.parseString(nested))
    assertThrows[IllegalArgumentException](DbcParser.parseString(nested, lenient = true))
    // target signal carries no m<N>
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      extMuxDbc.replace("SG_MUL_VAL_ 6 A Sel", "SG_MUL_VAL_ 6 Sel Sel")))
    // malformed range syntax / inverted range
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      extMuxDbc.replace("1-3, 7-7", "1..3")))
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      extMuxDbc.replace("1-3, 7-7", "3-1")))
    // unmatched declaration: strict throws, covered in the lenient test
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      extMuxDbc.replace("SG_MUL_VAL_ 6 A", "SG_MUL_VAL_ 6 Z")))
  }

  private val valDbc =
    """BO_ 7 M: 8 ECU
      | SG_ Gear : 0|8@1+ (1,0) [0|0] "" T
      | SG_ Other : 8|8@1+ (1,0) [0|0] "" T
      |
      |VAL_ 7 Gear 0 "neutral" 1 "first" 2 "second" -1 "fault" ;
      |""".stripMargin

  test("VAL_ value tables parse into Signal.labels in declaration order") {
    val n = DbcParser.parseString(valDbc)
    val m = n.messageById(7L)
    assert(m.signals.find(_.name == "Gear").get.labels ==
      Seq((0L, "neutral"), (1L, "first"), (2L, "second"), (-1L, "fault")))
    assert(m.signals.find(_.name == "Other").get.labels.isEmpty)
  }

  test("VAL_ rejects mistyped tables, follows the lenient rule for " +
      "unmatched, skips env-var and VAL_TABLE_ forms") {
    // unquoted label = mistyped table on a PRESENT signal — always fatal
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      valDbc.replace("0 \"neutral\"", "0 neutral")))
    // repeated value — ambiguous label, fatal
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      valDbc.replace("1 \"first\"", "0 \"first\"")))
    // unmatched message/signal: strict throws, lenient skips
    assertThrows[IllegalArgumentException](DbcParser.parseString(
      valDbc.replace("VAL_ 7 Gear", "VAL_ 99 Gear")))
    val n = DbcParser.parseString(
      valDbc.replace("VAL_ 7 Gear", "VAL_ 99 Gear"), lenient = true)
    assert(n.messageById(7L).signals.forall(_.labels.isEmpty))
    // env-var value tables and global VAL_TABLE_ are outside the subset —
    // skipped like the other unconsumed keywords
    val skipped = DbcParser.parseString(valDbc +
      "VAL_ EnvName 0 \"off\" 1 \"on\" ;\n" +
      "VAL_TABLE_ Tbl 0 \"zero\" 1 \"one\" ;\n")
    assert(skipped.messageById(7L).signals.find(_.name == "Gear").get.labels.nonEmpty)
  }
}
