package graft.dbc

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Real-world DBC grammar noise (VERDICT r18 item 4): tool-exported files
  * carry `VERSION`, `NS_` keyword lists, `BS_`/`BU_`, `CM_` comments
  * (single- AND multi-line), `BA_DEF_`/`BA_` attributes, `VAL_TABLE_`
  * globals, BOM, CRLF, and blank-line noise around the `BO_`/`SG_` blocks
  * the decoder consumes — the reference tolerates all of it via dbcppp
  * (`/root/reference/CMakeLists.txt:14-20`). Property: a generator
  * interleaves random noise into a clean network and the parse must come
  * out IDENTICAL — never throw on ignorable sections, never absorb
  * statement-lookalikes from comment text.
  *
  * The named traps each get a deterministic test too:
  *   - a multi-line `CM_` whose body contains `SG_`/`BO_`/`SIG_VALTYPE_`
  *     lookalikes (without string-state tracking these inject a phantom
  *     signal / flush the current message / flip a value type);
  *   - an `NS_` keyword list naming `SIG_VALTYPE_`/`SG_MUL_VAL_` with
  *     trailing whitespace (the malformed-declaration detectors must not
  *     fire on a bare keyword entry);
  *   - a UTF-8 BOM glued to the first keyword, with CRLF endings.
  */
class DbcGrammarNoiseSpec extends AnyFunSuite {

  /** Clean base: two plain messages, a mux message, and every appendix
    * kind the parser consumes (SIG_VALTYPE_, SG_MUL_VAL_, VAL_).
    */
  private val cleanBlocks: Seq[String] = Seq(
    """BO_ 256 Engine: 8 ECU1
      | SG_ EngSpeed : 0|16@1+ (0.125,0) [0|8000] "rpm" GW
      | SG_ EngTemp : 16|8@1+ (1,-40) [-40|215] "C" GW""".stripMargin,
    """BO_ 1040 MF: 8 ECU2
      | SG_ FV : 0|32@1+ (0.5,3) [0|0] "" X
      | SG_ SEQ2 : 32|32@1+ (1,0) [0|0] "" X""".stripMargin,
    """BO_ 1632 MX: 8 ECU2
      | SG_ SEL M : 0|8@1+ (1,0) [0|0] "" X
      | SG_ EA m1 : 8|8@1+ (1,0) [0|0] "" X
      | SG_ EB m2 : 16|8@1+ (1,0) [0|0] "" X""".stripMargin,
    "SG_MUL_VAL_ 1632 EA SEL 1-3, 7-7;",
    "SIG_VALTYPE_ 1040 FV : 1;",
    """VAL_ 1632 SEL 0 "off" 1 "on";""")

  private val clean = cleanBlocks.mkString("\n", "\n\n", "\n")
  private val expected = DbcParser.parseString(clean)

  /** The multi-line CM_ trap: every body line is a statement lookalike
    * that would corrupt the parse if consumed — a phantom signal, a
    * message flush, a VAL_ on a real signal, and a SIG_VALTYPE_ that
    * would even THROW (float64 on a 32-bit field) if applied.
    */
  private val multiLineCm =
    """CM_ SG_ 256 EngSpeed "engine speed, see spec
      |BO_ 999 Phantom: 8 X
      | SG_ PhantomSig : 0|8@1+ (1,0) [0|0] "" X
      |VAL_ 256 EngSpeed 1 "bogus";
      |SIG_VALTYPE_ 1040 FV : 2;
      |end of comment";""".stripMargin

  private val nsBlock = Seq(
    "NS_ :",
    "\tNS_DESC_",
    "\tCM_",
    "\tBA_DEF_ ",
    "\tBA_ ",
    "\tVAL_ ",
    "\tCAT_DEF_",
    "\tSIG_VALTYPE_ ", // trailing whitespace: a legal NS_ entry, not a
    "\tSG_MUL_VAL_  ", // malformed declaration — must not throw
    "\tBO_TX_BU_",
    "\tVAL_TABLE_").mkString("\n")

  private def noiseBlocks(rnd: Random): Seq[String] = {
    val pool = Seq(
      "VERSION \"created by canmatrix 0.9.5\"",
      nsBlock,
      "BS_:",
      "BU_ ECU1 ECU2 GW",
      "CM_ \"network-level comment\";",
      "CM_ BU_ ECU1 \"powertrain node\";",
      "CM_ BO_ 256 \"engine frame, 10ms\";",
      "CM_ SG_ 256 EngTemp \"coolant temperature\";",
      multiLineCm,
      "BA_DEF_ SG_ \"GenSigStartValue\" FLOAT 0 100000;",
      "BA_DEF_ BO_ \"GenMsgCycleTime\" INT 0 3600000;",
      "BA_DEF_DEF_ \"GenMsgCycleTime\" 0;",
      "BA_ \"GenMsgCycleTime\" BO_ 256 100;",
      "BA_ \"GenSigStartValue\" SG_ 256 EngSpeed 0;",
      "VAL_TABLE_ OnOff 0 \"Off\" 1 \"On\";",
      "",
      "   ",
      "\t")
    rnd.shuffle(pool).take(rnd.nextInt(4))
  }

  test("property: random noise interleaved between blocks parses identically") {
    (0 until 60).foreach { iter =>
      val rnd = new Random(7000 + iter)
      val parts = Seq.newBuilder[String]
      parts ++= noiseBlocks(rnd) // leading noise (VERSION/NS_ position)
      cleanBlocks.foreach { b =>
        parts += b
        parts ++= noiseBlocks(rnd)
      }
      var text = parts.result().mkString("\n", "\n\n", "\n")
      if (rnd.nextBoolean()) text = text.replace("\n", "\r\n")
      if (rnd.nextBoolean()) text = "﻿" + text.dropWhile(_ == '\n')
      val got =
        try DbcParser.parseString(text)
        catch {
          case e: Throwable =>
            fail(s"iter $iter threw on ignorable noise: ${e.getMessage}\n$text")
        }
      assert(got == expected, s"iter $iter parse diverged under noise:\n$text")
    }
  }

  test("multi-line CM_ body never injects phantom statements") {
    // the trap comment sits right after a message block, where a phantom
    // SG_ would attach to the CURRENT message and a phantom BO_ would
    // flush it — both silent corruption without string-state tracking
    val noisy = cleanBlocks.take(3).mkString("\n", "\n\n", "\n") +
      "\n" + multiLineCm + "\n\n" + cleanBlocks.drop(3).mkString("\n", "\n", "\n")
    val got = DbcParser.parseString(noisy)
    assert(got == expected)
    assert(!got.messages.exists(_.name == "Phantom"))
    assert(!got.signalsInOrder.exists(_._2.name == "PhantomSig"))
    // the embedded `SIG_VALTYPE_ 1040 FV : 2;` would THROW if consumed
    // (float64 on a 32-bit field) — reaching here proves it was skipped
    assert(got.messageById(1040L).signals.find(_.name == "FV").get.valType
      == ValType.Float32)
  }

  test("BOM + CRLF via parseFile round-trips identically") {
    val f = java.nio.file.Files.createTempFile("noise", ".dbc")
    val bytes = ("﻿" + clean.stripPrefix("\n").replace("\n", "\r\n"))
      .getBytes("UTF-8")
    java.nio.file.Files.write(f, bytes)
    assert(DbcParser.parseFile(f.toString) == expected)
  }

  test("overlong signal fields are malformed DBC, both endiannesses") {
    // an SG_ whose field runs past the 8-byte payload would silently
    // zero-extend its out-of-payload bits if decoded — r19 makes parse
    // reject it (classic-CAN scope; CAN-FD files fail here by design)
    val intel = "BO_ 1 M: 8 E\n SG_ S : 60|8@1+ (1,0) [0|0] \"\" X\n"
    val e1 = intercept[IllegalArgumentException] {
      DbcParser.parseString(intel)
    }
    assert(e1.getMessage.contains("exceeds the 64-bit payload"), e1.getMessage)
    val moto = "BO_ 1 M: 8 E\n SG_ S : 60|16@0+ (1,0) [0|0] \"\" X\n"
    val e2 = intercept[IllegalArgumentException] {
      DbcParser.parseString(moto)
    }
    assert(e2.getMessage.contains("exceeds the 64-bit payload"), e2.getMessage)
  }

  test("unparseable SG_ lines inside a message are loud, not dropped signals") {
    // r19: a failed SG_ parse used to fall to the skip case — silent
    // schema loss. The nested-mux shape gets its own message; any other
    // malformed SG_ inside a block names the generic drop hazard. An
    // orphan SG_ before any BO_ still skips (no message to lose it from).
    val nested = "BO_ 1 M: 8 E\n SG_ SEL M : 0|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S2 m1M : 8|8@1+ (1,0) [0|0] \"\" X\n"
    val e1 = intercept[IllegalArgumentException] {
      DbcParser.parseString(nested)
    }
    assert(e1.getMessage.contains("m<N>M"), e1.getMessage)
    val mangled = "BO_ 1 M: 8 E\n SG_ S : 0|8@1 (1,0) [0|0] \"\" X\n" // no sign
    val e2 = intercept[IllegalArgumentException] {
      DbcParser.parseString(mangled)
    }
    assert(e2.getMessage.contains("malformed SG_"), e2.getMessage)
    // orphan SG_ with no open message: ignorable, like today
    val orphan = "SG_ S : 0|8@1+ (1,0) [0|0] \"\" X\n" + clean.stripPrefix("\n")
    assert(DbcParser.parseString(orphan) == expected)
  }

  test("lenient mode drops ONLY the unparseable SG_ signal, keeping the " +
      "rest of the file (r19 ADVICE: the m<N>M vendor-DBC case)") {
    // dbcppp parses extended-mux-multiplexor signals; our mux model does
    // not — lenient must degrade to the pre-r19 behavior (signal dropped)
    // WITH a warning, instead of failing the whole file
    val nested = "BO_ 1 M: 8 E\n SG_ SEL M : 0|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S2 m1M : 8|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S3 m1 : 16|8@1+ (1,0) [0|0] \"\" X\n"
    val n = DbcParser.parseString(nested, lenient = true)
    assert(n.messageById(1L).signals.map(_.name) == Seq("SEL", "S3"),
      "only the m<N>M signal drops; its siblings parse")
    val mangled = "BO_ 1 M: 8 E\n SG_ OK : 0|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S : 8|8@1 (1,0) [0|0] \"\" X\n" // no sign — unparseable
    val n2 = DbcParser.parseString(mangled, lenient = true)
    assert(n2.messageById(1L).signals.map(_.name) == Seq("OK"))
    // the full clean corpus is untouched by lenient mode
    assert(DbcParser.parseString(clean, lenient = true) == expected)
    // the REALISTIC vendor shape: extended mux always comes with
    // SG_MUL_VAL_ lines. A dependent whose declared switch is the
    // dropped m<N>M signal degrades WITH it (never simple-gated, never
    // failing the file); dependents of the surviving top switch keep
    // their ranges.
    val vendor = "BO_ 1 M: 8 E\n SG_ SEL M : 0|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S2 m1M : 8|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S3 m1 : 16|8@1+ (1,0) [0|0] \"\" X\n" +
      " SG_ S4 m2 : 24|8@1+ (1,0) [0|0] \"\" X\n" +
      "SG_MUL_VAL_ 1 S3 S2 2-2;\n" + // gate on the DROPPED switch
      "SG_MUL_VAL_ 1 S4 SEL 2-3;\n" // gate on the surviving top switch
    val nv = DbcParser.parseString(vendor, lenient = true)
    assert(nv.messageById(1L).signals.map(_.name) == Seq("SEL", "S4"),
      "S2 (m<N>M) and its dependent S3 degrade together; S4 survives")
    assert(nv.messageById(1L).signals.find(_.name == "S4").get.mux ==
      Mux.ExtRanges(Seq((2L, 3L))))
    // strict mode still fails the same file at the SG_ line
    assertThrows[IllegalArgumentException](DbcParser.parseString(vendor))
  }

  test("a quoted string still open at EOF is loud: strict throws, " +
      "lenient warns and parses the prefix (swallowed-tail corruption)") {
    // one corrupted odd-quote line flips the parser into string mode and
    // every following statement — including whole messages — reads as
    // comment text; without the EOF check that is silent schema loss
    val tail = clean +
      "\nCM_ BO_ 1040 \"corrupted comment with no closing quote\n" +
      "BO_ 9 Tail: 8 E\n SG_ T : 0|8@1+ (1,0) [0|0] \"\" X\n"
    val e = intercept[IllegalArgumentException] {
      DbcParser.parseString(tail)
    }
    assert(e.getMessage.contains("unterminated quoted string"), e.getMessage)
    assert(e.getMessage.contains("CM_ BO_ 1040"), e.getMessage)
    // lenient: the pre-opener prefix parses; the swallowed tail is warned
    val n = DbcParser.parseString(tail, lenient = true)
    assert(n == expected, "lenient parse keeps everything before the opener")
    // a LEGAL multi-line comment that closes before EOF stays accepted
    assert(DbcParser.parseString(clean + "\n" + multiLineCm + "\n") == expected)
  }

  test("relaxed malformed-detectors still reject real malformed declarations") {
    val badValType = clean + "\nSIG_VALTYPE_ 1040 FV : 3;\n"
    val e1 = intercept[IllegalArgumentException] {
      DbcParser.parseString(badValType)
    }
    assert(e1.getMessage.contains("SIG_VALTYPE_"), e1.getMessage)
    val badMulVal = clean + "\nSG_MUL_VAL_ 1632 EA SEL 1-x;\n"
    val e2 = intercept[IllegalArgumentException] {
      DbcParser.parseString(badMulVal)
    }
    assert(e2.getMessage.contains("SG_MUL_VAL_"), e2.getMessage)
  }
}
