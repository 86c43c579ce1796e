package graft.can

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test: [[CandumpParser.readLogFidelity]] vs a plain-Scala replay
  * of the reference reader's sequential `initialize`/`getPacket` loop
  * (`/root/reference/src/inputs/fileInput.cpp:16-43`) over randomized logs.
  * The quirk arithmetic (first-frame discard; a run of >= 5 bad lines after
  * a good line ends the stream; leading bad lines skipped unboundedly) is
  * exactly the off-by-one territory example-based tests miss — the
  * generator biases bad-run lengths around the 5-line boundary.
  */
class FidelityPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val lineRe = CandumpParser.LineRe.r

  /** The reference's sequential loop in plain Scala: returns the surviving
    * (ts_ms, can_id) sequence. t0 = first good frame's ts (file order).
    */
  private def sequentialReference(lines: IndexedSeq[String],
      discardFirst: Boolean, eofBadRun: Int): Seq[(Double, Long)] = {
    def parse(l: String): Option[(Long, Long)] = l match {
      case lineRe(sec, frac, _, idHex, _) =>
        val tsUs = sec.toLong * 1000000L + (frac.take(6) + "0" * (6 - math.min(6, frac.length))).toLong
        Some((tsUs, java.lang.Long.parseLong(idHex, 16)))
      case _ => None
    }
    val firstIdx = lines.indexWhere(parse(_).isDefined)
    if (firstIdx < 0) return Seq.empty
    val t0 = parse(lines(firstIdx)).get._1
    val out = Seq.newBuilder[(Double, Long)]
    if (!discardFirst) out += (((parse(lines(firstIdx)).get._1 - t0) / 1000.0, parse(lines(firstIdx)).get._2))
    var badRun = 0
    var j = firstIdx + 1
    var eof = false
    while (j < lines.length && !eof) {
      parse(lines(j)) match {
        case Some((ts, id)) =>
          out += (((ts - t0) / 1000.0, id))
          badRun = 0
        case None =>
          badRun += 1
          if (badRun >= eofBadRun) eof = true
      }
      j += 1
    }
    out.result()
  }

  test("readLogFidelity matches the sequential reference loop on 200 random logs") {
    val rnd = new scala.util.Random(20260812L)
    val ifaces = Vector("can0", "can1", "vcan0")
    def goodLine(): String = {
      val sec = 1694651000L + rnd.nextInt(100000)
      val frac = rnd.nextInt(4) match {
        case 0 => "" // integer-second timestamp, no fraction
        case 1 => f"${rnd.nextInt(1000)}%03d"
        case _ => f"${rnd.nextInt(1000000)}%06d"
      }
      val id = rnd.nextInt(0x800)
      val nBytes = rnd.nextInt(9)
      val data =
        if (nBytes == 0 && rnd.nextBoolean()) "R" // remote frame
        else Array.fill(nBytes)(f"${rnd.nextInt(256)}%02X").mkString
      val ws = if (rnd.nextInt(5) == 0) "  " else " "
      val fracPart = if (frac.isEmpty) "" else s".$frac"
      s"($sec$fracPart)$ws${ifaces(rnd.nextInt(3))} ${id.toHexString.toUpperCase}#$data"
    }
    def badLine(): String = rnd.nextInt(6) match {
      case 0 => ""
      case 1 => "garbage text with no structure"
      case 2 => s"(16946510XX.123456) can0 1A3#DEAD" // bad seconds
      case 3 => s"1694651000.123456 can0 1A3#DEAD" // missing parens
      case 4 => s"(1694651000.123456) can0 #DEAD" // missing id
      case 5 => s"(1694651000.123456) can0 1A3ZZ#DEAD" // bad hex id
    }
    (1 to 200).foreach { trial =>
      // logs built from alternating random-length runs of good and bad
      // lines; bad-run lengths biased around the eofBadRun=5 boundary
      val nRuns = 1 + rnd.nextInt(8)
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until nRuns).foreach { _ =>
        if (rnd.nextBoolean()) lines ++= Seq.fill(rnd.nextInt(6))(goodLine())
        else {
          val runLen = rnd.nextInt(4) match {
            case 0 => 3 + rnd.nextInt(5) // 3..7: straddles the boundary
            case 1 => 4
            case 2 => 5
            case _ => rnd.nextInt(10)
          }
          lines ++= Seq.fill(runLen)(badLine())
        }
      }
      val discardFirst = rnd.nextBoolean()
      val expected = sequentialReference(lines.toIndexedSeq, discardFirst, 5)
      val f = Files.createTempFile("fidelity", ".log")
      try {
        Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        val got = CandumpParser
          .readLogFidelity(spark, f.toString, adjustTimestamp = true,
            discardFirstFrame = discardFirst)
          .select("ts_ms", "can_id").collect()
          .map(r => (r.getDouble(0), r.getLong(1)))
        // fidelity mode preserves file order is not part of the contract
        // (the final parse is distributed) — compare as multisets
        assert(got.sorted.toSeq == expected.sorted,
          s"trial $trial (discardFirst=$discardFirst, ${lines.size} lines):\n" +
            s"  got      ${got.sorted.toSeq}\n  expected ${expected.sorted}\n" +
            s"  log:\n${lines.mkString("    ", "\n    ", "")}")
      } finally Files.delete(f)
    }
  }
}
