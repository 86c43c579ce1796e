package graft.dbc

import scala.io.Source

/** Multiplex role of a signal within its message.
  *
  * Mirrors the reference's mux gating (`/root/reference/src/decoder.cpp:85-88`):
  * a `MuxValue(n)` signal is decoded only when the message's `MuxSwitch`
  * signal decodes to `n`.
  */
sealed trait Mux
object Mux {
  case object None extends Mux
  case object Switch extends Mux // "M" — the selector signal
  final case class Value(switchValue: Long) extends Mux // "mN"
  /** Extended multiplexing (`SG_MUL_VAL_`): the signal is decoded when the
    * message's mux switch is within ANY of the inclusive ranges — the
    * standard-DBC generalization of the single `mN` value. (The reference's
    * own decode loop is simple-mux only, `/root/reference/src/decoder.cpp:85-88`;
    * this is a beyond-reference capability, previously a silent wrong
    * answer: the declaration was skipped and the signal gated on its `mN`
    * value alone.)
    */
  final case class ExtRanges(ranges: Seq[(Long, Long)]) extends Mux
}

/** Native value type of a signal, declared by a `SIG_VALTYPE_` line
  * (`SIG_VALTYPE_ <msgId> <sigName> : <type>;` — 0 integer, 1 IEEE 754
  * float32, 2 IEEE 754 float64). This is the standard-DBC way to mark a
  * raw field as a float — the construct the reference consumes implicitly
  * through dbcppp's typed `Decode` (`/root/reference/src/decoder.cpp:87`;
  * its own schema builder would mistype such signals,
  * `/root/reference/src/decoder.cpp:45-63`) and distinct from the
  * reference's `flt32_`-name convention, which graft also supports.
  */
sealed trait ValType
object ValType {
  case object Integer extends ValType
  case object Float32 extends ValType
  case object Float64 extends ValType
}

/** One DBC signal definition.
  *
  * Field semantics follow the Vector DBC `SG_` line as consumed by the
  * reference via dbcppp (`/root/reference/src/decoder.cpp:17-73`):
  *
  *   SG_ <name> [M|m<N>] : <startBit>|<bitLen>@<order><sign> (<factor>,<offset>) [<min>|<max>] "<unit>" <receivers>
  *
  * `littleEndian` = `@1` (Intel); `@0` is Motorola big-endian with DBC
  * "sawtooth" start-bit numbering (start bit = MSB position, bytewise
  * MSB-first — see [[Signal.motorolaMsbPos]]).
  *
  * `isFlt32`: the reference's `flt32_` convention
  * (`/root/reference/README.md:58`, `/root/reference/src/decoder.cpp:28-37`):
  * the raw 32-bit little-endian field is reinterpreted as an IEEE-754 float
  * and the column is named with the prefix stripped. The reference's live
  * wiring of this feature is broken (looks up the unstripped name in the
  * stripped schema, `/root/reference/src/decoder.cpp:92-118`); we implement
  * the documented semantics.
  */
final case class Signal(
    name: String,
    startBit: Int,
    bitLen: Int,
    littleEndian: Boolean,
    signed: Boolean,
    factor: Double,
    offset: Double,
    min: Double,
    max: Double,
    unit: String,
    mux: Mux,
    isFlt32: Boolean,
    valType: ValType = ValType.Integer,
    labels: Seq[(Long, String)] = Nil
) {
  require(bitLen >= 1 && bitLen <= 64, s"signal $name: bitLen $bitLen out of [1,64]")
  require(startBit >= 0 && startBit < 64, s"signal $name: startBit $startBit out of [0,64)")
  // the whole field must fit the classic-CAN 8-byte payload: an overlong
  // declaration is a malformed DBC (or a CAN-FD file, out of scope), and
  // decoding it would silently zero-extend the out-of-payload bits
  require(!littleEndian || startBit + bitLen <= 64,
    s"signal $name: intel field [$startBit, ${startBit + bitLen}) exceeds the 64-bit payload")
  require(littleEndian || motorolaMsbPos + bitLen <= 64,
    s"signal $name: motorola field (msb pos $motorolaMsbPos + len $bitLen) exceeds the 64-bit payload")

  /** For Motorola (`@0`) signals: the bit offset of the signal's MSB counted
    * from the left of the big-endian byte string (byte 0 = most significant).
    * DBC numbers bits within each byte LSB=0..MSB=7, so DBC start bit `s`
    * maps to position `(s/8)*8 + (7 - s%8)` from the left.
    */
  def motorolaMsbPos: Int = (startBit / 8) * 8 + (7 - startBit % 8)

  /** Unsigned mask for the raw field; full -1L when bitLen == 64. */
  def mask: Long = if (bitLen >= 64) -1L else (1L << bitLen) - 1L

  /** True when factor/offset are the identity (raw == physical). */
  def isIdentityScale: Boolean = factor == 1.0 && offset == 0.0
}

/** One DBC message (`BO_ <id> <name>: <dlc> <sender>`). CAN ids above
  * 0x7FF are extended-frame; the DBC encodes the extended flag in bit 31,
  * which we mask off like dbcppp does.
  */
final case class Message(
    id: Long,
    name: String,
    dlc: Int,
    signals: Seq[Signal]
) {
  def muxSwitch: Option[Signal] = signals.find(_.mux == Mux.Switch)
}

/** The parsed network: an ordered list of messages (DBC file order —
  * the reference flattens schema columns in message order then signal
  * order, `/root/reference/src/decoder.cpp:17-73`, and we preserve that).
  */
final case class Network(messages: Seq[Message]) {
  def signalsInOrder: Seq[(Message, Signal)] =
    messages.flatMap(m => m.signals.map(s => (m, s)))
  def messageById: Map[Long, Message] = messages.map(m => m.id -> m).toMap
}

/** Pure-Scala parser for the DBC subset the reference consumes
  * (`BO_` messages and `SG_` signals incl. multiplexer markers).
  * Everything else (VERSION, NS_, BU_, comments, attributes, value
  * tables) is skipped — the reference's schema derivation only uses
  * messages and signals (`/root/reference/src/decoder.cpp:15-73`).
  *
  * The `flt32_` prefix is handled here: name stripped, `isFlt32` set —
  * fixing the reference's broken decode wiring (SURVEY.md §1.2).
  */
object DbcParser {

  private val BoRe = """^BO_\s+(\d+)\s+([A-Za-z0-9_]+)\s*:\s*(\d+)\s+(\S+)\s*$""".r
  // SG_ Name [M|mN] : start|len@order[+-] (factor,offset) [min|max] "unit" receivers
  private val SgRe =
    ("""^\s*SG_\s+([A-Za-z0-9_]+)\s*(M|m\d+)?\s*:\s*""" +
      """(\d+)\|(\d+)@([01])([+-])\s*""" +
      """\(\s*([^,()]+)\s*,\s*([^,()]+)\s*\)\s*""" +
      """\[\s*([^|\]]+)\s*\|\s*([^|\]]+)\s*\]\s*""" +
      """"([^"]*)"\s*(.*)$""").r
  // an SG_ line inside a message block that SgRe cannot parse is a
  // DROPPED SIGNAL — silent schema loss — so it fails loudly like the
  // malformed-declaration detectors. The one shape named specially:
  // `m<N>M` (extended multiplexed multiplexor — a signal that is both
  // gated and a switch), which dbcppp accepts but this engine's
  // single-switch mux model deliberately does not (applyMulVals rejects
  // nested switches for the same reason).
  private val SgNestedMuxRe = """^\s*SG_\s+(\S+)\s+m\d+M\s*:.*$""".r
  // name capture restricted to identifier characters: a malformed line
  // whose first token is NOT a plausible signal name (`SG_ : 0|8@1+ ...`)
  // must not record a meaningless key like ':' in droppedSigs (nor have
  // the warning assert that token is a name) — nameless lines fall to
  // SgNamelessRe and are reported as unparseable without a name claim.
  private val SgMalformedRe = """^\s*SG_\s+([A-Za-z0-9_]+).*$""".r
  private val SgNamelessRe = """^\s*SG_\b.*$""".r
  // SIG_VALTYPE_ msgId SigName : type;   (0 int, 1 float32, 2 float64)
  private val ValTypeRe =
    """^\s*SIG_VALTYPE_\s+(\d+)\s+([A-Za-z0-9_]+)\s*:\s*([012])\s*;?\s*$""".r
  // any other SIG_VALTYPE_ shape: the type code is not 0/1/2 → malformed,
  // rejected explicitly rather than silently skipped (a type-3 extended
  // declaration decoded as integer would be a silent wrong answer).
  // `\s+\S` (not `\s+.*`): an NS_ section's keyword list names these very
  // keywords as bare indented entries, and machine-generated files carry
  // trailing whitespace — "\tSIG_VALTYPE_ " is a legal NS_ entry, not a
  // malformed declaration; a real declaration always has arguments.
  private val ValTypeMalformedRe =
    """^\s*SIG_VALTYPE_\s+\S.*$""".r
  // SG_MUL_VAL_ msgId SigName SwitchName lo1-hi1[, lo2-hi2...];
  private val MulValRe =
    """^\s*SG_MUL_VAL_\s+(\d+)\s+([A-Za-z0-9_]+)\s+([A-Za-z0-9_]+)\s+(.+?)\s*;?\s*$""".r
  private val MulValMalformedRe = // \s+\S: see ValTypeMalformedRe
    """^\s*SG_MUL_VAL_\s+\S.*$""".r
  private val RangeRe = """^(\d+)\s*-\s*(\d+)$""".r
  // VAL_ msgId SigName v1 "label1" v2 "label2" ... ;  (value tables —
  // parsed by the reference's dbcppp as IValueEncodingDescription even
  // though its decode keeps values numeric). The keyword requires
  // whitespace after VAL_, so global `VAL_TABLE_` definitions (a
  // different keyword, no message scope) fall through to the skip case.
  private val ValLabelsRe =
    """^\s*VAL_\s+(\d+)\s+([A-Za-z0-9_]+)\s+(.*?)\s*;?\s*$""".r
  private val LabelPairRe = """(-?\d+)\s+"([^"]*)"""".r

  def parseFile(path: String, lenient: Boolean = false): Network = {
    // explicit UTF-8 with REPLACE: the platform default codec (ASCII in
    // minimal containers) THROWS on a BOM or any non-ASCII comment byte,
    // and real-world DBC exports carry both (latin-1 vendor comments,
    // tool-written BOMs). Replacement can only mangle free-text inside
    // comments/units — every structural token is ASCII.
    val codec = new scala.io.Codec(java.nio.charset.StandardCharsets.UTF_8)
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val src = Source.fromFile(path)(codec)
    try parse(src.getLines(), lenient) finally src.close()
  }

  def parseString(content: String, lenient: Boolean = false): Network =
    parse(content.linesIterator, lenient)

  /** `lenient = true` downgrades three classes of defect from an error
    * to a warning: UNMATCHED `SIG_VALTYPE_`/`SG_MUL_VAL_` declarations
    * (message id / signal name matching nothing parsed — e.g. a vendor
    * DBC referencing messages outside the parsed subset); unparseable
    * `SG_` lines (including the extended-mux-multiplexor `m<N>M` form,
    * which dbcppp accepts) — the offending SIGNAL is dropped, everything
    * else parses, and a `SG_MUL_VAL_` dependent whose switch was dropped
    * degrades with it (see [[applyMulVals]]); and a quoted string still
    * open at EOF (the swallowed
    * tail is warned about instead of throwing). Mistyped declarations
    * that would change the decode of a signal that IS present (bad type
    * code, bad range syntax, width mismatch, unknown mux switch) always
    * throw, in both modes.
    */
  def parse(lines: Iterator[String], lenient: Boolean = false): Network = {
    val messages = Seq.newBuilder[Message]
    var current: Option[(Long, String, Int)] = None
    var sigs = Seq.newBuilder[Signal]
    // SIG_VALTYPE_ lines appear after all message blocks; collected here
    // and applied once every message is flushed
    val valTypes = Map.newBuilder[(Long, String), ValType]
    val mulVals = Map.newBuilder[(Long, String), (String, Seq[(Long, Long)])]
    val valLabels = Map.newBuilder[(Long, String), Seq[(Long, String)]]
    // (msgId, sigName) of signals the LENIENT parse dropped — consumed by
    // applyMulVals to degrade dependents of a dropped switch (see below)
    val droppedSigs = Set.newBuilder[(Long, String)]

    def flush(): Unit = {
      current.foreach { case (id, name, dlc) =>
        messages += Message(id, name, dlc, sigs.result())
      }
      current = None
      sigs = Seq.newBuilder[Signal]
    }

    // Multi-line quoted strings (CM_ comments legally span lines in
    // real-world DBC): a statement line with an ODD number of quotes
    // opens a string that continues on following lines until a line
    // restores quote parity. Continuation lines are comment TEXT, never
    // statements — without this state, a comment line that happens to
    // look like `SG_ ...` would inject a phantom signal into whatever
    // message is current. (Heuristic limit, shared with dbcppp-naive
    // lexers: a stray quote inside the comment body resynchronizes one
    // line early; DBC strings have no escape syntax to do better with.)
    // The opener is tracked so a string still open at EOF — one corrupted
    // odd-quote line silently swallowing every following statement,
    // including SG_ lines — is loud (a dropped file TAIL is the same
    // silent-schema-loss failure mode the SgMalformedRe guard closes).
    var inString = false
    var stringOpener: String = null
    var stringOpenerLineNo = 0
    var lineNo = 0
    var first = true
    for (raw <- lines) {
      lineNo += 1
      val stripped = raw.replaceAll("[\r\n]+$", "")
      // UTF-8 BOM on the first line (common in tool-exported files) would
      // otherwise glue to the first keyword and skip it silently
      val line = if (first) stripped.stripPrefix("\uFEFF") else stripped
      first = false
      if (inString) {
        if (line.count(_ == '"') % 2 == 1) { inString = false; stringOpener = null }
      } else {
      line match {
        case BoRe(id, name, dlc, _) =>
          flush()
          // mask the extended-frame flag (bit 31) like dbcppp's IMessage::Id
          current = Some(((id.toLong & 0x1FFFFFFFL), name, dlc.toInt))
        case SgRe(name, muxStr, start, len, order, sign, factor, offset, mn, mx, unit, _)
            if current.isDefined =>
          val mux = Option(muxStr) match {
            case None        => Mux.None
            case Some("M")   => Mux.Switch
            case Some(m)     => Mux.Value(m.drop(1).toLong)
          }
          val isFlt = name.startsWith("flt32_")
          sigs += Signal(
            name = if (isFlt) name.stripPrefix("flt32_") else name,
            startBit = start.toInt,
            bitLen = len.toInt,
            littleEndian = order == "1",
            signed = sign == "-",
            factor = factor.trim.toDouble,
            offset = offset.trim.toDouble,
            min = mn.trim.toDouble,
            max = mx.trim.toDouble,
            unit = unit,
            mux = mux,
            isFlt32 = isFlt
          )
        // Unparseable SG_ lines: strict mode fails loudly (the signal
        // would otherwise vanish from the schema without a trace);
        // lenient mode logs and drops ONLY the offending signal, so a
        // vendor DBC carrying one extended-mux-multiplexor signal (legal
        // DBC, parsed by the reference's dbcppp) still yields the rest of
        // the file. Dropped names are RECORDED: a SG_MUL_VAL_ naming a
        // dropped signal as its switch makes its target's gate
        // unrepresentable, and applyMulVals drops that dependent too
        // (never simple-gates it — the round-10 rule) instead of failing
        // the file the lenient parse just saved.
        case SgNestedMuxRe(nm) if current.isDefined =>
          val msg = "extended multiplexed multiplexor (m<N>M) is " +
            s"unsupported — the mux model is single-switch per message: $line"
          if (lenient) {
            log.warn(msg + " — signal dropped (lenient parse)")
            droppedSigs += ((current.get._1, nm))
          } else throw new IllegalArgumentException(msg)
        case SgMalformedRe(nm) if current.isDefined =>
          val msg =
            s"malformed SG_ line (the signal would be silently dropped): $line"
          if (lenient) {
            log.warn(msg + " — signal dropped (lenient parse)")
            droppedSigs += ((current.get._1, nm))
          } else throw new IllegalArgumentException(msg)
        case SgNamelessRe() if current.isDefined =>
          // no identifier-shaped token after SG_ — nothing to record in
          // droppedSigs (there is no name a SG_MUL_VAL_ could reference)
          val msg = s"unparseable SG_ line with no signal name: $line"
          if (lenient) log.warn(msg + " — line dropped (lenient parse)")
          else throw new IllegalArgumentException(msg)
        case ValTypeRe(id, name, t) =>
          val vt = t match {
            case "1" => ValType.Float32
            case "2" => ValType.Float64
            case _   => ValType.Integer // "0": explicit default
          }
          valTypes += ((id.toLong & 0x1FFFFFFFL, name) -> vt)
        case ValTypeMalformedRe() =>
          throw new IllegalArgumentException(
            s"malformed SIG_VALTYPE_ declaration (type code must be 0, 1 or 2): $line")
        case MulValRe(id, sig, sw, rangeStr) =>
          val ranges = rangeStr.split(",").toSeq.map(_.trim).map {
            case RangeRe(lo, hi) =>
              val (l, h) = (lo.toLong, hi.toLong)
              require(l <= h, s"SG_MUL_VAL_ range $l-$h is inverted: $line")
              (l, h)
            case bad => throw new IllegalArgumentException(
              s"malformed SG_MUL_VAL_ range '$bad' (want lo-hi): $line")
          }
          mulVals += ((id.toLong & 0x1FFFFFFFL, sig) -> (sw, ranges))
        case MulValMalformedRe() =>
          throw new IllegalArgumentException(
            s"malformed SG_MUL_VAL_ declaration: $line")
        case ValLabelsRe(id, sig, body) =>
          val pairs = LabelPairRe.findAllMatchIn(body)
            .map(m => (m.group(1).toLong, m.group(2))).toSeq
          // the pair list must consume the whole body: leftover junk means
          // a mistyped table (e.g. an unquoted label), which would silently
          // drop labels of a signal that IS present
          val residue = LabelPairRe.replaceAllIn(body, "").trim
          require(pairs.nonEmpty && residue.isEmpty,
            s"malformed VAL_ declaration (want: v \"label\" pairs): $line")
          require(pairs.map(_._1).distinct.size == pairs.size,
            s"VAL_ declaration repeats a value: $line")
          valLabels += ((id.toLong & 0x1FFFFFFFL, sig) -> pairs)
        // a VAL_ line with no leading message id is an environment-variable
        // value table (`VAL_ <EnvVarName> ...`) — legal DBC outside our
        // subset, skipped with the other unconsumed keywords below
        case _ => // skip: VERSION, NS_, BS_, BU_, CM_, BA_, VAL_TABLE_, blank, ...
      }
      if (line.count(_ == '"') % 2 == 1) {
        inString = true; stringOpener = line; stringOpenerLineNo = lineNo
      }
      }
    }
    if (inString) {
      // every statement from the opener to EOF was consumed as string
      // text — if the opener was a corrupted line rather than a real
      // multi-line comment, that is a silently-dropped file tail
      val msg = "unterminated quoted string at EOF — every statement " +
        s"after line $stringOpenerLineNo was read as string text, not " +
        s"parsed; opener: $stringOpener"
      if (lenient) log.warn(msg + " (lenient parse)")
      else throw new IllegalArgumentException(msg)
    }
    flush()
    applyValLabels(
      applyMulVals(
        applyValTypes(Network(messages.result()), valTypes.result(), lenient),
        mulVals.result(), lenient, droppedSigs.result()),
      valLabels.result(), lenient)
  }

  /** Attaches collected `SIG_VALTYPE_` declarations to their signals.
    * The declaration carries the DBC-file signal name, so a `flt32_`-
    * prefixed signal (whose parsed name is stripped) matches under either
    * spelling. IEEE widths are validated here: a float32 declaration on a
    * non-32-bit field (or float64 on non-64-bit) is a malformed DBC —
    * and so is a declaration whose message id / signal name matches no
    * parsed signal (a typo'd declaration would otherwise silently decode
    * the intended signal as integer).
    */
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def unmatchedDecl(what: String, keys: Iterable[(Long, String)],
      lenient: Boolean): Unit = {
    if (keys.nonEmpty) {
      val msg = s"$what declarations match no signal (typo or wrong " +
        "message id): " +
        keys.toSeq.sorted.map { case (id, n) => s"$id $n" }.mkString("; ")
      if (lenient) log.warn(msg + " — skipped (lenient parse)")
      else throw new IllegalArgumentException(msg)
    }
  }

  /** Declaration lookup shared by the per-signal appendix appliers: a
    * `flt32_`-prefixed signal (parsed name stripped) matches its
    * declaration under either spelling; the matched key is recorded so
    * the caller can report unmatched declarations afterwards.
    */
  private def lookupDecl[T](m: Message, s: Signal,
      decls: Map[(Long, String), T],
      matched: scala.collection.mutable.Builder[(Long, String), Set[(Long, String)]]): Option[T] = {
    val key = ((m.id, s.name): (Long, String))
    val altKey = if (s.isFlt32) Some((m.id, "flt32_" + s.name)) else None
    decls.get(key).map { t => matched += key; t }
      .orElse(altKey.flatMap(k => decls.get(k).map { t => matched += k; t }))
  }

  private def applyValTypes(net: Network,
      vt: Map[(Long, String), ValType], lenient: Boolean): Network = {
    if (vt.isEmpty) net
    else {
      val matched = Set.newBuilder[(Long, String)]
      val out = Network(net.messages.map { m =>
        m.copy(signals = m.signals.map { s =>
          lookupDecl(m, s, vt, matched) match {
            case None | Some(ValType.Integer) => s
            case Some(t @ ValType.Float32) =>
              require(s.bitLen == 32,
                s"SIG_VALTYPE_ float32 on ${m.name}.${s.name}: bitLen ${s.bitLen} != 32")
              s.copy(valType = t)
            case Some(t @ ValType.Float64) =>
              require(s.bitLen == 64,
                s"SIG_VALTYPE_ float64 on ${m.name}.${s.name}: bitLen ${s.bitLen} != 64")
              s.copy(valType = t)
          }
        })
      })
      unmatchedDecl("SIG_VALTYPE_", vt.keySet -- matched.result(), lenient)
      out
    }
  }

  /** Attaches collected `SG_MUL_VAL_` declarations: the named signal's mux
    * gate becomes the declared range set ([[Mux.ExtRanges]]), replacing its
    * simple `m<N>` value. Always rejected (even lenient): a declaration
    * whose switch is a PRESENT signal other than the message's `M` signal
    * — nested (multiplexed-multiplexor) extended muxing is unsupported and
    * decoding it with simple semantics would be silently wrong — or one
    * naming a signal that is not multiplexed at all. One lenient carve-out
    * (`dropped`): if the declared switch is a signal the lenient parse
    * already dropped (an m<N>M multiplexor), the target's gate is
    * unrepresentable, so the TARGET is dropped too with a warning — the
    * whole extended-mux cluster degrades together; simple-gating the
    * survivor would decode wrongly (the round-10 rule), and throwing would
    * fail the exact vendor file the lenient SG_ drop just saved (real
    * extended-mux DBC always carries SG_MUL_VAL_ lines). Unmatched
    * (message/signal absent) follows the [[applyValTypes]] lenient rule.
    */
  private def applyMulVals(net: Network,
      mv: Map[(Long, String), (String, Seq[(Long, Long)])],
      lenient: Boolean,
      dropped: Set[(Long, String)] = Set.empty): Network = {
    if (mv.isEmpty) net
    else {
      val matched = Set.newBuilder[(Long, String)]
      val out = Network(net.messages.map { m =>
        m.copy(signals = m.signals.flatMap { s =>
          lookupDecl(m, s, mv, matched) match {
            case None => Some(s)
            case Some((sw, ranges))
                if dropped((m.id, sw)) && !m.signals.exists(_.name == sw) =>
              // dropped is non-empty only under lenient (strict threw at
              // the SG_ line); checked before resolving the top switch so
              // a message whose ONLY multiplexor was dropped degrades too.
              // The absence check keeps the carve-out honest: a malformed
              // SG_ line whose captured token happens to COLLIDE with the
              // name of a signal that parsed fine must not drop that
              // signal's valid SG_MUL_VAL_ dependents — a PRESENT switch
              // always takes the normal ExtRanges path below
              log.warn(s"SG_MUL_VAL_ on ${m.name}.${s.name}: switch '$sw' " +
                "was dropped by the lenient parse (unsupported m<N>M " +
                "multiplexor) — dropping this range-gated signal too; its " +
                "gate cannot be represented and simple-gating it would " +
                "decode wrongly")
              None
            case Some((sw, ranges)) =>
              val topSwitch = m.muxSwitch.getOrElse(throw new IllegalArgumentException(
                s"SG_MUL_VAL_ on ${m.name}.${s.name}: message has no mux switch"))
              require(topSwitch.name == sw,
                s"SG_MUL_VAL_ on ${m.name}.${s.name}: switch '$sw' is not the " +
                  s"message's mux switch '${topSwitch.name}' — nested extended " +
                  "multiplexing is unsupported")
              require(s.mux.isInstanceOf[Mux.Value],
                s"SG_MUL_VAL_ on ${m.name}.${s.name}: signal is not multiplexed (no m<N>)")
              Some(s.copy(mux = Mux.ExtRanges(ranges)))
          }
        })
      })
      unmatchedDecl("SG_MUL_VAL_", mv.keySet -- matched.result(), lenient)
      out
    }
  }

  /** Attaches collected `VAL_` value tables to their signals (declaration
    * order preserved). Decode stays numeric — labels are opt-in via
    * [[graft.can.SignalDecoder.withLabels]] — matching the reference,
    * whose dbcppp parses value encodings while its decode path never
    * applies them. Unmatched declarations follow the [[applyValTypes]]
    * lenient rule.
    */
  private def applyValLabels(net: Network,
      vl: Map[(Long, String), Seq[(Long, String)]], lenient: Boolean): Network = {
    if (vl.isEmpty) net
    else {
      val matched = Set.newBuilder[(Long, String)]
      val out = Network(net.messages.map { m =>
        m.copy(signals = m.signals.map { s =>
          lookupDecl(m, s, vl, matched) match {
            case None => s
            case Some(pairs) => s.copy(labels = pairs)
          }
        })
      })
      unmatchedDecl("VAL_", vl.keySet -- matched.result(), lenient)
      out
    }
  }
}
