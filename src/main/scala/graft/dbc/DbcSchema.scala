package graft.dbc

import org.apache.spark.sql.types._

/** Which typing table to apply when deriving the wide schema.
  *
  * The reference's integer branches are dead code — the guard
  * `Factor() < 1.0001 && Factor() > 9.9999` at
  * `/root/reference/src/decoder.cpp:45` is unsatisfiable, so de facto every
  * non-bool, non-flt32 signal lands in the scaled FLOAT/DOUBLE branch
  * (`/root/reference/src/decoder.cpp:56-63`). `Intended` implements what the
  * author clearly meant (factor == 1 ⇒ integer type); `DeFacto` reproduces
  * the shipped behavior. SURVEY.md §1.2 — default Intended.
  */
sealed trait TypingMode
object TypingMode {
  case object Intended extends TypingMode
  case object DeFacto extends TypingMode
}

/** Network → Spark wide-table schema, mirroring the reference's schema
  * builder (`/root/reference/src/decoder.cpp:15-73`): `Time_ms: double`
  * first, then one nullable column per signal in message order then
  * signal order.
  */
object DbcSchema {

  val TimeCol = "Time_ms"

  /** Spark type for one signal under the given typing mode
    * (typing table at `/root/reference/src/decoder.cpp:24-65`, SURVEY §1.2).
    *
    * Deviations from the reference's (dead) integer branches, for ANSI
    * soundness: the integer branch additionally requires a whole-number
    * offset (a factor-1 signal with offset 0.5 would silently truncate in
    * an int column), and an unsigned 32-bit signal maps to LongType — its
    * raw range exceeds Int.MaxValue, and the ANSI cast would throw.
    */
  def sparkType(sig: Signal, mode: TypingMode): DataType =
    if (sig.isFlt32) FloatType // `flt32_` reinterpret → float32 (decoder.cpp:28-37)
    // SIG_VALTYPE_-declared IEEE fields: the native width, under either
    // typing mode (the declaration IS the type; factor/offset scale within)
    else if (sig.valType == ValType.Float32) FloatType
    else if (sig.valType == ValType.Float64) DoubleType
    else if (sig.bitLen == 1) BooleanType // 1-bit → boolean (decoder.cpp:41-44)
    else mode match {
      case TypingMode.Intended if sig.factor == 1.0 && sig.offset.isWhole =>
        if (sig.bitLen < 32 || (sig.bitLen == 32 && sig.signed)) IntegerType
        else LongType // decoder.cpp:45-51 (intended guard, ANSI-sound)
      case _ =>
        if (sig.bitLen < 32) FloatType else DoubleType // scaled: decoder.cpp:56-63
    }

  def wideSchema(net: Network, mode: TypingMode = TypingMode.Intended): StructType = {
    val sigFields = net.signalsInOrder.map { case (_, s) =>
      StructField(s.name, sparkType(s, mode), nullable = true)
    }
    StructType(StructField(TimeCol, DoubleType, nullable = false) +: sigFields)
  }
}
