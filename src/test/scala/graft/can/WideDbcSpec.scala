package graft.can

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import graft.SparkTestSession
import graft.dbc._

/** Fleet-scale DBC shape: real networks carry hundreds of signals across
  * dozens of messages (the reference's wide sparse table, SURVEY §1.1; its
  * own `fs.dbc` workflow). Generates N-message × 4-signal networks and
  * checks the compiled decode for correctness (sampled goldens vs the
  * independent bit reference) AND for the execution-mode guarantees the
  * width depends on: the wide projection must stay inside whole-stage
  * codegen (`GraftSession.CodegenMaxFields` > width), and — because Spark
  * cannot split a projection's `doConsume` — the generated methods must
  * stay JIT-friendly, which only holds because each signal's tree is
  * outlined into its own method ([[graft.plans.Outline]]). Without
  * outlining, 129 columns generate one 25 KB interpreted-only method and
  * 513 columns fail Janino's 64 KB hard limit outright (measured round 9).
  *
  * Width regimes (measured round 9): at 129 columns EVERY generated method
  * is under HotSpot's 8000-bytecode JIT ceiling — fully compiled decode. At
  * 513 columns the per-field dispatcher (`doConsume` + UnsafeRow writes)
  * alone exceeds 8000 bytecodes, but that is inherent to ANY Spark
  * projection at that width — a trivial 513-col `select(id*k...)` already
  * generates a 22 045-byte method — so the test asserts the invariants that
  * ARE ours to keep: the stage compiles (Janino), stays under Spark's own
  * `spark.sql.codegen.hugeMethodLimit` whole-stage fallback, every decode
  * tree lives in its own sub-8000 outlined method, and the dispatcher is
  * within 2× of the trivial-projection floor (i.e. the signal trees did
  * not leak back inline).
  */
class WideDbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // N messages, each: u16 scaled, s8, bool, motorola u12
  private def dbcText(msgs: Int): String = (0 until msgs).map { m =>
    s"""BO_ ${512 + m} MSG$m: 8 E
       | SG_ M${m}_A : 0|16@1+ (0.5,-100) [0|0] "" X
       | SG_ M${m}_B : 16|8@1- (1,0) [0|0] "" X
       | SG_ M${m}_C : 24|1@1+ (1,0) [0|0] "" X
       | SG_ M${m}_D : 39|12@0+ (1,0) [0|0] "" X
       |""".stripMargin
  }.mkString("\n")

  private def frames(msgs: Int, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") * 1.0).as("ts_ms"),
      (lit(512) + col("id") % msgs).as("can_id"),
      unhex(lpad(hex(col("id") * 2654435761L), 16, "0")).as("data"))

  /** The executed plan with AQE off (canonical shape, same convention as
    * PlanSpec — AQE wraps the plan in an opaque adaptive root).
    */
  private def executedPlan(mk: => DataFrame) = {
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try mk.queryExecution.executedPlan
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Compiles the whole-stage span containing the `cols`-wide projection
    * and returns its max generated-method bytecode size (throws if the
    * projection is not in a span or Janino rejects the class).
    */
  private def compiledMaxMethodSize(wide: DataFrame, cols: Int): Int = {
    val plan = executedPlan(wide)
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    val decodeSpan = spans.find(_.collect {
      case p: ProjectExec if p.output.length >= cols => p
    }.nonEmpty)
    assert(decodeSpan.nonEmpty,
      s"$cols-col decode projection must be inside a WholeStageCodegen span:\n$plan")
    val (_, code) = decodeSpan.get.doCodeGen()
    val (_, stats) = CodeGenerator.compile(code) // throws if Janino rejects
    stats.maxMethodCodeSize
  }

  test("128-signal network decodes correctly and stays one JIT-able codegen span") {
    val net = DbcParser.parseString(dbcText(32))
    assert(net.signalsInOrder.size == 128)
    val wide = SignalDecoder.wideFrame(net, frames(32, 10000))
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

    // fleet width: the WHOLE stage — signal trees and dispatcher — JITs
    val maxSize = compiledMaxMethodSize(wide, 129)
    assert(maxSize < 8000,
      s"largest generated method is $maxSize bytecodes — above HotSpot's " +
        "8000-byte JIT ceiling, decode would run interpreted")

    val t0 = System.nanoTime()
    wide.write.mode("overwrite").format("noop").save()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, s"128-col decode of 10k frames took ${sec}s")
  }

  test("129-col tumbling bucket aggregate runs inside whole-stage codegen " +
      "(T1a at fleet width)") {
    val net = DbcParser.parseString(dbcText(32))
    val wide = SignalDecoder.wideFrame(net, frames(32, 10000))
    val bucketed = Bucketer.bucket(wide, BucketMode.Tumbling(100.0))
    val plan = executedPlan(bucketed)

    // execution mode: BOTH aggregate phases (partial and final) must plan
    // as HashAggregateExec — struct-typed buffers would force
    // ObjectHashAggregate, which never enters a codegen span (the round-9
    // finding this test pins)
    assert(plan.collect { case o: ObjectHashAggregateExec => o }.isEmpty &&
      plan.collect { case s: SortAggregateExec => s }.isEmpty,
      s"bucket aggregate fell out of hash aggregation:\n$plan")
    val hashAggs = plan.collect { case h: HashAggregateExec => h }
    assert(hashAggs.length == 2, s"expected partial+final HashAggregateExec:\n$plan")

    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    val aggSpans = spans.map(_.doCodeGen()._2)
      .filter(_.body.contains("doAggregateWithKeys"))
    assert(aggSpans.length == 2,
      s"both aggregate phases must be inside WholeStageCodegen spans:\n$plan")

    // each span must compile (Janino) and stay clear of the 1 MB
    // generated-class spill threshold: a function spilled into a nested
    // class that touches BufferedRowIterator.partitionIndex throws
    // IllegalAccessError at RUNTIME (observed during round 10 with the
    // generic And/Or predicate tree) — an executed plan is not proof until
    // the class layout is single-class
    spans.foreach { s =>
      val (_, code) = s.doCodeGen()
      CodeGenerator.compile(code)
      assert(code.body.length < 1000000,
        s"span generated ${code.body.length} chars — past Spark's 1 MB " +
          "class-spill threshold, doAggregateWithKeys may land in a nested class")
      assert(!code.body.contains("private class "),
        "generated functions spilled into a nested class — " +
          "IllegalAccessError risk on partitionIndex")
    }

    // and it must EXECUTE with results identical to the struct fallback
    val viaStruct = Bucketer.tumblingStruct(wide, 100.0, CombinePolicy.LastWins)
    assert(bucketed.exceptAll(viaStruct).count() == 0 &&
      viaStruct.exceptAll(bucketed).count() == 0,
      "arg-extremum and struct tumbling paths diverge at 129 columns")
  }

  test("tumblingFromFrames at 513 signals: full-volume aggregation codegens, " +
      "matches the wide-table struct path") {
    // past CodegenArgWidthLimit the wide-table tumbling falls back to the
    // interpreted struct aggregate; the frame-level path must (a) keep its
    // ONE full-data aggregation — over (bucket, can_id, mux) with a
    // payload/ts arg-extremum — inside whole-stage codegen at ANY network
    // width, and (b) produce identical rows
    val net = DbcParser.parseString(dbcText(128))
    val fr = frames(128, 20000)
    val viaFrames = Bucketer.tumblingFromFrames(net, fr, 100.0)
    val plan = executedPlan(viaFrames)
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    val aggSpans = spans.map(_.doCodeGen()._2)
      .filter(_.body.contains("doAggregateWithKeys"))
    assert(aggSpans.length >= 2,
      s"stage-1 partial+final aggregation must be whole-stage codegen:\n$plan")
    aggSpans.foreach { code =>
      CodeGenerator.compile(code)
      // nested-class spill of outlined PROJECT methods is benign (they
      // touch only parameters and outer-class fields Janino can reach via
      // accessors); what must never spill is a function reaching the
      // protected BufferedRowIterator.partitionIndex across the nested
      // boundary — that is a runtime IllegalAccessError. Scope the check
      // to the nested class BODY (brace-matched), not everything after it
      var idx = code.body.indexOf("private class ")
      while (idx >= 0) {
        val open = code.body.indexOf('{', idx)
        var depth = 1; var i = open + 1
        while (depth > 0 && i < code.body.length) {
          code.body.charAt(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val body = code.body.substring(open, i)
        assert(!body.contains("partitionIndex"),
          "partitionIndex-touching function spilled into a nested class")
        idx = code.body.indexOf("private class ", i)
      }
    }
    // compare via sorted collect, NOT exceptAll: ExceptAll at this width
    // plans a hash aggregate grouping by all 514 columns, whose own
    // generated class crosses the nested-class spill threshold and throws
    // the very IllegalAccessError this operator is designed to avoid —
    // the comparison harness must not out-width the operator under test
    val viaWide = Bucketer.bucket(
      SignalDecoder.wideFrame(net, fr), BucketMode.Tumbling(100.0))
    val a = viaFrames.orderBy(DbcColumns.TimeCol).collect()
    val b = viaWide.orderBy(DbcColumns.TimeCol).collect()
    assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra == rb, s"row $i diverges:\n $ra\n $rb")
    }
  }

  test("512-signal network (past Janino's 64 KB un-outlined cliff) still " +
      "codegens, JITs, and decodes correctly") {
    val net = DbcParser.parseString(dbcText(128))
    assert(net.signalsInOrder.size == 512)
    val wide = SignalDecoder.wideFrame(net, frames(128, 2000))
    assert(wide.columns.length == 513)

    val sample = wide.filter(col("ts_ms") === 131.0).collect().head // id=131 → msg 3
    val d = (0 until 8).map(i => (BigInt(131L * 2654435761L) >> (8 * (7 - i))).toInt & 0xFF)
    val exp_a = ((d(1) << 8 | d(0)) * 0.5 - 100).toFloat
    assert(sample.getAs[Float]("M3_A") == exp_a)
    assert(sample.isNullAt(sample.fieldIndex("M4_A")))

    // At 513 output columns the per-field dispatcher alone is past the
    // 8000-byte JIT ceiling for ANY Spark projection — establish that floor
    // with a trivial projection of the same width, then hold the decode to
    // it: compiles, stays under Spark's whole-stage fallback limit (the
    // stage remains codegen'd — Spark reverts to fully-interpreted above
    // hugeMethodLimit), and the dispatcher stays within 2× of the trivial
    // floor, which it only does while every signal tree is outlined (inline
    // trees fail Janino's 64 KB method cap outright at this width).
    val trivial = spark.range(2000).select(
      (0 until 513).map(i => (col("id") * (i + 1)).as(s"c$i")): _*)
    val trivialMax = compiledMaxMethodSize(trivial, 513)
    assert(trivialMax >= 8000,
      s"width floor assumption broken: trivial 513-col projection now " +
        s"generates $trivialMax-byte methods — tighten the decode assertion")
    val decodeMax = compiledMaxMethodSize(wide, 513)
    val hugeLimit = spark.conf.get("spark.sql.codegen.hugeMethodLimit").toInt
    assert(decodeMax < hugeLimit,
      s"decode dispatcher is $decodeMax bytecodes, at/above Spark's " +
        s"hugeMethodLimit $hugeLimit — the whole stage would fall back to " +
        "interpreted execution")
    assert(decodeMax <= 2 * trivialMax,
      s"decode dispatcher is $decodeMax bytecodes vs trivial-projection " +
        s"floor $trivialMax — signal trees are leaking inline instead of " +
        "being outlined")
  }
}
