package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2 bridge source: a DataSource V2 micro-batch stream that spawns a
  * bridge process and streams its stdout lines.
  *
  * The reference's live mode binds a PF_CAN raw socket
  * (`/root/reference/src/inputs/socketInput.cpp:16-62`); a JVM cannot open
  * `AF_CAN` portably, and the reference itself documents remote capture as
  * `candump | nc` (`/root/reference/README.md:52-55`). This source runs that
  * bridge as a child process — `candump -L can0` on a machine with the
  * interface, or any command emitting candump-format lines — and feeds its
  * stdout into Structured Streaming micro-batches:
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.ProcessSource")   // or short name "candump-process"
  *   .option("command", "candump -L can0")
  *   .load()                                   // → (value: string)
  * }}}
  *
  * then [[graft.can.CandumpParser.parseLines]] → [[graft.can.SignalDecoder]]
  * exactly like the socket/file paths.
  *
  * Same delivery contract as Spark's own socket source: the driver ingests
  * the (inherently single-point) capture stream, buffers rows per offset
  * range, and prunes committed batches; executors parse/decode in parallel
  * downstream. A capture point is one interface — the 100 TB design is many
  * such sources (one per interface/vehicle) unioned, each a thin driver
  * thread, with ALL heavy work (regex parse, decode, bucketing) in the
  * distributed plan.
  */
class ProcessSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "candump-process"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ProcessSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ProcessTable(opts.get("command"),
      opts.getLong("maxLinesPerTrigger", Long.MaxValue))
  }
}

object ProcessSource {
  val Schema: StructType = StructType(Seq(StructField("value", StringType)))
}

private[sources] class ProcessTable(command: String, maxLinesPerTrigger: Long)
    extends Table with SupportsRead {
  require(command != null && command.nonEmpty, "option 'command' is required")
  require(maxLinesPerTrigger > 0, "maxLinesPerTrigger must be positive")
  override def name(): String = s"process($command)"
  override def schema(): StructType = ProcessSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ProcessSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ProcessMicroBatchStream(command, maxLinesPerTrigger)
    }
}

/** Offset = count of lines read since source start (monotonic). */
private[sources] case class LineCountOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

private[sources] class ProcessMicroBatchStream(command: String,
    maxLinesPerTrigger: Long = Long.MaxValue) extends MicroBatchStream {

  // buffered lines for offsets [base, base + buffer.size)
  private val buffer = new ArrayBuffer[String]
  private var base = 0L
  private var process: Process = _
  private var readerThread: Thread = _
  private val lock = new Object

  private def ensureStarted(): Unit = lock.synchronized {
    if (process == null) {
      val pb = new ProcessBuilder(command.split("\\s+"): _*)
      // stderr goes straight to the driver's stderr: diagnostics stay
      // visible and the child can never block on a full stderr pipe
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      process = pb.start()
      readerThread = new Thread(() => {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          process.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        try {
          var line = r.readLine()
          while (line != null) {
            lock.synchronized { buffer += line }
            line = r.readLine()
          }
        } catch { case _: java.io.IOException => () /* process killed */ }
      }, s"graft-process-source(${command.take(32)})")
      readerThread.setDaemon(true)
      readerThread.start()
    }
  }

  override def initialOffset(): Offset = { ensureStarted(); LineCountOffset(0L) }

  override def latestOffset(): Offset = {
    ensureStarted()
    // admission control: cap each micro-batch at maxLinesPerTrigger NEW
    // lines beyond the committed base (commit advances base per batch), so
    // a backlogged bridge replaying hours of lines cannot funnel them all
    // into one batch — the documented mitigation for the keyless
    // exactStream memory bound (CanStream.exactStream)
    lock.synchronized(
      LineCountOffset(base + math.min(buffer.size.toLong, maxLinesPerTrigger)))
  }

  override def deserializeOffset(json: String): Offset = LineCountOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineCountOffset].count
    val e = end.asInstanceOf[LineCountOffset].count
    val slice = lock.synchronized {
      // offsets are line counts of THIS process's lifetime — a checkpoint
      // from a previous run references lines this process never produced.
      // Fail fast (on either end of the range) instead of silently
      // committing truncated or empty batches over them.
      if (s > base + buffer.size || e > base + buffer.size)
        throw new IllegalStateException(
          s"ProcessSource cannot replay offsets [$s, $e) from a previous " +
            s"run (this process has produced ${base + buffer.size} lines) — " +
            "delete the checkpoint or replay from files instead")
      buffer.slice((s - base).toInt.max(0), (e - base).toInt.max(0)).toArray
    }
    Array(LinesPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory = LinesReaderFactory

  /** Committed prefixes are never replanned — free the buffer. */
  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[LineCountOffset].count
    val drop = (e - base).toInt
    if (drop > 0) { buffer.dropInPlace(drop.min(buffer.size)); base = e.max(base) }
  }

  override def stop(): Unit = lock.synchronized {
    if (process != null) process.destroy()
  }
}

private[sources] case class LinesPartition(lines: Array[String]) extends InputPartition

private[sources] object LinesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[LinesPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}
