package graft.sinks

import java.io.{FileOutputStream, OutputStream}
import java.nio.file.{Files, Paths}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Arrow IPC side channel (reference K2: per-chunk Arrow IPC buffer over a
  * WebSocket, `/root/reference/src/websocketIPC.h:21-113`). The transport
  * here is a pluggable `OutputStream` — the zero-egress environment has no
  * WebSocket endpoint, so the shipped binding writes one IPC stream file
  * per micro-batch (same bytes a socket sender would push; swap
  * `openStream` to point at a real socket).
  *
  * Built directly on Arrow Java (ships with Spark) rather than Spark's
  * internal Arrow utils, which are `private[sql]` and version-volatile.
  */
object ArrowIpcSink {

  def arrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case other => throw new IllegalArgumentException(s"unsupported IPC type: $other")
  }

  def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map { f =>
      new Field(f.name, FieldType.nullable(arrowType(f.dataType)), Nil.asJava)
    }.toList.asJava)

  /** Serialize rows (one in-memory chunk — mirrors the reference's 10k-row
    * chunk granularity) as a single Arrow IPC stream to `out`.
    */
  def writeRows(schema: StructType, rows: Iterator[Row], out: OutputStream): Long = {
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      var total = 0L
      rows.grouped(10000).foreach { chunk =>
        root.allocateNew()
        chunk.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            val vec = root.getVector(c)
            if (row.isNullAt(c)) vec.asInstanceOf[FieldVector].setNull(i)
            else f.dataType match {
              case BooleanType => vec.asInstanceOf[BitVector].setSafe(i, if (row.getBoolean(c)) 1 else 0)
              case IntegerType => vec.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
              case LongType => vec.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
              case FloatType => vec.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(c))
              case DoubleType => vec.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
              case StringType => vec.asInstanceOf[VarCharVector].setSafe(i, row.getString(c).getBytes("UTF-8"))
              case BinaryType => vec.asInstanceOf[VarBinaryVector].setSafe(i, row.getAs[Array[Byte]](c))
              case other => throw new IllegalArgumentException(s"unsupported: $other")
            }
          }
        }
        root.setRowCount(chunk.size)
        writer.writeBatch()
        total += chunk.size
      }
      total
    } finally {
      writer.end(); root.close(); allocator.close()
    }
  }

  /** Streaming sink: one IPC file per non-empty micro-batch under `dir`.
    * The collect keeps the reference's contract — ONE chunk per batch,
    * driver-sized by design; [[fileSinkDistributed]] is the executor-side
    * option when that funnel matters.
    */
  def fileSink(df: DataFrame, dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    Files.createDirectories(Paths.get(dir))
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = batch.collect() // side-channel chunk, driver-sized by design
        if (rows.nonEmpty) {
          val out = new FileOutputStream(s"$dir/batch-$id.arrows")
          try writeRows(batch.schema, rows.iterator, out) finally out.close()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Executor-side variant of [[fileSink]]: each non-empty PARTITION
    * serializes its own IPC stream directly on the executor
    * (`batch-<id>-part-<pid>.arrows`) — no driver funnel anywhere in the
    * sink path. Rows stream straight from the partition iterator into
    * 10k-row Arrow batches, so executor memory holds one chunk, never a
    * partition. Replay-idempotent: file names are keyed (batch,
    * partition) and a replayed micro-batch re-plans to the same
    * partition count, so it overwrites its own previous files.
    * Consumers must accept N files per batch instead of the reference's
    * one-chunk contract (which [[fileSink]] keeps as the default).
    */
  def fileSinkDistributed(df: DataFrame, dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    Files.createDirectories(Paths.get(dir))
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // replay hygiene: a replayed micro-batch can plan FEWER
        // partitions than the aborted attempt (AQE/config/cluster
        // change), which would leave the attempt's higher-numbered
        // part files alongside the replay's — delete this batch id's
        // files first so the written set is exactly this attempt's
        Option(new java.io.File(dir).listFiles()).foreach(
          _.filter(_.getName.matches(s"batch-$id-part-\\d+\\.arrows"))
            .foreach { f => f.delete(); () })
        val schema = batch.schema
        batch.foreachPartition { (it: Iterator[Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val out = new FileOutputStream(s"$dir/batch-$id-part-$pid.arrows")
            try writeRows(schema, it, out) finally out.close()
          }
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
