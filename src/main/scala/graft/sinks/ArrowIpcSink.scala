package graft.sinks

import java.io.{FileOutputStream, OutputStream}
import java.nio.file.{Files, Paths}

import org.apache.arrow.memory.RootAllocator
import org.apache.hadoop.fs.{Path => HPath}
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

  /** Java-serializable Hadoop `Configuration` carrier (the Spark-internal
    * equivalent is `private[spark]`): ships the session's hadoop conf to
    * executors so [[fileSinkDistributed]] resolves `dir`'s filesystem with
    * the same settings the driver used.
    */
  private final class SerHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

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
      // chained finallys: writer.end() can itself throw (broken pipe on a
      // socket binding) — root/allocator hold NATIVE Arrow memory, and a
      // long-running stream that fails per batch would leak it otherwise
      try writer.end()
      finally { try root.close() finally allocator.close() }
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
    *
    * All I/O goes through the Hadoop `FileSystem` resolved from `dir`'s
    * scheme (executors write with the session's broadcast hadoop conf —
    * `sessionState.newHadoopConf()`, so runtime `spark.conf.set` fs
    * options like S3A credentials are honored), so `dir` may be any
    * shared filesystem (HDFS, S3A, NFS mount, or a local path in local
    * mode) and the driver-side replay cleanup sees exactly the files
    * executors wrote — no executor-local scatter. Local-mode writes stay
    * sidecar-free: the sink uses a private non-cached FS instance with
    * write checksums off, so no hidden `.arrows.crc` files appear for a
    * directory-tailing consumer (and the JVM-wide cached FileSystem is
    * never mutated).
    */
  def fileSinkDistributed(df: DataFrame, dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val sc = df.sparkSession.sparkContext
    val dirPath = new HPath(dir)
    // session-aware conf: sc.hadoopConfiguration misses runtime-set
    // spark.conf fs options that Spark's own file sinks would honor
    val confBc = sc.broadcast(
      new SerHadoopConf(df.sparkSession.sessionState.newHadoopConf()))
    withSinkFs(dirPath, confBc.value.value)(_.mkdirs(dirPath))
    // also matches orphaned ".batch-N-part-P.arrows.crc" sidecars (the
    // ChecksumFileSystem dot-prefixed form) a pre-checksum-off version
    // of this sink may have left: a replay that plans fewer partitions
    // must not strand a hidden sidecar for a deleted part file
    val stalePattern = "\\.?batch-(\\d+)-part-\\d+\\.arrows(\\.crc)?".r
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // replay hygiene: a replayed micro-batch can plan FEWER
        // partitions than the aborted attempt (AQE/config/cluster
        // change), which would leave the attempt's higher-numbered
        // part files alongside the replay's — delete this batch id's
        // files first so the written set is exactly this attempt's.
        // listStatus + name regex, NOT globStatus: a glob would treat
        // metacharacters in the caller's dir ("run[2]") as pattern
        // syntax and silently skip (or crash) the cleanup.
        withSinkFs(dirPath, confBc.value.value) { fs =>
          val entries =
            try fs.listStatus(dirPath)
            catch { // dir removed out-of-band: nothing stale to clean
              case _: java.io.FileNotFoundException =>
                Array.empty[org.apache.hadoop.fs.FileStatus]
            }
          entries.foreach { st =>
            st.getPath.getName match {
              case stalePattern(batchId, _) if batchId == id.toString =>
                fs.delete(st.getPath, false); ()
              case _ => ()
            }
          }
        }
        val schema = batch.schema
        batch.foreachPartition { (it: Iterator[Row]) =>
          if (it.hasNext) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val part = new HPath(dirPath, s"batch-$id-part-$pid.arrows")
            withSinkFs(dirPath, confBc.value.value) { fs =>
              val out = fs.create(part, true)
              try writeRows(schema, it, out) finally out.close()
            }
          }
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Run `body` with a FileSystem for `path` that never emits `.crc`
    * sidecars into the sink dir. Only `ChecksumFileSystem` (the local
    * FS) writes sidecars, and only there is the workaround needed: a
    * PRIVATE non-cached instance with write checksums off, closed after
    * use (`setWriteChecksum(false)` on the JVM-shared cached instance
    * would silently strip `.crc` files from every OTHER local writer in
    * the JVM). Remote filesystems (HDFS, S3A, …) never write sidecars,
    * so they use the normal JVM-cached instance — a per-partition
    * `newInstance` there would bootstrap a full client (connection
    * pools, SDK init) per task per micro-batch for zero benefit.
    */
  private def withSinkFs[A](path: HPath,
      conf: org.apache.hadoop.conf.Configuration)(
      body: org.apache.hadoop.fs.FileSystem => A): A =
    path.getFileSystem(conf) match {
      case _: org.apache.hadoop.fs.ChecksumFileSystem =>
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(path.toUri, conf)
        try { fs.setWriteChecksum(false); body(fs) } finally fs.close()
      case cached => body(cached) // sidecar-free FS: cache is safe as-is
    }
}
