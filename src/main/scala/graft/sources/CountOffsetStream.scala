package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.reflect.ClassTag

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Offset = count of elements ingested since source start (monotonic). */
private[sources] case class LineCountOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

/** Shared scaffold of the driver-ingest micro-batch sources
  * ([[ProcessSource]] lines, [[TcpStructSource]] packets): a background
  * reader thread appends elements to a buffer; offsets are element
  * counts of THIS source instance's lifetime; `latestOffset` admits at
  * most `maxPerTrigger` new elements per micro-batch (backlog admission
  * control); `commit` prunes the committed prefix; and offsets from a
  * previous instance (a stale checkpoint) FAIL FAST instead of
  * silently committing truncated batches. Subclasses supply only the
  * resource open/close and the ingest loop.
  */
private[sources] abstract class CountOffsetMicroBatchStream[T: ClassTag](
    maxPerTrigger: Long, lifetimeNoun: String) extends MicroBatchStream {

  private val buffer = new ArrayBuffer[T]
  private var base = 0L
  private var started = false
  protected val lock = new Object

  /** Open the resource and start the daemon reader thread; called once,
    * under `lock`. The ingest loop appends via [[ingest]].
    */
  protected def open(): Unit

  /** Close the resource; called under `lock`. */
  protected def close(): Unit

  /** Wrap one planned slice of buffered elements. */
  protected def partition(slice: Array[T]): InputPartition

  protected final def ingest(elem: T): Unit =
    lock.synchronized { buffer += elem }

  private def ensureStarted(): Unit = lock.synchronized {
    if (!started) { open(); started = true }
  }

  override def initialOffset(): Offset = { ensureStarted(); LineCountOffset(0L) }

  override def latestOffset(): Offset = {
    ensureStarted()
    lock.synchronized(
      LineCountOffset(base + math.min(buffer.size.toLong, maxPerTrigger)))
  }

  override def deserializeOffset(json: String): Offset =
    LineCountOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineCountOffset].count
    val e = end.asInstanceOf[LineCountOffset].count
    val slice = lock.synchronized {
      if (s > base + buffer.size || e > base + buffer.size)
        throw new IllegalStateException(
          s"${getClass.getSimpleName} cannot replay offsets [$s, $e) from " +
            s"a previous $lifetimeNoun (this one has produced " +
            s"${base + buffer.size} elements) — delete the checkpoint or " +
            "replay from files instead")
      buffer.slice((s - base).toInt.max(0), (e - base).toInt.max(0)).toArray
    }
    Array(partition(slice))
  }

  /** Committed prefixes are never replanned — free the buffer. */
  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[LineCountOffset].count
    val drop = (e - base).toInt
    if (drop > 0) { buffer.dropInPlace(drop.min(buffer.size)); base = e.max(base) }
  }

  override def stop(): Unit = lock.synchronized { if (started) close() }
}
