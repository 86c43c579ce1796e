package graft.can

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** T7 running counters (reference `messages`/`rows`,
  * `/root/reference/src/main.cpp:116-119`, `:150`; decoder `msg_count`,
  * `/root/reference/src/decoder.h:31`; progress print every N packets,
  * `/root/reference/src/main.cpp.bak:408-411`).
  *
  * Spark-first shape: the reference threads mutable counters through its
  * decode loop; here the counters are *observed metrics* on the plan
  * (`Dataset.observe`) — aggregated by the engine alongside the real
  * computation with zero extra passes, delivered to a listener on
  * completion (batch: [[QueryExecutionListener]]) or per micro-batch
  * (streaming: `StreamingQueryProgress.observedMetrics`). No driver-side
  * row iteration, no accumulator drift on task retries (observe dedups).
  */
object PipelineMetrics {

  val FramesMetric = "graft_frames"
  val RowsMetric = "graft_rows"

  /** Count parsed frames (the reference's `messages`) as they flow by. */
  def observeFrames(frames: DataFrame): DataFrame =
    frames.observe(FramesMetric, count(lit(1)).as("messages"))

  /** Count emitted wide rows (the reference's `rows`). */
  def observeRows(wide: DataFrame): DataFrame =
    wide.observe(RowsMetric, count(lit(1)).as("rows"))

  /** Batch listener: accumulates totals and prints the reference-style
    * progress line after each action touching the observed plans.
    */
  final class Progress(quiet: Boolean = false) extends QueryExecutionListener {
    val messages = new AtomicLong(0)
    val rows = new AtomicLong(0)

    /** True once a frames counter has been observed. The exact-keyless
      * pipeline deliberately omits it (its range-partitioning sampling
      * pass would double-count a flow-through CollectMetrics —
      * `CanPipeline.fromFrames`), so the progress line only claims a
      * packet count when one was actually measured.
      */
    private var sawFrames = false

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      qe.observedMetrics.get(FramesMetric).foreach { r =>
        sawFrames = true
        messages.addAndGet(r.getAs[Long]("messages"))
      }
      qe.observedMetrics.get(RowsMetric)
        .foreach(r => rows.addAndGet(r.getAs[Long]("rows")))
      if (!quiet && qe.observedMetrics.nonEmpty) {
        val recv = if (sawFrames) s"Received ${messages.get()} packets, " else ""
        println(s"${recv}wrote ${rows.get()} rows")
      }
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Streaming listener: same totals from each micro-batch's progress. */
  final class StreamingProgress(quiet: Boolean = false) extends StreamingQueryListener {
    val messages = new AtomicLong(0)
    val rows = new AtomicLong(0)

    override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = event.progress.observedMetrics
      if (om.containsKey(FramesMetric))
        messages.addAndGet(om.get(FramesMetric).getAs[Long]("messages"))
      if (om.containsKey(RowsMetric))
        rows.addAndGet(om.get(RowsMetric).getAs[Long]("rows"))
      if (!quiet && !om.isEmpty)
        println(s"Received ${messages.get()} packets, wrote ${rows.get()} rows")
    }
  }
}
