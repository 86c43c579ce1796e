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

  /** Frame counter for the exact keyless path: `exactDistributed`'s
    * segment passes are RDD actions, which carry no `QueryExecution` — a
    * `Dataset.observe` node upstream would (a) never deliver to the
    * listener and (b) be double-counted by the range partitioner's
    * sampling pass. Instead its pass 1 (a single `collect` action over the
    * persisted sorted input — accumulator updates inside actions are
    * exactly-once per partition) counts rows into this accumulator, and
    * [[Progress]] folds it into the printed line.
    *
    * Semantics note: this counts DECODED (known-id) frames — the
    * decoder's `msg_count` (`/root/reference/src/decoder.cpp:125`) —
    * where the observed-metric path counts parsed packets (main's
    * `messages`); the pre-filter stream is not observable exactly-once on
    * this path. One registered counter per SESSION (weak-keyed, so a
    * dropped session frees it); a new exact run in the same session
    * replaces it — the progress line reflects the most recent exact
    * pipeline plus any observed totals, and never another session's count.
    */
  private val exactFramesAccs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      org.apache.spark.util.LongAccumulator]())

  /** Fresh accumulator for an exact-pipeline run, registered per session
    * for [[Progress]] to read.
    */
  def newExactFramesCounter(
      spark: org.apache.spark.sql.SparkSession): org.apache.spark.util.LongAccumulator = {
    val acc = spark.sparkContext.longAccumulator(FramesMetric + "_exact")
    exactFramesAccs.put(spark, acc)
    acc
  }

  private[graft] def exactFramesValue(
      spark: org.apache.spark.sql.SparkSession): Long =
    Option(exactFramesAccs.get(spark)).map(_.value.longValue).getOrElse(0L)

  /** Count parsed frames (the reference's `messages`) as they flow by. */
  def observeFrames(frames: DataFrame): DataFrame =
    frames.observe(FramesMetric, count(lit(1)).as("messages"))

  /** Count emitted wide rows (the reference's `rows`). */
  def observeRows(wide: DataFrame): DataFrame =
    wide.observe(RowsMetric, count(lit(1)).as("rows"))

  /** Batch listener: accumulates totals and prints the reference-style
    * progress line after each action touching the observed plans.
    *
    * `sessionHint` scopes the exact-path accumulator lookup from
    * construction onwards (the CLI passes its session). Without it the
    * scope is learned from the first listener callback — correct, but
    * [[Progress.packets]] reads 0 until then even if an exact pipeline
    * has already filled its accumulator.
    */
  final class Progress(quiet: Boolean = false,
      sessionHint: Option[org.apache.spark.sql.SparkSession] = None)
      extends QueryExecutionListener {
    val messages = new AtomicLong(0)
    val rows = new AtomicLong(0)

    /** True once a frames counter has been observed. The exact-keyless
      * pipeline deliberately omits the observe node (its range-partitioning
      * sampling pass would double-count a flow-through CollectMetrics —
      * `CanPipeline.fromFrames`) and counts through
      * [[PipelineMetrics.newExactFramesCounter]] instead, so the progress
      * line only claims a packet count when one was actually measured.
      * Volatile: listener callbacks may arrive on a different listener-bus
      * thread than the reader.
      */
    @volatile private var sawFrames = false

    /** The session scoping the exact-path accumulator lookup: the
      * construction hint, else learned from the first callback.
      */
    @volatile private var session: Option[org.apache.spark.sql.SparkSession] = sessionHint

    /** Total packet count: observed-metric totals plus this session's
      * exact-path accumulator (see
      * [[PipelineMetrics.newExactFramesCounter]]).
      */
    def packets: Long = messages.get() +
      session.map(PipelineMetrics.exactFramesValue).getOrElse(0L)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      if (session.isEmpty) session = Some(qe.sparkSession)
      qe.observedMetrics.get(FramesMetric).foreach { r =>
        sawFrames = true
        messages.addAndGet(r.getAs[Long]("messages"))
      }
      qe.observedMetrics.get(RowsMetric)
        .foreach(r => rows.addAndGet(r.getAs[Long]("rows")))
      if (!quiet && qe.observedMetrics.nonEmpty) {
        val pk = packets
        val recv = if (sawFrames || pk > 0) s"Received $pk packets, " else ""
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
