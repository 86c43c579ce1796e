package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series analytics over decoded traces — the questions a
  * fleet asks of its CAN signals once they're in Parquet ("how long was
  * the system in each state", "does signal B follow signal A, and by
  * how much"). Every window here is PARTITIONED BY the series key: work
  * parallelizes across keys (vehicles, users, channels) and no task
  * ever holds more than one key's trace — there is no global sort or
  * global window anywhere, so the shapes survive a 1000-key, 100 TB
  * fleet unchanged.
  */
object Timeseries {

  /** Time-in-state / duty cycle: classify each sample into a state,
    * charge the interval [ts, next ts) of the SAME key to that state
    * (the last sample of a key's trace has no successor and is
    * excluded — open interval), and report per state the total dwell
    * time, the interval count, and the number of ENTRIES (transitions
    * into the state: first sample of a key, or a sample whose
    * predecessor held a different state). `duty = total_us / Σ
    * total_us` is the caller's division; the gate keeps exact micros.
    *
    * `tsCol` must be in integral microseconds and `(key, ts, tieCol)`
    * unique so lead/lag order is total — the tie column (an event id,
    * a frame counter) makes equal-timestamp samples deterministic.
    *
    * A state observed ONLY as the final sample of its traces owns no
    * interval and does not appear in the output (the dwell/entries
    * join is inner): the report covers states that held time, not
    * every state ever sampled.
    */
  def dutyCycle(df: DataFrame, keyCol: String, tsUs: Column,
      state: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("_tus"), col(tieCol))
    // both analytics share ONE window spec, so Catalyst plans a single
    // sort per partition for lead and lag together
    val x = df.select(col(keyCol), tsUs.as("_tus"), col(tieCol),
        state.as("state"))
      .withColumn("_nxt", lead(col("_tus"), 1).over(w))
      .withColumn("_prev", lag(col("state"), 1).over(w))
    val dwell = x.filter(col("_nxt").isNotNull)
      .groupBy("state")
      .agg(sum(col("_nxt") - col("_tus")).as("total_us"),
        count(lit(1)).as("n_intervals"))
    val entries = x.filter(col("_prev").isNull || col("_prev") =!= col("state"))
      .groupBy("state").agg(count(lit(1)).as("n_entries"))
    dwell.join(entries, "state")
      .select(col("state"), col("total_us"), col("n_intervals"),
        col("n_entries"))
      .orderBy("state")
  }

  /** Sampling-gap report per key — the dropped-frame/dead-channel
    * diagnostic ("which vehicles have holes in their trace?"): for each
    * key, the sample count, the LARGEST inter-arrival gap, and how many
    * gaps exceed `thresholdUs`. Same keyed-window contract as
    * [[dutyCycle]] (per-key parallel, `(key, ts, tieCol)` total order);
    * a single-sample key has no gap and reports a NULL `max_gap_us`.
    */
  def gapReport(df: DataFrame, keyCol: String, tsUs: Column,
      tieCol: String, thresholdUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("_tus"), col(tieCol))
    df.select(col(keyCol), tsUs.as("_tus"), col(tieCol))
      .withColumn("_gap", lead(col("_tus"), 1).over(w) - col("_tus"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_samples"),
        max("_gap").as("max_gap_us"),
        sum(when(col("_gap") > thresholdUs, 1L).otherwise(0L))
          .as("n_gaps_over"))
      .orderBy(keyCol)
  }

  /** Time-weighted average per key — the correct mean for IRREGULARLY
    * sampled telemetry (an arithmetic mean over-weights chatty bursts;
    * CAN buses sample on change, so bursts are the norm): step-hold
    * integral `Σ vᵢ·(tᵢ₊₁ − tᵢ)` over the key's span, each sample
    * holding until the next (the [[graft.can.ForwardFill]] semantics as
    * an integral). Values must be caller-scaled exact integers
    * (cents/micro): the integral is then an exact bigint
    * (`|v|·span < 2⁶³` is the caller's scaling contract) and
    * `twa_micro = integral·10⁶ div span` an exact quotient. Keys with a
    * single sample have no span and report NULL. Same keyed-window
    * contract as [[dutyCycle]].
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsUs: Column,
      tieCol: String, value: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("_tus"), col(tieCol))
    df.select(col(keyCol), tsUs.as("_tus"), col(tieCol), value.as("_v"))
      .withColumn("_dt", lead(col("_tus"), 1).over(w) - col("_tus"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_samples"),
        sum(col("_v") * col("_dt")).as("integral"),
        sum(col("_dt")).as("span_us"))
      // two-term quotient: (I div S)·10⁶ + ((I mod S)·10⁶) div S ==
      // floor(I·10⁶/S) for I ≥ 0 WITHOUT materializing I·10⁶ (which
      // overflows bigint on month-long spans)
      .withColumn("twa_micro", when(col("span_us") > 0,
        expr("(integral div span_us) * 1000000 + " +
          "((integral % span_us) * 1000000) div span_us")))
      .orderBy(keyCol)
  }

  /** On-change compression audit — the CAN "log on change" policy
    * (store a sample only when the signal moved; [[graft.can.ForwardFill]]
    * is the inverse, reconstruction): per key, how many samples survive
    * keeping only rows whose value differs from their predecessor
    * (first sample always kept), and the exact micro-unit retention
    * ratio. `value` should be the caller's quantized signal (raw floats
    * never repeat, so quantize first — that IS the policy decision).
    * Same keyed-window contract as [[dutyCycle]].
    */
  def onChangeCompression(df: DataFrame, keyCol: String, tsUs: Column,
      tieCol: String, value: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("_tus"), col(tieCol))
    df.select(col(keyCol), tsUs.as("_tus"), col(tieCol), value.as("_v"))
      .withColumn("_pv", lag(col("_v"), 1).over(w))
      .withColumn("_keep", col("_pv").isNull || col("_pv") =!= col("_v"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_samples"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("ratio_micro", expr("(n_kept * 1000000) div n_samples"))
      .orderBy(keyCol)
  }

  /** Lag cross-covariance between two bucketed series — "does B track A
    * shifted by k buckets?" Both inputs are (bucket, value) in exact
    * integral units (centi/micro — the caller's scaling). For each lag
    * in [0, maxLag] the co-moment `Σ a(t)·b(t+lag)` and the overlap
    * count are exact integers: a bigint product-sum is
    * order-independent, so the result is partition-invariant (the
    * reason this is NOT done in doubles). The join is an equi-join on
    * the shifted bucket after a `maxLag+1`-way literal explode of the
    * LEFT series (pass the smaller/sparser series as `a`) — at fleet
    * scale the grid is bounded by time span, not event count, so the
    * explode is cheap and the join co-partitions on the grid.
    *
    * Callers pick the scaling so `|a|·|b|·overlap < 2⁶²` — events-table
    * cents (≤ 5·10⁴) over a minute grid (≤ 10⁵ buckets at a week) keep
    * the sum below 2.5·10¹⁴.
    */
  def lagCoMoment(a: DataFrame, b: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be non-negative, got $maxLag")
    val lags = a.select(col("bucket"), col("v").as("va"),
        explode(array((0 to maxLag).map(i => lit(i)): _*)).as("lag_k"))
      .withColumn("tb", col("bucket") + col("lag_k"))
    lags.join(b.select(col("bucket").as("tb"), col("v").as("vb")), "tb")
      .groupBy("lag_k")
      .agg(sum(col("va") * col("vb")).as("co_moment"),
        count(lit(1)).as("n_overlap"))
      .orderBy("lag_k")
  }
}
