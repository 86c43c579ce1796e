package graft

import org.apache.spark.sql.SparkSession

/** Session-level tuning every graft entry point applies. */
object GraftSession {

  /** Spark fuses a stage into whole-stage codegen only while the widest
    * schema in the stage stays at or under `spark.sql.codegen.maxFields`
    * (default 100). Fleet DBC networks routinely carry hundreds of signals
    * (SURVEY §1.1 — the reference's own `fs.dbc` workflow), so at the
    * default the flagship wide decode silently runs interpreted exactly at
    * production width. Above [[graft.can.SignalDecoder.OutlineSignalThreshold]]
    * signals the decode trees are outlined into per-signal generated
    * methods, which keeps the class compilable at these widths (each
    * signal is its own small method; `doConsume` is one call site per
    * signal), so raising the ceiling is safe — below the threshold the
    * inline trees fit comfortably anyway (measured matrix in the
    * threshold's scaladoc). 1024 covers any realistic network; beyond it
    * Spark falls back to interpreted execution, which stays correct.
    */
  val CodegenMaxFields = 1024

  /** Applies graft runtime tuning to an existing session (all keys are
    * runtime-settable SQL confs).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.codegen.maxFields", CodegenMaxFields.toString)
    // Pin ANSI explicitly (it is the Spark 4 default, but operator
    // semantics here are written to it — e.g. zero-norm cosine THROWS on
    // division by zero, and the driver-side ANN probe picks mirror that
    // loud failure): a session inheriting ansi=false from a migration
    // config would silently change error behavior out from under the
    // documented contracts.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark
  }
}
