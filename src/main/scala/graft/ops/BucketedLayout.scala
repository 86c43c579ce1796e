package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-bucketed table layouts for shuffle-free co-located joins.
  *
  * At 100 TB a fact⋈fact equi-join (orders⋈lineitem and friends) pays a
  * full shuffle of BOTH sides every time it runs. Writing each table
  * bucketed by its join key — `bucketBy(n, key)` + `sortBy` into a saved
  * table — hash-partitions the FILES once at write time; every subsequent
  * join between tables sharing the bucket count reads bucket i against
  * bucket i directly, no exchange on either side, amortizing one write-side
  * shuffle across every future join (the classic Hive-bucketing trade
  * Spark inherits — see SPARK-19256 umbrella for semantics).
  *
  * Sizing at scale: `numBuckets` ≈ table size / target bucket-file size
  * (128–512 MB), rounded so all co-joined tables share the count (Spark
  * can coalesce a multiple into the smaller count, but identical counts
  * keep every join zero-exchange). Skewed keys skew bucket FILES, not
  * tasks — AQE still splits large buckets for the scan; only the join
  * stage is pinned to bucket granularity.
  */
object BucketedLayout {

  /** Remembers the (path, key, numBuckets) each session's `ensure` call
    * created a table with, so a later call reusing the NAME with a
    * different spec fails loudly instead of silently returning a layout
    * bucketed on the wrong key/count (which would still plan "without
    * exchange" — on the wrong partitioning). Weak-keyed so dropped
    * sessions free their entries.
    */
  private val created = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Map[String, (String, String, Int)]]())

  /** Create-once: write `df` as an external bucketed+sorted table under
    * `path` unless `name` is already in the session catalog, then return
    * the catalog-backed frame (whose scan carries the bucket spec — this
    * is what makes downstream joins exchange-free; reading the parquet
    * path directly would lose it). The write is the one-time shuffle the
    * layout amortizes; callers (gates, benches) share it per session.
    * An existing table is only reused when THIS helper created it in the
    * same session with the SAME (path, key, numBuckets) — any mismatch,
    * or a pre-existing table of unknown origin, throws.
    */
  def ensure(spark: SparkSession, name: String, path: String, key: String,
      numBuckets: Int)(df: => DataFrame): DataFrame = {
    val want = (path, key, numBuckets)
    val mine = created.synchronized {
      created.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, (String, String, Int)]())
    }
    if (spark.catalog.tableExists(name)) {
      val prev = Option(mine.get(name))
      require(prev.contains(want),
        s"bucketed table $name exists with a different spec or origin: " +
          s"have ${prev.getOrElse("<not created by BucketedLayout.ensure>")}, want $want")
    } else {
      df.write.mode("overwrite").option("path", path)
        .bucketBy(numBuckets, key).sortBy(key)
        .saveAsTable(name)
      mine.put(name, want)
    }
    spark.table(name)
  }
}
