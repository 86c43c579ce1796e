package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: pairs each point row with
  * every interval row of the same key whose `[start, end]` contains the
  * point.
  *
  * Spark has no native range-join strategy — an inequality-only join plans
  * as a broadcast-nested-loop (or worse, a cartesian) and dies at scale.
  * The standard fix, used here: quantize time into buckets of `bucketWidth`,
  * replicate each interval into every bucket it overlaps, and equi-join on
  * `(key..., bucket)` before filtering the exact containment predicate.
  *
  * Scale properties:
  *   - the join is a plain hash equi-join — one shuffle each side, no
  *     nested loop;
  *   - a point lives in exactly ONE bucket, so each (point, interval) pair
  *     meets at most once — no post-join dedup;
  *   - interval replication is `len/bucketWidth + 1` rows — bounded when
  *     interval lengths are (pick the width near the typical interval
  *     length; a width far below it explodes the interval side, far above
  *     it degrades bucket selectivity toward a per-key all-pairs).
  *
  * Column names across `points` and `intervals` must be disjoint apart
  * from `keyCols`. Time columns are numeric (epoch units).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(i, keyCols :+ "_bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval-overlap join: (left, right) pairs on the same key whose
    * closed intervals intersect (`ls <= re && rs <= le`). Both sides
    * bucketize; candidates meet in shared (key, bucket) cells; and each
    * qualifying pair is emitted EXACTLY ONCE by bucket OWNERSHIP — the
    * pair belongs to the bucket containing the overlap start
    * `max(ls, rs)` — so no DISTINCT pass exists anywhere. (The naive
    * bucketized form emits a pair once per shared bucket and dedups with
    * a distinct, which at 100 TB is a second corpus-scale shuffle moving
    * nothing but duplicates; the ownership filter removes it for free.)
    * Replication is `len/width + 1` rows per interval per side — same
    * bound as [[pointInInterval]].
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bucket", explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))))
    bucketed(left, lStart, lEnd)
      .join(bucketed(right, rStart, rEnd), keyCols :+ "_bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bucket") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth).cast("long"))
      .drop("_bucket")
  }
}
