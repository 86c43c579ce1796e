package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Sessions are tuned the way a
  * production deployment would be at this core count: shuffle partitions =
  * cores, small maxPartitionBytes so single-file local inputs still fan out
  * across all cores (the 100 TB case has many files; a 5 MB bench file must
  * not serialize the whole scan onto one task), AQE on.
  *
  * Timing methodology:
  *   - the timed action is a `noop`-format write, which fully materializes
  *     every output column (a bare `.count()` lets Catalyst prune
  *     projection-only work, under-charging map-only decode queries);
  *   - each query runs 5 times and the MIN is reported. Min (not median)
  *     is the standard contention-immune wall-clock statistic: external
  *     load can only ever ADD time, so the fastest rep is the closest
  *     observation of the query's true cost. Two of the first three
  *     driver bench rounds ran on a contended host and median-of-3
  *     reported ~2× inflated totals (131s vs 61s quiet for identical
  *     code); min-of-5 survives several loaded reps;
  *   - the JSON line goes to stdout AND to a bare file (bench_out.json, or
  *     $SPARK_GRAFT_BENCH_OUT) so log-prefix wrapping (sbt's "[info] ")
  *     cannot break downstream parsing.
  */
object Bench {
  private val Reps = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: initialize parquet reader, shuffle machinery, and JIT
    // the common execution paths so the first timed query isn't charged
    // session bring-up
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    // optional comma-separated query filter (diagnostics: isolating a
    // drifted query from the rest of the board, e.g. to bisect shared-JVM
    // GC/codec pressure). The driver contract always runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a mistyped filter name must fail loudly, not write an empty (or
    // silently smaller) results board
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names match no registered query: " +
          s"${unknown.toSeq.sorted.mkString(", ")} (known: " +
          s"${SparkEntry.queries.keySet.toSeq.sorted.take(5).mkString(", ")}, ...)")
    }
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        // a failed rep must NOT win the min (an exception returns in
        // milliseconds and would report a near-zero "fastest" time for a
        // query that never ran) — exclude it from the min entirely
        val ok =
          try {
            // noop sink: consumes every row and column without writing
            // bytes, so projection work is charged but disk I/O is not
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name rep failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // drop lingering per-query caches so later runs aren't charged
        // earlier runs' memory pressure; localCheckpoint blocks are
        // RDD-level (not in the catalog cache manager), release them too
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        if (ok) Some(sec) else None
      }
      // min over successful reps only; a query whose reps ALL failed
      // reports null (not a sentinel number a downstream sum would
      // swallow) and is listed under "failed"
      name -> times.flatten.minOption
    }
    // millisecond precision: sub-ms digits are pure noise at these run
    // times, and the shorter line survives tail-window log captures that
    // truncated a full-precision round-5 line mid-JSON. Locale.ROOT keeps
    // the decimal separator a '.' on comma-decimal JVM locales — a
    // locale-formatted "53,700" is invalid JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + v.map(fmt).getOrElse("null")
      }
      .mkString("{", ",", "}")
    val failedNames = results.collect { case (k, None) => "\"" + k + "\"" }
    val failed = failedNames.mkString("[", ",", "]")
    // any hard failure means the total covers a smaller query set than
    // other rounds' — emit null so cross-round total comparisons can never
    // silently read a failure as a speedup
    val total =
      if (failedNames.nonEmpty) "null" else fmt(results.flatMap(_._2).sum)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
