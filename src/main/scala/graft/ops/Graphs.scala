package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics beyond the fixpoint family
  * ([[Ranking.pageRankInt]], [[Dedup.connectedComponents]]) — the
  * link-structure signals a crawl-curation pipeline computes over its
  * domain graph (density, transitivity) to spot link farms and measure
  * crawl quality.
  */
object Graphs {

  /** Triangle count + global clustering coefficient by DEGREE-ORDERED
    * ORIENTATION (the MapReduce-era standard, Suri & Vassilvitskii
    * 2011): orient every undirected edge from its lower-(degree, id)
    * endpoint to its higher one, enumerate wedges only between
    * out-neighbors, and close them against the oriented edge list. Every
    * node's out-degree is bounded by O(√|E|) regardless of its real
    * degree — the web-graph power-law hub that would explode a naive
    * neighbor self-join (a 10⁶-degree hub yields 10¹² naive wedges)
    * contributes almost nothing, because hubs ORIENT INWARD. Each
    * triangle is counted exactly once.
    *
    * Input: raw directed/undirected edge rows `(src, dst)` — self-loops
    * dropped, parallel and reverse duplicates collapsed. Three
    * equi-joins and two aggregations; nothing driver-sized.
    *
    * Output (one row): `n_nodes`, `n_edges`, `n_triangles`,
    * `n_wedges` (Σ C(d,2) over the UNDIRECTED degrees — the
    * transitivity denominator), and the global clustering coefficient
    * `cc_micro = 3·10⁶·triangles div wedges` in exact micro-units.
    */
  def triangleStats(rawEdges: DataFrame): DataFrame = {
    val e = rawEdges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
    // orient x→y iff (d(x), x) < (d(y), y): a total order, so the
    // oriented graph is acyclic and each triangle appears exactly once
    // as (a→b, a→c, b→c) with key(b) < key(c)
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"),
        when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
    val tri = o.as("a").join(o.as("b"),
        col("a.src") === col("b.src") &&
          (col("a.ddst") < col("b.ddst") ||
            (col("a.ddst") === col("b.ddst") && col("a.dst") < col("b.dst"))))
      .select(col("a.dst").as("x"), col("b.dst").as("y"))
      .join(o.select(col("src").as("x"), col("dst").as("y")), Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    counts.crossJoin(edges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        // a wedge-free graph (perfect matching) has no transitivity to
        // report — NULL by contract, not an ANSI divide-by-zero
        when(col("n_wedges") > 0,
          expr("(3000000 * n_triangles) div n_wedges")).as("cc_micro"))
  }
}
