package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Triangle counting (`Graphs.triangleStats`): closed-form graphs
  * (complete graph, triangle + pendant), input canonicalization
  * (self-loops, reversed and parallel duplicates), and a brute-force
  * differential over a deterministic pseudo-random graph.
  */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) = {
    val r = Graphs.triangleStats(edges.toDF("src", "dst")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  /** Exact triangle/wedge brute force over canonical undirected edges. */
  private def brute(edges: Seq[(Long, Long)]) = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val adj = e.toSet
    def linked(a: Long, b: Long) = adj.contains((a min b, a max b))
    val tri = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if linked(a, b) && linked(a, c) && linked(b, c)
    } yield 1).size.toLong
    val wedges = nodes.map { n =>
      val d = e.count(p => p._1 == n || p._2 == n).toLong
      d * (d - 1) / 2
    }.sum
    (nodes.size.toLong, e.size.toLong, tri, wedges)
  }

  test("K4: 4 triangles, transitivity exactly 1") {
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    assert(stats(k4) == ((4L, 6L, 4L, 12L, 1000000L)))
  }

  test("triangle plus pendant edge: one triangle over five wedges") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(stats(g) == ((4L, 4L, 1L, 5L, 600000L)))
  }

  test("self-loops, reversed duplicates, and parallel edges collapse " +
      "before counting") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(stats(messy) == ((3L, 3L, 1L, 3L, 1000000L)))
  }

  test("a wedge-free graph (perfect matching) reports NULL " +
      "transitivity instead of dividing by zero") {
    val r = Graphs.triangleStats(
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")).collect()(0)
    assert(r.getLong(3) == 0L && r.isNullAt(4))
  }

  test("brute-force differential on a deterministic pseudo-random " +
      "graph (including a high-degree hub)") {
    // 25 nodes, arithmetic edge rule, plus node 0 wired to everyone —
    // the power-law hub the orientation must not explode on
    val g = (for {
      i <- 0L until 25L; j <- (i + 1) until 25L
      if (i * 31 + j * 17) % 7 == 0
    } yield (i, j)) ++ (1L until 25L).map(j => (0L, j))
    val (n, e, t, w) = brute(g)
    assert(t > 10, "fixture must contain a non-trivial triangle count")
    assert(stats(g) == ((n, e, t, w, 3000000L * t / w)))
  }
}
