package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the child-JVM work-unit builder: family grouping, the
  * per-child size cap (the r14 qt-family inflation fix), determinism,
  * and exact coverage (every query in exactly one slice).
  */
class BenchGroupingSpec extends AnyFunSuite {

  test("childGroups: families under the cap stay whole, larger ones " +
      "split into deterministic sorted slices covering every query") {
    val names =
      (1 to 18).map(i => s"q${i}_core") ++ // "core" family, under cap
        (1 to 50).map(i => f"qt_gate$i%02d") ++ // must split (50 > 24)
        (1 to 9).map(i => s"qm_g$i")
    val groups = Bench.childGroups(names)
    // coverage: every query exactly once
    assert(groups.flatMap(_._2).sorted == names.sorted)
    // core and qm stay whole
    assert(groups.collect { case ("core", m) => m.size } == Seq(18))
    assert(groups.collect { case ("qm", m) => m.size } == Seq(9))
    // qt splits into 3 BALANCED slices (17+17+16), never 24+24+2 with a
    // near-empty child paying full session bring-up
    val qt = groups.filter(_._1.startsWith("qt"))
    assert(qt.map(_._1) == Seq("qt#0", "qt#1", "qt#2"))
    assert(qt.map(_._2.size) == Seq(17, 17, 16))
    // slices are sorted-name contiguous → stable across runs
    assert(qt.flatMap(_._2) == (1 to 50).map(i => f"qt_gate$i%02d"))
    // determinism regardless of input order
    assert(Bench.childGroups(scala.util.Random.shuffle(names)) == groups)
  }

  test("childGroups on the real registry: no slice exceeds the cap, " +
      "all 150+ queries covered") {
    val all = SparkEntry.queries.keySet.toSeq
    val groups = Bench.childGroups(all)
    assert(groups.flatMap(_._2).sorted == all.sorted)
    assert(groups.forall(_._2.size <= 24))
    assert(groups.map(_._1).distinct.size == groups.size)
  }
}
