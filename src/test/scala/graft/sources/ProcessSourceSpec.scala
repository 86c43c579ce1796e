package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class ProcessSourceSpec extends AnyFunSuite {

  test("offsets from a previous process lifetime fail fast") {
    val s = new ProcessMicroBatchStream("cat /dev/null")
    try {
      // this process produced 0 lines; a checkpointed offset of 5 is from
      // a previous run and must not be silently clamped to an empty batch
      val e = intercept[IllegalStateException] {
        s.planInputPartitions(LineCountOffset(5), LineCountOffset(7))
      }
      assert(e.getMessage.contains("previous run"))
    } finally s.stop()
  }

  test("offset json round-trips") {
    val s = new ProcessMicroBatchStream("cat /dev/null")
    try {
      val o = LineCountOffset(42)
      assert(s.deserializeOffset(o.json()) == o)
    } finally s.stop()
  }
}
