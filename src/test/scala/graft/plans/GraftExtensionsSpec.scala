package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // the shared test session already exists, so getOrCreate would skip
    // withExtensions — use the imperative registration (same builders)
    val s = graft.SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  can_payload_u64(unhex('401F'), true) AS le,
        |  can_payload_u64(unhex('401F'), false) AS be,
        |  can_signal_extract(unhex('401F4B01'), 0, 16, true, false) AS speed_raw,
        |  can_signal_extract(unhex('02E8030000000000'), 16, 12, false, true) AS pressure_raw,
        |  int_bits_to_float(1065353216L) AS one,
        |  array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("le") == 0x1F40L)
    assert(r.getAs[Long]("be") == 0x401F000000000000L)
    assert(r.getAs[Long]("speed_raw") == 0x1F40L)
    assert(r.getAs[Long]("pressure_raw") == -2048L)
    assert(r.getAs[Float]("one") == 1.0f)
    assert(r.getAs[Long]("dot") == 32L)
  }

  test("non-literal config args are rejected with a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT can_signal_extract(unhex('00'), cast(rand()*8 as int), 8, true, false)").collect()
    }
    assert(e.getMessage.contains("int literal"))
  }
}
