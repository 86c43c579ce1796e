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

  test("arg_last/arg_first aggregate from SQL, incl. FILTER and DISTINCT " +
      "(builders return the bare AggregateFunction)") {
    import spark.implicits._
    Seq((1.0, 10L), (2.0, 20L), (3.0, 15L), (4.0, 20L))
      .toDF("t", "v").createOrReplaceTempView("ae")
    val r = spark.sql(
      """SELECT
        |  arg_last(v, t) AS last_v,
        |  arg_first(v, t) AS first_v,
        |  arg_last(v, t) FILTER (WHERE v < 20) AS last_small,
        |  arg_last(DISTINCT v, t) AS last_distinct
        |FROM ae""".stripMargin).collect().head
    assert(r.getAs[Long]("last_v") == 20L)    // t=4
    assert(r.getAs[Long]("first_v") == 10L)   // t=1
    assert(r.getAs[Long]("last_small") == 15L) // t=3 among v<20
    assert(r.getAs[Long]("last_distinct") == 20L)
  }

  test("non-literal config args are rejected with a named error") {
    val e = intercept[Exception] {
      spark.sql("SELECT can_signal_extract(unhex('00'), cast(rand()*8 as int), 8, true, false)").collect()
    }
    assert(e.getMessage.contains("int literal"))
  }
}
