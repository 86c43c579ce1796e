package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the line-protocol sink end-to-end against an in-process JDK
  * HttpServer (the zero-egress stand-in for an Influx `/write`
  * endpoint): line shape + escaping, typed field rendering, null
  * handling, request batching, auth header, and the retry ladder.
  */
class InfluxLineSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** (server, received bodies+auth, port); handler returns `codes` in
    * sequence then 204 forever.
    */
  private def withServer(codes: Int*)(
      f: (Int, ConcurrentLinkedQueue[(String, String)]) => Unit): Unit = {
    val received = new ConcurrentLinkedQueue[(String, String)]()
    val remaining = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/write", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse("")
        received.add((body, auth))
        val i = remaining.getAndIncrement()
        val code = if (i < codes.length) codes(i) else 204
        ex.sendResponseHeaders(code, -1)
        ex.close()
      }
    })
    server.start()
    try f(server.getAddress.getPort, received)
    finally server.stop(0)
  }

  test("line protocol column: tags and typed fields render and escape " +
      "per spec; all-null field set yields null") {
    val df = Seq(
      (1L, "src a,b", 3.5, Some(7L), Some("""say "hi" \now"""), true),
      (2L, "plain", 0.25, None, None, false),
      (3L, "plain", Double.NaN, Some(1L), Some("x"), true))
      .toDF("t", "src", "d", "l", "s", "b")
      .withColumn("d", when(!isnan(col("d")), col("d")))
    import org.apache.spark.sql.types._
    val line = InfluxLineSink.lineProtocol("can frames",
      Seq("srcfile" -> col("src")),
      Seq(("val d", col("d"), DoubleType), ("n", col("l"), LongType),
        ("msg", col("s"), StringType), ("ok", col("b"), BooleanType)),
      col("t") * 1000L)
    val out = df.select(col("t"), line.as("line")).orderBy("t")
      .as[(Long, String)].collect()
    assert(out(0)._2 ==
      """can\ frames,srcfile=src\ a\,b val\ d=3.5,n=7i,msg="say \"hi\" \\now",ok=true 1000""")
    assert(out(1)._2 == """can\ frames,srcfile=plain val\ d=0.25,ok=false 2000""")
    // null double drops; remaining fields still render
    assert(out(2)._2 == """can\ frames,srcfile=plain n=1i,msg="x",ok=true 3000""")
    // every field null -> null line
    val empty = Seq((9L, "s")).toDF("t", "x")
      .select(InfluxLineSink.lineProtocol("m", Nil,
        Seq(("f", lit(null).cast("double"), DoubleType)), col("t")))
      .collect()
    assert(empty.head.isNullAt(0))
  }

  test("escape helpers cover the line-protocol special characters") {
    assert(InfluxLineSink.escapeMeasurement("can frames,v1") ==
      """can\ frames\,v1""")
    assert(InfluxLineSink.escapeKey("src file,a=b") ==
      """src\ file\,a\=b""")
    val esc = Seq(("""x,y=z w""", 1)).toDF("v", "i")
      .select(InfluxLineSink.escapeTagValue(col("v")),
        InfluxLineSink.escapeFieldString(lit("""say "hi" \now""")))
      .head()
    assert(esc.getString(0) == """x\,y\=z\ w""")
    assert(esc.getString(1) == """say \"hi\" \\now""")
  }

  test("newlines fold to a space in every escaper — a value cannot split " +
      "the newline-delimited POST body mid-line") {
    // literal (driver-side) escapers: fold happens BEFORE space-escaping,
    // so the folded space itself comes out escaped
    assert(InfluxLineSink.escapeMeasurement("m1\r\nm2") == """m1\ m2""")
    assert(InfluxLineSink.escapeMeasurement("a\nb\nc") == """a\ b\ c""")
    assert(InfluxLineSink.escapeKey("k1\nk2=x") == """k1\ k2\=x""")
    // dynamic Column escapers
    val esc = Seq(1).toDF("i")
      .select(InfluxLineSink.escapeTagValue(lit("a\r\nb")),
        InfluxLineSink.escapeFieldString(lit("l1\nl2")))
      .head()
    assert(esc.getString(0) == """a\ b""")
    assert(esc.getString(1) == "l1 l2")
    // end-to-end: an injected newline stays inside ONE rendered line
    import org.apache.spark.sql.types._
    val line = Seq((7L, "evil\nm2,t=x f=1i 1")).toDF("t", "msg")
      .select(InfluxLineSink.lineProtocol(
        "m\nrogue", Seq("tag\nkey" -> lit("v1\nv2")),
        Seq(("msg", col("msg"), StringType)), col("t")))
      .as[String].head()
    assert(!line.contains("\n"), s"newline leaked into the line: $line")
    assert(line ==
      """m\ rogue,tag\ key=v1\ v2 msg="evil m2,t=x f=1i 1" 7""")
  }

  test("null tag values drop the TAG, not the line; NaN/Infinity double " +
      "fields drop the FIELD, not the batch") {
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None: Option[String], Some(2.5)), // null tag: line survives
      (3L, Some("c"), Some(Double.NaN)),     // NaN field: field drops
      (4L, Some("d"), Some(Double.PositiveInfinity)),
      (5L, Some("e"), None: Option[Double])) // null field: field drops
      .toDF("t", "tag", "d")
    val line = InfluxLineSink.lineProtocol("m",
      Seq("k" -> col("tag")),
      Seq(("d", col("d"), DoubleType), ("id", col("t"), LongType)),
      col("t"))
    val out = df.select(col("t"), line.as("l")).orderBy("t")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "m,k=a d=1.5,id=1i 1")
    assert(out(2L) == "m d=2.5,id=2i 2") // tag omitted, fields intact
    assert(out(3L) == "m,k=c id=3i 3")   // NaN double omitted
    assert(out(4L) == "m,k=d id=4i 4")   // Infinity omitted
    assert(out(5L) == "m,k=e id=5i 5")
  }

  test("upload: posts per-partition batches with auth; timestamps are " +
      "ns from the timestamp column; field-less rows dropped") {
    withServer() { (port, received) =>
      val df = spark.range(0, 10, 1, 2)
        .select(col("id").as("event_id"),
          timestamp_micros(col("id") * 1000000L).as("ts"),
          (col("id") * 2).cast("double").as("speed"),
          // one row with every field null must drop, not 400 the server
          when(col("id") =!= 3L, col("id") % 2 === 0).as("flag"))
        .withColumn("speed", when(col("event_id") =!= 3L, col("speed")))
        .withColumn("event_id",
          when(col("event_id") =!= 3L, col("event_id")))
      InfluxLineSink.upload(df, s"http://127.0.0.1:$port/write?db=can",
        token = "sekrit", measurement = "frames",
        tags = Seq("srcfile" -> lit("mini.log")), timeCol = "ts",
        batchLines = 4)
      val reqs = received.toArray(Array.empty[(String, String)])
      assert(reqs.nonEmpty && reqs.forall(_._2 == "Token sekrit"))
      val lines = reqs.flatMap(_._1.split("\n")).filter(_.nonEmpty)
      assert(lines.length == 9) // 10 rows minus the all-null one
      // 2 partitions x batches of 4: no request exceeds batchLines
      assert(reqs.forall(_._1.split("\n").count(_.nonEmpty) <= 4))
      val l5 = lines.find(_.contains("event_id=5i")).get
      assert(l5 == "frames,srcfile=mini.log event_id=5i,speed=10.0,flag=false 5000000000")
    }
  }

  test("retry ladder: 5xx retries then succeeds; 4xx fails fast") {
    withServer(500, 503) { (port, received) =>
      InfluxLineSink.post(s"http://127.0.0.1:$port/write", "",
        "m f=1i 1\n".getBytes(StandardCharsets.UTF_8), maxRetries = 3)
      assert(received.size == 3) // 500, 503, then 204
    }
    withServer(400) { (port, received) =>
      val e = intercept[java.io.IOException] {
        InfluxLineSink.post(s"http://127.0.0.1:$port/write", "",
          "bad\n".getBytes(StandardCharsets.UTF_8), maxRetries = 3)
      }
      assert(e.getMessage.contains("HTTP 400") && received.size == 1)
    }
    withServer(500, 500, 500, 500) { (port, _) =>
      val e = intercept[java.io.IOException] {
        InfluxLineSink.post(s"http://127.0.0.1:$port/write", "",
          "m f=1i 1\n".getBytes(StandardCharsets.UTF_8), maxRetries = 2)
      }
      assert(e.getMessage.contains("after 3 attempts"))
    }
  }

  test("foreachBatchSink drives a real micro-batch stream") {
    withServer() { (port, received) =>
      val dir = java.nio.file.Files.createTempDirectory("influx_src").toString
      val ckpt = java.nio.file.Files.createTempDirectory("influx_ck").toString
      spark.range(0, 6).select(col("id"),
          timestamp_micros(col("id")).as("ts"))
        .write.mode("overwrite").parquet(dir)
      val q = spark.readStream.schema("id LONG, ts TIMESTAMP").parquet(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(InfluxLineSink.foreachBatchSink(
          s"http://127.0.0.1:$port/write?db=can", token = "",
          measurement = "m", tags = Nil, timeCol = "ts"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val lines = received.toArray(Array.empty[(String, String)])
        .flatMap(_._1.split("\n")).filter(_.nonEmpty)
      assert(lines.length == 6)
      assert(lines.count(_.startsWith("m id=")) == 6)
    }
  }
}
