package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession
import graft.can.{Bucketer, CandumpParser, CombinePolicy}
import graft.dbc.DbcParser

class CanStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val net = DbcParser.parseFile("fixtures/mini.dbc")

  def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming parse + decode matches batch on the fixture lines") {
    val input = MemoryStream[String](spark)
    input.addData(scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF()))
    runToMemory(wide.drop("ts"), "s1")
    val got = spark.table("s1").orderBy("ts_ms").collect()
    assert(got.length == 6) // 7 parseable minus unknown id 7FF
    assert(got.head.getAs[Float]("Engine_Speed") == 2000.0f)
    assert(got.map(_.getAs[Any]("GPS_Speed")).count(_ != null) == 1)
  }

  test("streaming tumbling windows with watermark aggregate like batch") {
    val input = MemoryStream[String](spark)
    input.addData(scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF()))
    val bucketed = CanStream.bucketedStream(wide, cacheMs = 10L, watermark = "0 seconds")
    // append mode only emits closed windows; a complete-mode memory sink
    // shows all — use update-less complete for the assertion
    val q = bucketed.writeStream.format("memory").queryName("s2")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("s2").orderBy("Time_ms").collect()
    // epoch-ms buckets of the fixture: 3 windows with data
    assert(rows.length == 3)
    assert(rows.head.getAs[Float]("Engine_Speed") == 2000.0f)
    assert(rows(1).getAs[Int]("Val_B") == 32767) // last-wins in [10,20)
  }

  test("exactStream reproduces batch exact bucketing across micro-batches") {
    val input = MemoryStream[String](spark)
    val lines = scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF())).drop("ts")
    val exact = CanStream.exactStream(wide, cacheMs = 10.0)
    val q = exact.writeStream.format("memory").queryName("s3")
      .outputMode("append").start()
    // feed in two micro-batches to exercise state carry-over
    input.addData(lines.take(5))
    q.processAllAvailable()
    input.addData(lines.drop(5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("s3").orderBy("Time_ms").collect()
    // batch-exact gives rows opening at 0, 12, 50 epoch-offset ms — the
    // stream never closes the last bucket (no EOF), so 2 closed rows
    val t0 = 1700000000000.0
    assert(rows.map(_.getDouble(0)).toSeq == Seq(t0, t0 + 12))
    assert(rows(1).getAs[Int]("Val_B") == 32767)
  }

  test("exactStream forward-fill carries values across buckets and batches") {
    val input = MemoryStream[String](spark)
    val lines = scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF())).drop("ts")
    val exact = CanStream.exactStream(wide, cacheMs = 10.0, forwardFill = true)
    val q = exact.writeStream.format("memory").queryName("sff")
      .outputMode("append").start()
    input.addData(lines.take(5)); q.processAllAvailable()
    input.addData(lines.drop(5)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("sff").orderBy("Time_ms").collect()
    // second closed row (opens @+12) must carry GPS_Speed=1.0 from row 1
    assert(rows.length == 2)
    assert(rows(1).getAs[Float]("GPS_Speed") == 1.0f)
    assert(rows(1).getAs[Float]("Engine_Speed") == 2000.0f)
  }

  test("keyed exactStream: per-key state, key column in output, batch parity") {
    val input = MemoryStream[(Double, String, Int)](spark)
    val wide = input.toDF().toDF("ts_ms", "k", "a")
    val exact = CanStream.exactStream(wide, cacheMs = 10.0, keyCol = Some("k"))
    val q = exact.writeStream.format("memory").queryName("skey")
      .outputMode("append").start()
    // micro-batch 1: both keys open buckets; x closes one at 15
    input.addData((0.0, "x", 1), (4.0, "x", 2), (15.0, "x", 3), (0.0, "y", 7))
    q.processAllAvailable()
    // micro-batch 2: y's gap closes its bucket from batch 1 (state carry)
    input.addData((30.0, "y", 8), (100.0, "x", 9))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("skey").orderBy("k", "Time_ms").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    // open buckets (x@100, y@30) are unclosed — no EOF in a stream
    assert(rows.toSeq == Seq(("x", 0.0, 2), ("x", 15.0, 3), ("y", 0.0, 7)))
    // batch parity on the closed rows: keyed exactFold over the same data
    val batch = Bucketer.exactFold(
      Seq((0.0, "x", 1), (4.0, "x", 2), (15.0, "x", 3), (0.0, "y", 7),
        (30.0, "y", 8), (100.0, "x", 9)).toDF("ts_ms", "k", "a"),
      10.0, Seq("k"), CombinePolicy.LastWins, forwardFill = false)
      .orderBy("k", "Time_ms").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    // the stream's unclosed trailing buckets (x@100, y@30) exist only in
    // the batch fold (EOF closes them) — drop them before comparing
    assert(batch.toSeq.filterNot(r => r == (("x", 100.0, 9)) || r == (("y", 30.0, 8)))
      == rows.toSeq)
  }

  test("keyed exactStream: binary keys group by VALUE (canonical hex), " +
      "non-atomic key types are rejected loudly") {
    // Array[Byte].toString is the identity hash — distinct instances with
    // the same bytes would scatter one logical key across state groups
    // nondeterministically. The canonical hex encoding must route them
    // through ONE group: the 4.0-ms row lands in the 0.0-opened bucket.
    val input = MemoryStream[(Double, Array[Byte], Int)](spark)
    val wide = input.toDF().toDF("ts_ms", "k", "a")
    val exact = CanStream.exactStream(wide, cacheMs = 10.0, keyCol = Some("k"))
    val q = exact.writeStream.format("memory").queryName("sbin")
      .outputMode("append").start()
    input.addData((0.0, Array[Byte](1, 2), 1), (4.0, Array[Byte](1, 2), 2),
      (15.0, Array[Byte](1, 2), 3), (0.0, Array[Byte](9), 7))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sbin").orderBy("Time_ms").collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getDouble(1), r.getInt(2)))
    // one closed bucket for key [1,2] (opened at 0, closed by 15, last-wins
    // value 2); [9] and the 15-opened bucket stay open (no EOF)
    assert(rows.toSeq == Seq((Seq[Byte](1, 2), 0.0, 2)))

    // composite key types have identity-based toString too, but no
    // canonical encoding — they must be rejected before any state forms
    val arrKeyed = Seq((0.0, Seq(1, 2), 1)).toDF("ts_ms", "k", "a")
    val e = intercept[IllegalArgumentException] {
      CanStream.exactStream(arrKeyed, cacheMs = 10.0, keyCol = Some("k"))
    }
    assert(e.getMessage.contains("non-atomic"), e.getMessage)
  }

  test("decoded carries iface through the wide decode for keyed bucketing " +
      "(the CLI --bucket-key path)") {
    val input = MemoryStream[String](spark)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF()),
      carryCols = Seq("iface")).drop("ts")
    assert(wide.columns.take(2).toSeq == Seq("ts_ms", "iface"))
    val exact = CanStream.exactStream(wide, cacheMs = 10.0, keyCol = Some("iface"))
    val q = exact.writeStream.format("memory").queryName("siface")
      .outputMode("append").start()
    // two buses interleaved; each closes its own first bucket independently
    input.addData(Seq(
      "(100.000000) can0 100#401F4B01",
      "(100.000000) can1 100#00000000",
      "(100.020000) can0 100#00000000", // closes can0's t=100000 bucket
      "(100.030000) can1 100#401F4B01")) // closes can1's t=100000 bucket
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("siface").orderBy("iface").collect()
    assert(rows.map(_.getString(rows.head.fieldIndex("iface"))).toSeq == Seq("can0", "can1"))
    assert(rows(0).getAs[Float]("Engine_Speed") == 2000.0f) // can0's bucket
    assert(rows(1).getAs[Float]("Engine_Speed") == 0.0f)    // can1's own state
  }

  test("streaming session windows group bursts per key across micro-batches") {
    val input = MemoryStream[(Long, String)](spark)
    val wide = input.toDF().toDF("ms", "k")
      .withColumn("ts", timestamp_millis(col("ms")))
    val sessions = CanStream.sessionStream(wide, gapMs = 1000L, keyCol = "k")
    val q = sessions.writeStream.format("memory").queryName("ssw")
      .outputMode("complete").start()
    // burst 1 for x (0,400,800ms), then >1s silence, burst 2 (3000,3100);
    // y has one event inside x's silence
    input.addData((0L, "x"), (400L, "x"), (800L, "x"), (1500L, "y"))
    q.processAllAvailable()
    input.addData((3000L, "x"), (3100L, "x"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssw").orderBy("k", "session_start_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.toSeq == Seq(("x", 0L, 3L), ("x", 3000L, 2L), ("y", 1500L, 1L)))
  }

  test("streaming exact dedup drops cross-batch duplicates") {
    import graft.ops.Dedup
    val input = MemoryStream[(String, Long)](spark)
    val df = input.toDF().toDF("sig", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val deduped = Dedup.streamingExactUnbounded(df, Seq("sig"))
    val q = deduped.writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    input.addData(("a", 0L), ("b", 10L), ("a", 20L))
    q.processAllAvailable()
    input.addData(("a", 30L), ("c", 40L), ("b", 50L))
    q.processAllAvailable()
    q.stop()
    val sigs = spark.table("sdd").collect().map(r => (r.getString(0), r.getLong(1)))
    // first arrival per signature survives, including across micro-batches
    assert(sigs.sortBy(_._1).toSeq == Seq(("a", 0L), ("b", 10L), ("c", 40L)))
  }

  test("watermarked streaming dedup keys state on signature alone") {
    import graft.ops.Dedup
    val input = MemoryStream[(String, Long)](spark)
    val df = input.toDF().toDF("sig", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    // duplicates arrive at DIFFERENT event times — a (sig, ts) key would
    // pass them all; signature-keyed state must drop them
    val deduped = Dedup.streamingExact(df, Seq("sig"), "ts", "10 seconds")
      .select("sig", "ms")
    val q = deduped.writeStream.format("memory").queryName("sddw")
      .outputMode("append").start()
    input.addData(("a", 0L), ("a", 500L), ("b", 100L))
    q.processAllAvailable()
    input.addData(("a", 900L), ("b", 1500L), ("c", 2000L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sddw").collect().map(r => (r.getString(0), r.getLong(1)))
    // exactly one representative per signature (which same-batch duplicate
    // survives is engine-chosen); cross-batch duplicates always dropped
    assert(rows.map(_._1).sorted.toSeq == Seq("a", "b", "c"))
    assert(!rows.contains(("a", 900L)) && !rows.contains(("b", 1500L)))
  }

  test("process bridge source (S2) streams a command's stdout and decodes") {
    val frames = CanStream.framesFromProcess(spark, "cat fixtures/mini.log")
    val wide = CanStream.decoded(net, frames).drop("ts")
    val q = wide.writeStream.format("memory").queryName("sproc")
      .outputMode("append").start()
    // the bridge process is finite; drain until its EOF has been ingested
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.table("sproc").count() < 6 && System.nanoTime() < deadline) {
      q.processAllAvailable(); Thread.sleep(100)
    }
    q.stop()
    val got = spark.table("sproc").orderBy("ts_ms").collect()
    assert(got.length == 6) // parity with the batch/file replay tests
    assert(got.head.getAs[Float]("Engine_Speed") == 2000.0f)
  }

  test("CAN-over-TCP struct source (S6): packed CanTcpPacket records " +
      "decode to frame parity with the text fixture; RTR/ERR drop") {
    // serialize fixtures/mini.log's frames as 32-byte CanTcpPacket
    // records (tcpstream.h layout: LE can_id@0, dlc@4, data@8, epoch
    // double@16, packetID i64@24), plus one RTR and one ERR frame that
    // must drop, and a torn 10-byte tail that must be ignored
    def pkt(id: Long, data: Array[Byte], epoch: Double, pid: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(id.toInt); b.put(data.length.toByte); b.put(0.toByte)
      b.put(0.toByte); b.put(0.toByte)
      b.put(java.util.Arrays.copyOf(data, 8))
      b.putDouble(epoch); b.putLong(pid)
      b.array()
    }
    def hx(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val t0 = 1700000000.0
    val packets = Seq(
      pkt(0x100, hx("401F4B01"), t0, 1L),
      pkt(0x200, hx("02E8030000000000"), t0 + 0.004, 2L),
      pkt(0x300, hx("0000803F"), t0 + 0.008, 3L),
      pkt(0x400, hx("00D007"), t0 + 0.012, 4L),
      pkt(0x400, hx("01FF7F"), t0 + 0.016, 5L),
      pkt(0x7FF | 0x40000000L, hx("DEADBEEF"), t0 + 0.018, 6L), // RTR: drop
      pkt(0x20000001L, hx("00"), t0 + 0.019, 7L),               // ERR: drop
      pkt(0x7FF, hx("DEADBEEF"), t0 + 0.020, 8L),
      pkt(0x100, hx("00000000"), t0 + 0.050, 9L))
    val server = new java.net.ServerSocket(0)
    val sender = new Thread(() => {
      val s = server.accept()
      val os = s.getOutputStream
      packets.foreach(p => os.write(p))
      os.write(new Array[Byte](10)) // torn tail: must not become a row
      os.flush(); s.close()
    }, "s6-test-server")
    sender.setDaemon(true); sender.start()
    try {
      val frames = CanStream.framesFromTcpStruct(spark, "127.0.0.1",
        server.getLocalPort)
      val wide = CanStream.decoded(net, frames,
        carryCols = Seq("packet_id")).drop("ts")
      val q = wide.writeStream.format("memory").queryName("s6tcp")
        .outputMode("append").start()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("s6tcp").count() < 6 && System.nanoTime() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      q.stop()
      val got = spark.table("s6tcp").orderBy("ts_ms").collect()
      // 7 decodable packets, minus the unknown-id 0x7FF → 6 wide rows,
      // the same parity as the text replay tests; RTR/ERR never surface
      assert(got.length == 6, got.mkString("\n"))
      assert(got.head.getAs[Float]("Engine_Speed") == 2000.0f)
      assert(got.head.getAs[Long]("packet_id") == 1L)
      assert(got.last.getAs[Long]("packet_id") == 9L)
      // epoch reinterpret is exact: micros round-trip the text timestamps
      assert(got.map(_.getAs[Double]("ts_ms")).toSeq ==
        Seq(0, 4, 8, 12, 16, 50).map(t0 * 1000 + _))
    } finally server.close()
  }

  test("unpackTcpStruct in batch: stays in one codegen stage with no " +
      "exchange, and round-trips a recorded packet dump") {
    def pkt(id: Long, data: Array[Byte], epoch: Double, pid: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(id.toInt); b.put(data.length.toByte); b.put(0.toByte)
      b.put(0.toByte); b.put(0.toByte)
      b.put(java.util.Arrays.copyOf(data, 8))
      b.putDouble(epoch); b.putLong(pid)
      b.array()
    }
    // through parquet: a Seq-backed relation constant-folds to a
    // LocalTableScan and there would be no scan/codegen plan to pin
    val dir = java.nio.file.Files.createTempDirectory("pkt_dump").toString
    Seq(
      pkt(0x100, Array[Byte](0x40, 0x1F, 0x4B, 1), 1700000000.25, 7L),
      pkt(0x123 | 0x80000000L, Array[Byte](1), 1.5, 8L)) // EFF flag masks off
      .toDF("packet").write.mode("overwrite").parquet(dir)
    val out = CanStream.unpackTcpStruct(spark.read.parquet(dir))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unpack must be map-only:\n$plan")
    // the executedPlan string marks whole-stage-codegen spans "*(n)";
    // one span covers both project and filter
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      s"unpack fell out of codegen:\n$plan")
    val rows = out.orderBy("packet_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("ts_us") == 1700000000250000L)
    assert(rows(0).getAs[Long]("can_id") == 0x100L)
    assert(rows(0).getAs[Array[Byte]]("data").toSeq ==
      Seq[Byte](0x40, 0x1F, 0x4B, 1))
    assert(rows(1).getAs[Long]("can_id") == 0x123L) // EFF bit stripped
  }

  test("unpackTcpStruct property: 200 random packets decode identically " +
      "to an independent ByteBuffer reference") {
    val rnd = new scala.util.Random(42)
    val packets = (1 to 200).map { _ =>
      val raw = new Array[Byte](32)
      rnd.nextBytes(raw)
      // dlc byte must be a plausible 0..15 so `least(dlc, 8)` is exercised
      raw(4) = (rnd.nextInt(16) & 0xFF).toByte
      raw
    }
    // independent reference: plain ByteBuffer struct reads, no hex/conv
    def ref(p: Array[Byte]): Option[(Long, Array[Byte], Long, Long)] = {
      val b = java.nio.ByteBuffer.wrap(p)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val idRaw = b.getInt(0).toLong & 0xFFFFFFFFL
      val epoch = b.getDouble(16)
      if ((idRaw & 0x60000000L) != 0) None
      else if (epoch.isNaN || math.abs(epoch) >= 9.2e12) None // corrupt
      else {
        val dlc = math.min(p(4) & 0xFF, 8)
        // HALF_UP like Spark's round() — Math.round is half-toward-
        // positive-infinity, which differs on negative exact halves
        val ts = java.math.BigDecimal.valueOf(epoch * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        Some((idRaw & 0x1FFFFFFFL,
          java.util.Arrays.copyOfRange(p, 8, 8 + dlc), ts, b.getLong(24)))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("pkt_prop").toString
    packets.toDF("packet").write.mode("overwrite").parquet(dir)
    val got = CanStream.unpackTcpStruct(spark.read.parquet(dir))
      .orderBy("packet_id")
      .select("can_id", "data", "ts_us", "packet_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq,
        r.getLong(2), r.getLong(3)))
    val want = packets.flatMap(ref)
      .map(t => (t._1, t._2.toSeq, t._3, t._4)).sortBy(_._4)
    assert(got.length == want.length) // same RTR/ERR drops
    got.zip(want).foreach { case (g, w) => assert(g == w, s"\n$g\n$w") }
  }

  test("exactStream state works under the RocksDB state-store provider") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    CanStream.StateBackend.configure(spark, CanStream.StateBackend.RocksDB)
    try {
      val input = MemoryStream[String](spark)
      val lines = scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq
      val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF())).drop("ts")
      val exact = CanStream.exactStream(wide, cacheMs = 10.0)
      val q = exact.writeStream.format("memory").queryName("srocks")
        .outputMode("append").start()
      try {
        input.addData(lines.take(5)); q.processAllAvailable()
        input.addData(lines.drop(5)); q.processAllAvailable()
        // the running query's state operator must actually be RocksDB-backed
        // (custom metrics are provider-specific), not silently the default
        val stateMetrics = q.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet.toArray.map(String.valueOf))
        assert(stateMetrics.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb state metrics in ${stateMetrics.distinct.mkString(",")}")
      } finally q.stop() // a failed assert must not leak the query
      // identical results to the in-heap run in the spec above
      val rows = spark.table("srocks").orderBy("Time_ms").collect()
      val t0 = 1700000000000.0
      assert(rows.map(_.getDouble(0)).toSeq == Seq(t0, t0 + 12))
      assert(rows(1).getAs[Int]("Val_B") == 32767)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("framesFromTextFiles maxFilesPerTrigger bounds each micro-batch") {
    val logDir = java.nio.file.Files.createTempDirectory("graft_mfpt").toString
    val lines = scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq
    // 3 backlog files; bound = 1 file per trigger ⇒ 3 data micro-batches
    (0 until 3).foreach { k =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$logDir/part$k.log"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val frames = CanStream.framesFromTextFiles(spark, logDir, maxFilesPerTrigger = Some(1))
    val wide = CanStream.decoded(net, frames).drop("ts")
    val q = wide.writeStream.format("memory").queryName("smfpt")
      .outputMode("append").start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(spark.table("smfpt").count() == 18) // 6 decodable frames × 3 files
    assert(dataBatches.length == 3,
      s"expected 3 bounded micro-batches, got ${dataBatches.length}")
    assert(dataBatches.forall(_.numInputRows == lines.length))
  }

  test("file-stream replay to parquet sink (K1) with AvailableNow") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val logDir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get("fixtures/mini.log"),
      java.nio.file.Paths.get(s"$logDir/mini.log"))
    val frames = CanStream.framesFromTextFiles(spark, logDir)
    val wide = CanStream.decoded(net, frames).drop("ts")
    val q = CanStream.parquetSink(wide, s"$outDir/data", s"$outDir/ckpt",
      Trigger.AvailableNow())
    q.awaitTermination(60000)
    val back = spark.read.parquet(s"$outDir/data")
    assert(back.count() == 6)
    assert(back.schema.fieldNames.contains("Engine_Speed"))
  }

  test("statePartitions sizes state stores, restores the conf, and is frozen in the checkpoint") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_sp_out").toString
    val logDir = java.nio.file.Files.createTempDirectory("graft_sp_in").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get("fixtures/mini.log"),
      java.nio.file.Paths.get(s"$logDir/mini.log"))
    val savedConf = spark.conf.get("spark.sql.shuffle.partitions")

    def run(statePartitions: Option[Int]): Unit = {
      val frames = CanStream.framesFromTextFiles(spark, logDir)
      val bucketed = CanStream.bucketedStreamFromFrames(net, frames, cacheMs = 10L)
      val q = CanStream.parquetSink(bucketed, s"$outDir/data", s"$outDir/ckpt",
        Trigger.AvailableNow(), statePartitions)
      q.awaitTermination(60000)
    }
    run(Some(3))
    // session conf restored after start
    assert(spark.conf.get("spark.sql.shuffle.partitions") == savedConf)
    // the knob is recorded in the checkpoint's offset log (this is what
    // makes it per-query durable rather than a session-lifetime setting)
    val off0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/ckpt/offsets/0")), "UTF-8")
    assert(off0.contains("\"spark.sql.shuffle.partitions\":\"3\""),
      s"offset log should pin 3 state partitions:\n$off0")
    // watermark = max ts (1700000000.050): buckets 000 and 012 closed
    assert(spark.read.parquet(s"$outDir/data").count() == 2)

    // a restart asking for a DIFFERENT width keeps the checkpointed 3 —
    // the frozen value wins for the life of the checkpoint
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$logDir/later.log"),
      "(1700000001.000000) vcan0 100#401F4B01\n".getBytes("UTF-8"))
    run(Some(7))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == savedConf)
    import scala.jdk.CollectionConverters._
    val offFiles = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$outDir/ckpt/offsets")).iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.forall(_.isDigit)).sortBy(_.getFileName.toString.toInt)
    val offN = new String(java.nio.file.Files.readAllBytes(offFiles.last), "UTF-8")
    assert(offN.contains("\"spark.sql.shuffle.partitions\":\"3\""),
      s"restart must keep the checkpoint-frozen partition count:\n$offN")
    // the +1s frame advanced the watermark: bucket 050 emitted on restart
    assert(spark.read.parquet(s"$outDir/data").count() == 3)
  }

  test("websocket IPC transport (K2): handshake, one binary frame per chunk") {
    import graft.sinks.WebSocketIpc
    // minimal RFC6455 server: accept one connection, validate the
    // handshake, read one masked binary frame, hand back its payload
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]]()
    val t = new Thread(() => {
      val s = server.accept()
      val in = new java.io.DataInputStream(s.getInputStream)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      val head = new StringBuilder
      while (!head.endsWith("\r\n\r\n")) head.append(in.readByte().toChar)
      val key = head.toString.linesIterator
        .find(_.toLowerCase.startsWith("sec-websocket-key:")).get.split(":", 2)(1).trim
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Accept: " +
        WebSocketIpc.acceptToken(key) + "\r\n\r\n").getBytes("US-ASCII"))
      out.flush()
      val b0 = in.readByte(); val b1 = in.readByte()
      assert((b0 & 0x0f) == 0x2 && (b1 & 0x80) != 0) // binary, masked
      val len = (b1 & 0x7f) match {
        case 126 => in.readUnsignedShort().toLong
        case 127 => in.readLong()
        case n => n.toLong
      }
      val mask = new Array[Byte](4); in.readFully(mask)
      val data = new Array[Byte](len.toInt); in.readFully(data)
      for (i <- data.indices) data(i) = (data(i) ^ mask(i % 4)).toByte
      received.put(data)
      s.close()
    })
    t.setDaemon(true); t.start()

    val input = MemoryStream[String](spark)
    input.addData(scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF())).drop("ts")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ws").toString
    val q = WebSocketIpc.wsSink(wide, "127.0.0.1", server.getLocalPort, "/ipc", ckpt)
    q.awaitTermination(60000)
    val payload = received.poll(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(payload != null && payload.nonEmpty)
    // the binary message is a complete Arrow IPC stream
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(payload), alloc)
    var rows = 0
    while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    val fields = reader.getVectorSchemaRoot.getSchema.getFields
    reader.close(); alloc.close(); server.close()
    assert(rows == 6)
    assert(fields.toString.contains("Engine_Speed"))
  }

  test("arrow IPC sink round-trips batches (K2)") {
    import graft.sinks.ArrowIpcSink
    val outDir = java.nio.file.Files.createTempDirectory("graft_ipc").toString
    val input = MemoryStream[String](spark)
    input.addData(scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF())).drop("ts")
    val q = ArrowIpcSink.fileSink(wide, s"$outDir/ipc", s"$outDir/ckpt")
    q.awaitTermination(60000)
    val files = new java.io.File(s"$outDir/ipc").listFiles().filter(_.getName.endsWith(".arrows"))
    assert(files.nonEmpty)
    // read back with Arrow and count rows
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val in = new java.io.FileInputStream(files.head)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    var rows = 0
    while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    reader.close(); in.close(); alloc.close()
    assert(rows == 6)
  }

  test("console sink (K3) renders selected signal values per micro-batch (P9)") {
    // the live-decode surface: selected signals printed driver-side per
    // batch. Assert the actual rendered text — column headers and a known
    // decoded value from the fixture (Engine_Speed of mini.log line 1 =
    // le u16 0x1F40 * 0.25 = 2000.0)
    val input = MemoryStream[String](spark)
    input.addData(scala.io.Source.fromFile("fixtures/mini.log").getLines().toSeq)
    val wide = CanStream.decoded(net, CandumpParser.parseLines(input.toDF()))
      .drop("ts").withColumnRenamed("ts_ms", graft.can.DbcColumns.TimeCol)
    // scala Console.println resolves Console.out (not System.out at call
    // time); the query thread is spawned inside withOut's dynamic scope,
    // so it inherits the capture
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      val q = CanStream.consoleSink(wide, Seq("Engine_Speed", "Engine_Temp"))
      q.processAllAvailable()
      q.stop()
    }
    val rendered = buf.toString("UTF-8")
    assert(rendered.contains("Engine_Speed") && rendered.contains("Engine_Temp")
      && rendered.contains(graft.can.DbcColumns.TimeCol),
      s"console render missing expected columns:\n$rendered")
    assert(rendered.contains("2000.0"),
      s"console render missing decoded Engine_Speed value:\n$rendered")
  }
}
