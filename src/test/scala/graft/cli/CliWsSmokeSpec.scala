package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sinks.WebSocketIpc

/** End-to-end smoke of the CLI's K2 side channel (`--ws-host`): the
  * batch decode run pushes its written rows as ONE Arrow-IPC WebSocket
  * binary message to an in-process RFC 6455 server, and the payload's
  * row count matches the parquet sink. Runs the CLI in its own JVM (the
  * CliStreamSmokeSpec pattern — the CLI owns its SparkSession).
  */
class CliWsSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def readIpcRows(bytes: Array[Byte]): Long = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    var rows = 0L
    while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
    reader.close(); alloc.close()
    rows
  }

  /** In-process RFC 6455 server: accepts concurrent connections, reads
    * ONE masked binary message per connection into `received`. Returns
    * (server socket, message queue); caller closes the socket.
    */
  private def startWsServer(): (java.net.ServerSocket,
      java.util.concurrent.LinkedBlockingQueue[Array[Byte]]) = {
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]]()
    val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        new Thread(() => {
          try {
            val in = new java.io.DataInputStream(s.getInputStream)
            val out = new java.io.DataOutputStream(s.getOutputStream)
            val head = new StringBuilder
            while (!head.endsWith("\r\n\r\n")) head.append(in.readByte().toChar)
            val key = head.toString.linesIterator
              .find(_.toLowerCase.startsWith("sec-websocket-key:"))
              .get.split(":", 2)(1).trim
            out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
              "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
              "Sec-WebSocket-Accept: " + WebSocketIpc.acceptToken(key) +
              "\r\n\r\n").getBytes("US-ASCII"))
            out.flush()
            val b0 = in.readByte(); val b1 = in.readByte()
            assert((b0 & 0x0f) == 0x2 && (b1 & 0x80) != 0)
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
          } catch { case _: Throwable => () }
        }).start()
      } catch { case _: Throwable => () } // server closed
    })
    acceptor.setDaemon(true); acceptor.start()
    (server, received)
  }

  test("CLI batch --ws-host pushes the run's rows as one valid IPC " +
      "message; exit 0; parquet row count matches") {
    val (server, received) = startWsServer()
    val outDir = java.nio.file.Files.createTempDirectory("cli_ws").toString + "/out"
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.master=local[4]",
      "-Dspark.sql.shuffle.partitions=4",
      "-cp", cp, "graft.cli.Main", "fixtures/mini.dbc",
      "--if", "fixtures/mini.log", "--of", outDir,
      "--file", "--cache", "10",
      "--ws-host", s"127.0.0.1:${server.getLocalPort}/ipc")
    val logFile = java.nio.file.Files.createTempFile("cli_ws", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(sys.props("user.dir")))
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    val proc = pb.start()
    try {
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "batch CLI did not exit")
      val log = scala.io.Source.fromFile(logFile).mkString
      assert(proc.exitValue() == 0, s"CLI failed; log:\n${log.takeRight(4000)}")
      val payload = received.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(payload != null, "no WebSocket message arrived")
      assert(readIpcRows(payload) == spark.read.parquet(outDir).count(),
        "IPC payload row count != parquet sink")
      assert(received.poll(2, java.util.concurrent.TimeUnit.SECONDS) == null,
        "expected exactly one chunk-per-run message in driver mode")
    } finally {
      server.close()
      proc.destroyForcibly()
      proc.waitFor()
      ()
    }
  }

  test("CLI batch --ws-host --ws-distributed pushes partition-count " +
      "messages whose rows sum to the parquet sink") {
    val (server, received) = startWsServer()
    val outDir = java.nio.file.Files.createTempDirectory("cli_wsd").toString + "/out"
    // a 300-frame log (10 ms buckets over ~1.5 s → ~150 wide rows across
    // all 4 shuffle partitions → several part files), and a read-back
    // maxPartitionBytes far below the 4 MB per-file open cost so every
    // part file becomes its own scan partition — the smoke then MUST see
    // one message per partition, not a single funneled chunk
    val logPath = java.nio.file.Files.createTempFile("cli_wsd_in", ".log")
    val logLines = (0 until 300).map { i =>
      val usTotal = i * 5000L
      val sec = 1700000000L + usTotal / 1000000L
      val us = usTotal % 1000000L
      val payload = Seq("100#401F4B01", "200#02E8030000000000",
        "300#0000803F")(i % 3)
      s"($sec.${"%06d".format(us)}) vcan0 $payload"
    }
    java.nio.file.Files.write(logPath,
      logLines.mkString("\n").getBytes("US-ASCII"))
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.master=local[4]",
      "-Dspark.sql.shuffle.partitions=4",
      // AQE would (correctly, at scale) coalesce 150 tiny rows into one
      // write partition — turn coalescing off so the run writes several
      // part files and the partition-per-message contract is observable
      "-Dspark.sql.adaptive.coalescePartitions.enabled=false",
      "-Dspark.sql.files.maxPartitionBytes=131072",
      "-cp", cp, "graft.cli.Main", "fixtures/mini.dbc",
      "--if", logPath.toString, "--of", outDir,
      "--file", "--cache", "10",
      "--ws-host", s"127.0.0.1:${server.getLocalPort}/ipc",
      "--ws-distributed")
    val logFile = java.nio.file.Files.createTempFile("cli_wsd", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(sys.props("user.dir")))
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    val proc = pb.start()
    try {
      assert(proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "batch CLI did not exit")
      val log = scala.io.Source.fromFile(logFile).mkString
      assert(proc.exitValue() == 0, s"CLI failed; log:\n${log.takeRight(4000)}")
      // drain: executors push concurrently, and per-connection handler
      // threads may still be mid-read after the CLI process exits — a
      // short fixed quiet-poll races them on a loaded host, so poll
      // until the row sum reaches the sink count (success) or a hard
      // deadline (fail), never stopping early on a transiently empty
      // queue
      val parquetRows = spark.read.parquet(outDir).count()
      val msgs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var sum = 0L
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (sum < parquetRows && System.nanoTime() < deadline) {
        val m = received.poll(2, java.util.concurrent.TimeUnit.SECONDS)
        if (m != null) { msgs += m; sum += readIpcRows(m) }
      }
      assert(msgs.nonEmpty, "no WebSocket messages arrived")
      assert(msgs.size > 1,
        s"expected one message per non-empty partition (>1), got ${msgs.size}")
      assert(sum == parquetRows,
        s"sum of per-partition IPC rows $sum != parquet sink $parquetRows")
      // duplicate-push detection the sum-target drain would otherwise
      // lose: once the sink count is reached, the queue must go quiet
      assert(received.poll(2, java.util.concurrent.TimeUnit.SECONDS) == null,
        "extra message after the full row count arrived — duplicate push")
    } finally {
      server.close()
      proc.destroyForcibly()
      proc.waitFor()
      ()
    }
  }

  test("--ws-distributed without --ws-host exits 2 with usage") {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx512m", "-cp", cp, "graft.cli.Main", "fixtures/mini.dbc",
      "--if", "fixtures/mini.log", "--ws-distributed")
    val logFile = java.nio.file.Files.createTempFile("cli_ws2", ".log").toFile
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(sys.props("user.dir")))
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile)
    val proc = pb.start()
    try {
      assert(proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(proc.exitValue() == 2)
      val log = scala.io.Source.fromFile(logFile).mkString
      assert(log.contains("--ws-distributed requires --ws-host"))
    } finally { proc.destroyForcibly(); proc.waitFor(); () }
  }
}
