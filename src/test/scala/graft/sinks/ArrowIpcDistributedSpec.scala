package graft.sinks

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Executor-side Arrow IPC (`ArrowIpcSink.fileSinkDistributed`,
  * `WebSocketIpc.wsSinkDistributed`): byte-identical payload to the
  * collect form on a single partition, partition-parallel valid IPC
  * streams covering all rows, and no collect in the sink path.
  */
class ArrowIpcDistributedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def readIpc(bytes: Array[Byte]): (Long, Seq[Long]) = {
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    var rows = 0L
    val ids = Seq.newBuilder[Long]
    while (reader.loadNextBatch()) {
      val root = reader.getVectorSchemaRoot
      val v = root.getVector(0).asInstanceOf[org.apache.arrow.vector.BigIntVector]
      (0 until root.getRowCount).foreach(i => ids += v.get(i))
      rows += root.getRowCount
    }
    reader.close(); alloc.close()
    (rows, ids.result())
  }

  private def fileBytes(f: java.io.File): Array[Byte] =
    java.nio.file.Files.readAllBytes(f.toPath)

  private def stream(n: Int) = {
    import spark.implicits._
    val input = MemoryStream[Long](spark)
    input.addData(0L until n.toLong)
    input.toDF().select(col("value").as("id"),
      concat(lit("row-"), col("value")).as("tag"))
  }

  test("single partition: the distributed file is byte-identical to the " +
      "collect-form chunk") {
    val base = tmp("ipc_dist")
    val df1 = stream(50).coalesce(1)
    ArrowIpcSink.fileSink(df1, s"$base/ref", s"$base/ck1")
      .awaitTermination(60000)
    val df2 = stream(50).coalesce(1)
    ArrowIpcSink.fileSinkDistributed(df2, s"$base/dist", s"$base/ck2")
      .awaitTermination(60000)
    val ref = new java.io.File(s"$base/ref").listFiles()
      .filter(_.getName.endsWith(".arrows"))
    val dist = new java.io.File(s"$base/dist").listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(ref.length == 1 && dist.length == 1)
    assert(fileBytes(ref.head).sameElements(fileBytes(dist.head)),
      "executor-side serialization must produce the same IPC bytes")
  }

  test("multi-partition: one valid IPC file per non-empty partition, " +
      "union of rows = the batch; a stale part file from an aborted " +
      "wider attempt is deleted on replay") {
    val base = tmp("ipc_dist")
    // simulate an aborted first attempt that planned MORE partitions:
    // its leftover high-numbered part file must not survive the replay
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/out"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/out/batch-0-part-9.arrows"),
      Array[Byte](1, 2, 3))
    val df = stream(97).repartition(3)
    ArrowIpcSink.fileSinkDistributed(df, s"$base/out", s"$base/ck")
      .awaitTermination(60000)
    assert(!new java.io.File(s"$base/out/batch-0-part-9.arrows").exists(),
      "stale part file from the aborted attempt must be deleted")
    val files = new java.io.File(s"$base/out").listFiles()
      .filter(_.getName.endsWith(".arrows")).sortBy(_.getName)
    assert(files.length == 3, s"expected 3 partition files: ${files.toSeq}")
    assert(files.forall(_.getName.matches("batch-\\d+-part-\\d+\\.arrows")))
    val all = files.flatMap(f => readIpc(fileBytes(f))._2)
    assert(all.length == 97 && all.sorted.toSeq == (0L until 97L),
      "every row exactly once across the partition files")
  }

  test("fileSinkDistributed resolves a scheme-qualified dir through the " +
      "Hadoop FileSystem (file: URI) — write and replay-cleanup both") {
    val base = tmp("ipc_uri")
    // stale attempt file, planted through plain java.io — the sink's
    // Hadoop-side listing must still see and delete it — plus an
    // orphaned dot-prefixed checksum sidecar from a pre-checksum-off
    // version of the sink, which the replay must also clean
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/out"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/out/batch-0-part-7.arrows"),
      Array[Byte](9, 9))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/out/.batch-0-part-7.arrows.crc"),
      Array[Byte](1))
    val df = stream(40).repartition(2)
    ArrowIpcSink.fileSinkDistributed(df, s"file:$base/out", s"$base/ck")
      .awaitTermination(60000)
    assert(!new java.io.File(s"$base/out/batch-0-part-7.arrows").exists())
    assert(!new java.io.File(s"$base/out/.batch-0-part-7.arrows.crc").exists(),
      "orphaned legacy checksum sidecar must be cleaned on replay")
    val files = new java.io.File(s"$base/out").listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(files.length == 2, s"expected 2 partition files: ${files.toSeq}")
    val all = files.flatMap(f => readIpc(fileBytes(f))._2)
    assert(all.length == 40 && all.sorted.toSeq == (0L until 40L))
    // the Hadoop LocalFileSystem write must be checksum-free: hidden
    // .arrows.crc sidecars would trip a directory-tailing consumer
    val strays = new java.io.File(s"$base/out").listFiles()
      .filterNot(_.getName.endsWith(".arrows"))
    assert(strays.isEmpty, s"unexpected sidecar files: ${strays.toSeq}")
  }

  test("wsSinkDistributed pushes one valid IPC message per non-empty " +
      "partition; a multi-accept server sees every row") {
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

    val ckpt = tmp("ws_dist")
    val q = WebSocketIpc.wsSinkDistributed(stream(60).repartition(3),
      "127.0.0.1", server.getLocalPort, "/ipc", ckpt)
    q.awaitTermination(60000)
    val payloads = Iterator.continually(
        received.poll(10, java.util.concurrent.TimeUnit.SECONDS))
      .takeWhile(_ != null).take(3).toSeq
    server.close()
    assert(payloads.length == 3, s"expected 3 messages, got ${payloads.length}")
    val all = payloads.flatMap(p => readIpc(p)._2)
    assert(all.length == 60 && all.sorted == (0L until 60L),
      "every row exactly once across the partition messages")
  }
}
