package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the S6 TCP struct source (the end-to-end decode
  * parity lives in CanStreamSpec): offset replay fail-fast, admission
  * cap, commit pruning, and partial-record handling at the byte layer.
  */
class TcpStructSourceSpec extends AnyFunSuite {

  /** A loopback server that writes `bytes` to the first client. */
  private def withServer(bytes: Array[Byte])(f: Int => Unit): Unit = {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        s.getOutputStream.write(bytes); s.getOutputStream.flush(); s.close()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    try f(server.getLocalPort) finally server.close()
  }

  private def awaitCount(s: TcpStructMicroBatchStream, n: Long): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (s.latestOffset().asInstanceOf[LineCountOffset].count < n &&
      System.nanoTime() < deadline) Thread.sleep(20)
  }

  test("whole packets buffer, a torn tail never surfaces, commit prunes") {
    // 3 whole packets + 7 trailing bytes
    val bytes = new Array[Byte](3 * TcpStructSource.PacketBytes + 7)
    bytes.indices.foreach(i => bytes(i) = (i % 127).toByte)
    withServer(bytes) { port =>
      val s = new TcpStructMicroBatchStream("127.0.0.1", port, Long.MaxValue)
      try {
        s.initialOffset()
        awaitCount(s, 3)
        assert(s.latestOffset().asInstanceOf[LineCountOffset].count == 3)
        val part = s.planInputPartitions(LineCountOffset(0), LineCountOffset(3))
        val pkts = part.head.asInstanceOf[PacketsPartition].packets
        assert(pkts.length == 3)
        assert(pkts.forall(_.length == TcpStructSource.PacketBytes))
        assert(pkts(1).toSeq == bytes.slice(32, 64).toSeq)
        s.commit(LineCountOffset(2))
        // committed prefix is pruned; later ranges still plan
        val rest = s.planInputPartitions(LineCountOffset(2), LineCountOffset(3))
        assert(rest.head.asInstanceOf[PacketsPartition].packets.length == 1)
      } finally s.stop()
    }
  }

  test("offsets from a previous connection fail fast; admission cap bounds " +
      "latestOffset") {
    withServer(new Array[Byte](5 * TcpStructSource.PacketBytes)) { port =>
      val s = new TcpStructMicroBatchStream("127.0.0.1", port, 2L)
      try {
        s.initialOffset()
        awaitCount(s, 2)
        // cap: 5 packets buffered, at most 2 admitted per trigger
        assert(s.latestOffset().asInstanceOf[LineCountOffset].count == 2)
        val e = intercept[IllegalStateException] {
          s.planInputPartitions(LineCountOffset(50), LineCountOffset(52))
        }
        assert(e.getMessage.contains("previous connection"))
      } finally s.stop()
    }
  }
}
