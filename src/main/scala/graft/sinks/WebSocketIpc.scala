package graft.sinks

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** K2 WebSocket transport for the Arrow IPC side channel (reference
  * `/root/reference/src/websocketIPC.h:63-113`): per chunk, serialize an
  * Arrow IPC stream into an in-memory buffer, open a WebSocket to
  * `ws://host:port/target`, perform the client handshake, push the whole
  * buffer as ONE binary message, close.
  *
  * Implemented over raw JDK sockets (RFC 6455 client handshake + framing —
  * the environment ships no WebSocket library, and the protocol subset the
  * reference uses is tiny: one handshake, one binary frame, one close).
  * Points wherever the caller says; typical deployment is a localhost
  * dashboard, mirroring the reference's visualization consumer.
  */
object WebSocketIpc {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** base64(SHA-1(key + GUID)) — the RFC 6455 §4.2.2 accept token; shared
    * with tests so a hand-rolled server can validate the handshake.
    */
  def acceptToken(key: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + WsGuid).getBytes(StandardCharsets.US_ASCII)))

  /** Client side of the handshake + one masked binary frame + close.
    * Blocks until written, like the reference sender.
    */
  def sendBuffer(host: String, port: Int, target: String,
      payload: Array[Byte],
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000): Unit = {
    // bounded connect + handshake-read timeouts: a half-open server must
    // fail the micro-batch loudly, not wedge the streaming query forever
    val socket = new Socket()
    try {
      socket.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
      socket.setSoTimeout(readTimeoutMs)
      val out = new DataOutputStream(socket.getOutputStream)
      val in = new DataInputStream(socket.getInputStream)

      // --- handshake (RFC 6455 §4.1) ---
      val keyBytes = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(keyBytes)
      val key = Base64.getEncoder.encodeToString(keyBytes)
      val req =
        s"GET $target HTTP/1.1\r\n" +
          s"Host: $host:$port\r\n" +
          "Upgrade: websocket\r\n" +
          "Connection: Upgrade\r\n" +
          s"Sec-WebSocket-Key: $key\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n"
      out.write(req.getBytes(StandardCharsets.US_ASCII)); out.flush()

      val response = readHttpHead(in)
      require(response.startsWith("HTTP/1.1 101"),
        // nextOption: a connection dropped before any header byte must
        // report "refused", not NoSuchElementException from the message
        s"websocket handshake refused: ${response.linesIterator.nextOption()
          .getOrElse("<empty response>")}")
      val accept = response.linesIterator
        .find(_.toLowerCase.startsWith("sec-websocket-accept:"))
        .map(_.split(":", 2)(1).trim)
      require(accept.contains(acceptToken(key)),
        "websocket handshake: bad Sec-WebSocket-Accept")

      // --- one binary frame, client-masked (RFC 6455 §5.2/§5.3) ---
      writeFrame(out, opcode = 0x2, payload)
      // --- close frame (opcode 8, empty) ---
      writeFrame(out, opcode = 0x8, Array.emptyByteArray)
      out.flush()
    } finally socket.close()
  }

  private def readHttpHead(in: DataInputStream): String = {
    val buf = new ByteArrayOutputStream()
    var last4 = 0
    var b = in.read()
    while (b >= 0 && last4 != 0x0d0a0d0a) {
      buf.write(b)
      last4 = ((last4 << 8) | b) & 0xffffffff
      if (last4 == 0x0d0a0d0a) () else b = in.read()
    }
    buf.toString(StandardCharsets.US_ASCII)
  }

  private def writeFrame(out: DataOutputStream, opcode: Int,
      payload: Array[Byte]): Unit = {
    out.writeByte(0x80 | opcode) // FIN + opcode
    val maskBit = 0x80 // clients MUST mask
    val n = payload.length
    if (n < 126) out.writeByte(maskBit | n)
    else if (n < 65536) { out.writeByte(maskBit | 126); out.writeShort(n) }
    else { out.writeByte(maskBit | 127); out.writeLong(n.toLong) }
    val mask = new Array[Byte](4)
    new java.security.SecureRandom().nextBytes(mask)
    out.write(mask)
    val masked = new Array[Byte](n)
    var i = 0
    while (i < n) { masked(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    out.write(masked)
  }

  /** Streaming sink: each non-empty micro-batch becomes one Arrow IPC
    * buffer pushed as one WebSocket binary message — the reference's
    * chunk-per-message contract exactly ([[wsSinkDistributed]] is the
    * executor-side option when the driver funnel matters).
    */
  def wsSink(df: DataFrame, host: String, port: Int, target: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect() // side-channel chunk, driver-sized by design
        if (rows.nonEmpty) {
          val buf = new ByteArrayOutputStream()
          ArrowIpcSink.writeRows(batch.schema, rows.iterator, buf)
          sendBuffer(host, port, target, buf.toByteArray)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Executor-side variant of [[wsSink]]: each non-empty PARTITION
    * serializes and pushes its own IPC buffer as one binary message
    * straight from the executor — partition-per-message instead of the
    * reference's chunk-per-batch contract (kept as the [[wsSink]]
    * default). The last driver-side data funnel in the sink tier
    * disappears; executors connect to the endpoint concurrently, so the
    * consumer must accept parallel connections and must not assume one
    * message per micro-batch. At-least-once like the batch form: a
    * failed task replays its partition's message.
    */
  def wsSinkDistributed(df: DataFrame, host: String, port: Int,
      target: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val schema = batch.schema
        batch.foreachPartition {
          (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val buf = new ByteArrayOutputStream()
            ArrowIpcSink.writeRows(schema, it, buf)
            sendBuffer(host, port, target, buf.toByteArray)
          }
          ()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
