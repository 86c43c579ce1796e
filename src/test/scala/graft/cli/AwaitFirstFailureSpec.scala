package graft.cli

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}
import org.scalatest.funsuite.AnyFunSuite

/** Unit spec of `Main.awaitFirstFailure` — the CLI's await loop routed
  * through fake query handles, covering the r16 fix: a
  * StreamingQueryException rethrown by `awaitAnyTermination` must reach
  * the graceful exit path even when NO handle exposes the exception
  * (previously that case fell through to the success path and exit 0).
  */
class AwaitFirstFailureSpec extends AnyFunSuite {

  private class FakeQuery(val qname: String) extends StreamingQuery {
    @volatile var active: Boolean = true
    @volatile var exc: Option[StreamingQueryException] = None
    override def name: String = qname
    override def id: java.util.UUID = java.util.UUID.nameUUIDFromBytes(qname.getBytes)
    override def runId: java.util.UUID = id
    override def sparkSession: org.apache.spark.sql.SparkSession = null
    override def isActive: Boolean = active
    override def exception: Option[StreamingQueryException] = exc
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = null
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = Array.empty
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress = null
    override def awaitTermination(): Unit = ()
    override def awaitTermination(timeoutMs: Long): Boolean = true
    override def processAllAvailable(): Unit = ()
    override def stop(): Unit = { active = false }
    override def explain(): Unit = ()
    override def explain(extended: Boolean): Unit = ()
  }

  private def sqe(msg: String): StreamingQueryException =
    new StreamingQueryException(msg, null, "START", "END",
      "STREAM_FAILED",
      Map("id" -> "q", "runId" -> "r", "message" -> msg))

  test("clean stop of the primary returns None") {
    val q = new FakeQuery("primary"); q.active = false
    assert(Main.awaitFirstFailure(q, Nil, () => (), () => ()).isEmpty)
  }

  test("primary failing with a visible exception returns Right(primary)") {
    val q = new FakeQuery("primary")
    val await = () => { q.active = false; q.exc = Some(sqe("boom")) }
    val got = Main.awaitFirstFailure(q, Nil, await, () => ())
    assert(got == Some(Right(q)))
  }

  test("a dead side query with an exception wins while the primary is " +
      "still active") {
    val q = new FakeQuery("primary")
    val s = new FakeQuery("influx")
    val await = () => { s.active = false; s.exc = Some(sqe("side boom")) }
    val got = Main.awaitFirstFailure(q, Seq(s), await, () => ())
    assert(got == Some(Right(s)))
  }

  test("awaitAnyTermination rethrow with NO handle exposing the exception " +
      "returns Left(the caught exception) — never a silent success") {
    val q = new FakeQuery("primary")
    val e = sqe("orphan failure")
    val await: () => Unit = () => throw e
    val got = Main.awaitFirstFailure(q, Seq(new FakeQuery("side")), await, () => ())
    assert(got == Some(Left(e)))
  }

  test("awaitAnyTermination rethrow prefers a handle that carries the " +
      "exception over the caught one") {
    val q = new FakeQuery("primary")
    val s = new FakeQuery("influx")
    s.active = false; s.exc = Some(sqe("handle-visible"))
    val await: () => Unit = () => throw sqe("rethrown")
    val got = Main.awaitFirstFailure(q, Seq(s), await, () => ())
    assert(got == Some(Right(s)))
  }
}
