package graft.serving

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import org.sparkproject.connect.grpc.stub.ServerCallStreamObserver

/** [[Backpressure.drive]] gating logic against a scripted transport: the
  * producer must push ONLY while `isReady`, stall with bounded output when
  * the client is slower (the round-10 scale-killer: an unbounded onNext
  * loop accumulates encoded batches on the driver heap), resume from the
  * onReady callback, and complete/error exactly once. */
class BackpressureSpec extends SparkSpec {

  /** Transport double: ready for `burst` sends, then not-ready until the
    * test "drains the wire" via [[drainWire]]. */
  private final class FakeTransport(burst: Int)
      extends ServerCallStreamObserver[Array[Byte]] {
    val sent = ArrayBuffer.empty[Array[Byte]]
    var completed = false
    var error: Throwable = _
    var onDoneCount = 0
    private var credits = burst
    private var readyHandler: Runnable = _
    private var cancelHandler: Runnable = _
    private var cancelled = false

    def drainWire(): Unit = {
      credits = burst
      readyHandler.run()
    }
    def cancel(): Unit = cancelled = true
    /** What grpc-java does on a real client cancel: flag + handler. */
    def fireCancel(): Unit = {
      cancelled = true
      if (cancelHandler != null) cancelHandler.run()
    }

    override def isReady: Boolean = credits > 0
    override def setOnReadyHandler(r: Runnable): Unit = readyHandler = r
    override def isCancelled: Boolean = cancelled
    override def setOnCancelHandler(r: Runnable): Unit = cancelHandler = r
    override def setCompression(c: String): Unit = ()
    override def setMessageCompression(b: Boolean): Unit = ()
    override def disableAutoInboundFlowControl(): Unit = ()
    override def request(n: Int): Unit = ()
    override def onNext(m: Array[Byte]): Unit = { sent += m; credits -= 1 }
    override def onError(t: Throwable): Unit = error = t
    override def onCompleted(): Unit = completed = true
  }

  private def msgs(n: Int): Iterator[Array[Byte]] =
    (0 until n).iterator.map(i => Array(i.toByte))

  test("producer stalls with bounded output while the client is slow, " +
    "resumes on onReady, completes once") {
    val t = new FakeTransport(burst = 2)
    var done = 0
    Backpressure.drive(t, msgs(10), _ => done += 1)
    // only the transport's buffer worth was produced — NOT all 10
    assert(t.sent.size == 2, "must stop producing when the transport is full")
    assert(!t.completed && done == 0)
    t.drainWire()
    assert(t.sent.size == 4)
    (0 until 3).foreach(_ => t.drainWire())
    assert(t.sent.size == 10,
      "iterator exhausted exactly as the last credit is spent")
    assert(t.completed, "stream completes once the iterator is exhausted")
    assert(done == 1, "onDone fires exactly once")
    assert(t.sent.map(_.head.toInt).toSeq == (0 until 10), "order preserved")
    // further ready signals are no-ops
    t.drainWire()
    assert(t.sent.size == 10 && done == 1)
  }

  test("iterator failure mid-stream surfaces as onError and onDone(Some)") {
    val t = new FakeTransport(burst = 100)
    var failure: Option[Throwable] = null
    val bad = (0 until 5).iterator.map { i =>
      if (i == 3) sys.error("spark task died") else Array(i.toByte)
    }
    Backpressure.drive(t, bad, e => failure = e)
    assert(t.sent.size == 3)
    assert(!t.completed && t.error != null)
    assert(failure.isDefined)
  }

  test("client cancellation stops production without error") {
    val t = new FakeTransport(burst = 2)
    Backpressure.drive(t, msgs(100))
    assert(t.sent.size == 2)
    t.cancel()
    t.drainWire()
    assert(t.sent.size == 2, "no production after cancel")
    assert(t.error == null)
  }

  test("cancel handler fires onDone exactly once — resource release (e.g. " +
    "FlightServe's Arrow allocator) must never double-run, and the dead " +
    "call gets no onCompleted/onError") {
    val t = new FakeTransport(burst = 2)
    var done = 0
    Backpressure.drive(t, msgs(100), _ => done += 1)
    assert(t.sent.size == 2 && done == 0)
    t.fireCancel()          // transport thread path
    t.fireCancel()          // a second cancel signal must be a no-op
    t.drainWire()           // a late onReady must not re-finish either
    assert(done == 1, "onDone fires exactly once on cancel")
    assert(t.sent.size == 2 && !t.completed && t.error == null,
      "no transport calls after a client cancel")
  }

  test("empty stream completes immediately") {
    val t = new FakeTransport(burst = 1)
    var done = 0
    Backpressure.drive(t, Iterator.empty, _ => done += 1)
    assert(t.completed && t.sent.isEmpty && done == 1)
  }
}
