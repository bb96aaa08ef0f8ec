package graft.serving

import org.sparkproject.connect.grpc.Status
import org.sparkproject.connect.grpc.stub.{ServerCallStreamObserver, StreamObserver}

/** gRPC server-streaming flow control — the half of backpressure the
  * transport cannot do alone. `StreamObserver.onNext` never blocks: a
  * producer that outruns a slow client just accumulates encoded messages
  * on the server heap (the reference's generated Go/Python servers get
  * blocking `Send` from grpc-go/grpc-python; grpc-java is async by
  * design). The standard remedy (grpc-java manual flow-control pattern)
  * is to push only while `ServerCallStreamObserver.isReady` — i.e. while
  * the transport's outbound buffer is below its low-water mark — and
  * resume from the `onReady` callback when the client drains it. Server
  * memory is then bounded by the HTTP/2 flow-control window however slow
  * the consumer, which is what lets [[GrpcServe]] stream an unbounded
  * training set off `toLocalIterator` without driver-heap risk.
  */
object Backpressure {

  /** Drive `msgs` into `obs` under flow control, then complete. Errors
    * raised by the iterator (e.g. a Spark task failure mid-stream) are
    * surfaced as INTERNAL; `onDone` fires exactly once with the failure,
    * if any (metrics hook — production may outlive the caller's frame).
    * Falls back to a plain loop when the observer is not a
    * [[ServerCallStreamObserver]] (in-process test doubles). */
  def drive(obs: StreamObserver[Array[Byte]], msgs: Iterator[Array[Byte]],
            onDone: Option[Throwable] => Unit = _ => ()): Unit = obs match {
    case sc: ServerCallStreamObserver[Array[Byte] @unchecked] =>
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val lock = new Object
      // ONLY ever called from inside drain()'s lock: onDone therefore fires
      // exactly once (CAS) AND always on the thread that owns the message
      // production — resources it releases (FlightServe's Arrow allocator /
      // VectorSchemaRoot) can never be torn down while a batch build is
      // mid-flight on the drain side.
      def finish(err: Option[Throwable], callDead: Boolean): Unit =
        if (done.compareAndSet(false, true)) {
          if (!callDead) err match {
            case None => sc.onCompleted()
            case Some(e) =>
              // onError after a client cancel can itself throw; the RPC is
              // already dead either way
              try sc.onError(toStatus(e)) catch { case _: Throwable => () }
          }
          onDone(err)
        }
      def drain(): Unit = lock.synchronized {
        if (done.get()) return
        try {
          if (sc.isCancelled) { finish(None, callDead = true); return }
          var go = true
          while (go && sc.isReady && msgs.hasNext) {
            if (sc.isCancelled) { finish(None, callDead = true); go = false }
            else sc.onNext(msgs.next())
          }
          // complete as soon as the last message is out, even if that
          // send also used the transport's last credit
          if (!done.get() && !msgs.hasNext) finish(None, callDead = false)
        } catch { case e: Throwable => finish(Some(e), callDead = false) }
      }
      // a cancelled client may never trigger another onReady — the cancel
      // handler re-enters drain(), which takes the lock (waiting out any
      // in-flight batch build), observes isCancelled and runs the same
      // finish path, so cleanup neither waits forever nor races production
      sc.setOnCancelHandler(() => drain())
      sc.setOnReadyHandler(() => drain())
      drain()
    case _ =>
      try { msgs.foreach(obs.onNext); obs.onCompleted(); onDone(None) }
      catch {
        case e: Throwable =>
          try obs.onError(toStatus(e)) catch { case _: Throwable => () }
          onDone(Some(e))
      }
  }

  private[serving] def toStatus(e: Throwable): Throwable = e match {
    case s: org.sparkproject.connect.grpc.StatusRuntimeException => s
    case _ => Status.INTERNAL
      .withDescription(Option(e.getMessage).getOrElse(e.toString))
      .asRuntimeException()
  }
}
