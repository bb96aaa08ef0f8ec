package graft.serving

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.sparkproject.connect.grpc.{MethodDescriptor, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

import ProtoWire.{R, W}

/** The reference's gRPC serving wire protocol, served for real — the
  * `featureform.serving.proto.Feature` service (proto/serving.proto:15-25;
  * server role serving/serving.go:57-127) on an actual gRPC/HTTP2
  * endpoint, so a generated reference client can connect. Runs entirely
  * on runtimes already in the Spark distribution: the gRPC core/netty and
  * protobuf runtimes shaded into spark-connect (`org.sparkproject.connect
  * .grpc` / `.protobuf` — grpc-netty binds the unshaded `io.netty` jars
  * beside it), plus the repo's dependency-free [[ProtoWire]] wire-format
  * codec. No generated stubs: each RPC is a hand-built [[MethodDescriptor]]
  * over an identity byte marshaller, with request/response messages
  * encoded/decoded straight from the published protobuf wire spec — the
  * same bytes a protoc-generated client produces and parses.
  *
  * Method → engine mapping (same backing surfaces as the HTTP facade):
  *  - FeatureServe → [[OnlineStore.features]] (O1/O2/O3; entity duck-typed
  *    long-or-string like the HTTP route)
  *  - Nearest → [[OnlineStore.nearest]] (O4)
  *  - TrainingData / TrainingDataColumns → registered training frames
  *    (B3/S9: streamed via `toLocalIterator`, 256 rows per message)
  *  - SourceData / SourceColumns → registered sources with `limit` (S10/O6)
  *  - BatchFeatureServe → [[OnlineStore.batchRows]] (B1/B2 shape)
  *  - TrainTestSplit (bidi) → [[graft.ops.SplitSession]] (X3: INITIALIZE /
  *    TRAINING / TEST protocol with per-request batch_size and
  *    iterator_done, reference serving.py:310-410)
  *  - GetResourceLocation → registered location strings
  *
  * Scalar mapping onto the proto `Value` oneof: String→str, Int→int32,
  * Long→int64, Float→float, Double→double, Boolean→bool, float array →
  * Vector32, Timestamp→int64 epoch-millis, Decimal→double, null → empty
  * Value (proto3 unset oneof). */
final class GrpcServe(store: OnlineStore, port: Int = 0,
                      /** Same per-route counters/histograms as the HTTP
                        * facade (route = method name) — server-side latency
                        * truth beside the client-observed numbers. Pass a
                        * ServingServer's instance to expose the gRPC routes
                        * on that server's `/metrics` scrape (one scrape for
                        * both wire surfaces). */
                      val metrics: Metrics = new Metrics) {
  import GrpcServe._

  private val sources = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val trainingSets = scala.collection.concurrent.TrieMap.empty[String, (DataFrame, String)]
  private val locations = scala.collection.concurrent.TrieMap.empty[String, String]

  def registerSource(name: String, df: DataFrame): Unit = sources.put(name, df)

  /** Register a training frame; `labelCol` defaults to `label` if present
    * else the LAST column (the reference's training frames end in the
    * label). */
  def registerTrainingSet(name: String, df: DataFrame,
                          labelCol: String = ""): Unit = {
    val label =
      if (labelCol.nonEmpty) labelCol
      else if (df.columns.contains("label")) "label"
      else df.columns.last
    trainingSets.put(name, (df, label))
  }

  def registerLocation(name: String, variant: String, location: String): Unit =
    locations.put(s"$name/$variant", location)

  // ------------------------------------------------------------ handlers

  private def featureServe(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val entities = scala.collection.mutable.ArrayBuffer.empty[String]
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => names += readFeatureId(r.readSlice())._1
      case (2, _) =>
        val e = r.readSlice()
        var em = true
        while (em) e.readTag() match {
          case (0, _) => em = false
          case (2, _) => entities += e.readString() // deprecated single
          case (3, _) => entities += e.readString()
          case (_, wt) => e.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    require(entities.nonEmpty, "at least one entity required")
    val w = new W
    entities.foreach { raw =>
      val entity: Any = raw.toLongOption.getOrElse(raw) // HTTP route's rule
      val vs = store.features(names.toSeq, entity)
      w.msg(2) { vl => vs.foreach(v => vl.msg(1)(writeValue(_, v.orNull))) }
    }
    w.result()
  }

  private def nearest(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var name = ""
    var vec: Array[Float] = Array.empty
    var k = 0
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = readFeatureId(r.readSlice())._1
      case (2, _) =>
        val v = r.readSlice()
        var vm = true
        while (vm) v.readTag() match {
          case (0, _) => vm = false
          case (1, ProtoWire.WtLen) => vec = v.readPackedFloats()
          case (1, ProtoWire.WtFixed32) => vec = vec :+ v.readFloat()
          case (_, wt) => v.skip(wt)
        }
      case (3, _) => k = r.readVarint().toInt
      case (_, wt) => r.skip(wt)
    }
    val w = new W
    store.nearest(name, vec, k).foreach { case (id, _) => w.str(1, id.toString) }
    w.result()
  }

  private def trainingColumns(req: Array[Byte]): Array[Byte] = {
    val (df, label) = lookupTraining(readIdField(req))
    val w = new W
    df.columns.filterNot(_ == label).foreach(w.str(1, _))
    w.str(2, label)
    w.result()
  }

  private def sourceColumns(req: Array[Byte]): Array[Byte] = {
    val df = lookupSource(readIdField(req))
    val w = new W
    df.columns.foreach(w.str(1, _))
    w.result()
  }

  private def resourceLocation(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var name = ""
    var variant = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = r.readString()
      case (2, _) => variant = r.readString()
      case (_, wt) => r.skip(wt)
    }
    val loc = locations.getOrElse(s"$name/$variant",
      throw Status.NOT_FOUND.withDescription(s"no location for $name/$variant")
        .asRuntimeException())
    val w = new W
    w.str(1, loc)
    w.result()
  }

  private def trainingData(req: Array[Byte],
                           obs: StreamObserver[Array[Byte]]): Unit = {
    val (df, label) = lookupTraining(readIdField(req))
    val featCols = df.columns.filterNot(_ == label)
    val ordered = df.selectExpr((featCols :+ label).map(c => s"`$c`"): _*)
    streamRows(ordered, obs) { (w, row) =>
      w.msg(1) { m =>
        var i = 0
        while (i < featCols.length) { m.msg(1)(writeValue(_, row.get(i))); i += 1 }
        m.msg(2)(writeValue(_, row.get(featCols.length)))
      }
    }
  }

  private def sourceData(req: Array[Byte],
                         obs: StreamObserver[Array[Byte]]): Unit = {
    val r = new R(req)
    var name = ""
    var limit = Long.MaxValue
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = readFeatureId(r.readSlice())._1
      case (2, _) => limit = r.readVarint()
      case (_, wt) => r.skip(wt)
    }
    val df0 = lookupSource(name)
    val df = if (limit > 0 && limit < Long.MaxValue) df0.limit(limit.toInt) else df0
    streamRows(df, obs) { (w, row) =>
      w.msg(1) { m =>
        var i = 0
        while (i < row.length) { m.msg(1)(writeValue(_, row.get(i))); i += 1 }
      }
    }
  }

  private def batchFeatureServe(req: Array[Byte],
                                obs: StreamObserver[Array[Byte]]): Unit = {
    val r = new R(req)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => names += readFeatureId(r.readSlice())._1
      case (_, wt) => r.skip(wt)
    }
    val it = store.batchRows(names.toSeq).grouped(RowsPerMessage)
    it.foreach { group =>
      val w = new W
      group.foreach { case (entity, vals) =>
        w.msg(1) { m =>
          m.msg(1)(writeValue(_, entity))
          vals.foreach(v => m.msg(2)(writeValue(_, v.orNull)))
        }
      }
      obs.onNext(w.result())
    }
    obs.onCompleted()
  }

  /** Bidi TrainTestSplit: INITIALIZE pins the split view, then each
    * TRAINING/TEST request pulls `batch_size` rows from the respective
    * paired iterator; `iterator_done` marks exhaustion (reference protocol
    * serving.py:310-410). One [[graft.ops.SplitSession]] per RPC. */
  private def trainTestSplit(obs: StreamObserver[Array[Byte]])
      : StreamObserver[Array[Byte]] =
    new StreamObserver[Array[Byte]] {
      private var session: graft.ops.SplitSession = _
      private var labelIdx = -1
      private var trainIt: Iterator[Row] = _
      private var testIt: Iterator[Row] = _

      override def onNext(req: Array[Byte]): Unit = try {
        val r = new R(req)
        var name = ""
        var testSize = 0.0f
        var shuffle = false
        var randomState = 0
        var requestType = 0
        var batchSize = 1024
        var more = true
        while (more) r.readTag() match {
          case (0, _) => more = false
          case (1, _) => name = readFeatureId(r.readSlice())._1
          case (3, _) => testSize = r.readFloat()
          case (5, _) => shuffle = r.readVarint() != 0
          case (6, _) => randomState = r.readVarint().toInt
          case (7, _) => requestType = r.readVarint().toInt
          case (8, _) => batchSize = math.max(1, r.readVarint().toInt)
          case (_, wt) => r.skip(wt)
        }
        requestType match {
          case 0 => // INITIALIZE
            val (df, label) = lookupTraining(name)
            labelIdx = df.columns.indexOf(label)
            session = new graft.ops.SplitSession(df, Seq(df.columns.head),
              testSize.toDouble, randomState.toLong).initialize()
            // the request's shuffle flag is honored with the training-set
            // iterator's buffered shuffle, seeded by random_state (the
            // reference shuffles client-side the same way; the SPLIT
            // itself is hash-deterministic either way)
            def it(base: Iterator[Row]): Iterator[Row] =
              if (shuffle) TrainingSetIterator.shuffled(base,
                bufferSize = 1024, seed = randomState.toLong)
              else base
            trainIt = it(session.train())
            testIt = it(session.test())
            val w = new W
            w.enum(1, 0)
            w.bool(3, true) // result = initialized
            obs.onNext(w.result())
          case t => // 1 = TRAINING, 2 = TEST
            require(session != null, "INITIALIZE first")
            val it = if (t == 1) trainIt else testIt
            val batch = it.take(batchSize).toSeq
            val w = new W
            w.enum(1, t)
            w.msg(4) { rows =>
              batch.foreach { row =>
                rows.msg(1) { m =>
                  var i = 0
                  while (i < row.length) {
                    if (i != labelIdx) m.msg(1)(writeValue(_, row.get(i)))
                    i += 1
                  }
                  m.msg(2)(writeValue(_, row.get(labelIdx)))
                }
              }
            }
            w.bool(2, !it.hasNext)
            obs.onNext(w.result())
        }
      } catch {
        case e: Throwable =>
          // close BEFORE erroring: after onError the transport may never
          // deliver onError/onCompleted to this request observer, and the
          // session's persisted split frame would leak for the JVM's life
          if (session != null) { session.close(); session = null }
          obs.onError(toStatus(e))
      }

      override def onError(t: Throwable): Unit =
        if (session != null) { session.close(); session = null }
      override def onCompleted(): Unit = {
        if (session != null) { session.close(); session = null }
        obs.onCompleted()
      }
    }

  // ----------------------------------------------------------- helpers

  private def lookupSource(name: String): DataFrame =
    sources.getOrElse(name,
      throw Status.NOT_FOUND.withDescription(s"source $name").asRuntimeException())
  private def lookupTraining(name: String): (DataFrame, String) =
    trainingSets.getOrElse(name,
      throw Status.NOT_FOUND.withDescription(s"training set $name").asRuntimeException())

  private def readIdField(req: Array[Byte]): String = {
    val r = new R(req)
    var name = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = readFeatureId(r.readSlice())._1
      case (_, wt) => r.skip(wt)
    }
    name
  }

  /** Stream a frame as length-bounded messages: `toLocalIterator`
    * (partition-at-a-time, never the whole frame on this node) grouped to
    * [[RowsPerMessage]] rows per gRPC message. */
  private def streamRows(df: DataFrame, obs: StreamObserver[Array[Byte]])
                        (writeRow: (W, Row) => Unit): Unit = {
    df.toLocalIterator().asScala.grouped(RowsPerMessage).foreach { group =>
      val w = new W
      group.foreach(row => writeRow(w, row))
      obs.onNext(w.result())
    }
    obs.onCompleted()
  }

  private def toStatus(e: Throwable): Throwable = e match {
    case s: org.sparkproject.connect.grpc.StatusRuntimeException => s
    case _ => Status.INTERNAL
      .withDescription(Option(e.getMessage).getOrElse(e.toString))
      .asRuntimeException()
  }

  private def unary(route: String, h: Array[Byte] => Array[Byte]) =
    ServerCalls.asyncUnaryCall(
      new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte],
                            obs: StreamObserver[Array[Byte]]): Unit = {
          val t0 = System.nanoTime()
          try {
            val out = h(req)
            metrics.observe(route, System.nanoTime() - t0, error = false)
            obs.onNext(out); obs.onCompleted()
          } catch {
            case e: Throwable =>
              metrics.observe(route, System.nanoTime() - t0, error = true)
              obs.onError(toStatus(e))
          }
        }
      })

  private def serverStreaming(route: String,
      h: (Array[Byte], StreamObserver[Array[Byte]]) => Unit) =
    ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte],
                            obs: StreamObserver[Array[Byte]]): Unit = {
          val t0 = System.nanoTime()
          try {
            h(req, obs)
            metrics.observe(route, System.nanoTime() - t0, error = false)
          } catch {
            case e: Throwable =>
              metrics.observe(route, System.nanoTime() - t0, error = true)
              obs.onError(toStatus(e))
          }
        }
      })

  private val service: ServerServiceDefinition = {
    import MethodDescriptor.MethodType._
    ServerServiceDefinition.builder(ServiceName)
      .addMethod(method("FeatureServe", UNARY),
        unary("FeatureServe", featureServe))
      .addMethod(method("Nearest", UNARY), unary("Nearest", nearest))
      .addMethod(method("TrainingDataColumns", UNARY),
        unary("TrainingDataColumns", trainingColumns))
      .addMethod(method("SourceColumns", UNARY),
        unary("SourceColumns", sourceColumns))
      .addMethod(method("GetResourceLocation", UNARY),
        unary("GetResourceLocation", resourceLocation))
      .addMethod(method("TrainingData", SERVER_STREAMING),
        serverStreaming("TrainingData", trainingData))
      .addMethod(method("SourceData", SERVER_STREAMING),
        serverStreaming("SourceData", sourceData))
      .addMethod(method("BatchFeatureServe", SERVER_STREAMING),
        serverStreaming("BatchFeatureServe", batchFeatureServe))
      .addMethod(method("TrainTestSplit", BIDI_STREAMING),
        ServerCalls.asyncBidiStreamingCall(
          new ServerCalls.BidiStreamingMethod[Array[Byte], Array[Byte]] {
            override def invoke(obs: StreamObserver[Array[Byte]])
                : StreamObserver[Array[Byte]] = trainTestSplit(obs)
          }))
      .build()
  }

  private val server = NettyServerBuilder
    .forAddress(new java.net.InetSocketAddress("127.0.0.1", port))
    .addService(service)
    .build()

  def start(): GrpcServe = { server.start(); this }
  def boundPort: Int = server.getPort
  def stop(): Unit = server.shutdownNow()
}

object GrpcServe {
  val ServiceName = "featureform.serving.proto.Feature"
  val RowsPerMessage = 256

  private val BytesMarshaller = new MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(value: Array[Byte]): java.io.InputStream =
      new java.io.ByteArrayInputStream(value)
    override def parse(stream: java.io.InputStream): Array[Byte] =
      stream.readAllBytes()
  }

  /** Hand-built descriptor — what protoc's generated stubs contain, minus
    * the generated message classes (ProtoWire codes the payloads). Shared
    * by the server and any in-JVM test client. */
  def method(name: String,
             mt: MethodDescriptor.MethodType): MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setType(mt)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(ServiceName, name))
      .build()

  /** FeatureID/SourceID/TrainingDataID are wire-identical: (name, version). */
  def readFeatureId(r: R): (String, String) = {
    var name = ""
    var version = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = r.readString()
      case (2, _) => version = r.readString()
      case (_, wt) => r.skip(wt)
    }
    (name, version)
  }

  /** Scala value → proto `Value` oneof (field numbers from
    * proto/serving.proto:94-107). null → no field set (proto3 unset). */
  def writeValue(w: W, v: Any): Unit = v match {
    case null => ()
    case s: String => w.str(1, s)
    case i: Int => w.int32(6, i)
    case l: Long => w.int64(5, l)
    case f: Float => w.float(3, f)
    case d: Double => w.double(4, d)
    case b: Boolean => w.bool(7, b)
    case t: java.sql.Timestamp => w.int64(5, t.getTime)
    case d: java.math.BigDecimal => w.double(4, d.doubleValue())
    case d: BigDecimal => w.double(4, d.toDouble)
    case a: Array[Float] => w.msg(9)(_.packedFloats(1, a))
    case s: Seq[_] if s.forall(_.isInstanceOf[Float]) =>
      w.msg(9)(_.packedFloats(1, s.asInstanceOf[Seq[Float]]))
    case r: Row => // struct values (e.g. (v, t) pairs) flatten to first field
      writeValue(w, r.get(0))
    case other => w.str(1, other.toString)
  }

  /** proto `Value` → Scala (the client half; exercised by GrpcServeSpec's
    * in-JVM generated-client stand-in). */
  def readValue(r: R): Any = {
    var out: Any = null
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => out = r.readString()
      case (2, _) => out = r.readVarint().toInt
      case (3, _) => out = r.readFloat()
      case (4, _) => out = r.readDouble()
      case (5, _) => out = r.readVarint()
      case (6, _) => out = r.readVarint().toInt
      case (7, _) => out = r.readVarint() != 0
      case (9, _) =>
        val v = r.readSlice()
        var vm = true
        while (vm) v.readTag() match {
          case (0, _) => vm = false
          case (1, ProtoWire.WtLen) => out = v.readPackedFloats()
          case (1, ProtoWire.WtFixed32) =>
            out = (Option(out).map(_.asInstanceOf[Array[Float]])
              .getOrElse(Array.empty[Float]) :+ v.readFloat())
          case (_, wt) => v.skip(wt)
        }
      case (10, _) => out = r.readVarint().toInt
      case (11, _) => out = r.readVarint()
      case (_, wt) => r.skip(wt)
    }
    out
  }
}
