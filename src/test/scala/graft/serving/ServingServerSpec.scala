package graft.serving

import java.net.{HttpURLConnection, URI}
import scala.io.Source
import graft.SparkSpec

/** Integration test for the HTTP serving façade: real sockets, real
  * request/response cycles against a live [[ServingServer]] — the §3.3
  * online-inference boundary (reference serving/serving.go:617-714). */
class ServingServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(10000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("features, on-demand, nearest, training stream and preview over a socket") {
    val store = new OnlineStore(new InProcessKv)
    store.load("clicks", Seq((1L, 10L), (2L, 20L)).toDF("entity", "value"))
    store.load("spend", Seq((1L, 1.5), (2L, 2.5)).toDF("entity", "value"))
    store.registerOnDemand("spend_x2",
      (params, pre) => pre.head.asInstanceOf[Long] * 2L)
    store.loadVectors("emb", Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f))).toDF("entity", "vector"))

    val srv = new ServingServer(store).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      assert(get(s"$base/health")._2 == """{"status":"ok"}""")

      // O1/O2: row assembly; O3: request-time on-demand over precomputed
      val (c1, b1) = get(s"$base/features?names=clicks,spend,spend_x2&entity=1")
      assert(c1 == 200)
      assert(b1 == """{"entity":"1","values":[10,1.5,20]}""")
      // missing entity -> nulls
      assert(get(s"$base/features?names=clicks&entity=99")._2
        == """{"entity":"99","values":[null]}""")
      // missing args -> 400, not a hang or a 500
      assert(get(s"$base/features?entity=1")._1 == 400)

      // O4: nearest over the loaded vector table
      val (c2, b2) = get(s"$base/nearest?feature=emb&k=2&q=1.0,0.05")
      assert(c2 == 200)
      assert(b2.startsWith("""[{"id":1,"""") || b2.startsWith("""[{"id":1,"""))
      assert("\"id\":(\\d+)".r.findAllMatchIn(b2).map(_.group(1)).toSeq
        == Seq("1", "3"))

      // O5: training stream (JSONL, repeat + limit honored)
      val ts = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("e", "s", "v")
      srv.registerDataset("ts1", ts)
      val (c3, b3) = get(s"$base/training?name=ts1&repeat=2")
      assert(c3 == 200)
      val lines = b3.trim.split('\n').toSeq
      assert(lines.size == 4)
      assert(lines.head == """[1,"a",0.5]""")
      assert(get(s"$base/training?name=ts1&repeat=3&limit=5")._2
        .trim.split('\n').length == 5)
      // shuffled stream is a permutation per repeat block size
      val (_, b4) = get(s"$base/training?name=ts1&shuffle=8&seed=7")
      assert(b4.trim.split('\n').toSet == Set("""[1,"a",0.5]""", """[2,"b",1.5]"""))

      // O6: preview
      assert(get(s"$base/preview?name=ts1&limit=1")._2.trim
        == """[1,"a",0.5]""")
      assert(get(s"$base/training?name=nope")._1 == 400)

      // X3: split protocol — train/test partition exactly and replay
      val wide = (1L to 40L).map(i => (i, i * 0.5)).toDF("k", "v")
      srv.registerDataset("w", wide)
      def side(sd: String) = get(
        s"$base/split?name=w&side=$sd&keys=k&testSize=0.25&seed=7")._2
        .trim.split('\n').filter(_.nonEmpty).toSet
      val (tr, te) = (side("train"), side("test"))
      assert(tr.nonEmpty && te.nonEmpty)
      assert((tr & te).isEmpty && (tr ++ te).size == 40)
      assert(side("train") == tr) // deterministic replay
      assert(get(s"$base/split?name=w&side=bogus&keys=k")._1 == 400)

      // B3: /batch streams every entity across the named tables once,
      // row-assembled like /features (null where a feature is missing)
      store.load("only2", Seq((2L, 7L)).toDF("entity", "value"))
      val (cb, bb) = get(s"$base/batch?names=clicks,only2,spend_x2")
      assert(cb == 200)
      val bl = bb.trim.split('\n').toSet
      assert(bl == Set("[1,10,null,20]", "[2,20,7,40]"))
      assert(get(s"$base/batch?names=clicks&limit=1")._2.trim
        .split('\n').length == 1)
      assert(get(s"$base/batch?entity=1")._1 == 400)

      // right-to-erasure on the wire: forgotten entity reads null after
      assert(get(s"$base/forget?names=clicks&entity=1")._1 == 200)
      assert(get(s"$base/features?names=clicks&entity=1")._2
        == """{"entity":"1","values":[null]}""")
      assert(get(s"$base/features?names=clicks&entity=2")._2
        == """{"entity":"2","values":[20]}""") // others untouched
      assert(get(s"$base/forget?entity=1")._1 == 400)
    } finally srv.stop()
  }

  test("concurrent clients: parallel /features + /nearest stay correct and isolated") {
    val store = new OnlineStore(new InProcessKv)
    store.load("f", (1L to 200L).map(i => (i, i * 3L)).toDF("entity", "value"))
    store.loadVectors("emb", Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("entity", "vector"))
    val srv = new ServingServer(store).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      import java.util.concurrent.{Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(16)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val done = new java.util.concurrent.atomic.AtomicInteger(0)
      for (i <- 0 until 200) pool.submit(new Runnable {
        def run(): Unit = try {
          val e = (i % 200) + 1
          val (c, b) = get(s"$base/features?names=f&entity=$e")
          if (c != 200 || b != s"""{"entity":"$e","values":[${e * 3}]}""")
            errors.add(s"features($e): $c $b")
          val (c2, _) = get(s"$base/nearest?feature=emb&k=1&q=1.0,0.0")
          if (c2 != 200) errors.add(s"nearest: $c2")
          done.incrementAndGet()
        } catch { case t: Throwable => errors.add(t.toString) }
      })
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(errors.isEmpty, errors.toString)
      assert(done.get() == 200)
    } finally srv.stop()
  }

  test("mid-stream failure aborts the chunked stream instead of faking a clean end") {
    val store = new OnlineStore(new InProcessKv)
    val srv = new ServingServer(store).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      // rows 0..9 stream fine; row 10 throws inside the iterator — after
      // the 200 header is committed
      val bad = spark.range(0, 20).select(
        org.apache.spark.sql.functions.expr(
          "CASE WHEN id < 10 THEN id ELSE raise_error('boom') END").as("v"))
      srv.registerDataset("bad", bad)
      val (code, body) = get(s"$base/training?name=bad")
      assert(code == 200) // headers committed before the failure
      val lines = body.trim.split('\n').filter(_.nonEmpty)
      // the streamed prefix survives; the stream ends with an IN-BAND error
      // frame (an object, unambiguous vs the array data lines) rather than
      // a clean end that fakes completeness
      assert(lines.last.startsWith("""{"error":"""))
      assert(lines.init.forall(_.startsWith("[")))
      assert(lines.init.length < 20) // the failing tail was never emitted
      // the server survives the failed exchange
      assert(get(s"$base/health")._2 == """{"status":"ok"}""")
    } finally srv.stop()
  }
}
