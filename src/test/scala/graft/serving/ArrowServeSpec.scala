package graft.serving

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowStreamReader
import graft.SparkSpec

/** Arrow IPC streaming: a REAL encode → decode round-trip with the
  * bundled arrow-java reader — schema mapping, nulls, multi-batch
  * chunking, the 2M-style row cap, and the /arrow HTTP endpoint. */
class ArrowServeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte]): (Seq[String], Seq[Seq[Any]]) = {
    val alloc = new RootAllocator(Long.MaxValue)
    val r = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), alloc)
    val root = r.getVectorSchemaRoot
    val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    while (r.loadNextBatch()) {
      for (i <- 0 until root.getRowCount) {
        rows += names.indices.map { c =>
          val v = root.getVector(c)
          if (v.isNull(i)) null
          else v match {
            case lv: ListVector =>
              lv.getObject(i).asScala.toSeq
            case vc: VarCharVector => new String(vc.get(i), "UTF-8")
            case other => other.getObject(i)
          }
        }
      }
    }
    r.close(); alloc.close()
    (names, rows.toSeq)
  }

  test("scalar + array round trip with nulls, multi-batch") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(Array(1.0f, 2.0f))),
      (2L, None, None, None),
      (3L, Some("gamma"), Some(-0.25), Some(Array(0.5f)))
    ).toDF("id", "s", "x", "emb")
    val out = new ByteArrayOutputStream()
    val n = ArrowServe.writeStream(df, out, batchRows = 2) // forces 2 batches
    assert(n == 3L)
    val (names, rows) = decode(out.toByteArray)
    assert(names == Seq("id", "s", "x", "emb"))
    assert(rows.size == 3)
    val byId = rows.map(r => r.head.asInstanceOf[Long] -> r).toMap
    assert(byId(1L)(1) == "alpha" && byId(1L)(2) == 1.5)
    assert(byId(1L)(3) == Seq(1.0f, 2.0f))
    assert(byId(2L)(1) == null && byId(2L)(2) == null && byId(2L)(3) == null)
    assert(byId(3L)(3) == Seq(0.5f))
  }

  test("timestamps ride as epoch micros UTC; row cap enforced") {
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")
    val df = Seq((1L, ts), (2L, ts), (3L, ts)).toDF("id", "t")
    val out = new ByteArrayOutputStream()
    val n = ArrowServe.writeStream(df, out, batchRows = 10, maxRows = 2)
    assert(n == 2L) // the serving-edge cap (reference streamer's 2M bound)
    val (_, rows) = decode(out.toByteArray)
    assert(rows.size == 2)
    assert(rows.head(1).asInstanceOf[Long] == ts.getTime * 1000L)
  }

  test("/arrow endpoint streams a readable IPC stream over HTTP") {
    val store = new OnlineStore(new InProcessKv)
    val srv = new ServingServer(store).start()
    try {
      srv.registerDataset("d1",
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
      val url = java.net.URI.create(
        s"http://127.0.0.1:${srv.boundPort}/arrow?name=d1&limit=2&batch=1").toURL
      val bytes = url.openStream().readAllBytes()
      val (names, rows) = decode(bytes)
      assert(names == Seq("k", "s"))
      assert(rows.map(_.head.asInstanceOf[Long]).toSet == Set(1L, 2L))
    } finally srv.stop()
  }
}
