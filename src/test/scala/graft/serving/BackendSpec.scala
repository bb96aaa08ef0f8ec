package graft.serving

import graft.SparkSpec

/** A custom [[KvBackend]] substitutes transparently behind [[OnlineStore]],
  * and the executor-side bulk load streams every row without the driver. */
class BackendSpec extends SparkSpec {
  import spark.implicits._

  test("OnlineStore routes load/get through the backend seam") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val stub = new KvBackend {
      val inner = new InProcessKv
      def createTable(f: String): Unit = { calls += s"create:$f"; inner.createTable(f) }
      def putBatch(f: String, rows: Iterator[(Any, Any)]): Unit = {
        calls += s"put:$f"; inner.putBatch(f, rows)
      }
      def get(f: String, e: Any): Option[Any] = inner.get(f, e)
    }
    val store = new OnlineStore(stub)
    store.load("f1", Seq((1L, 2.0), (2L, 3.0)).toDF("entity", "value"))
    assert(store.get("f1", 1L).contains(2.0))
    assert(store.get("f1", 99L).isEmpty)
    assert(calls.toList == List("create:f1", "put:f1"))
  }

  test("bulkLoad writes executor-side through the factory") {
    BackendSpec.shared = new InProcessKv
    OnlineBulkLoad.bulkLoad(() => BackendSpec.shared, "f2",
      (0L until 100L).map(i => (i, i * 0.5)).toDF("entity", "value"))
    assert(BackendSpec.shared.get("f2", 40L).contains(20.0))
    assert((0L until 100L).forall(i => BackendSpec.shared.get("f2", i).isDefined))
  }
}

object BackendSpec {
  /** JVM-shared so local-mode executor threads and the assertion see the
    * same store (a real deployment's factory opens a network client). */
  @transient var shared: InProcessKv = _
}
