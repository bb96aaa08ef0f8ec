package graft.serving

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame

/** The online-store backend seam — the boundary where this library meets a
  * network serving edge.
  *
  * Reference counterparts: the `OnlineStore` provider interface
  * (provider/online.go:43-54 — CreateTable/Set/Get over Redis/Dynamo/...),
  * the gRPC request path (serving/serving.go `FeatureServe`), and the Arrow
  * Flight streamer (streamer/iceberg_streamer.py:22-106 `do_get`). Those
  * wire protocols need connector/grpc/flight jars this environment doesn't
  * ship, so the seam is the documented interface instead:
  *
  *  - an external deployment implements [[KvBackend]] over its KV store;
  *    `putBatch` is the per-chunk write the K9 chunk-addressed export
  *    ([[graft.ops.Materialize]] chunks) streams EXECUTOR-side via
  *    [[OnlineBulkLoad.bulkLoad]] — no driver materialization at any scale;
  *  - `get` backs the request-path handler (the gRPC FeatureServe body is
  *    `store.features(names, entity)` verbatim);
  *  - the training-set stream ([[TrainingSetIterator]]) is what a Flight
  *    `do_get` would wrap record-batch-wise.
  *
  * [[InProcessKv]] is the single-JVM default behind [[OnlineStore]].
  */
trait KvBackend {
  def createTable(feature: String): Unit
  def putBatch(feature: String, rows: Iterator[(Any, Any)]): Unit
  def get(feature: String, entity: Any): Option[Any]
}

/** TrieMap-backed in-process store — the honest single-JVM equivalent of
  * the reference's Redis copy. Loads go through the driver (`collect`),
  * which is exactly why the external path exists on the trait instead. */
final class InProcessKv extends KvBackend {
  private val tables = TrieMap.empty[String, TrieMap[Any, Any]]
  override def createTable(feature: String): Unit =
    tables.putIfAbsent(feature, TrieMap.empty[Any, Any])
  override def putBatch(feature: String, rows: Iterator[(Any, Any)]): Unit = {
    createTable(feature)
    val t = tables(feature)
    rows.foreach { case (k, v) => t.put(k, v) }
  }
  override def get(feature: String, entity: Any): Option[Any] =
    tables.get(feature).flatMap(_.get(entity))
}

object OnlineBulkLoad {
  /** The 100 TB load path: every partition opens ITS OWN backend client
    * (`backendFactory` runs executor-side) and streams its rows — the
    * driver never sees the data. Use with a network-backed [[KvBackend]];
    * an [[InProcessKv]] would scatter state across executor JVMs on a real
    * cluster, which is why [[OnlineStore.load]] collects instead. */
  def bulkLoad(backendFactory: () => KvBackend, feature: String,
               materialized: DataFrame, entityCol: String = "entity",
               valueCol: String = "value"): Unit =
    materialized.select(entityCol, valueCol).foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        backendFactory().putBatch(feature, rows.map(r => r.get(0) -> r.get(1)))
    }
}
