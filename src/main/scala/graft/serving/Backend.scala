package graft.serving

import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path, Paths}
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
  *  - backends that also implement [[ExecutorBackend]] advertise a
  *    serializable client factory, which routes [[OnlineStore.load]]
  *    through that executor-side path automatically;
  *  - `get` backs the request-path handler (the gRPC FeatureServe body is
  *    `store.features(names, entity)` verbatim);
  *  - the training-set stream ([[TrainingSetIterator]]) is what a Flight
  *    `do_get` would wrap record-batch-wise.
  *
  * [[DiskKv]] is the partition-backed default behind [[OnlineStore]] — loads
  * stream per-partition, the driver never holds the materialization.
  * [[InProcessKv]] is the explicit small-corpus special case.
  */
trait KvBackend {
  def createTable(feature: String): Unit
  def putBatch(feature: String, rows: Iterator[(Any, Any)]): Unit
  /** Upsert with an EXPLICIT global version (a streaming batchId): when
    * writers span JVMs, per-writer clocks cannot order conflicting puts —
    * the caller's version can. Higher version wins; within one version a
    * key must appear in at most one call (the micro-batch contract).
    * Default delegates to [[putBatch]] for backends with their own
    * conflict resolution (a network KV's server-side ordering). */
  def putBatchVersioned(feature: String, version: Long,
                        rows: Iterator[(Any, Any)]): Unit =
    putBatch(feature, rows)
  def get(feature: String, entity: Any): Option[Any]
  /** Full-table iteration (Redis SCAN role) — backs the serving-side vector
    * scan and index build. */
  def scan(feature: String): Iterator[(Any, Any)]
  /** Point deletion (the right-to-erasure write). Default rides the
    * append-only path as a [[KvTombstone]] record — last-write-wins
    * resolution makes the key disappear from `get`/`scan`, and segment
    * `compact` physically drops it; backends with native deletes
    * override. */
  def delete(feature: String, entity: Any): Unit =
    putBatch(feature, Iterator(entity -> KvTombstone))
}

/** The deletion marker for append-only backends: a serializable case
  * object, so ObjectInputStream's readResolve restores the singleton and
  * identity checks survive the segment round trip. */
case object KvTombstone extends Serializable

/** A backend whose clients can be constructed executor-side: `clientFactory`
  * must be serializable and capture no JVM-local state (a connection string,
  * a shared filesystem path). [[OnlineStore.load]] streams partitions
  * through it instead of collecting to the driver. */
trait ExecutorBackend { this: KvBackend =>
  def clientFactory: () => KvBackend
}

/** TrieMap-backed in-process store — the honest single-JVM equivalent of
  * the reference's Redis copy for corpora that fit driver memory. Loads go
  * through the driver (`collect`); anything bigger belongs on [[DiskKv]] or
  * a network [[ExecutorBackend]]. */
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
  override def scan(feature: String): Iterator[(Any, Any)] =
    tables.get(feature).iterator.flatMap(_.iterator)
  override def delete(feature: String, entity: Any): Unit =
    tables.get(feature).foreach(_.remove(entity))
}

/** Hash-bucketed segment store on a filesystem path — the partition-backed
  * [[KvBackend]] that makes the DEFAULT serving load path streaming:
  *
  *  - `putBatch` groups its rows by `hash(key) % buckets` and appends one
  *    immutable segment file per touched bucket (unique name per call — no
  *    coordination between concurrent writers, so every Spark partition
  *    writes independently);
  *  - `get`/`scan` read through a per-bucket map cache keyed by the
  *    bucket's segment-file set, so lookups are map-speed after first touch
  *    and new segments are picked up automatically;
  *  - `clientFactory` captures only the root path string: on local mode
  *    and any shared filesystem (NFS/EFS/fuse-mounted object store) the
  *    executor-written segments are immediately servable. On a cluster
  *    without a shared FS this backend is the wrong choice — implement
  *    [[ExecutorBackend]] over the network KV instead (same seam).
  *
  * This is the engine-side realization of the reference's chunked online
  * copy (runner/materialize.go:101-230): each partition = one chunk, each
  * segment file = one chunk write.
  */
final class DiskKv(rootDir: String, buckets: Int = 64)
    extends KvBackend with ExecutorBackend {
  require(buckets > 0, "buckets must be positive")
  private val root: Path = Paths.get(rootDir)

  private def tableDir(feature: String): Path = {
    // filesystem-safe table name (feature names are caller-controlled)
    val safe = feature.map(c =>
      if (c.isLetterOrDigit || c == '_' || c == '-') c else '%')
    root.resolve(safe + "-" + Integer.toHexString(feature.hashCode))
  }
  private def bucketDir(feature: String, b: Int): Path =
    tableDir(feature).resolve(f"b$b%03d")
  private def bucketOf(key: Any): Int = Math.floorMod(key.hashCode, buckets)

  override def createTable(feature: String): Unit =
    Files.createDirectories(tableDir(feature))

  // time-ordered names: bucketMap merges segments in sorted order, so a
  // monotonic prefix makes repeated puts of the same key last-write-wins
  // (streaming upserts depend on this). The prefix is wall-clock-anchored
  // but per-JVM monotonic (same-millisecond sequential batches must not
  // reorder); cross-JVM writers need putBatchVersioned — per-writer clocks
  // cannot order conflicting puts across JVMs. Within one putBatch a key
  // appears at most once, so the UUID tiebreak is safe either way.
  override def putBatch(feature: String, rows: Iterator[(Any, Any)]): Unit =
    writeGrouped(feature, rows,
      f"seg-${DiskKv.nextSegTime()}%019d-")

  /** Versioned segments carry a `seg-v` prefix: 'v' sorts after every
    * digit, so ALL versioned (streaming) segments overlay the whole
    * unversioned (bulk-load) base, and among themselves order by the
    * caller's global version — cross-JVM last-write-wins without clocks.
    * Lifecycle contract: bulk-load the base first, stream versions on top;
    * a bulk re-load under live versioned writers needs a fresh table. */
  override def putBatchVersioned(feature: String, version: Long,
                                 rows: Iterator[(Any, Any)]): Unit = {
    require(version >= 0, "version must be non-negative")
    writeGrouped(feature, rows, f"seg-v$version%019d-")
  }

  private def writeGrouped(feature: String, rows: Iterator[(Any, Any)],
                           prefix: String): Unit = {
    val grouped = rows.foldLeft(
      scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuffer[(Any, Any)]]) {
      case (acc, kv) =>
        acc.getOrElseUpdate(bucketOf(kv._1),
          scala.collection.mutable.ArrayBuffer.empty) += kv
        acc
    }
    grouped.foreach { case (b, pairs) =>
      val dir = bucketDir(feature, b)
      Files.createDirectories(dir)
      writeSegment(dir, prefix + java.util.UUID.randomUUID().toString,
        pairs.iterator, pairs.length)
    }
  }

  /** Crash-atomic segment publish: the bytes land under a `.tmp-` name and
    * only an ATOMIC same-directory rename makes them a `seg-` file readers
    * consume. A writer killed mid-segment (an executor dying mid-batch, a
    * halted streaming JVM) therefore leaves a `.tmp-` orphan that readers
    * never open — without this, one truncated `seg-` file poisons every
    * subsequent read of its bucket with EOFException. Orphans are swept by
    * [[compact]] (which already requires no concurrent writers). */
  private def writeSegment(dir: Path, segName: String,
                           pairs: Iterator[(Any, Any)], count: Int): Unit = {
    val tmp = dir.resolve(".tmp-" + java.util.UUID.randomUUID().toString)
    val out = new ObjectOutputStream(new BufferedOutputStream(
      Files.newOutputStream(tmp)))
    try {
      out.writeInt(count)
      pairs.foreach { case (k, v) => out.writeObject(k); out.writeObject(v) }
    } finally out.close()
    Files.move(tmp, dir.resolve(segName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  // (feature, bucket) -> (segment-file set, merged map); rebuilt whenever
  // the segment set changes (a re-list per access — local-FS cheap, and the
  // price of lock-free multi-writer ingestion)
  private val cache =
    TrieMap.empty[(String, Int), (Set[String], Map[Any, Any])]

  private def bucketMap(feature: String, b: Int): Map[Any, Any] = {
    val dir = bucketDir(feature, b)
    if (!Files.isDirectory(dir)) return Map.empty
    val segs = {
      val s = Files.list(dir)
      // only published segments: a `.tmp-` file is an in-flight or
      // crash-orphaned write (see writeSegment) and must never be read
      try s.iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seg-")).toList.sorted
      finally s.close()
    }
    val key = (feature, b)
    cache.get(key) match {
      case Some((cached, m)) if cached == segs.toSet => m
      case _ =>
        val m = Map.newBuilder[Any, Any]
        segs.foreach { name =>
          val in = new ObjectInputStream(new BufferedInputStream(
            Files.newInputStream(dir.resolve(name))))
          try {
            val n = in.readInt()
            var i = 0
            while (i < n) { m += (in.readObject() -> in.readObject()); i += 1 }
          } finally in.close()
        }
        val built = m.result()
        cache.put(key, (segs.toSet, built))
        built
    }
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  override def get(feature: String, entity: Any): Option[Any] =
    bucketMap(feature, bucketOf(entity)).get(entity)
      .filter(_ != KvTombstone)

  override def scan(feature: String): Iterator[(Any, Any)] =
    Iterator.range(0, buckets).flatMap(b => bucketMap(feature, b).iterator)
      .filter(_._2 != KvTombstone)

  override def clientFactory: () => KvBackend = {
    val r = rootDir
    val nb = buckets
    () => new DiskKv(r, nb)
  }

  /** Merge every bucket's segment chain into one segment — the maintenance
    * pass a long-running streaming sink needs (each micro-batch appends a
    * segment per touched bucket; reads re-merge the whole chain on every
    * cache refresh). The merged segment takes a fresh monotonic name, so
    * it sorts AFTER everything it merged: a reader that lists mid-swap
    * (merged + not-yet-deleted originals) still resolves every key to the
    * merged value — last-write-wins is preserved at every instant. Run
    * from ONE maintenance process per table; concurrent readers are safe,
    * concurrent writers to the same bucket are not (their segment could be
    * merged-then-overshadowed or deleted mid-write). */
  def compact(feature: String): Unit = {
    var b = 0
    while (b < buckets) {
      val dir = bucketDir(feature, b)
      if (Files.isDirectory(dir)) {
        val (segs, orphans) = {
          val s = Files.list(dir)
          try {
            val names = s.iterator().asInstanceOf[java.util.Iterator[Path]]
              .asScala.map(_.getFileName.toString).toList
            (names.filter(_.startsWith("seg-")).sorted,
              names.filter(_.startsWith(".tmp-")))
          } finally s.close()
        }
        // crash-orphaned in-flight segments: compact's contract already
        // excludes concurrent writers, so any .tmp- here is dead weight
        orphans.foreach(name => Files.deleteIfExists(dir.resolve(name)))
        // Tombstones are dropped PHYSICALLY during the merge — safe
        // because compact folds every segment in the bucket, so no older
        // segment survives to resurrect the key. This is the erasure
        // story's second half: after compact, the deleted entity's
        // identifier no longer exists anywhere in the bucket's bytes
        // (asserted in BackendSpec). A single-segment bucket is also
        // rewritten when it still carries a tombstone record.
        lazy val hasTombstone =
          bucketMap(feature, b).exists(_._2 == KvTombstone)
        if (segs.length > 1 || (segs.length == 1 && hasTombstone)) {
          val merged = bucketMap(feature, b).filter(_._2 != KvTombstone)
          writeSegment(dir, f"seg-${DiskKv.nextSegTime()}%019d-" +
            java.util.UUID.randomUUID().toString,
            merged.iterator, merged.size)
          segs.foreach(name => Files.deleteIfExists(dir.resolve(name)))
        }
      }
      b += 1
    }
  }
}

object DiskKv {
  private val segClock = new java.util.concurrent.atomic.AtomicLong(0L)
  private[serving] def nextSegTime(): Long =
    segClock.updateAndGet(p => math.max(p + 1, System.currentTimeMillis()))
}

object OnlineBulkLoad {
  /** The 100 TB load path: every partition opens ITS OWN backend client
    * (`backendFactory` runs executor-side) and streams its rows — the
    * driver never sees the data. [[OnlineStore.load]] takes this path
    * automatically for [[ExecutorBackend]]s; an [[InProcessKv]] would
    * scatter state across executor JVMs on a real cluster, which is why it
    * loads through the driver instead. */
  def bulkLoad(backendFactory: () => KvBackend, feature: String,
               materialized: DataFrame, entityCol: String = "entity",
               valueCol: String = "value"): Unit =
    materialized.select(entityCol, valueCol).foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        backendFactory().putBatch(feature, rows.map(r => r.get(0) -> r.get(1)))
    }
}
