package graft.serving

import scala.collection.mutable

/** In-process serving-side ANN index — the role Redis HNSW plays in the
  * reference (provider/redis.go:260,454-493), re-expressed as multi-probe
  * hyperplane LSH so lookups stop being O(n) linear scans
  * (OnlineStore.nearest) once a feature's vector table is indexed.
  *
  * Same hash family as the batch path ([[graft.functions.Vectors
  * .hyperplaneSignature]]): plane component (p, i) = md5("p|i") mapped to
  * [-1, 1) — deterministic, no RNG state, so the serving index buckets
  * agree with the batch LSH buckets for the same numPlanes.
  *
  * Query: probe buckets in Hamming-distance order from the query signature
  * (exact signature first, then 1-bit flips, then 2-bit flips …) until at
  * least `oversample × k` candidates are gathered, then exact-cosine rank.
  * Worst case degrades to the full scan (all buckets) — never worse than
  * the linear baseline, typically probes a small fraction.
  */
final class VectorIndex(numPlanes: Int = 16) {
  require(numPlanes > 0 && numPlanes <= 30, "numPlanes in (0, 30]")

  private val buckets =
    mutable.HashMap.empty[Int, mutable.ArrayBuffer[(Any, Array[Float], Double)]]
  private var planes: Array[Array[Double]] = _
  private var dim: Int = -1

  private def planeComponent(p: Int, i: Int): Double = {
    val h = graft.functions.expressions.Md5Hash64.lower(s"$p|$i") & Long.MaxValue
    ((h % 2000001L) - 1000000L).toDouble / 1000000.0
  }

  private def ensurePlanes(d: Int): Unit = {
    if (planes == null) {
      dim = d
      planes = Array.tabulate(numPlanes, d)(planeComponent)
    }
    require(d == dim, s"vector dim $d != index dim $dim")
  }

  def signature(vec: Array[Float]): Int = {
    ensurePlanes(vec.length)
    var sig = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i).toDouble * planes(p)(i); i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  // id → bucket signature, so streaming upserts can evict the stale entry
  // without scanning every bucket
  private val sigOf = mutable.HashMap.empty[Any, Int]

  def add(id: Any, vec: Array[Float]): Unit = synchronized {
    // add ≡ upsert on a duplicate id: sigOf keeps only the newest
    // signature, so an appended second entry would orphan the old one —
    // unevictable by remove()/upsert() and still serving stale matches.
    if (sigOf.contains(id)) remove(id)
    var n = 0.0
    var i = 0
    while (i < vec.length) { n += vec(i).toDouble * vec(i); i += 1 }
    val sig = signature(vec)
    buckets.getOrElseUpdate(sig, mutable.ArrayBuffer.empty)
      .append((id, vec, math.sqrt(n)))
    sigOf(id) = sig
  }

  /** Drop `id`'s entry (no-op if absent). */
  def remove(id: Any): Boolean = synchronized {
    sigOf.remove(id) match {
      case Some(sig) =>
        buckets.get(sig).exists { buf =>
          val i = buf.indexWhere(_._1 == id)
          if (i >= 0) buf.remove(i)
          if (buf.isEmpty) buckets.remove(sig)
          i >= 0
        }
      case None => false
    }
  }

  /** Streaming upkeep: replace `id`'s vector in place — the serving-side
    * consumer of a vector changelog ([[graft.streaming.StreamingOnline
    * .vectorSink]]); a stale entry must disappear or overwritten vectors
    * keep matching under their OLD direction. */
  def upsert(id: Any, vec: Array[Float]): Unit = synchronized {
    remove(id)
    add(id, vec)
  }

  def size: Int = synchronized(buckets.valuesIterator.map(_.size).sum)

  /** Top-k by cosine; `oversample` bounds how many candidates are gathered
    * before exact ranking. Returns (id, cosine) sorted (cosine desc, then
    * [[VectorIndex.idTieKey]] — numeric-aware, same as OnlineStore). */
  def nearest(query: Array[Float], k: Int,
              oversample: Int = 4): Seq[(Any, Double)] = synchronized {
    if (buckets.isEmpty) return Nil
    ensurePlanes(query.length)
    val qsig = signature(query)
    var qn = 0.0
    var i = 0
    while (i < query.length) { qn += query(i).toDouble * query(i); i += 1 }
    val qnorm = math.sqrt(qn)
    val target = math.max(k * oversample, k)
    val cand = mutable.ArrayBuffer.empty[(Any, Array[Float], Double)]
    // probe buckets in Hamming order: group existing signatures by distance
    // to the query signature (cheap: one popcount per non-empty bucket)
    val byDist = buckets.keysIterator.toArray
      .sortBy(s => Integer.bitCount(s ^ qsig))
    var b = 0
    while (b < byDist.length &&
      (cand.size < target || Integer.bitCount(byDist(b) ^ qsig) == 0)) {
      cand ++= buckets(byDist(b))
      b += 1
    }
    cand.iterator.map { case (id, v, n) =>
      var dot = 0.0
      var j = 0
      while (j < v.length) { dot += v(j).toDouble * query(j); j += 1 }
      id -> (if (n == 0 || qnorm == 0) 0.0 else dot / (n * qnorm))
    }.toSeq.sortBy { case (id, s) => (-s, VectorIndex.idTieKey(id)) }.take(k)
  }
}

object VectorIndex {
  /** Shared cosine tie-break key (indexed and scan paths must agree):
    * numeric ids order numerically — the oracle's ORDER BY neighbor_id on
    * integer columns puts 2 before 10, which plain string order inverts —
    * and non-numeric ids order lexically after all numeric ones. */
  def idTieKey(e: Any): (Int, Long, String) = {
    val s = e.toString
    try ((0, s.toLong, ""))
    catch { case _: NumberFormatException => (1, 0L, s) }
  }
}
