package graft.serving

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Process-local serving metrics — the reference's prometheus surface
  * (metrics/metrics.go:16-45: per-feature request counters, error counters
  * and latency histograms via promauto) re-expressed dependency-free:
  * striped [[LongAdder]]s + fixed-bucket histograms per route, rendered in
  * the prometheus text exposition format (format version 0.0.4, a public
  * spec). One instance per [[ServingServer]]; `/metrics` scrapes it, and
  * `graft.ServingBench` reads its load numbers FROM the endpoint instead
  * of trusting client-side timers only.
  *
  * Recording is wait-free (LongAdder per cell); rendering takes a
  * point-in-time sum per cell, which is the prometheus scrape contract
  * (counters are monotone, gauges are instantaneous — we export only
  * counters and cumulative histograms, so a torn read across cells can
  * only lag, never double-count). */
final class Metrics {

  /** Histogram bucket upper bounds in milliseconds (`le=` labels); a +Inf
    * bucket is implicit. Spans the 0.1 ms point-lookup floor to multi-
    * second full-store `/batch` scans. */
  val bucketsMs: Array[Double] =
    Array(0.25, 0.5, 1, 2.5, 5, 10, 25, 50, 100, 250, 1000, 5000)

  final class RouteStats {
    val requests = new LongAdder
    val errors = new LongAdder
    val latencySumNs = new LongAdder
    /** Per-bucket (NON-cumulative) counts; cumulated at render time. */
    val bucket: Array[LongAdder] = Array.fill(bucketsMs.length + 1)(new LongAdder)

    def observe(elapsedNs: Long, error: Boolean): Unit = {
      requests.increment()
      if (error) errors.increment()
      latencySumNs.add(elapsedNs)
      val ms = elapsedNs / 1e6
      var i = 0
      while (i < bucketsMs.length && ms > bucketsMs(i)) i += 1
      bucket(i).increment()
    }
  }

  private val routes = new ConcurrentHashMap[String, RouteStats]()

  def observe(route: String, elapsedNs: Long, error: Boolean): Unit =
    routes.computeIfAbsent(route, _ => new RouteStats)
      .observe(elapsedNs, error)

  def stats(route: String): Option[RouteStats] = Option(routes.get(route))

  /** Per-FEATURE request/error counters + latency histogram — the
    * reference's metrics are labeled by feature, not just route
    * (metrics/metrics.go:16-45: promauto counters AND latency observed
    * per feature name), so two features served from one endpoint get
    * independent traffic/error/latency series. Names arrive from RAW
    * request input (the store serves unknown names as nulls rather than
    * erroring), so cardinality is hard-capped: past [[MaxFeatureLabels]]
    * distinct names, new ones aggregate under `__other__` — a typo loop
    * or scanner cannot grow server memory or scrape size without bound.
    * A multi-feature request observes its wall latency once under EACH
    * requested feature's label (the reference's per-feature observe
    * loop does the same). */
  final class FeatureStats {
    val requests = new LongAdder
    val errors = new LongAdder
    val latencySumNs = new LongAdder
    val bucket: Array[LongAdder] = Array.fill(bucketsMs.length + 1)(new LongAdder)
  }

  private val features = new ConcurrentHashMap[String, FeatureStats]()
  val MaxFeatureLabels = 512

  def observeFeature(name: String, error: Boolean,
                     elapsedNs: Long = 0L): Unit = {
    // soft cap (size+containsKey is racy by a few entries, never by more
    // than the racing threads): overflow names share one bucket
    val key =
      if (features.containsKey(name) || features.size < MaxFeatureLabels) name
      else "__other__"
    val s = features.computeIfAbsent(key, _ => new FeatureStats)
    s.requests.increment()
    if (error) s.errors.increment()
    s.latencySumNs.add(elapsedNs)
    val ms = elapsedNs / 1e6
    var i = 0
    while (i < bucketsMs.length && ms > bucketsMs(i)) i += 1
    s.bucket(i).increment()
  }

  def featureStats(name: String): Option[FeatureStats] =
    Option(features.get(name))

  /** Quantile estimate from the histogram (linear interpolation within the
    * containing bucket — the same estimate `histogram_quantile` computes
    * server-side in prometheus). Returns milliseconds. */
  def quantileMs(route: String, q: Double): Double =
    stats(route).map { s =>
      val counts = s.bucket.map(_.sum())
      val total = counts.sum
      if (total == 0) 0.0
      else {
        val target = q * total
        var cum = 0L
        var i = 0
        while (i < counts.length && cum + counts(i) < target) {
          cum += counts(i); i += 1
        }
        if (i >= bucketsMs.length) bucketsMs.last // +Inf bucket: clamp
        else {
          val lo = if (i == 0) 0.0 else bucketsMs(i - 1)
          val hi = bucketsMs(i)
          val inBucket = counts(i)
          if (inBucket == 0) hi
          else lo + (hi - lo) * ((target - cum) / inBucket)
        }
      }
    }.getOrElse(0.0)

  /** Full prometheus label-value escape (text format 0.0.4): backslash
    * FIRST (else it would re-escape the escapes), then quote, then
    * newline. Feature names come from raw request input, so any of the
    * three can arrive; one unescaped `\` or newline would corrupt every
    * subsequent scrape for the life of the process (entries are never
    * removed). */
  private def escapeLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Prometheus text exposition (0.0.4): counters + cumulative-bucket
    * histograms, deterministically ordered. */
  def render(): String = {
    import scala.jdk.CollectionConverters._
    val b = new StringBuilder
    val sorted = routes.asScala.toSeq.sortBy(_._1)
    def lbl(route: String) = s"""{path="${escapeLabel(route)}"}"""
    b.append("# TYPE graft_requests_total counter\n")
    sorted.foreach { case (p, s) =>
      b.append(s"graft_requests_total${lbl(p)} ${s.requests.sum()}\n")
    }
    b.append("# TYPE graft_request_errors_total counter\n")
    sorted.foreach { case (p, s) =>
      b.append(s"graft_request_errors_total${lbl(p)} ${s.errors.sum()}\n")
    }
    val fsorted = features.asScala.toSeq.sortBy(_._1)
    if (fsorted.nonEmpty) {
      def flbl(n: String) = s"""{feature="${escapeLabel(n)}"}"""
      b.append("# TYPE graft_feature_requests_total counter\n")
      fsorted.foreach { case (n, s) =>
        b.append(s"graft_feature_requests_total${flbl(n)} ${s.requests.sum()}\n")
      }
      b.append("# TYPE graft_feature_errors_total counter\n")
      fsorted.foreach { case (n, s) =>
        b.append(s"graft_feature_errors_total${flbl(n)} ${s.errors.sum()}\n")
      }
      b.append("# TYPE graft_feature_latency_ms histogram\n")
      fsorted.foreach { case (n, s) =>
        val fe = escapeLabel(n)
        var cum = 0L
        var i = 0
        while (i < bucketsMs.length) {
          cum += s.bucket(i).sum()
          val le = if (bucketsMs(i) == bucketsMs(i).toLong)
            bucketsMs(i).toLong.toString else bucketsMs(i).toString
          b.append(s"""graft_feature_latency_ms_bucket{feature="$fe",le="$le"} $cum""")
            .append('\n')
          i += 1
        }
        cum += s.bucket(bucketsMs.length).sum()
        b.append(s"""graft_feature_latency_ms_bucket{feature="$fe",le="+Inf"} $cum""")
          .append('\n')
        b.append(f"graft_feature_latency_ms_sum${flbl(n)} ${s.latencySumNs.sum() / 1e6}%.6f\n")
        b.append(s"graft_feature_latency_ms_count${flbl(n)} ${s.requests.sum()}\n")
      }
    }
    b.append("# TYPE graft_request_latency_ms histogram\n")
    sorted.foreach { case (p, s) =>
      val pe = escapeLabel(p)
      var cum = 0L
      var i = 0
      while (i < bucketsMs.length) {
        cum += s.bucket(i).sum()
        val le = if (bucketsMs(i) == bucketsMs(i).toLong)
          bucketsMs(i).toLong.toString else bucketsMs(i).toString
        b.append(s"""graft_request_latency_ms_bucket{path="$pe",le="$le"} $cum""")
          .append('\n')
        i += 1
      }
      cum += s.bucket(bucketsMs.length).sum()
      b.append(s"""graft_request_latency_ms_bucket{path="$pe",le="+Inf"} $cum""")
        .append('\n')
      b.append(f"graft_request_latency_ms_sum${lbl(p)} ${s.latencySumNs.sum() / 1e6}%.6f\n")
      b.append(s"graft_request_latency_ms_count${lbl(p)} ${s.requests.sum()}\n")
    }
    b.toString
  }
}
