package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}

/** Network serving façade — the reference's gRPC serving surface
  * (serving/serving.go:57-127 TrainingData, 617-714 FeatureServe, 762-780
  * SourceData, 781-837 Nearest; proto/serving.proto) re-expressed as a
  * dependency-free HTTP/JSON server over the JDK's built-in
  * `com.sun.net.httpserver` — the one §3 lifecycle boundary the
  * in-process engine did not cover. gRPC itself needs jars this sandbox
  * doesn't have; the CONTRACT (request → feature row / neighbor list /
  * training-row stream over a socket) is what this closes.
  *
  * Endpoints (all GET, JSON responses):
  *  - `/health` → `{"status":"ok"}`
  *  - `/features?names=a,b&entity=e[&entityType=long]` → FeatureServe:
  *    `{"entity":"e","values":[...]}` (null for missing), on-demand
  *    features computed request-time with the remaining query params.
  *  - `/nearest?feature=f&k=5&q=0.1,0.2,...` → Nearest:
  *    `[{"id":...,"sim":...}, ...]` (indexed when buildIndex ran).
  *  - `/training?name=ts[&repeat=n][&shuffle=buf&seed=s][&limit=n]` →
  *    TrainingData: JSONL stream — a `{"schema":[...]}` object frame
  *    first, then one JSON array per row, chunked transfer — the
  *    iterator protocol (repeat/shuffle are the reference client's
  *    Dataset combinators, applied server-side here).
  *  - `/preview?name=src&limit=n` → SourceData: JSONL, first n rows.
  *  - `/columns?name=ds` → TrainingDataColumns/SourceColumns
  *    (serving.go:293,762): `{"name":…,"columns":[{name,type,nullable}]}`.
  *  - `/metrics` → prometheus text exposition: per-route request/error
  *    counters + latency histograms (reference metrics/metrics.go).
  *
  * Serving reads ride [[OnlineStore]] point lookups and
  * `toLocalIterator` streams — no Spark job per request beyond the
  * training-set scan itself, and the stream never materializes the set
  * driver-side. One JVM thread pool; state registration is in-process
  * (the metadata-server role stays with [[graft.catalog.Catalog]]). */
final class ServingServer(store: OnlineStore, port: Int = 0,
                          threads: Int = 4,
                          /** Bind a catalog to serve the dashboard read
                            * plane — `/search` (the reference's typesense-
                            * backed metadata search role) and `/lineage`
                            * (metadata/dashboard resource DAG export).
                            * None → those endpoints answer 501. */
                          catalog: Option[graft.catalog.Catalog] = None,
                          /** Ledger whose latest run states ride the
                            * `/lineage` export (dashboard run badges). */
                          tasks: Option[graft.sched.TaskRunner] = None) {

  private val sets = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
  server.setExecutor(pool)

  /** Per-route request/error counters + latency histograms (reference
    * metrics/metrics.go promauto registry); scraped by `/metrics`. */
  val metrics = new Metrics

  /** Register a training set / source for `/training` and `/preview`. */
  def registerDataset(name: String, df: DataFrame): Unit = sets.put(name, df)

  def boundPort: Int = server.getAddress.getPort

  // ----------------------------------------------------------- JSON
  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\""); case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n"); case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private def jsonVal(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => jsonVal(x)
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float =>
      if (n.isNaN || n.isInfinite) "\"" + n + "\"" else n.toString
    case n: Double =>
      if (n.isNaN || n.isInfinite) "\"" + n + "\"" else n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case t: java.sql.Timestamp => t.getTime.toString // epoch-ms, oracle rule
    case d: java.sql.Date => "\"" + d.toString + "\""
    case a: Array[_] => a.map(jsonVal).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(jsonVal).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => "\"" + esc(k.toString) + "\":" + jsonVal(x) }
        .mkString("{", ",", "}")
    case r: Row => r.toSeq.map(jsonVal).mkString("[", ",", "]")
    case s: String => "\"" + esc(s) + "\""
    case other => "\"" + esc(other.toString) + "\""
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        val k = if (i < 0) kv else kv.substring(0, i)
        val v = if (i < 0) "" else java.net.URLDecoder.decode(
          kv.substring(i + 1), UTF_8)
        k -> v
      }.toMap

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  /** Create a metrics-instrumented route: every exchange is counted and
    * its wall latency observed under the CONTEXT path (bounded label
    * cardinality — never the raw request URI); 4xx/5xx responses and
    * mid-stream failures count as errors. */
  private def route(path: String)(fn: HttpExchange => Unit): Unit =
    server.createContext(path, { (ex: HttpExchange) =>
      val t0 = System.nanoTime()
      val failed = handle(fn, ex)
      metrics.observe(path, System.nanoTime() - t0,
        error = failed || ex.getResponseCode >= 400)
    })

  /** Run a route body with the error protocol; returns true iff the body
    * threw (including mid-stream, where the status code stays 200). */
  private def handle(fn: HttpExchange => Unit, ex: HttpExchange): Boolean = {
      try { fn(ex); false }
      catch {
        // Once sendResponseHeaders has committed a (streaming) response we
        // can't send an error status anymore — calling respond() again would
        // throw IllegalStateException and mask the original failure. For
        // NDJSON streams, emit an in-band `{"error":…}` frame (the JDK
        // server's graceful close always writes the chunk terminator, so a
        // wire-level abort isn't expressible — an error frame is the
        // deterministic signal; data lines are always JSON arrays, so the
        // object frame is unambiguous). Binary streams (Arrow) just close:
        // the truncated IPC stream fails the client's reader.
        case e: Throwable if ex.getResponseCode != -1 =>
          System.err.println(s"[ServingServer] mid-stream failure on ${
            ex.getRequestURI.getPath}: $e")
          val isNdjson = Option(
            ex.getResponseHeaders.getFirst("Content-Type"))
            .exists(_.contains("ndjson"))
          if (isNdjson)
            try ex.getResponseBody.write(
              (s"""{"error":"${esc(String.valueOf(e))}"}""" + "\n")
                .getBytes(UTF_8))
            catch { case _: Throwable => () }
          try ex.close() catch { case _: Throwable => () }
          true
        case e: IllegalArgumentException =>
          respond(ex, 400, s"""{"error":"${esc(e.getMessage)}"}""")
          true
        case e: Throwable =>
          respond(ex, 500, s"""{"error":"${esc(String.valueOf(e))}"}""")
          true
      }
  }

  // ----------------------------------------------------------- routes
  route("/health")(ex => respond(ex, 200, """{"status":"ok"}"""))

  route("/features") { ex =>
    val q = query(ex)
    val names = q.getOrElse("names",
      throw new IllegalArgumentException("names required")).split(',').toSeq
    val raw = q.getOrElse("entity",
      throw new IllegalArgumentException("entity required"))
    val entity: Any = q.get("entityType") match {
      case Some("string") => raw
      case Some("long") => raw.toLong
      case _ => raw.toLongOption.getOrElse(raw) // duck-typed default
    }
    val params: Map[String, Any] =
      (q - "names" - "entity" - "entityType").map { case (k, v) =>
        k -> (v.toLongOption orElse v.toDoubleOption getOrElse v: Any)
      }
    val t0 = System.nanoTime()
    val values =
      try store.features(names, entity, params)
      catch { case e: Throwable =>
        val el = System.nanoTime() - t0
        names.foreach(metrics.observeFeature(_, error = true, el)); throw e
      }
    val el = System.nanoTime() - t0
    names.foreach(metrics.observeFeature(_, error = false, el))
    respond(ex, 200, s"""{"entity":${jsonVal(raw)},"values":${
      values.map(jsonVal).mkString("[", ",", "]")}}""")
  }

  route("/nearest") { ex =>
    val q = query(ex)
    val feature = q.getOrElse("feature",
      throw new IllegalArgumentException("feature required"))
    val k = q.getOrElse("k", "10").toInt
    val vec = q.getOrElse("q",
      throw new IllegalArgumentException("q required"))
      .split(',').map(_.toFloat)
    val t0 = System.nanoTime()
    val hits =
      try store.nearest(feature, vec, k)
      catch { case e: Throwable =>
        metrics.observeFeature(feature, error = true,
          System.nanoTime() - t0); throw e
      }
    metrics.observeFeature(feature, error = false, System.nanoTime() - t0)
    respond(ex, 200, hits.map { case (id, sim) =>
      s"""{"id":${jsonVal(id)},"sim":$sim}"""
    }.mkString("[", ",", "]"))
  }

  /** Column descriptors for a DataFrame-backed dataset — the reference's
    * TrainingDataColumns / SourceColumns payload (serving/serving.go:293,
    * 762): name, Spark SQL type, nullability. */
  private def columnsJson(df: DataFrame): String =
    df.schema.fields.map { f =>
      s"""{"name":${jsonVal(f.name)},"type":${
        jsonVal(f.dataType.sql.toLowerCase)},"nullable":${f.nullable}}"""
    }.mkString("[", ",", "]")

  /** NDJSON stream protocol: an optional `{"schema":[...]}` OBJECT frame
    * first, then one JSON ARRAY per row — objects and arrays are mutually
    * unambiguous line shapes, which is also how mid-stream `{"error":…}`
    * frames stay distinguishable. The header is not counted against
    * `limit` (it describes the stream, it isn't a row). */
  private def streamRows(ex: HttpExchange, it: Iterator[Row],
                         limit: Option[Int],
                         schemaHeader: Option[String] = None): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
    ex.sendResponseHeaders(200, 0L) // chunked
    val out = ex.getResponseBody
    schemaHeader.foreach { h =>
      out.write((s"""{"schema":$h}""" + "\n").getBytes(UTF_8))
    }
    // Close normally ONLY on success — the clean close writes the chunked
    // terminator, which must not happen on a truncated stream (handler's
    // mid-stream branch aborts the exchange instead).
    val bounded = limit.map(it.take).getOrElse(it)
    bounded.foreach { r =>
      out.write((jsonVal(r) + "\n").getBytes(UTF_8))
    }
    out.close(); ex.close()
  }

  route("/training") { ex =>
    val q = query(ex)
    val name = q.getOrElse("name",
      throw new IllegalArgumentException("name required"))
    val df = sets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown training set: $name"))
    var it: Iterator[Row] = q.get("repeat") match {
      case Some(n) => TrainingSetIterator.repeat(df, n.toInt)
      case None => TrainingSetIterator.rows(df)
    }
    q.get("shuffle").foreach { buf =>
      it = TrainingSetIterator.shuffled(it, buf.toInt,
        q.getOrElse("seed", "42").toLong)
    }
    streamRows(ex, it, q.get("limit").map(_.toInt),
      schemaHeader = Some(columnsJson(df)))
  }

  route("/arrow") { ex =>
    val q = query(ex)
    val name = q.getOrElse("name",
      throw new IllegalArgumentException("name required"))
    val df = sets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown dataset: $name"))
    val limited = q.get("limit").map(n => df.limit(n.toInt)).getOrElse(df)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.apache.arrow.stream")
    ex.sendResponseHeaders(200, 0L) // chunked
    val out = ex.getResponseBody
    ArrowServe.writeStream(limited, out,
      batchRows = q.getOrElse("batch", "1024").toInt)
    out.close(); ex.close()
  }

  // X3 split protocol over the wire (reference serving/serving.go:128-291:
  // INITIALIZE pins the split view, then train/test streams replay it).
  // The md5-hash split is a pure function of the key columns, so the same
  // (keys, testSize, seed) always partitions identically — train ∪ test =
  // all, train ∩ test = ∅ — and re-requesting a side replays verbatim.
  route("/split") { ex =>
    val q = query(ex)
    val name = q.getOrElse("name",
      throw new IllegalArgumentException("name required"))
    val df = sets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown dataset: $name"))
    val side = q.getOrElse("side",
      throw new IllegalArgumentException("side=train|test required"))
    val keys = q.getOrElse("keys",
      throw new IllegalArgumentException("keys required")).split(',').toSeq
    val testSize = q.getOrElse("testSize", "0.2").toDouble
    val seed = q.getOrElse("seed", "42").toLong
    val frame = side match {
      case "train" => graft.ops.Split.train(df, keys, testSize, seed)
      case "test"  => graft.ops.Split.test(df, keys, testSize, seed)
      case other => throw new IllegalArgumentException(
        s"side must be train or test, got $other")
    }
    streamRows(ex, TrainingSetIterator.rows(frame),
      q.get("limit").map(_.toInt), schemaHeader = Some(columnsJson(frame)))
  }

  // B3 batch feature serve: JSONL, one `[entity, v1, …, vn]` line per
  // entity present in any named table (reference serving.go:716-761) —
  // the bulk complement of /features' point lookup.
  route("/batch") { ex =>
    val q = query(ex)
    val names = q.getOrElse("names",
      throw new IllegalArgumentException("names required")).split(',').toSeq
    val params: Map[String, Any] =
      (q - "names" - "limit").map { case (k, v) =>
        k -> (v.toLongOption orElse v.toDoubleOption getOrElse v: Any)
      }
    val it = store.batchRows(names, params)
      .map { case (e, vs) => Row.fromSeq(e +: vs.map(_.orNull)) }
    // KV-backed stream: the store is schemaless, so the header carries
    // column NAMES only (entity + the requested feature names in order)
    val header = ("entity" +: names)
      .map(n => s"""{"name":${jsonVal(n)}}""").mkString("[", ",", "]")
    streamRows(ex, it, q.get("limit").map(_.toInt),
      schemaHeader = Some(header))
  }

  // right-to-erasure on the wire: point-delete an entity from the named
  // online tables (the offline half — scrubLatest + gcVersions — is a
  // batch job, not a serving call)
  route("/forget") { ex =>
    val q = query(ex)
    val names = q.getOrElse("names",
      throw new IllegalArgumentException("names required")).split(',').toSeq
    val raw = q.getOrElse("entity",
      throw new IllegalArgumentException("entity required"))
    val entity: Any = q.get("entityType") match {
      case Some("string") => raw
      case Some("long") => raw.toLong
      case _ => raw.toLongOption.getOrElse(raw)
    }
    store.forget(entity, names)
    respond(ex, 200, s"""{"forgotten":${jsonVal(raw)},"features":${
      names.map(jsonVal).mkString("[", ",", "]")}}""")
  }

  route("/preview") { ex =>
    val q = query(ex)
    val name = q.getOrElse("name",
      throw new IllegalArgumentException("name required"))
    val df = sets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown source: $name"))
    val limit = q.getOrElse("limit", "10").toInt
    streamRows(ex, TrainingSetIterator.preview(df, limit).iterator, None,
      schemaHeader = Some(columnsJson(df)))
  }

  // Column metadata for a registered dataset — TrainingDataColumns /
  // SourceColumns (reference serving/serving.go:293, 762): the schema
  // without any rows, for dashboards and typed clients.
  route("/columns") { ex =>
    val q = query(ex)
    val name = q.getOrElse("name",
      throw new IllegalArgumentException("name required"))
    val df = sets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown dataset: $name"))
    respond(ex, 200,
      s"""{"name":${jsonVal(name)},"columns":${columnsJson(df)}}""")
  }

  // ---------------------------------------------- dashboard read plane
  // The reference ships a dashboard backend over metadata search +
  // resource browsing (metadata/dashboard, the typesense role). The data
  // contracts already live in-process (Catalog.search tokens, Lineage
  // export); these two routes put them on the wire for a dashboard-class
  // consumer. Read-only, metadata-scale — never a Spark job.

  route("/search") { ex =>
    catalog match {
      case None => respond(ex, 501, """{"error":"no catalog bound"}""")
      case Some(cat) =>
        val q = query(ex)
        val term = q.getOrElse("q",
          throw new IllegalArgumentException("q required"))
        val limit = q.getOrElse("limit", "20").toInt
        val hits = cat.search(term, limit).map { case (k, score) =>
          s"""{"kind":${jsonVal(k.kind)},"id":${jsonVal(k.id)},"score":$score}"""
        }.mkString("[", ",", "]")
        respond(ex, 200, s"""{"q":${jsonVal(term)},"hits":$hits}""")
    }
  }

  route("/lineage") { ex =>
    catalog match {
      case None => respond(ex, 501, """{"error":"no catalog bound"}""")
      case Some(cat) => respond(ex, 200, graft.catalog.Lineage.exportJson(
        // each run's CURRENT state off the O(1) latest-run index — the
        // dashboard polls this route, and runs() re-parses the full
        // ledger JSON per hit (per-attempt history isn't shown here)
        cat, tasks.map(_.latestRuns()).getOrElse(Nil)))
    }
  }

  // resource browse — the dashboard's list view: every registered
  // resource with its lifecycle status, staged-deletion flag, and tags
  route("/resources") { ex =>
    catalog match {
      case None => respond(ex, 501, """{"error":"no catalog bound"}""")
      case Some(cat) =>
        import graft.catalog.ResourceKey
        val keys: Seq[ResourceKey] =
          cat.allSources.map(s => ResourceKey("SOURCE", s.id.toString)) ++
          cat.allFeatures.map(f => ResourceKey("FEATURE", f.id.toString)) ++
          cat.allLabels.map(l => ResourceKey("LABEL", l.id.toString)) ++
          cat.allTrainingSets.map(t =>
            ResourceKey("TRAINING_SET", t.id.toString)) ++
          cat.allEntities.map(e => ResourceKey("ENTITY", e.name)) ++
          cat.allOnDemands.map(o => ResourceKey("ON_DEMAND", o.id.toString)) ++
          cat.allProviders.map(p => ResourceKey("PROVIDER", p.name)) ++
          cat.allUsers.map(u => ResourceKey("USER", u.name)) ++
          cat.allModels.map(m => ResourceKey("MODEL", m.name))
        val kindFilter = query(ex).get("kind")
        val body = keys
          .filter(k => kindFilter.forall(_ == k.kind))
          .map { k =>
            s"""{"kind":${jsonVal(k.kind)},"id":${jsonVal(k.id)},"status":${
              cat.status(k)._1},"staged":${cat.isStaged(k)},"tags":${
              cat.tags(k).map(jsonVal).mkString("[", ",", "]")}}"""
          }.mkString("[", ",", "]")
        respond(ex, 200, body)
    }
  }

  // Prometheus scrape endpoint (reference metrics/metrics.go exposes the
  // same shape via promhttp): text exposition format 0.0.4.
  route("/metrics") { ex =>
    val body = metrics.render().getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    ex.sendResponseHeaders(200, body.length.toLong)
    try ex.getResponseBody.write(body) finally ex.close()
  }

  def start(): ServingServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}
