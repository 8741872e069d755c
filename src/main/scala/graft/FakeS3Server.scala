package graft

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** A queued fault: the next request matching (method, path substring,
  * query substring) draws this response instead of normal handling.
  * `applyFirst` performs the PUT server-side BEFORE failing the response
  * (the ambiguous commit case: applied-but-unacknowledged); `killConn`
  * closes the connection without any response (transport failure). */
case class S3Fault(method: String, pathContains: String, code: Int,
    applyFirst: Boolean = false, killConn: Boolean = false, queryContains: String = "")

/** In-process fake S3 — the DEV/TEST HARNESS (never a production
  * component) behind S3StoreSuite and [[ClusterCheck]]'s object-store
  * phase; it lives in main sources only so the multi-JVM ClusterCheck
  * main can start it without a test classpath. Speaks the REST surface
  * [[graft.sources.S3FileSystem]] needs — GET/HEAD objects (+Range), PUT
  * (+`If-None-Match: *` conditional create, +`x-amz-copy-source` COPY),
  * DELETE (+bulk DeleteObjects), multipart upload lifecycle,
  * ListObjectsV2 with delimiter — with REAL SigV4 verification (the
  * server recomputes every request's signature from the shared secret
  * and rejects mismatches), so the signer is exercised end-to-end, not
  * just "an Authorization header exists". Mirrors the store flow the
  * reference validates against MinIO (`/root/reference/tests/store.rs:20-70`,
  * `src/object_store.rs:42-47`). */
class FakeS3Server(accessKey: String, secretKey: String) {
  // "bucket/key" -> bytes. A SORTED concurrent map, not a hash map: LIST
  // pages are tail-iterations from a key-space position, so each page
  // costs O(page), never an O(N log N) sort of the whole store — at 200k
  // keys the per-page sort was ~200ms of server CPU, drowning the
  // injected page latency the listing probes measure (and serializing
  // the sharded lister's concurrent pages behind server-side work the
  // real service doesn't do).
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  private val uploads = // uploadId -> (path, partNumber -> bytes)
    new ConcurrentHashMap[String, (String, ConcurrentHashMap[Int, Array[Byte]])]()
  @volatile var multipartCompletions = 0 // observability for specs
  @volatile var bulkDeletes = 0
  @volatile var multipartAborts = 0
  /** LIST request count — lets suites assert the sharded lister actually
    * paid pages concurrently rather than re-walking the whole chain. */
  val listPages = new java.util.concurrent.atomic.AtomicLong()
  /** Per-LIST latency injection: localhost answers in ~0.1ms where real
    * object stores take ~10-40ms per page, which is the entire reason a
    * serial 10k-page chain hurts — probes set this to measure the
    * sharded-vs-serial shape at honest round-trip costs. */
  @volatile var listDelayMs = 0L
  private val faults = new java.util.concurrent.ConcurrentLinkedQueue[S3Fault]()
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort
  def keys: Set[String] = objects.keySet().asScala.toSet
  /** Direct test seeding ("bucket/key") — listing-scale suites need tens
    * of thousands of keys without paying one signed PUT each. */
  def seed(key: String, bytes: Array[Byte]): Unit = objects.put(key, bytes)
  def get(key: String): Array[Byte] = objects.get(key)
  def activeUploads: Int = uploads.size()
  def injectFault(f: S3Fault): Unit = faults.add(f)

  /** Pop the first queued fault matching this request, if any. */
  private def takeFault(method: String, path: String, query: String): Option[S3Fault] = {
    val it = faults.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f.method == method && path.contains(f.pathContains) &&
        (f.queryContains.isEmpty || query.contains(f.queryContains))) {
        it.remove(); return Some(f)
      }
    }
    None
  }

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try route(ex)
        catch { case e: Exception =>
          System.err.println(s"[fake-s3] ${e.getMessage}")
          ex.sendResponseHeaders(500, -1); ex.close()
        }
    })
    // a real thread pool, NOT the default null executor (= the accept
    // thread serving every request serially): the sharded flat lister
    // issues up to 16 concurrent LIST pages, and with a serial server
    // they'd queue behind each other's injected page delay — the probe
    // would measure the fake's accept loop, not the sharding
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "fake-s3-handler")
      t.setDaemon(true)
      t
    }))
    server.start()
  }
  def stop(): Unit = server.stop(0)

  private def verifySig(ex: HttpExchange, payload: Array[Byte]): Boolean = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(return false)
    val sigM = """Signature=([0-9a-f]{64})""".r.findFirstMatchIn(auth).getOrElse(return false)
    val credM = """Credential=([^/]+)/(\d{8})/([^/]+)/s3/aws4_request""".r
      .findFirstMatchIn(auth).getOrElse(return false)
    if (credM.group(1) != accessKey) return false
    val (date, region) = (credM.group(2), credM.group(3))
    val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
    val contentSha = ex.getRequestHeaders.getFirst("x-amz-content-sha256")
    val host = ex.getRequestHeaders.getFirst("Host")
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    def sha(b: Array[Byte]) =
      hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))
    def hmac(k: Array[Byte], d: String) = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256")); m.doFinal(d.getBytes(UTF_8))
    }
    val canonicalQuery = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      .split('&').filter(_.nonEmpty).sorted.mkString("&")
    val canonical = Seq(
      ex.getRequestMethod, ex.getRequestURI.getRawPath, canonicalQuery,
      s"host:$host\nx-amz-content-sha256:$contentSha\nx-amz-date:$amzDate\n",
      "host;x-amz-content-sha256;x-amz-date", contentSha).mkString("\n")
    val toSign = Seq("AWS4-HMAC-SHA256", amzDate,
      s"$date/$region/s3/aws4_request", sha(canonical.getBytes(UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(UTF_8), date), region), "s3"), "aws4_request")
    // the declared body hash must also MATCH the body — without this the
    // signature never binds the payload and the "real SigV4 verification"
    // claim is hollow (UNSIGNED-PAYLOAD is accepted as itself)
    val bodyBound = contentSha == "UNSIGNED-PAYLOAD" || contentSha == sha(payload)
    bodyBound && hex(hmac(kSigning, toSign)) == sigM.group(1)
  }

  private def route(ex: HttpExchange): Unit = {
    val body = ex.getRequestBody.readAllBytes()
    if (!verifySig(ex, body)) { ex.sendResponseHeaders(403, -1); ex.close(); return }
    val rawPath = URLDecoder.decode(ex.getRequestURI.getRawPath, "UTF-8").stripPrefix("/")
    // decode from the RAW query exactly once: getQuery is already
    // percent-decoded, so a second URLDecoder pass corrupted any value
    // containing '%' or '+' (hive-encoded partition values)
    val rawQuery = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val query = rawQuery.split('&')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap
    takeFault(ex.getRequestMethod, rawPath, rawQuery).foreach { f =>
      if (f.killConn) { ex.close(); return }
      if (f.applyFirst && ex.getRequestMethod == "PUT")
        // apply the mutation server-side, then fail the RESPONSE — the
        // ambiguous outcome a real S3 500 after a successful write produces
        applyPut(ex, rawPath, body)
      if (f.applyFirst && ex.getRequestMethod == "POST" && query.contains("uploadId"))
        // ambiguous CompleteMultipartUpload: applied (upload consumed,
        // object visible) but the 200 never reaches the client
        completeUpload(query("uploadId"),
          Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*"))
      ex.sendResponseHeaders(f.code, -1); ex.close(); return
    }
    val isList = query.get("list-type").contains("2")
    (ex.getRequestMethod, isList) match {
      case ("GET", true) => list(ex, rawPath.stripSuffix("/"), query)
      case ("GET", _) | ("HEAD", _) => getObject(ex, rawPath)
      case ("PUT", _) if query.contains("partNumber") =>
        uploads.get(query("uploadId")) match {
          case null =>
            // consumed/aborted id: 404 NoSuchUpload like real S3 (a 500
            // here would read as transient and burn the client's retries)
            ex.sendResponseHeaders(404, -1); ex.close()
          case (_, parts) =>
            parts.put(query("partNumber").toInt, body)
            ex.getResponseHeaders.add("ETag", s""""p${query("partNumber")}"""")
            ex.sendResponseHeaders(200, -1); ex.close()
        }
      case ("PUT", _) => putObject(ex, rawPath, body)
      case ("POST", _) if query.contains("delete") =>
        // bulk DeleteObjects: parse <Key> elements, remove each
        val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
          .newDocumentBuilder().parse(new java.io.ByteArrayInputStream(body))
        val nl = doc.getElementsByTagName("Key")
        val bucket = rawPath.stripSuffix("/")
        (0 until nl.getLength).foreach { i =>
          objects.remove(s"$bucket/${nl.item(i).getTextContent}")
        }
        bulkDeletes += 1
        val xml = "<DeleteResult/>".getBytes(UTF_8)
        ex.sendResponseHeaders(200, xml.length.toLong)
        ex.getResponseBody.write(xml); ex.close()
      case ("POST", _) if query.contains("uploads") =>
        val id = java.util.UUID.randomUUID().toString
        uploads.put(id, (rawPath, new ConcurrentHashMap[Int, Array[Byte]]()))
        val xml = s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>"
          .getBytes(UTF_8)
        ex.sendResponseHeaders(200, xml.length.toLong)
        ex.getResponseBody.write(xml); ex.close()
      case ("POST", _) if query.contains("uploadId") =>
        // CompleteMultipartUpload — honors `If-None-Match: *` (S3 supports
        // conditional completes); a lost conditional leaves the upload in
        // place for the client to abort, like real S3; a CONSUMED id (a
        // retry after an applied-but-unacknowledged complete) gets 404
        // NoSuchUpload, also like real S3
        completeUpload(query("uploadId"),
          Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")) match {
          case 200 =>
            val xml = "<CompleteMultipartUploadResult/>".getBytes(UTF_8)
            ex.sendResponseHeaders(200, xml.length.toLong)
            ex.getResponseBody.write(xml); ex.close()
          case code => ex.sendResponseHeaders(code, -1); ex.close()
        }
      case ("DELETE", _) if query.contains("uploadId") =>
        // AbortMultipartUpload: release the stored parts
        if (uploads.remove(query("uploadId")) != null) multipartAborts += 1
        ex.sendResponseHeaders(204, -1); ex.close()
      case ("DELETE", _) =>
        objects.remove(rawPath); ex.sendResponseHeaders(204, -1); ex.close()
      case _ => ex.sendResponseHeaders(405, -1); ex.close()
    }
  }

  private def getObject(ex: HttpExchange, path: String): Unit = {
    val bytes = objects.get(path)
    if (bytes == null) { ex.sendResponseHeaders(404, -1); ex.close(); return }
    val head = ex.getRequestMethod == "HEAD"
    Option(ex.getRequestHeaders.getFirst("Range")) match {
      case Some(r) if !head =>
        // accept prefix/bounded AND suffix ("bytes=-N") forms; out-of-range
        // answers 416 like real S3, never a 500 the client retries
        val bounded = """bytes=(\d+)-(\d*)""".r.findFirstMatchIn(r)
        val suffix = """bytes=-(\d+)""".r.findFirstMatchIn(r)
        val span: Option[(Int, Int)] = bounded.map { m =>
          val from = m.group(1).toInt
          val to = Option(m.group(2)).filter(_.nonEmpty).map(_.toInt)
            .getOrElse(bytes.length - 1).min(bytes.length - 1)
          (from, to)
        }.orElse(suffix.map { m =>
          val n = m.group(1).toInt.min(bytes.length)
          (bytes.length - n, bytes.length - 1)
        })
        span match {
          case Some((from, to)) if from >= 0 && from < bytes.length && from <= to =>
            val slice = java.util.Arrays.copyOfRange(bytes, from, to + 1)
            ex.getResponseHeaders.add("Content-Range", s"bytes $from-$to/${bytes.length}")
            ex.sendResponseHeaders(206, slice.length.toLong)
            ex.getResponseBody.write(slice)
          case _ =>
            ex.getResponseHeaders.add("Content-Range", s"bytes */${bytes.length}")
            ex.sendResponseHeaders(416, -1)
        }
      case _ =>
        // HEAD still advertises Content-Length (the JDK server suppresses
        // the body and logs a cosmetic warning)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        if (!head) ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  /** CompleteMultipartUpload core: 200 applied, 412 conditional loss,
    * 404 NoSuchUpload (consumed/unknown id). */
  private def completeUpload(uploadId: String, conditional: Boolean): Int = {
    val entry = uploads.get(uploadId)
    if (entry == null) return 404
    val (path, parts) = entry
    val whole = parts.asScala.toSeq.sortBy(_._1).map(_._2)
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val won =
      if (conditional) objects.putIfAbsent(path, whole) == null
      else { objects.put(path, whole); true }
    if (!won) 412
    else { uploads.remove(uploadId); multipartCompletions += 1; 200 }
  }

  /** Apply the PUT's mutation (copy / conditional / plain); returns the
    * status it produces — shared by the normal handler and the
    * applyFirst fault path. */
  private def applyPut(ex: HttpExchange, path: String, body: Array[Byte]): Int = {
    val copySource = Option(ex.getRequestHeaders.getFirst("x-amz-copy-source"))
    val conditional = Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
    val payload = copySource match {
      case Some(src) =>
        val bytes = objects.get(URLDecoder.decode(src, "UTF-8").stripPrefix("/"))
        if (bytes == null) return 404
        bytes
      case None => body
    }
    if (conditional) {
      // the atomicity under test: putIfAbsent is one atomic map op
      if (objects.putIfAbsent(path, payload) != null) return 412
    } else objects.put(path, payload)
    200
  }

  private def putObject(ex: HttpExchange, path: String, body: Array[Byte]): Unit = {
    val code = applyPut(ex, path, body)
    ex.sendResponseHeaders(code, -1); ex.close()
  }

  private def list(ex: HttpExchange, bucket: String, query: Map[String, String]): Unit = {
    val prefix = query.getOrElse("prefix", "")
    val delimiter = query.get("delimiter")
    // real ListObjectsV2 page semantics (needed by the sharded flat
    // lister, which positions ranges via start-after): max-keys pages,
    // continuation-token outranks start-after, NextContinuationToken is
    // an opaque key-space position
    val maxKeys = query.get("max-keys").map(_.toInt).getOrElse(1000)
    val after = query.get("continuation-token").orElse(query.get("start-after"))
    listPages.incrementAndGet()
    if (listDelayMs > 0) Thread.sleep(listDelayMs)
    // STREAMED page build over the sorted map's tail view: start at the
    // later of (prefix, after) in key order, group/collapse as entries
    // arrive (prefix-sharing keys are consecutive under the sort), and
    // stop at the first non-matching key or at maxKeys+1 entries — so a
    // page costs O(page), independent of store size. Order-preserving
    // grouping into direct objects + collapsed common prefixes, THEN the
    // page cut — KeyCount covers both kinds, like S3. An entry's
    // continuation position: its own key for an object; past the whole
    // group for a prefix (resuming AT the prefix would re-list its
    // members forever).
    val prefixFull = s"$bucket/$prefix"
    val fromTail = after.map(a => s"$bucket/$a") match {
      case Some(fa) if fa >= prefixFull => objects.keySet().tailSet(fa, false)
      case _ => objects.keySet().tailSet(prefixFull, true)
    }
    val entries = Vector.newBuilder[(String, String)] // (kind, key/prefix)
    var nEntries = 0
    var lastPrefix = ""
    val it = fromTail.iterator()
    var scanning = true
    while (scanning && it.hasNext && nEntries <= maxKeys) {
      val full = it.next()
      if (!full.startsWith(prefixFull)) scanning = false
      else {
        val k = full.stripPrefix(s"$bucket/")
        val rel = k.stripPrefix(prefix)
        delimiter match {
          case Some(d) if rel.contains(d) =>
            val p = prefix + rel.takeWhile(_ != d.head) + d
            if (p != lastPrefix) { entries += (("p", p)); nEntries += 1; lastPrefix = p }
          case _ => entries += (("o", k)); nEntries += 1
        }
      }
    }
    val allEntries = entries.result()
    val page = allEntries.take(maxKeys)
    val truncated = allEntries.size > maxKeys
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val xml = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
    page.foreach {
      case ("o", k) =>
        xml ++= s"<Contents><Key>${esc(k)}</Key><Size>${objects.get(s"$bucket/$k").length}</Size>" +
          "<LastModified>2026-01-01T00:00:00Z</LastModified></Contents>"
      case (_, p) =>
        xml ++= s"<CommonPrefixes><Prefix>${esc(p)}</Prefix></CommonPrefixes>"
    }
    if (truncated) {
      val token = page.last match {
        case ("o", k) => k
        case (_, p) => p + "￿"
      }
      xml ++= s"<NextContinuationToken>${esc(token)}</NextContinuationToken>"
    }
    xml ++= "</ListBucketResult>"
    val bytes = xml.toString.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/xml")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
