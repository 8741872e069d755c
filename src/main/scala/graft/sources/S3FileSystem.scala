package graft.sources

import java.io.{ByteArrayInputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Capability seam for stores with a batched delete cheaper than
  * per-object calls — maintenance paths (VACUUM) pattern-match on it and
  * retire files in batches instead of one request each. */
trait BulkDeleteStore {
  /** Delete the given paths (same store) in as few requests as the
    * protocol allows; returns the number submitted for deletion. */
  def deleteBatch(paths: Seq[Path]): Long
}

/** Capability seam for stores that can list ONE flat prefix through
  * concurrent disjoint key-range shards (r19 verdict #5). The Hadoop FS
  * API forces a serial continuation-token page chain — at 10M objects
  * under a single prefix that is 10k sequential round trips, the one
  * listing residual the distributed maintenance plane could not shard
  * because directory fan-out was its only parallelism source. A store
  * that owns its LIST protocol (ListObjectsV2 `start-after`) can split
  * the key space adaptively instead. */
trait ShardedListStore {
  /** Every object under `dir` (delimiter-free, so nested "directories"
    * are included), listed by up to `threads` concurrent key-range
    * shards and STREAMED to `f` from the calling thread — heap stays
    * O(queue bound), never O(objects), so a 10M-key table can feed a
    * batched staging writer. Semantics (set of statuses) match one
    * serial delimiter-free page chain over `dir/`; arrival order is
    * unspecified. */
  def listFlatShardedForeach(dir: Path, threads: Int)(f: FileStatus => Unit): Unit

  /** Collecting convenience over [[listFlatShardedForeach]], sorted by
    * path — for suites and probes, NOT for 10M-key consumers. */
  def listFlatSharded(dir: Path, threads: Int): Array[FileStatus] = {
    val out = Array.newBuilder[FileStatus]
    listFlatShardedForeach(dir, threads)(out += _)
    out.result().sortBy(_.getPath.toUri.getPath)
  }
}

/** An HTTP error response (as opposed to a transport failure) — carries
  * the status so the retry seam can tell 503 SlowDown from 403/404. */
private[sources] final class S3HttpException(val code: Int, msg: String)
  extends IOException(msg)

/** S3 object store over the REST API — the Spark-side equivalent of the
  * reference's S3/MinIO store (`/root/reference/src/object_store.rs:42-47`:
  * endpoint + env credentials; `examples/s3_standalone.rs:15-18`). The
  * environment ships no hadoop-aws jar, so the store is implemented here
  * first-party on the JDK alone: AWS Signature V4 signing (HMAC-SHA256),
  * path-style addressing against a configurable endpoint (the MinIO
  * shape), ListObjectsV2 with continuation-token pagination, ranged
  * seekable reads (shared with [[HttpSeekableInputStream]]), PUT/COPY/
  * DELETE writes, and **conditional PUT** (`If-None-Match: *`) so
  * `create(path, overwrite = false)` is an ATOMIC create-if-absent — the
  * primitive [[graft.sources.delta.DeltaLog.tryCommit]] needs for
  * mutual-exclusion commits on S3 (what delta-rs keys on since S3 gained
  * conditional writes; before that the answer was a DynamoDB LogStore).
  *
  * Configuration (per-bucket FS cache key is scheme+authority):
  *  - `fs.s3.endpoint`  e.g. `http://127.0.0.1:9000` (required; the
  *    MinIO/localstack endpoint-override surface)
  *  - `fs.s3.access.key` / `fs.s3.secret.key`, falling back to the
  *    `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY` env vars (reference
  *    parity: creds from env, `src/object_store.rs:44`)
  *  - `fs.s3.region` (default `us-east-1`)
  *
  * S3 semantics honestly surfaced: `mkdirs` is a no-op (prefixes, not
  * directories), `rename` is COPY+DELETE per object (non-atomic — which
  * is exactly why the COMMIT path uses conditional PUT, never rename). */
class S3FileSystem extends FileSystem with BulkDeleteStore with ShardedListStore {

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var accessKey: String = _
  private var secretKey: String = _
  private var region: String = _
  private var retryLimit: Int = _
  private var retryBaseMs: Long = _

  override def getScheme: String = "s3"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = Option(name.getAuthority).filter(_.nonEmpty).getOrElse(
      throw new IOException(s"s3 URI needs a bucket authority: $name"))
    fsUri = URI.create(s"$getScheme://$bucket")
    endpoint = Option(conf.get("fs.s3.endpoint")).map(_.stripSuffix("/")).getOrElse(
      throw new IOException("fs.s3.endpoint is required (e.g. http://host:9000)"))
    accessKey = Option(conf.get("fs.s3.access.key"))
      .orElse(sys.env.get("AWS_ACCESS_KEY_ID")).getOrElse(
        throw new IOException("no S3 credentials: set fs.s3.access.key or AWS_ACCESS_KEY_ID"))
    secretKey = Option(conf.get("fs.s3.secret.key"))
      .orElse(sys.env.get("AWS_SECRET_ACCESS_KEY")).getOrElse(
        throw new IOException("no S3 credentials: set fs.s3.secret.key or AWS_SECRET_ACCESS_KEY"))
    region = Option(conf.get("fs.s3.region")).getOrElse("us-east-1")
    retryLimit = conf.getInt("fs.s3.retry.limit", 4)
    retryBaseMs = conf.getLong("fs.s3.retry.base.ms", 100L)
  }

  // ---- transient-failure retry seam ----

  private def httpError(code: Int, msg: String): Nothing =
    throw new S3HttpException(code, msg)

  /** Throttling and server-side transient statuses — at 100 TB scale,
    * `503 SlowDown` and sporadic 500s are routine, not exceptional. */
  private def isRetryableCode(code: Int): Boolean =
    code == 408 || code == 429 || code == 500 || code == 502 || code == 503 || code == 504

  /** Full-jitter exponential backoff (AWS's published retry guidance):
    * sleep uniform(0, base·2^attempt), capped at 10 s. */
  private def backoff(attempt: Int): Unit = {
    val cap = math.min(retryBaseMs << math.min(attempt, 16), 10000L)
    Thread.sleep((java.util.concurrent.ThreadLocalRandom.current().nextDouble() * cap).toLong)
  }

  /** Run `attempt` (which must open a FRESH connection per call — an
    * HttpURLConnection is single-shot) with bounded backoff+jitter on
    * retryable HTTP statuses and transport-level IOExceptions. ONLY for
    * idempotent requests: GET/HEAD/LIST/DELETE, bulk delete, COPY,
    * unconditional PUT, and per-part multipart uploads. The conditional
    * PUT has its own ambiguity-aware loop in [[conditionalPut]]. */
  private def retrying[T](what: String)(attempt: () => T): T = {
    var tries = 0
    while (true) {
      try return attempt()
      catch {
        case e: S3HttpException if isRetryableCode(e.code) && tries < retryLimit =>
          backoff(tries); tries += 1
        case e: IOException
          if !e.isInstanceOf[S3HttpException] &&
            !e.isInstanceOf[java.io.FileNotFoundException] &&
            !e.isInstanceOf[FileAlreadyExistsException] && tries < retryLimit =>
          // transport failure (connect reset, truncated response) — the
          // request never completed cleanly; safe to re-send an idempotent verb
          backoff(tries); tries += 1
      }
    }
    throw new IllegalStateException(s"unreachable: $what")
  }

  override def getUri: URI = fsUri
  override def setWorkingDirectory(dir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(s"$getScheme://$bucket/")

  private def keyOf(f: Path): String = {
    val p = f.toUri.getPath
    (if (p == null) "" else p).stripPrefix("/")
  }

  // ---- SigV4 ----

  private val amzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def sha256(b: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(b))
  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def uriEncode(s: String, keepSlash: Boolean): String = {
    val enc = URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20").replace("*", "%2A").replace("%7E", "~")
    if (keepSlash) enc.replace("%2F", "/") else enc
  }

  /** Sign `conn` for (method, canonical URI path, sorted query) with the
    * request payload's SHA-256 (AWS SigV4, single-chunk). `canonicalPath`
    * must be byte-identical to the raw path the request goes out with —
    * any drift (a trailing slash, an encoding difference) fails
    * verification server-side. */
  /** @return the Authorization header value (the JDK filters
    *         security-sensitive headers out of getRequestProperty, so
    *         specs can only observe the signature via this return). */
  private[sources] def sign(
      conn: HttpURLConnection, method: String, canonicalPath: String,
      query: Seq[(String, String)], payloadSha: String): String = {
    val now = Instant.now()
    val amzDate = amzDateFmt.format(now)
    val date = amzDate.take(8)
    // Host is a JDK-restricted header: setRequestProperty("Host", …) is
    // silently IGNORED and the JDK derives the header from the URL — so the
    // SIGNED host string must be computed the way the JDK emits it (the
    // port is dropped when it equals the scheme default, kept otherwise).
    // Signing getAuthority verbatim would break against an endpoint that
    // pins the default port explicitly (http://host:80 → JDK sends
    // `Host: host`, signature covers `host:80`).
    val u = conn.getURL
    val host =
      if (u.getPort == -1 || u.getPort == u.getDefaultPort) u.getHost
      else s"${u.getHost}:${u.getPort}"
    conn.setRequestProperty("x-amz-date", amzDate)
    conn.setRequestProperty("x-amz-content-sha256", payloadSha)
    val canonicalQuery = query.map { case (k, v) =>
      s"${uriEncode(k, keepSlash = false)}=${uriEncode(v, keepSlash = false)}"
    }.sorted.mkString("&")
    val canonicalHeaders =
      s"host:$host\nx-amz-content-sha256:$payloadSha\nx-amz-date:$amzDate\n"
    val signedHeaders = "host;x-amz-content-sha256;x-amz-date"
    val canonicalRequest = Seq(
      method, canonicalPath,
      canonicalQuery, canonicalHeaders, signedHeaders, payloadSha).mkString("\n")
    val scope = s"$date/$region/s3/aws4_request"
    val toSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(UTF_8), date), region), "s3"), "aws4_request")
    val signature = hex(hmac(kSigning, toSign))
    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
    conn.setRequestProperty("Authorization", auth)
    auth
  }

  private val UnsignedPayload = "UNSIGNED-PAYLOAD"
  private val EmptySha = sha256(Array.emptyByteArray)

  private def connect(
      method: String, key: String, query: Seq[(String, String)] = Nil,
      payloadSha: String = EmptySha): HttpURLConnection = {
    val qs =
      if (query.isEmpty) ""
      else "?" + query.map { case (k, v) =>
        s"${uriEncode(k, keepSlash = false)}=${uriEncode(v, keepSlash = false)}"
      }.mkString("&")
    val canonicalPath = s"/$bucket/${uriEncode(key, keepSlash = true)}"
    val url = new URL(s"$endpoint$canonicalPath$qs")
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    // bounded connect/read timeouts: without them a single black-holed
    // TCP connection (routine at 100-TB fleet scale) parks the task
    // forever — Spark has no default task reaper. A timeout surfaces as
    // IOException and flows into the same retry seam as a 5xx.
    conn.setConnectTimeout(
      getConf.getInt("fs.s3.connect.timeout.ms", 15000))
    conn.setReadTimeout(
      getConf.getInt("fs.s3.read.timeout.ms", 60000))
    conn.setRequestMethod(method)
    sign(conn, method, canonicalPath, query, payloadSha)
    conn
  }

  // ---- statuses & listing ----

  // status paths carry the FS's own scheme (s3 or, via the compat
  // subclass, s3a) — Spark hands these paths back to FileSystem.get,
  // which must resolve to THIS filesystem again
  private def fileStatusOf(key: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 64L << 20, mtime, 0L,
      FsPermission.getFileDefault, "", "", new Path(s"$getScheme://$bucket/$key"))

  private def dirStatusOf(key: String): FileStatus =
    new FileStatus(0L, true, 1, 0L, 0L, 0L,
      FsPermission.getDirDefault, "", "", new Path(s"$getScheme://$bucket/${key.stripSuffix("/")}"))

  /** Length via `Range: bytes=0-0` + `Content-Range` total — for servers
    * whose HEAD replies carry no Content-Length (same fallback as
    * [[HttpFileSystem]]). */
  private def lengthViaRangedGet(key: String): Long = retrying(s"GET $key") { () =>
    val conn = connect("GET", key)
    conn.setRequestProperty("Range", "bytes=0-0")
    try {
      if (conn.getResponseCode >= 400)
        httpError(conn.getResponseCode, s"GET s3://$bucket/$key -> HTTP ${conn.getResponseCode}")
      val total = Option(conn.getHeaderField("Content-Range"))
        .filter(_.contains("/")).map(_.split('/').last.trim.toLong)
        .getOrElse(conn.getContentLengthLong)
      conn.getInputStream.close()
      if (total < 0) throw new IOException(
        s"s3://$bucket/$key: server reports no length (no HEAD length, no Content-Range)")
      total
    } finally conn.disconnect()
  }

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty) return dirStatusOf("") // bucket root
    val headCode = retrying(s"HEAD $key") { () =>
      val conn = connect("HEAD", key)
      try {
        conn.getResponseCode match {
          case 200 =>
            val len = conn.getContentLengthLong
            return fileStatusOf(key, if (len >= 0) len else lengthViaRangedGet(key),
              math.max(conn.getLastModified, 0L))
          case 404 => 404
          case code => httpError(code, s"HEAD s3://$bucket/$key -> HTTP $code")
        }
      } finally conn.disconnect()
    }
    require(headCode == 404)
    // an S3 "directory" is a non-empty key prefix
    if (listPage(s"$key/", delimiter = None, maxKeys = Some(1))._1.nonEmpty ||
      listPage(s"$key/", delimiter = Some("/"), maxKeys = Some(1))._2.nonEmpty)
      dirStatusOf(key)
    else throw new java.io.FileNotFoundException(f.toString)
  }

  /** One ListObjectsV2 page: (objects(key, size, mtime), commonPrefixes,
    * continuationToken). */
  private def listPage(
      prefix: String, delimiter: Option[String], maxKeys: Option[Int] = None,
      token: Option[String] = None, startAfter: Option[String] = None)
      : (Seq[(String, Long, Long)], Seq[String], Option[String]) = {
    val query = Seq("list-type" -> "2", "prefix" -> prefix) ++
      delimiter.map("delimiter" -> _) ++
      maxKeys.map(n => "max-keys" -> n.toString) ++
      token.map("continuation-token" -> _) ++
      startAfter.map("start-after" -> _)
    retrying(s"LIST $prefix") { () =>
    val conn = connect("GET", "", query)
    try {
      if (conn.getResponseCode >= 400)
        httpError(conn.getResponseCode, s"LIST s3://$bucket/$prefix -> HTTP ${conn.getResponseCode}")
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(conn.getInputStream)
      def texts(tag: String): Seq[org.w3c.dom.Element] = {
        val nl = doc.getElementsByTagName(tag)
        (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
      }
      def child(e: org.w3c.dom.Element, tag: String): String =
        e.getElementsByTagName(tag).item(0).getTextContent
      val objs = texts("Contents").map { e =>
        val mtime = try Instant.parse(child(e, "LastModified")).toEpochMilli
          catch { case _: Exception => 0L }
        (child(e, "Key"), child(e, "Size").toLong, mtime)
      }
      val prefixes = texts("CommonPrefixes").map(child(_, "Prefix"))
      val next = texts("NextContinuationToken").headOption.map(_.getTextContent)
        .filter(_.nonEmpty)
      (objs, prefixes, next)
    } finally conn.disconnect()
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    // a FILE path lists as itself (Hadoop contract)
    if (key.nonEmpty) {
      val self = retrying(s"HEAD $key") { () =>
        val conn = connect("HEAD", key)
        try {
          if (conn.getResponseCode == 200) {
            val len = conn.getContentLengthLong
            Some(fileStatusOf(key, if (len >= 0) len else lengthViaRangedGet(key),
              math.max(conn.getLastModified, 0L)))
          } else if (isRetryableCode(conn.getResponseCode))
            httpError(conn.getResponseCode, s"HEAD s3://$bucket/$key -> HTTP ${conn.getResponseCode}")
          else None
        } finally conn.disconnect()
      }
      self.foreach(st => return Array(st))
    }
    val prefix = if (key.isEmpty) "" else s"$key/"
    val out = Array.newBuilder[FileStatus]
    var token: Option[String] = None
    var sawAny = false
    var first = true
    while (first || token.isDefined) {
      first = false
      val (objs, prefixes, next) = listPage(prefix, delimiter = Some("/"), token = token)
      sawAny |= objs.nonEmpty || prefixes.nonEmpty
      objs.filterNot(_._1 == prefix) // skip a directory-marker object
        .foreach { case (k, len, mtime) => out += fileStatusOf(k, len, mtime) }
      prefixes.foreach(p => out += dirStatusOf(p))
      token = next
    }
    if (!sawAny && key.nonEmpty) throw new java.io.FileNotFoundException(f.toString)
    out.result()
  }

  // ---- sharded flat listing (r19 verdict #5) ----

  /** `a <= b` in UTF-8 BYTE order — the order S3 lists and positions
    * keys in. Java String order (UTF-16 code units) disagrees above the
    * BMP, so every range decision here compares what S3 compares. */
  private def keyLte(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length <= y.length
  }
  private def keyLt(a: String, b: String): Boolean = a != b && keyLte(a, b)

  /** A key strictly between `lo` and `hi` (None = +∞): the adaptive
    * bisection split point. The divergence character is kept in ASCII so
    * the produced string sorts identically under UTF-8 bytes and UTF-16
    * units; the final betweenness VERIFY (in S3's byte order) makes the
    * answer safe regardless — None just means "don't split here", never
    * a correctness risk. Needs no prior on the key distribution: keys
    * sharing a long common prefix converge within a few splits because
    * each split inherits the observed prefix from `lo`. */
  private[sources] def midKey(lo: String, hi: Option[String]): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    var bounded = hi.isDefined
    val hiStr = hi.getOrElse("")
    val maxLen = lo.length + 8
    var result: Option[String] = None
    while (i < maxLen && result.isEmpty) {
      val av: Int = if (i < lo.length) lo.charAt(i).toInt else 0
      val bvRaw: Int =
        if (!bounded) 0x80
        else if (i < hiStr.length) hiStr.charAt(i).toInt
        else return None // hi exhausted at a shared prefix: no gap here
      val bv = math.min(bvRaw, 0x80) // ASCII-only divergence alphabet
      val m = (av + bv) / 2
      if (m > av && m < bv) result = Some((sb + m.toChar.toString))
      else {
        sb.append((if (i < lo.length) lo.charAt(i) else 0.toChar))
        // once this position is strictly below hi's, every continuation
        // stays below hi — the bound stops constraining deeper positions
        if (bounded && bvRaw > av) bounded = false
        i += 1
      }
    }
    result.filter(m => keyLt(lo, m) && hi.forall(h => keyLt(m, h)))
  }

  /** Lists one flat prefix by concurrent disjoint key ranges. Ranges are
    * (startAfter-exclusive, hi-INCLUSIVE]: a worker keeps keys ≤ hi and
    * its split sibling starts-after the same boundary, so no key is lost
    * or doubled at a split point. Splitting is adaptive: after emitting a
    * full page, a worker bisects its remaining range whenever the queue
    * runs below the thread count — parallelism doubles until saturation,
    * with no assumption about how keys are distributed (a hex-first-char
    * scheme would see every `part-…` file land in one shard). Statuses
    * stream through a BOUNDED queue to the caller's thread: driver heap
    * is O(queue), so 10M keys feed a batched staging writer directly. */
  override def listFlatShardedForeach(dir: Path, threads: Int)(
      f: FileStatus => Unit): Unit = {
    val key = keyOf(dir)
    val prefix = if (key.isEmpty) "" else s"$key/"
    val nThreads = math.max(1, math.min(threads, 64))
    val ranges = new java.util.concurrent.ConcurrentLinkedQueue[
      (Option[String], Option[String])]()
    val pendingRanges = new java.util.concurrent.atomic.AtomicInteger(1)
    ranges.add((None, None))
    // Some(status) = a row; None = all workers finished (poison pill)
    val out = new java.util.concurrent.LinkedBlockingQueue[Option[FileStatus]](8192)
    val live = new java.util.concurrent.atomic.AtomicInteger(nThreads)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def runRange(r0: (Option[String], Option[String])): Unit = {
      var lo = r0._1
      var hi = r0._2
      var open = true
      while (open && failure.get() == null) {
        val (objs, _, next) = listPage(prefix, delimiter = None, startAfter = lo)
        objs.iterator
          .filter { case (k, _, _) => hi.forall(h => keyLte(k, h)) }
          .filterNot(_._1 == prefix) // skip a directory-marker object
          .foreach { case (k, len, mtime) =>
            out.put(Some(fileStatusOf(k, len, mtime)))
          }
        val crossed = hi.exists(h => objs.lastOption.exists(o => !keyLte(o._1, h)))
        if (next.isEmpty || crossed || objs.isEmpty) open = false
        else {
          lo = Some(objs.last._1)
          if (ranges.size < nThreads) {
            midKey(objs.last._1, hi).foreach { m =>
              pendingRanges.incrementAndGet()
              ranges.add((Some(m), hi))
              hi = Some(m)
            }
          }
        }
      }
    }
    (0 until nThreads).foreach { w =>
      val t = new Thread(() => {
        try {
          var done = false
          while (!done && failure.get() == null) {
            val r = ranges.poll()
            if (r == null) {
              if (pendingRanges.get() == 0) done = true else Thread.sleep(2)
            } else {
              try runRange(r)
              catch { case e: Throwable => failure.compareAndSet(null, e) }
              finally pendingRanges.decrementAndGet()
            }
          }
        } finally {
          if (live.decrementAndGet() == 0) out.put(None) // last one out
        }
      }, s"s3-sharded-list-$w")
      t.setDaemon(true)
      t.start()
    }
    try {
      var draining = true
      while (draining) out.take() match {
        case Some(st) => f(st)
        case None => draining = false
      }
    } catch { case e: Throwable =>
      // a sink failure must still release producers blocked on the full
      // queue: flag the abort (stops their page loops), then keep taking
      // until the poison pill so no worker stays parked in put()
      failure.compareAndSet(null, e)
      var waiting = true
      while (waiting) out.take() match {
        case None => waiting = false
        case _ => ()
      }
      throw e
    }
    if (failure.get() != null) failure.get() match {
      case io: IOException => throw io
      case e => throw new IOException(s"sharded LIST of $dir failed", e)
    }
  }

  // ---- read ----

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val st = getFileStatus(f)
    if (st.isDirectory) throw new IOException(s"cannot open directory s3://$bucket/$key")
    val canonicalPath = s"/$bucket/${uriEncode(key, keepSlash = true)}"
    val url = new URL(s"$endpoint$canonicalPath")
    new FSDataInputStream(new HttpSeekableInputStream(url, st.getLen,
      conn => sign(conn, "GET", canonicalPath, Nil, EmptySha), retryLimit, retryBaseMs,
      connectTimeoutMs = getConf.getInt("fs.s3.connect.timeout.ms", 15000),
      readTimeoutMs = getConf.getInt("fs.s3.read.timeout.ms", 60000)))
  }

  // ---- write ----

  /** Buffers to a local temp file; on close, objects at or under
    * `fs.s3.multipart.threshold` (default 128 MB) go up as one PUT
    * (Content-Length known, payload SHA signed), larger ones as a
    * MULTIPART upload in `fs.s3.multipart.size` parts (default 64 MB) —
    * a single PUT caps at 5 GB on real S3, a ceiling a 100 TB pipeline's
    * compacted parquet files WILL hit. `overwrite = false` maps to
    * `If-None-Match: *` — S3-native conditional create: the FIRST closer
    * wins, every loser gets 412 → FileAlreadyExistsException (commit
    * JSONs are small, so the conditional path is always single-PUT). */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    val threshold = getConf.getLong("fs.s3.multipart.threshold", 128L << 20)
    val partSize = math.max(getConf.getLong("fs.s3.multipart.size", 64L << 20), 1L)
    val tmp = java.nio.file.Files.createTempFile("graft-s3-put", ".tmp")
    val local = java.nio.file.Files.newOutputStream(tmp)
    val out = new java.io.FilterOutputStream(local) {
      private var closed = false
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        local.write(b, off, len) // FilterOutputStream defaults to byte-at-a-time
      override def close(): Unit = {
        if (closed) return
        closed = true
        local.close()
        try {
          val size = java.nio.file.Files.size(tmp)
          // the conditional create (overwrite=false) stays single-PUT up
          // to the threshold — commit JSONs are tiny, so the atomic path
          // always holds for them; a LARGE overwrite=false object (a
          // parquet part file, unique by name) goes multipart and keeps
          // only name-uniqueness, which is what its caller relies on
          if (size <= threshold)
            putObject(key, java.nio.file.Files.readAllBytes(tmp),
              failIfExists = !overwrite)
          else multipartUpload(key, tmp, partSize, failIfExists = !overwrite)
        } finally java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    new FSDataOutputStream(out, null)
  }

  /** InitiateMultipartUpload → UploadPart per chunk → Complete. Parts
    * stream from the temp file, so driver/executor heap holds one part,
    * never the object. Each phase rides the retry seam (a part re-upload
    * with the same partNumber is idempotent — S3 keeps the last). Any
    * failure after initiate ABORTS the upload before rethrowing —
    * orphaned parts otherwise accrue billable storage until a lifecycle
    * rule notices. `failIfExists` keeps create(overwrite=false)'s atomic
    * contract for LARGE objects too: the COMPLETE carries
    * `If-None-Match: *` (S3 supports conditional completes), so the
    * first completer wins and losers get 412, same as the single-PUT
    * plane. */
  private def multipartUpload(key: String, tmp: java.nio.file.Path, partSize: Long,
      failIfExists: Boolean): Unit = {
    // initiate
    val uploadId = retrying(s"initiate multipart $key") { () =>
      val initConn = connect("POST", key, Seq("uploads" -> ""))
      initConn.setDoOutput(true)
      initConn.setFixedLengthStreamingMode(0)
      initConn.getOutputStream.close()
      if (initConn.getResponseCode != 200)
        httpError(initConn.getResponseCode,
          s"initiate multipart s3://$bucket/$key -> HTTP ${initConn.getResponseCode}")
      val initDoc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder().parse(initConn.getInputStream)
      initDoc.getElementsByTagName("UploadId").item(0).getTextContent
    }

    try {
      // parts
      val in = java.nio.file.Files.newInputStream(tmp)
      val etags = Seq.newBuilder[(Int, String)]
      try {
        val buf = new Array[Byte](partSize.toInt)
        var partNumber = 1
        var n = 0
        while ({ n = readFull(in, buf); n > 0 }) {
          val chunk = if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
          val etag = retrying(s"upload part $partNumber of $key") { () =>
            val conn = connect("PUT", key,
              Seq("partNumber" -> partNumber.toString, "uploadId" -> uploadId),
              sha256(chunk))
            conn.setDoOutput(true)
            conn.setFixedLengthStreamingMode(chunk.length)
            val os = conn.getOutputStream
            os.write(chunk); os.close()
            val code = conn.getResponseCode
            val tag = Option(conn.getHeaderField("ETag"))
            drain(conn)
            if (code != 200)
              httpError(code, s"upload part $partNumber of s3://$bucket/$key -> HTTP $code")
            tag.getOrElse(s"part-$partNumber")
          }
          etags += partNumber -> etag
          partNumber += 1
        }
      } finally in.close()

      // complete (conditional when the caller asked for create-if-absent)
      val xml = etags.result().map { case (pn, etag) =>
        s"<Part><PartNumber>$pn</PartNumber><ETag>$etag</ETag></Part>"
      }.mkString("<CompleteMultipartUpload>", "", "</CompleteMultipartUpload>")
      val body = xml.getBytes(UTF_8)
      // AMBIGUITY-AWARE completion for the create-if-absent contract
      // (mirrors conditionalPut's read-back): a COMPLETE applied server-
      // side whose 200 is lost makes a blind retry see 412 (If-None-Match
      // against our OWN object) or 404 NoSuchUpload (the consumed
      // uploadId) — both must resolve to success, not a false loss/abort.
      // The read-back compares CONTENT (md5 of the visible object vs the
      // local temp file — length alone cannot tell our upload from a
      // same-length rival that won a genuine race), the same discipline
      // as conditionalPut's byte compare; it runs only on the rare
      // ambiguous path, never per upload.
      val expectedLen = java.nio.file.Files.size(tmp)
      lazy val expectedMd5: Array[Byte] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val in = java.nio.file.Files.newInputStream(tmp)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = 0
          while ({ n = in.read(buf); n > 0 }) md.update(buf, 0, n)
        } finally in.close()
        md.digest()
      }
      def appliedByUs(): Boolean =
        try {
          val target = new Path(s"$getScheme://$bucket/$key")
          if (getFileStatus(target).getLen != expectedLen) false
          else {
            val md = java.security.MessageDigest.getInstance("MD5")
            val in = open(target, 1 << 16)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = 0
              while ({ n = in.read(buf); n > 0 }) md.update(buf, 0, n)
            } finally in.close()
            java.util.Arrays.equals(md.digest(), expectedMd5)
          }
        } catch { case _: java.io.FileNotFoundException => false }
      try retrying(s"complete multipart $key") { () =>
        val done = connect("POST", key, Seq("uploadId" -> uploadId), sha256(body))
        if (failIfExists) done.setRequestProperty("If-None-Match", "*")
        done.setDoOutput(true)
        done.setFixedLengthStreamingMode(body.length)
        val os = done.getOutputStream
        os.write(body); os.close()
        val code = done.getResponseCode
        drain(done)
        if (code == 412 && failIfExists)
          throw new FileAlreadyExistsException(s"s3://$bucket/$key already exists")
        if (code != 200)
          httpError(code, s"complete multipart s3://$bucket/$key -> HTTP $code")
      } catch {
        // the content compare resolves the ambiguity for CONDITIONAL and
        // UNCONDITIONAL completes alike — an overwrite-mode complete whose
        // 200 was lost also retries into 404 NoSuchUpload (consumed id)
        // and must not abort a live object it in fact wrote. After the
        // read-back declares success, STILL best-effort abort: if the
        // COMPLETE did apply the abort 404s harmlessly, but if the bytes
        // matched only because a previous write left an identical object
        // (complete genuinely never applied), the abort is what releases
        // the upload's stored parts — otherwise they leak server-side
        case _: FileAlreadyExistsException if failIfExists && appliedByUs() =>
          abortMultipartUpload(key, uploadId)
        case e: IOException
          if !e.isInstanceOf[FileAlreadyExistsException] && appliedByUs() =>
          abortMultipartUpload(key, uploadId)
      }
    } catch {
      case e: Throwable =>
        abortMultipartUpload(key, uploadId)
        throw e
    }
  }

  /** Best-effort AbortMultipartUpload (`DELETE ?uploadId=…`) — releases
    * the stored parts of a failed upload. */
  private def abortMultipartUpload(key: String, uploadId: String): Unit =
    try retrying(s"abort multipart $key") { () =>
      val conn = connect("DELETE", key, Seq("uploadId" -> uploadId))
      try {
        val code = conn.getResponseCode
        if (isRetryableCode(code)) httpError(code, s"abort multipart $key -> HTTP $code")
      } finally conn.disconnect()
    } catch { case _: Exception => () } // abort is cleanup; never mask the cause

  private def readFull(in: InputStream, buf: Array[Byte]): Int = {
    var total = 0
    var n = 0
    while (total < buf.length && { n = in.read(buf, total, buf.length - total); n > 0 })
      total += n
    total
  }

  /** Drain whichever response stream exists so the JDK can return the
    * keep-alive connection to its pool — commit-heavy workloads issue
    * many small requests and connection reuse is the difference between
    * one TCP handshake and thousands. */
  private def drain(conn: HttpURLConnection): Unit =
    try {
      val s = if (conn.getResponseCode >= 400) conn.getErrorStream else conn.getInputStream
      if (s != null) { s.readAllBytes(); s.close() }
    } catch { case _: Exception => () }

  private def putObject(key: String, bytes: Array[Byte], failIfExists: Boolean): Unit =
    if (failIfExists) conditionalPut(key, bytes)
    else retrying(s"PUT $key") { () =>
      val code = putOnce(key, bytes, conditional = false)
      if (code != 200) httpError(code, s"PUT s3://$bucket/$key -> HTTP $code")
    }

  /** One PUT attempt; returns the HTTP status (response drained). */
  private def putOnce(key: String, bytes: Array[Byte], conditional: Boolean): Int = {
    val conn = connect("PUT", key, Nil, sha256(bytes))
    if (conditional) conn.setRequestProperty("If-None-Match", "*")
    conn.setDoOutput(true)
    conn.setFixedLengthStreamingMode(bytes.length)
    val os = conn.getOutputStream
    os.write(bytes); os.close()
    val code = conn.getResponseCode
    drain(conn)
    code
  }

  /** GET the object and compare against `bytes`: Some(true) = identical,
    * Some(false) = exists with other content, None = absent. The
    * disambiguation read for ambiguous conditional-PUT outcomes. */
  private def readMatches(key: String, bytes: Array[Byte]): Option[Boolean] =
    retrying(s"GET $key") { () =>
      val conn = connect("GET", key)
      try {
        conn.getResponseCode match {
          case 200 => Some(java.util.Arrays.equals(conn.getInputStream.readAllBytes(), bytes))
          case 404 => None
          case code => httpError(code, s"GET s3://$bucket/$key -> HTTP $code")
        }
      } finally conn.disconnect()
    }

  /** Atomic create-if-absent (`If-None-Match: *`) with AMBIGUITY-AWARE
    * retries — this is the delta COMMIT primitive, where a blind retry is
    * wrong in both directions: a 5xx/transport failure after the server
    * applied the PUT would make a naive retry see 412 and report
    * "lost the race" for a commit WE won (the caller would then re-apply
    * the same actions at version+1 — double apply); and a 409
    * (ConditionalRequestConflict: concurrent conditional writes racing on
    * real S3) is transient contention, not a loss. So: after any ambiguous
    * failure, every exists-signal (412/409-exhausted) is resolved by
    * reading the object back and comparing content — identical ⇒ our
    * earlier attempt landed ⇒ success. */
  private def conditionalPut(key: String, bytes: Array[Byte]): Unit = {
    var tries = 0
    var ambiguous = false // some earlier attempt MAY have been applied server-side
    def lostOrWon(): Unit =
      if (ambiguous && readMatches(key, bytes).contains(true)) () // our PUT landed
      else throw new FileAlreadyExistsException(s"s3://$bucket/$key already exists")
    while (true) {
      val code =
        try putOnce(key, bytes, conditional = true)
        catch {
          case e: IOException if !e.isInstanceOf[S3HttpException] =>
            // transport failure mid-PUT: the server may or may not have it
            ambiguous = true
            if (tries >= retryLimit) {
              readMatches(key, bytes) match {
                case Some(true) => return
                case Some(false) =>
                  throw new FileAlreadyExistsException(s"s3://$bucket/$key already exists")
                case None => throw e
              }
            }
            -1
        }
      code match {
        case 200 => return
        case 412 => lostOrWon(); return
        case 409 =>
          // concurrent conditional writes in flight — transient: back off and
          // re-issue; on exhaustion resolve via read-back like 412
          if (tries >= retryLimit) { lostOrWon(); return }
        case c if c > 0 && isRetryableCode(c) =>
          // 5xx/429 on a PUT is AMBIGUOUS (a 500 can follow a server-side
          // apply) — mark it so a later 412 disambiguates by content
          ambiguous = true
          if (tries >= retryLimit) {
            readMatches(key, bytes) match {
              case Some(true) => return
              case Some(false) =>
                throw new FileAlreadyExistsException(s"s3://$bucket/$key already exists")
              case None => httpError(c, s"PUT s3://$bucket/$key -> HTTP $c (retries exhausted)")
            }
          }
        case -1 => () // transport failure already accounted above
        case c => httpError(c, s"PUT s3://$bucket/$key -> HTTP $c")
      }
      backoff(tries); tries += 1
    }
  }

  private def copyObject(srcKey: String, dstKey: String): Unit =
    retrying(s"COPY $srcKey") { () =>
      val conn = connect("PUT", dstKey)
      conn.setRequestProperty("x-amz-copy-source", s"/$bucket/$srcKey")
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(0)
      conn.getOutputStream.close()
      val code = conn.getResponseCode
      drain(conn)
      if (code != 200) httpError(code, s"COPY $srcKey -> $dstKey: HTTP $code")
    }

  private def deleteObject(key: String): Boolean = retrying(s"DELETE $key") { () =>
    val conn = connect("DELETE", key)
    try conn.getResponseCode match {
      case 204 | 200 => true
      case 404 => false
      case code => httpError(code, s"DELETE s3://$bucket/$key -> HTTP $code")
    } finally conn.disconnect()
  }

  /** COPY+DELETE per object — document-honest: NOT atomic (which is why
    * the delta COMMIT path never renames on this store; data-file moves
    * tolerate duplicates because only committed paths are ever read). */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src); val dstKey = keyOf(dst)
    val st = try getFileStatus(src) catch {
      case _: java.io.FileNotFoundException => return false
    }
    if (!st.isDirectory) {
      val target =
        try { if (getFileStatus(dst).isDirectory) s"$dstKey/${src.getName}" else dstKey }
        catch { case _: java.io.FileNotFoundException => dstKey }
      copyObject(srcKey, target); deleteObject(srcKey)
    } else {
      val (objs, _, _) = listAll(s"$srcKey/")
      objs.foreach { case (k, _, _) =>
        copyObject(k, s"$dstKey/${k.stripPrefix(s"$srcKey/")}"); deleteObject(k)
      }
    }
    true
  }

  private def listAll(prefix: String): (Seq[(String, Long, Long)], Seq[String], Option[String]) = {
    var token: Option[String] = None
    var first = true
    val objs = Seq.newBuilder[(String, Long, Long)]
    while (first || token.isDefined) {
      first = false
      val (o, _, next) = listPage(prefix, delimiter = None, token = token)
      objs ++= o
      token = next
    }
    (objs.result(), Nil, None)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    val st = try getFileStatus(f) catch {
      case _: java.io.FileNotFoundException => return false
    }
    if (!st.isDirectory) deleteObject(key)
    else {
      val (objs, _, _) = listAll(s"$key/")
      if (objs.nonEmpty && !recursive)
        throw new IOException(s"non-recursive delete of non-empty s3://$bucket/$key")
      // bulk DeleteObjects, 1000 keys per request (the S3 limit): a VACUUM
      // retiring a million expired files costs ~1000 requests, not 1M
      objs.map(_._1).grouped(1000).foreach(deleteObjects)
      true
    }
  }

  override def deleteBatch(paths: Seq[Path]): Long = {
    paths.map(keyOf).grouped(1000).foreach(deleteObjects)
    paths.size.toLong
  }

  /** `POST /?delete` multi-object delete (idempotent: deleting an
    * already-deleted key is a no-op, so the batch retries whole). */
  private def deleteObjects(keys: Seq[String]): Unit = {
    if (keys.isEmpty) return
    val xml = keys.map(k =>
      s"<Object><Key>${k.replace("&", "&amp;").replace("<", "&lt;")}</Key></Object>")
      .mkString("<Delete><Quiet>true</Quiet>", "", "</Delete>")
    val body = xml.getBytes(UTF_8)
    retrying("bulk DELETE") { () =>
      val conn = connect("POST", "", Seq("delete" -> ""), sha256(body))
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      os.write(body); os.close()
      val code = conn.getResponseCode
      drain(conn)
      if (code != 200) httpError(code, s"bulk delete on s3://$bucket -> HTTP $code")
    }
  }

  /** S3 has no directories — but committers (FileOutputCommitter's
    * `_temporary/0` dance) expect a just-mkdirs'ed EMPTY directory to
    * exist, so write a zero-byte DIRECTORY MARKER object `key/` (the s3a
    * convention). `getFileStatus` finds it via the prefix list;
    * `listStatus` filters it out of children. */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.nonEmpty) putObject(s"$key/", Array.emptyByteArray, failIfExists = false)
    true
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("S3 objects are immutable: no append")
}
