package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem over plain HTTP(S) — the Spark-side
  * equivalent of the reference's HTTP object store
  * (`/root/reference/src/object_store.rs:36-41`, which registers an HTTP
  * store so `register_parquet("http://…")` works). Hadoop ships no such
  * FileSystem, so this one is implemented here from the JDK's
  * HttpURLConnection alone:
  *
  *  - `getFileStatus` = HEAD (falling back to a 1-byte ranged GET for
  *    servers that reject HEAD, taking the total from `Content-Range`);
  *  - `open` returns a seekable stream: sequential reads share one
  *    connection, a `seek` lazily reopens at the new offset with a
  *    `Range: bytes=pos-` request, and positioned reads (`readFully`) are
  *    independent one-shot range requests — exactly the access pattern a
  *    parquet footer + column-chunk read needs;
  *  - like the reference's store (and HTTP itself) there is NO listing:
  *    a path names one object, so `listStatus` returns just it — point
  *    reads of single files (`spark.read.parquet("http://…/f.parquet")`),
  *    not directory tables;
  *  - every mutation throws: the store is read-only by protocol.
  *
  * Register with `fs.http.impl` / `fs.https.impl` (GraftSession presets
  * both): `spark.hadoop.fs.http.impl=graft.sources.HttpFileSystem`. */
class HttpFileSystem extends FileSystem {

  private var fsUri: URI = _

  override def getScheme: String = "http"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"$getScheme://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getUri: URI = fsUri

  private def urlOf(f: Path): URL = f.toUri.toURL

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op: the $getScheme:// store is read-only (HTTP has no write surface)")

  /** Transient-retry for the status/open probe — executed once per file
    * fleet-wide, so a single throttling 503 or connect timeout must not
    * kill the task while the byte-range reads next to it retry happily. */
  private def retryingStatus[T](attempt: () => T): T = {
    var tries = 0
    while (true) {
      try return attempt()
      catch {
        case e: java.io.FileNotFoundException => throw e
        case e: HttpStatusTransientException if tries < 3 =>
          backoffStatus(tries); tries += 1
        case e: IOException
          if tries < 3 && !e.isInstanceOf[HttpStatusTransientException] &&
            (e.isInstanceOf[java.net.SocketTimeoutException] ||
             e.isInstanceOf[java.net.ConnectException] ||
             e.isInstanceOf[java.net.SocketException]) =>
          backoffStatus(tries); tries += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
  private def backoffStatus(tries: Int): Unit = {
    val cap = math.min(100L << math.min(tries, 16), 10000L)
    Thread.sleep(
      (java.util.concurrent.ThreadLocalRandom.current().nextDouble() * cap).toLong)
  }
  private final class HttpStatusTransientException(msg: String) extends IOException(msg)

  /** Unfollowed redirect (HttpURLConnection never crosses protocols,
    * e.g. http→https): treating the 3xx response as the object would
    * serve the redirect HTML as parquet — fail with the target instead. */
  private def rejectRedirect(f: Path, conn: HttpURLConnection, code: Int): Unit =
    if (code >= 300 && code < 400) throw new IOException(
      s"$f: unfollowed HTTP $code redirect to " +
        s"${Option(conn.getHeaderField("Location")).getOrElse("<no Location>")} — " +
        "use the redirect target URL directly (cross-protocol redirects are not followed)")

  override def getFileStatus(f: Path): FileStatus = retryingStatus { () =>
    val conn = urlOf(f).openConnection().asInstanceOf[HttpURLConnection]
    HttpTimeouts(conn,
      getConf.getInt("fs.http.connect.timeout.ms", 15000),
      getConf.getInt("fs.http.read.timeout.ms", 60000))
    conn.setRequestMethod("HEAD")
    conn.setInstanceFollowRedirects(true)
    try {
      val code = conn.getResponseCode
      if (code == HttpURLConnection.HTTP_NOT_FOUND)
        throw new java.io.FileNotFoundException(f.toString)
      rejectRedirect(f, conn, code)
      if (code == 408 || code == 429 || code >= 500)
        throw new HttpStatusTransientException(s"HEAD $f -> HTTP $code")
      if (code >= 400 || conn.getContentLengthLong < 0)
        statusViaRangedGet(f) // HEAD unsupported → 1-byte ranged GET
      else status(f, conn.getContentLengthLong, conn.getLastModified)
    } finally conn.disconnect()
  }

  /** Servers that reject HEAD still answer `Range: bytes=0-0` with a
    * `Content-Range: bytes 0-0/<total>` — take the length from there. */
  private def statusViaRangedGet(f: Path): FileStatus = {
    val conn = urlOf(f).openConnection().asInstanceOf[HttpURLConnection]
    HttpTimeouts(conn,
      getConf.getInt("fs.http.connect.timeout.ms", 15000),
      getConf.getInt("fs.http.read.timeout.ms", 60000))
    conn.setRequestProperty("Range", "bytes=0-0")
    try {
      val code = conn.getResponseCode
      if (code == HttpURLConnection.HTTP_NOT_FOUND)
        throw new java.io.FileNotFoundException(f.toString)
      rejectRedirect(f, conn, code)
      if (code == 408 || code == 429 || code >= 500)
        throw new HttpStatusTransientException(s"GET $f -> HTTP $code")
      if (code >= 400) throw new IOException(s"GET $f -> HTTP $code")
      // RFC 7233 allows 'bytes 0-0/*' (total unknown) — a non-numeric
      // total falls through to Content-Length, then the length error
      val total = Option(conn.getHeaderField("Content-Range"))
        .filter(_.contains("/")).map(_.split('/').last.trim)
        .filter(t => t.nonEmpty && t.forall(_.isDigit)).map(_.toLong)
        .getOrElse(conn.getContentLengthLong)
      if (total < 0) throw new IOException(
        s"$f: server reports no length (no HEAD, no numeric Content-Range)")
      conn.getInputStream.close()
      status(f, total, conn.getLastModified)
    } finally conn.disconnect()
  }

  private def status(f: Path, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 64L << 20, math.max(mtime, 0L), 0L,
      FsPermission.getFileDefault, "", "", f)

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val len = getFileStatus(f).getLen
    new FSDataInputStream(new HttpSeekableInputStream(urlOf(f), len,
      connectTimeoutMs = getConf.getInt("fs.http.connect.timeout.ms", 15000),
      readTimeoutMs = getConf.getInt("fs.http.read.timeout.ms", 60000)))
  }

  /** HTTP has no listing protocol: a path IS one object. */
  override def listStatus(f: Path): Array[FileStatus] = Array(getFileStatus(f))

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly("create")
  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly("mkdirs")

  override def setWorkingDirectory(dir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri)
}

/** Same store over TLS (`fs.https.impl`). */
class HttpsFileSystem extends HttpFileSystem {
  override def getScheme: String = "https"
}

/** Seekable HTTP stream: one live connection for sequential reads, lazy
  * `Range: bytes=pos-` reopen after a seek, one-shot bounded range
  * requests for positioned reads (safe to call concurrently with the
  * sequential cursor — they share no state).
  *
  * Every GET is idempotent, so transient failures — 429/5xx responses
  * and transport-level IOExceptions (connection reset mid-column-chunk:
  * routine at 100 TB scan scale) — retry with bounded exponential
  * backoff + jitter; a mid-stream reset reopens at the CURRENT offset,
  * never re-reading delivered bytes.
  *
  * @param prepare hook run on every connection before it is sent — the
  *        seam stores with authenticated GETs (S3 SigV4) plug into */
private[graft] class HttpSeekableInputStream(
    url: URL, length: Long, prepare: HttpURLConnection => Unit = _ => (),
    maxRetries: Int = 3, retryBaseMs: Long = 100L,
    connectTimeoutMs: Int = 15000, readTimeoutMs: Int = 60000)
  extends InputStream with Seekable with PositionedReadable {

  private var pos = 0L
  private var in: InputStream = _
  private var streamPos = -1L // offset the open stream is positioned at

  /** Throttle/server-transient status — always retried. */
  private final class TransientHttpIOException(msg: String) extends IOException(msg)
  /** Contract error (404, range-unsupported) — never retried. */
  private final class PermanentHttpIOException(msg: String) extends IOException(msg)

  private def transientCode(code: Int): Boolean =
    code == 408 || code == 429 || code >= 500

  /** Retry transient HTTP statuses and transport-level IOExceptions
    * (connection reset, truncated body); contract errors and EOF fail
    * through untouched. */
  private def withRetries[T](attempt: () => T): T = {
    var tries = 0
    while (true) {
      try return attempt()
      catch {
        case e: IOException
          if tries < maxRetries && !e.isInstanceOf[PermanentHttpIOException] &&
            !e.isInstanceOf[EOFException] =>
          val cap = math.min(retryBaseMs << math.min(tries, 16), 10000L)
          Thread.sleep(
            (java.util.concurrent.ThreadLocalRandom.current().nextDouble() * cap).toLong)
          tries += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def ensureOpen(): InputStream = {
    if (in == null || streamPos != pos) {
      if (in != null) { in.close(); in = null }
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      HttpTimeouts(conn, connectTimeoutMs, readTimeoutMs)
      if (pos > 0) conn.setRequestProperty("Range", s"bytes=$pos-")
      prepare(conn)
      val code = conn.getResponseCode
      if (code >= 300 && code < 400)
        throw new PermanentHttpIOException(
          s"$url: unfollowed HTTP $code redirect to " +
            s"${Option(conn.getHeaderField("Location")).getOrElse("<no Location>")}")
      if (code >= 400) {
        if (transientCode(code))
          throw new TransientHttpIOException(s"GET $url @$pos -> HTTP $code")
        throw new PermanentHttpIOException(s"GET $url @$pos -> HTTP $code")
      }
      if (pos > 0 && code != HttpURLConnection.HTTP_PARTIAL)
        throw new PermanentHttpIOException(
          s"$url: server ignored Range (HTTP $code) — cannot serve seekable reads")
      in = conn.getInputStream
      streamPos = pos
    }
    in
  }

  override def read(): Int = withRetries { () =>
    if (pos >= length) -1
    else {
      val b =
        try ensureOpen().read()
        catch { case e: IOException => close(); throw e } // reopen at pos on retry
      if (b >= 0) { pos += 1; streamPos = pos }
      else {
        // PREMATURE server-side EOF: pos < length means the connection
        // ended early (close-delimited response, object replaced) — a
        // clean -1 here would silently truncate the stream. Transient:
        // the retry reopens at pos via Range.
        close()
        throw new TransientHttpIOException(
          s"$url: premature EOF at $pos of $length")
      }
      b
    }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = withRetries { () =>
    if (pos >= length) -1
    else {
      val n =
        try ensureOpen().read(b, off, len)
        catch { case e: IOException => close(); throw e } // reopen at pos on retry
      if (n > 0) { pos += n; streamPos = pos }
      else if (n < 0) {
        // premature EOF with pos < length — see read() above
        close()
        throw new TransientHttpIOException(
          s"$url: premature EOF at $pos of $length")
      }
      n
    }
  }

  override def seek(newPos: Long): Unit = {
    if (newPos < 0 || newPos > length)
      throw new EOFException(s"seek($newPos) outside [0, $length] for $url")
    pos = newPos // stream reopens lazily on the next read
  }

  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int, len: Int): Int = {
    if (position >= length) return -1
    val want = math.min(len.toLong, length - position).toInt
    if (want <= 0) return 0
    withRetries { () =>
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      HttpTimeouts(conn, connectTimeoutMs, readTimeoutMs)
      conn.setRequestProperty("Range", s"bytes=$position-${position + want - 1}")
      prepare(conn)
      try {
        val code = conn.getResponseCode
        if (code >= 300 && code < 400)
          throw new PermanentHttpIOException(
            s"$url: unfollowed HTTP $code redirect to " +
              s"${Option(conn.getHeaderField("Location")).getOrElse("<no Location>")}")
        if (code >= 400) {
          if (transientCode(code))
            throw new TransientHttpIOException(s"GET $url @$position -> HTTP $code")
          throw new PermanentHttpIOException(s"GET $url @$position -> HTTP $code")
        }
        if (code != HttpURLConnection.HTTP_PARTIAL) throw new PermanentHttpIOException(
          s"$url: server ignored Range (HTTP $code) — cannot serve positioned reads")
        val s = conn.getInputStream
        try {
          var total = 0
          var n = 0
          while (total < want &&
            { n = s.read(buffer, offset + total, want - total); n > 0 }) total += n
          total
        } finally s.close()
      } finally conn.disconnect()
    }
  }

  override def readFully(position: Long, buffer: Array[Byte], offset: Int, len: Int): Unit = {
    var total = 0
    while (total < len) {
      val n = read(position + total, buffer, offset + total, len - total)
      if (n <= 0) throw new EOFException(
        s"EOF at ${position + total} reading $len bytes from $url")
      total += n
    }
  }

  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)

  override def close(): Unit = {
    if (in != null) { in.close(); in = null }
    streamPos = -1L
  }
}

/** Bounded connect/read timeouts for every JDK connection the stores
  * open: without them one black-holed TCP connection (routine at
  * 100-TB fleet scale) parks a Spark task forever — there is no default
  * task reaper. A timeout surfaces as IOException and flows into the
  * same transient-retry seams as a 5xx. Defaults are deliberately
  * generous (15 s connect / 60 s read — a slow-but-alive range stream
  * must not be killed mid-column-chunk); stores with a Configuration
  * pass conf-driven values, bare streams use the defaults. */
private[graft] object HttpTimeouts {
  def apply(conn: HttpURLConnection,
      connectMs: Int = 15000, readMs: Int = 60000): Unit = {
    conn.setConnectTimeout(connectMs)
    conn.setReadTimeout(readMs)
  }
}
