package graft

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.S3FileSystem
import graft.sources.delta.{DeltaDml, DeltaLog, DeltaTable, DeltaWriter}

/** In-process fake S3: the REST surface [[S3FileSystem]] speaks —
  * GET/HEAD objects (+Range), PUT (+`If-None-Match: *` conditional
  * create, +`x-amz-copy-source` COPY), DELETE, ListObjectsV2 with
  * delimiter/continuation-token — with REAL SigV4 verification (the
  * server recomputes every request's signature from the shared secret
  * and rejects mismatches), so the signer is tested end-to-end, not
  * just "an Authorization header exists". */
/** A queued fault: the next request matching (method, path substring,
  * query substring) draws this response instead of normal handling.
  * `applyFirst` performs the PUT server-side BEFORE failing the response
  * (the ambiguous commit case: applied-but-unacknowledged); `killConn`
  * closes the connection without any response (transport failure). */
case class S3Fault(method: String, pathContains: String, code: Int,
    applyFirst: Boolean = false, killConn: Boolean = false, queryContains: String = "")

class FakeS3Server(accessKey: String, secretKey: String) {
  private val objects = new ConcurrentHashMap[String, Array[Byte]]() // "bucket/key" -> bytes
  private val uploads = // uploadId -> (path, partNumber -> bytes)
    new ConcurrentHashMap[String, (String, ConcurrentHashMap[Int, Array[Byte]])]()
  @volatile var multipartCompletions = 0 // observability for specs
  @volatile var bulkDeletes = 0
  @volatile var multipartAborts = 0
  private val faults = new java.util.concurrent.ConcurrentLinkedQueue[S3Fault]()
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort
  def keys: Set[String] = objects.keySet().asScala.toSet
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
    hex(hmac(kSigning, toSign)) == sigM.group(1)
  }

  private def route(ex: HttpExchange): Unit = {
    val body = ex.getRequestBody.readAllBytes()
    if (!verifySig(ex, body)) { ex.sendResponseHeaders(403, -1); ex.close(); return }
    val rawPath = URLDecoder.decode(ex.getRequestURI.getRawPath, "UTF-8").stripPrefix("/")
    val rawQuery = Option(ex.getRequestURI.getQuery).getOrElse("")
    val query = rawQuery.split('&')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> URLDecoder.decode(v, "UTF-8")
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
        val (_, parts) = uploads.get(query("uploadId"))
        parts.put(query("partNumber").toInt, body)
        ex.getResponseHeaders.add("ETag", s""""p${query("partNumber")}"""")
        ex.sendResponseHeaders(200, -1); ex.close()
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
        val m = """bytes=(\d+)-(\d*)""".r.findFirstMatchIn(r).get
        val from = m.group(1).toInt
        val to = Option(m.group(2)).filter(_.nonEmpty).map(_.toInt)
          .getOrElse(bytes.length - 1).min(bytes.length - 1)
        val slice = java.util.Arrays.copyOfRange(bytes, from, to + 1)
        ex.getResponseHeaders.add("Content-Range", s"bytes $from-$to/${bytes.length}")
        ex.sendResponseHeaders(206, slice.length.toLong)
        ex.getResponseBody.write(slice)
      case _ =>
        // HEAD still advertises Content-Length (the JDK server suppresses
        // the body and logs a cosmetic warning)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        if (!head) ex.getResponseBody.write(bytes)
    }
    ex.close()
  }

  /** Apply the PUT's mutation (copy / conditional / plain); returns the
    * status it produces — shared by the normal handler and the
    * applyFirst fault path. */
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
    val all = objects.keySet().asScala.toSeq.sorted
      .filter(_.startsWith(s"$bucket/$prefix"))
      .map(_.stripPrefix(s"$bucket/"))
    val (objsOut, prefixesOut) = delimiter match {
      case Some(d) =>
        val (direct, deeper) = all.partition(k => !k.stripPrefix(prefix).contains(d))
        (direct,
          deeper.map(k => prefix + k.stripPrefix(prefix).takeWhile(_ != d.head) + d).distinct)
      case None => (all, Nil)
    }
    val xml = new StringBuilder("<?xml version=\"1.0\"?><ListBucketResult>")
    objsOut.foreach { k =>
      xml ++= s"<Contents><Key>$k</Key><Size>${objects.get(s"$bucket/$k").length}</Size>" +
        "<LastModified>2026-01-01T00:00:00Z</LastModified></Contents>"
    }
    prefixesOut.foreach(p => xml ++= s"<CommonPrefixes><Prefix>$p</Prefix></CommonPrefixes>")
    xml ++= "</ListBucketResult>"
    val bytes = xml.toString.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/xml")
    ex.sendResponseHeaders(200, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

/** S3 object store end-to-end (reference `src/object_store.rs:42-47` +
  * `examples/s3_standalone.rs` — endpoint override + env credentials;
  * here the first-party SigV4 [[S3FileSystem]] against [[FakeS3Server]],
  * signature-VERIFIED per request). */
class S3StoreSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withS3(body: (FakeS3Server, String) => Unit): Unit = {
    val server = new FakeS3Server("graft-access", "graft-secret")
    server.start()
    try {
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3.impl", classOf[S3FileSystem].getName)
      hc.set("fs.s3.endpoint", s"http://127.0.0.1:${server.port}")
      hc.set("fs.s3.access.key", "graft-access")
      hc.set("fs.s3.secret.key", "graft-secret")
      hc.set("fs.s3.impl.disable.cache", "true") // endpoint/port changes per test
      hc.set("fs.s3.retry.base.ms", "1") // keep fault-injection specs fast
      body(server, s"s3://bucket/tbl-${java.util.UUID.randomUUID().toString.take(8)}")
    } finally server.stop()
  }

  test("full delta write -> log replay -> scan -> DML over s3://") {
    import spark.implicits._
    withS3 { (server, table) =>
      DeltaTable.write(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k"),
        table, SaveMode.Append, partitionBy = Seq("k"))
      assert(server.keys.exists(_.contains("_delta_log/00000000000000000000.json")))
      val got = DeltaTable.read(spark, table)
      assert(got.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
      // partition pruning still applies through the store
      assert(got.filter($"k" === "a").count() === 2L)
      // a second commit + DML (copy-on-write rewrite through the store)
      DeltaTable.write(Seq((4L, "b")).toDF("id", "k"), table, SaveMode.Append)
      DeltaDml.delete(spark, table, "id = 2")
      assert(DeltaTable.read(spark, table).select("id").as[Long].collect().sorted.toSeq
        === Seq(1L, 3L, 4L))
      // time travel replays the s3-hosted log
      assert(DeltaTable.readVersion(spark, table, 0L).count() === 3L)
    }
  }

  test("commit mutual exclusion: conditional PUT makes the second writer lose") {
    withS3 { (_, table) =>
      import spark.implicits._
      DeltaTable.write(Seq((1L, "a")).toDF("id", "k"), table, SaveMode.Append)
      val v1 = """{"commitInfo":{"operation":"TEST","timestamp":1}}"""
      assert(DeltaLog.tryCommit(spark, table, 1L, v1))
      assert(!DeltaLog.tryCommit(spark, table, 1L, v1),
        "second commit of the same version must lose the conditional PUT")
      assert(DeltaLog.tryCommit(spark, table, 2L, v1))
    }
  }

  test("large objects go up MULTIPART and read back bit-identical") {
    import spark.implicits._
    withS3 { (server, table) =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3.multipart.threshold", "1024") // every parquet file crosses it
      hc.set("fs.s3.multipart.size", "2048")
      try {
        val df = (0 until 5000).map(i => (i.toLong, s"row-$i-${"x" * 20}")).toDF("id", "s")
        DeltaTable.write(df.coalesce(2), table, SaveMode.Append)
        assert(server.multipartCompletions >= 2,
          s"expected the parquet files to upload multipart, saw ${server.multipartCompletions}")
        val got = DeltaTable.read(spark, table)
        assert(got.count() === 5000L)
        assert(got.agg(org.apache.spark.sql.functions.sum("id")).as[Long].collect().head
          === (0L until 5000L).sum)
        // commits stay single conditional PUTs (small JSON, If-None-Match)
        assert(DeltaLog.snapshot(spark, table).version === 0L)
      } finally {
        hc.unset("fs.s3.multipart.threshold"); hc.unset("fs.s3.multipart.size")
      }
    }
  }

  test("recursive prefix delete goes through ONE bulk DeleteObjects request") {
    withS3 { (server, table) =>
      import spark.implicits._
      DeltaTable.write((0 until 20).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .repartition(4), table, SaveMode.Append)
      val before = server.keys.count(_.startsWith("bucket/"))
      assert(before > 4)
      val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
      val deletesBefore = server.bulkDeletes
      assert(fs.delete(new Path(table), true))
      assert(server.bulkDeletes === deletesBefore + 1,
        "a <=1000-object prefix must retire in ONE DeleteObjects call")
      val tableName = new Path(table).getName // UUID-suffixed, unique
      assert(!server.keys.exists(_.contains(tableName)),
        s"objects survived the recursive delete: ${server.keys.filter(_.contains(tableName))}")
    }
  }

  test("VACUUM on s3:// retires expired files through bulk DeleteObjects") {
    import spark.implicits._
    withS3 { (server, table) =>
      DeltaTable.write((0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .repartition(3), table, SaveMode.Append)
      // overwrite strands the v0 files; retention 0 makes them vacuumable
      DeltaTable.write(Seq((99L, "z")).toDF("id", "s").coalesce(1),
        table, SaveMode.Overwrite)
      val deletesBefore = server.bulkDeletes
      val n = graft.sources.delta.DeltaMaintenance.vacuum(spark, table, retentionMs = 0L)
      assert(n >= 3L, s"expected the 3 stranded v0 files vacuumed, got $n")
      assert(server.bulkDeletes === deletesBefore + 1,
        "vacuum must retire the batch in ONE DeleteObjects request")
      assert(DeltaTable.read(spark, table).count() === 1L, "live data must survive")
    }
  }

  // ---- transient-failure resilience (fault injection) ----

  private def fsOf(table: String): graft.sources.S3FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
      .asInstanceOf[graft.sources.S3FileSystem]

  test("503 SlowDown twice on GET is retried transparently") {
    withS3 { (server, table) =>
      val fs = fsOf(table)
      val p = new Path(s"$table/obj.bin")
      val out = fs.create(p, true)
      out.write("payload-under-test".getBytes(UTF_8)); out.close()
      server.injectFault(S3Fault("GET", "obj.bin", 503))
      server.injectFault(S3Fault("GET", "obj.bin", 503))
      val in = fs.open(p, 4096)
      val got = new String(in.readAllBytes(), UTF_8)
      in.close()
      assert(got === "payload-under-test")
    }
  }

  test("LIST and HEAD retry through 500s") {
    withS3 { (server, table) =>
      val fs = fsOf(table)
      val p = new Path(s"$table/a/x.bin")
      val out = fs.create(p, true); out.write(Array[Byte](1, 2, 3)); out.close()
      server.injectFault(S3Fault("HEAD", "x.bin", 500))
      assert(fs.getFileStatus(p).getLen === 3L)
      server.injectFault(S3Fault("GET", "", 503, queryContains = "list-type"))
      assert(fs.listStatus(new Path(s"$table/a")).length === 1)
    }
  }

  test("connection killed mid-PUT is retried (transport failure, idempotent verb)") {
    withS3 { (server, table) =>
      val fs = fsOf(table)
      server.injectFault(S3Fault("PUT", "killed.bin", 0, killConn = true))
      val p = new Path(s"$table/killed.bin")
      val out = fs.create(p, true)
      out.write("survived".getBytes(UTF_8)); out.close()
      val in = fs.open(p, 4096)
      assert(new String(in.readAllBytes(), UTF_8) === "survived")
      in.close()
    }
  }

  test("ambiguous 500 AFTER server-side apply on the commit PUT: tryCommit wins, no double apply") {
    withS3 { (server, table) =>
      import spark.implicits._
      DeltaTable.write(Seq((1L, "a")).toDF("id", "k"), table, SaveMode.Append)
      val content = """{"commitInfo":{"operation":"TEST","timestamp":7}}"""
      // server applies the conditional PUT, then fails the response — the
      // client must read back, recognize ITS OWN content, and claim the win
      server.injectFault(S3Fault("PUT", "00000000000000000001.json", 500, applyFirst = true))
      assert(DeltaLog.tryCommit(spark, table, 1L, content),
        "an applied-but-unacknowledged commit is a WIN, not a lost race")
      val key = server.keys.find(_.endsWith("00000000000000000001.json")).get
      assert(new String(server.get(key), UTF_8) === content)
    }
  }

  test("transient 500 (not applied) on the commit PUT retries and commits") {
    withS3 { (server, table) =>
      import spark.implicits._
      DeltaTable.write(Seq((1L, "a")).toDF("id", "k"), table, SaveMode.Append)
      server.injectFault(S3Fault("PUT", "00000000000000000001.json", 500))
      assert(DeltaLog.tryCommit(spark, table, 1L, """{"commitInfo":{"operation":"T"}}"""))
    }
  }

  test("ambiguous failure then a GENUINE loss still reports false (content differs)") {
    withS3 { (server, table) =>
      import spark.implicits._
      DeltaTable.write(Seq((1L, "a")).toDF("id", "k"), table, SaveMode.Append)
      val winner = """{"commitInfo":{"operation":"WINNER"}}"""
      assert(DeltaLog.tryCommit(spark, table, 1L, winner))
      // the loser's first attempt draws a 500 (ambiguous), the retry sees
      // 412, and read-back shows someone ELSE's content → lost
      server.injectFault(S3Fault("PUT", "00000000000000000001.json", 500))
      assert(!DeltaLog.tryCommit(spark, table, 1L, """{"commitInfo":{"operation":"LOSER"}}"""))
      val key = server.keys.find(_.endsWith("00000000000000000001.json")).get
      assert(new String(server.get(key), UTF_8) === winner, "the winner's commit must survive")
    }
  }

  test("409 ConditionalRequestConflict on conditional PUT is transient, not a hard failure") {
    withS3 { (server, table) =>
      val fs = fsOf(table)
      server.injectFault(S3Fault("PUT", "cond.json", 409))
      val out = fs.create(new Path(s"$table/cond.json"), false)
      out.write("won-after-contention".getBytes(UTF_8)); out.close()
      val in = fs.open(new Path(s"$table/cond.json"), 4096)
      assert(new String(in.readAllBytes(), UTF_8) === "won-after-contention")
      in.close()
    }
  }

  test("multipart create-if-absent stays atomic: conditional COMPLETE loses 412 and aborts") {
    withS3 { (server, table) =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3.multipart.threshold", "64")
      hc.set("fs.s3.multipart.size", "64")
      try {
        val fs = fsOf(table)
        val p = new Path(s"$table/big.bin")
        val first = fs.create(p, false)
        first.write(("A" * 300).getBytes(UTF_8)); first.close()
        assert(server.multipartCompletions >= 1)
        // second exclusive create of the SAME key must lose at COMPLETE time
        intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
          val out = fs.create(p, false)
          out.write(("B" * 300).getBytes(UTF_8)); out.close()
        }
        assert(new String(server.get(s"bucket/${new Path(table).getName}/big.bin"), UTF_8)
          === "A" * 300, "the first writer's object must survive")
        assert(server.multipartAborts >= 1, "the losing upload must be aborted")
        assert(server.activeUploads === 0, "no orphaned multipart uploads may remain")
      } finally {
        hc.unset("fs.s3.multipart.threshold"); hc.unset("fs.s3.multipart.size")
      }
    }
  }

  test("ambiguous 500 AFTER an applied multipart COMPLETE resolves by read-back, no abort") {
    withS3 { (server, table) =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3.multipart.threshold", "64")
      hc.set("fs.s3.multipart.size", "64")
      try {
        val fs = fsOf(table)
        val p = new Path(s"$table/big-ambig.bin")
        // the COMPLETE applies server-side but its 200 is lost; the blind
        // retry hits 404 NoSuchUpload (consumed id) — the writer must
        // recognize its own object (unique key + expected length) and
        // report success, never a loss, never an abort of a live object
        server.injectFault(
          S3Fault("POST", "big-ambig.bin", 500, applyFirst = true, queryContains = "uploadId"))
        val out = fs.create(p, false)
        out.write(("C" * 300).getBytes(UTF_8)); out.close()
        assert(new String(server.get(s"bucket/${new Path(table).getName}/big-ambig.bin"), UTF_8)
          === "C" * 300, "the applied upload must be the visible object")
        assert(server.activeUploads === 0, "the consumed upload leaves no orphan")
        assert(fs.getFileStatus(p).getLen === 300L)
      } finally {
        hc.unset("fs.s3.multipart.threshold"); hc.unset("fs.s3.multipart.size")
      }
    }
  }

  test("a failed part upload aborts the multipart upload (no orphaned parts)") {
    withS3 { (server, table) =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3.multipart.threshold", "64")
      hc.set("fs.s3.multipart.size", "64")
      try {
        val fs = fsOf(table)
        // exhaust the retry budget (limit 4 ⇒ 5 attempts) on part 2
        (0 until 5).foreach { _ =>
          server.injectFault(S3Fault("PUT", "doomed.bin", 500, queryContains = "partNumber=2"))
        }
        intercept[java.io.IOException] {
          val out = fs.create(new Path(s"$table/doomed.bin"), true)
          out.write(("C" * 300).getBytes(UTF_8)); out.close()
        }
        assert(server.multipartAborts >= 1, "failed upload must be aborted")
        assert(server.activeUploads === 0, "no orphaned multipart uploads may remain")
        assert(!server.keys.exists(_.endsWith("doomed.bin")))
      } finally {
        hc.unset("fs.s3.multipart.threshold"); hc.unset("fs.s3.multipart.size")
      }
    }
  }

  test("delta STREAMING source tails an s3:// table (listing-based discovery)") {
    import spark.implicits._
    withS3 { (_, table) =>
      DeltaTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), table, SaveMode.Append)
      // stream checkpoint stays local (production object-store checkpoints
      // ride committer machinery out of scope here); the SOURCE is s3://
      val cp = java.nio.file.Files.createTempDirectory("graft-s3-stream-cp").toString
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("delta").load(table)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= batch.select("id").collect().map(_.getLong(0)) }
          ()
        }
        .start()
      try {
        q.processAllAvailable()
        assert(seen.synchronized(seen.sorted.toSeq) === Seq(1L, 2L))
        // a NEW commit lands on s3 and the stream picks it up
        DeltaTable.write(Seq((3L, "c")).toDF("id", "k"), table, SaveMode.Append)
        q.processAllAvailable()
        assert(seen.synchronized(seen.sorted.toSeq) === Seq(1L, 2L, 3L))
      } finally q.stop()
    }
  }

  test("dl-family parity: the same delta pipeline on s3:// and file:// is value-identical") {
    import org.apache.spark.sql.functions._
    // the dl01–dl05 shapes (partitioned roundtrip, time travel, pruned
    // read, DML rewrite, VACUUM) executed against BOTH stores from the
    // same fixture — any divergence in scan/commit/delete behavior
    // between the conditional-PUT plane and POSIX shows here
    def pipeline(root: String): Seq[Seq[String]] = {
      val dir = "/root/testdata/sf0.001"
      val supplier = spark.read.parquet(s"$dir/supplier.parquet")
      // dl01: partitioned write → provider read → aggregate
      val p1 = s"$root/t1"
      supplier.write.format("delta").partitionBy("s_nationkey").save(p1)
      val r1 = DeltaTable.read(spark, p1)
        .groupBy(col("s_nationkey").cast("int").as("k"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("s_acctbal").cast("decimal(18,6)")), 2).cast("string").as("bal"))
        .orderBy(col("k")).collect().map(_.mkString("|")).toSeq
      // dl02: two commits + VERSION AS OF 0
      val p2 = s"$root/t2"
      DeltaTable.write(supplier.filter(col("s_suppkey") % 2 === 0), p2, SaveMode.Append)
      DeltaTable.write(supplier.filter(col("s_suppkey") % 2 === 1), p2, SaveMode.Append)
      val r2 = DeltaTable.readVersion(spark, p2, 0L)
        .agg(count(lit(1)), sum(col("s_suppkey")))
        .collect().map(_.mkString("|")).toSeq
      // dl03: partition-pruned read
      val r3 = DeltaTable.read(spark, p1).filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey")).collect().map(_.mkString("|")).toSeq
      // dl06-shape: DELETE rewrite, then VACUUM the stranded files
      DeltaDml.delete(spark, p2, "s_suppkey % 7 = 0")
      val r4 = DeltaTable.read(spark, p2)
        .agg(count(lit(1)), sum(col("s_suppkey")))
        .collect().map(_.mkString("|")).toSeq
      graft.sources.delta.DeltaMaintenance.vacuum(spark, p2, retentionMs = 0L)
      val r5 = DeltaTable.read(spark, p2)
        .agg(count(lit(1)), sum(col("s_suppkey")))
        .collect().map(_.mkString("|")).toSeq
      Seq(r1, r2, r3, r4, r5)
    }
    withS3 { (_, table) =>
      val local = java.nio.file.Files.createTempDirectory("graft-s3-parity").toString
      val onLocal = pipeline(local)
      val onS3 = pipeline(table)
      onLocal.zip(onS3).zipWithIndex.foreach { case ((l, s3r), i) =>
        assert(l === s3r, s"stage $i diverged between file:// and s3://")
      }
    }
  }

  test("mixed concurrent writers race the conditional-PUT commit plane to a serial result") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    import spark.implicits._
    withS3 { (_, table) =>
      (0 until 2).foreach { b =>
        DeltaTable.write(
          (1 to 20).map(i => ((b * 20 + i).toLong, s"r${b * 20 + i}", i % 2))
            .toDF("id", "payload", "p"),
          table, SaveMode.Append, partitionBy = Seq("p"))
      }
      val aborts = new java.util.concurrent.atomic.AtomicInteger(0)
      def untilCommitted(op: () => Unit): Unit = {
        var done = false
        var attempts = 0
        while (!done && attempts < 20) {
          try { op(); done = true }
          catch {
            case _: java.util.ConcurrentModificationException =>
              aborts.incrementAndGet(); attempts += 1
          }
        }
        assert(done, "op failed to commit within 20 conflict retries")
      }
      val ops: Seq[() => Unit] = Seq(
        () => DeltaTable.write(Seq((101L, "a1", 0)).toDF("id", "payload", "p"),
          table, SaveMode.Append, partitionBy = Seq("p")),
        () => DeltaTable.write(Seq((102L, "a2", 1)).toDF("id", "payload", "p"),
          table, SaveMode.Append, partitionBy = Seq("p")),
        () => DeltaDml.delete(spark, table, "p = 1 AND id <= 20"),
        () => DeltaDml.delete(spark, table, "p = 0 AND id <= 20"),
        () => DeltaDml.delete(spark, table, "p = 1 AND id > 20")) // overlaps p=1
      Await.result(
        Future.sequence(ops.map(op => Future(untilCommitted(op)))), 300.seconds)
      assert(DeltaLog.snapshot(spark, table).version === 6L,
        "2 seeds + 5 ops must serialize into a linear 7-version history")
      val deleted = (1 to 40).filter(i =>
        (i % 2 == 1 && i <= 20) || (i % 2 == 0 && i <= 20) ||
          (i % 2 == 1 && i > 20)).map(_.toLong).toSet
      val expected = (1L to 40L).toSet -- deleted ++ Set(101L, 102L)
      val got = DeltaTable.read(spark, table).select("id").as[Long].collect().toSet
      assert(got === expected, "final snapshot must equal the serial result")
    }
  }

  test("concurrent writers serialize THROUGH injected 503s/ambiguous 500s on commit PUTs") {
    // the production composition: OCC conflict retries × transport retries
    // × ambiguity read-back, all at once. Faults target the commit plane
    // (version JSON PUTs): a 503 before apply (pure retry), and an
    // ambiguous 500 AFTER server-side apply (read-back must recognize the
    // winner as itself, not abort as lost).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    import spark.implicits._
    withS3 { (server, table) =>
      DeltaTable.write(
        (1 to 20).map(i => (i.toLong, s"r$i", i % 2)).toDF("id", "payload", "p"),
        table, SaveMode.Append, partitionBy = Seq("p"))
      (1 to 4).foreach { v =>
        server.injectFault(S3Fault("PUT", f"$v%020d.json", 503))
      }
      server.injectFault(S3Fault("PUT", f"${2}%020d.json", 500, applyFirst = true))
      val ops: Seq[() => Unit] = Seq(
        () => DeltaTable.write(Seq((101L, "a1", 0)).toDF("id", "payload", "p"),
          table, SaveMode.Append, partitionBy = Seq("p")),
        () => DeltaTable.write(Seq((102L, "a2", 1)).toDF("id", "payload", "p"),
          table, SaveMode.Append, partitionBy = Seq("p")),
        () => DeltaDml.delete(spark, table, "p = 1 AND id <= 20"))
      def untilCommitted(op: () => Unit): Unit = {
        var done = false
        var attempts = 0
        while (!done && attempts < 20) {
          try { op(); done = true }
          catch {
            case _: java.util.ConcurrentModificationException => attempts += 1
          }
        }
        assert(done, "op failed to commit within 20 conflict retries")
      }
      Await.result(
        Future.sequence(ops.map(op => Future(untilCommitted(op)))), 300.seconds)
      assert(DeltaLog.snapshot(spark, table).version === 3L,
        "1 seed + 3 ops must serialize into a linear 4-version history")
      val expected = (1L to 20L).filter(_ % 2 == 0).toSet ++ Set(101L, 102L)
      val got = DeltaTable.read(spark, table).select("id").as[Long].collect().toSet
      assert(got === expected,
        "faults on the commit plane must not lose or double-apply any op")
    }
  }

  test("streaming CHECKPOINT lives on s3:// too, and a restart resumes exactly-once") {
    import spark.implicits._
    withS3 { (server, table) =>
      DeltaTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k"), table, SaveMode.Append)
      // checkpoint on the OBJECT STORE: Spark's rename-based
      // FileSystemBasedCheckpointFileManager rides our FileSystem (no
      // FileContext registered for s3://, so it takes the fallback path);
      // single-writer checkpoints tolerate the non-atomic COPY+DELETE
      // rename
      val cp = s"$table-cp/checkpoint"
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      def startQuery() = spark.readStream.format("delta").load(table)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= batch.select("id").collect().map(_.getLong(0)) }
          ()
        }
        .start()
      val q = startQuery()
      try {
        q.processAllAvailable()
        assert(seen.synchronized(seen.sorted.toSeq) === Seq(1L, 2L))
        assert(server.keys.exists(_.contains("checkpoint/offsets")),
          s"offsets log must live on s3://: ${server.keys.filter(_.contains("checkpoint"))}")
      } finally q.stop()
      // restart from the SAME s3-hosted checkpoint: already-committed
      // batches must NOT replay, new commits must flow
      DeltaTable.write(Seq((3L, "c")).toDF("id", "k"), table, SaveMode.Append)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        assert(seen.synchronized(seen.sorted.toSeq) === Seq(1L, 2L, 3L),
          "restart from the s3 checkpoint must resume exactly-once (no replay of 1,2)")
      } finally q2.stop()
    }
  }

  test("plain parquet + checkpointed log round-trip on s3://") {
    import spark.implicits._
    withS3 { (server, table) =>
      // enough commits to cross the checkpoint cadence (10)
      (0 until 12).foreach { i =>
        DeltaTable.write(Seq((i.toLong, s"r$i")).toDF("id", "s").coalesce(1),
          table, SaveMode.Append)
      }
      assert(server.keys.exists(_.contains(".checkpoint.parquet")),
        s"expected a checkpoint object, got: ${server.keys.filter(_.contains("_delta_log"))}")
      assert(DeltaTable.read(spark, table).count() === 12L)
      val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
      intercept[java.io.FileNotFoundException] {
        fs.getFileStatus(new Path(s"$table/absent.parquet"))
      }
    }
  }
}
