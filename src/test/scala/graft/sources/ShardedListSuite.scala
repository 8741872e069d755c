package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.FakeS3Server

/** The sharded flat lister (r19 verdict #5): one prefix's ListObjectsV2
  * page chain — serial through the Hadoop FS API by protocol — split
  * into concurrent disjoint `start-after` key ranges via adaptive
  * bisection. These pins are coverage-exactness under adversarial key
  * distributions: a hex-first-char scheme is the documented strawman
  * (every `part-…` key lands in one shard); bisection must not care. */
class ShardedListSuite extends AnyFunSuite {

  private def utf8Lt(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes(UTF_8), b.getBytes(UTF_8))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def withStore(body: (FakeS3Server, S3FileSystem) => Unit): Unit = {
    val server = new FakeS3Server("ak", "sk")
    server.start()
    try {
      val conf = new Configuration(false)
      conf.set("fs.s3.endpoint", s"http://127.0.0.1:${server.port}")
      conf.set("fs.s3.access.key", "ak")
      conf.set("fs.s3.secret.key", "sk")
      conf.set("fs.s3.retry.base.ms", "1")
      val fs = new S3FileSystem()
      fs.initialize(new java.net.URI("s3://bucket/"), conf)
      body(server, fs)
    } finally server.stop()
  }

  test("midKey: strictly between in UTF-8 byte order, or None — never wrong") {
    withStore { (_, fs) =>
      val rnd = new scala.util.Random(20)
      val alphabets = Seq(
        "abcdefghij", "part-0123456789", "0123456789abcdef",
        "é世xyz", "a") // accents/CJK stress the ASCII-only divergence
      (0 until 2000).foreach { _ =>
        val alpha = alphabets(rnd.nextInt(alphabets.size))
        def k() = (0 until 1 + rnd.nextInt(12))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        val (a, b) = (k(), k())
        val (lo, hi) = if (utf8Lt(a, b)) (a, b) else (b, a)
        if (lo != hi) fs.midKey(lo, Some(hi)).foreach { m =>
          assert(utf8Lt(lo, m) && utf8Lt(m, hi),
            s"midKey($lo, $hi) = $m not strictly between")
        }
        fs.midKey(lo, None).foreach { m =>
          assert(utf8Lt(lo, m), s"midKey($lo, +inf) = $m not above lo")
        }
      }
      // the gapless case must answer None, never a corrupt boundary
      assert(fs.midKey("abc", Some("abc")).isEmpty)
      // hi a strict extension of lo leaves room only BELOW hi's extension
      fs.midKey("abc", Some("abcd")).foreach(m =>
        assert(utf8Lt("abc", m) && utf8Lt(m, "abcd")))
    }
  }

  test("sharded listing covers the common-prefix key space EXACTLY (hex-shard strawman)") {
    withStore { (server, fs) =>
      // every key shares "tbl/part-" — a first-char shard scheme would
      // put 100% of them in one shard; adaptive bisection must still
      // fan out AND return the exact set, each key exactly once
      val keys = (0 until 3503).map(i => f"tbl/part-$i%08d-c0ffee.parquet")
      keys.foreach(k => server.seed(s"bucket/$k", Array[Byte](1)))
      server.listPages.set(0)
      // the bucket is the s3:// URI's AUTHORITY — key space starts at the path
      val got = fs.listFlatSharded(new Path("s3://bucket/tbl"), threads = 8)
        .map(_.getPath.toUri.getPath.stripPrefix("/"))
      assert(got.length === keys.size, "exactly-once coverage")
      assert(got.toSeq === keys.sorted,
        "the sharded union must equal the serial page chain's set")
      // pagination was genuinely exercised (4 pages minimum at 1000/page)
      assert(server.listPages.get() >= 4)
    }
  }

  test("sharded listing spans nested partition dirs and hostile key chars") {
    withStore { (server, fs) =>
      val keys =
        (0 until 1200).map(i => s"t2/k=a/part-$i.parquet") ++
          (0 until 1200).map(i => s"t2/k=b&c<d/part-$i.parquet") ++
          Seq("t2/_delta_log/00000000000000000000.json")
      keys.foreach(k => server.seed(s"bucket/$k", Array[Byte](1)))
      val got = fs.listFlatSharded(new Path("s3://bucket/t2"), threads = 8)
        .map(_.getPath.toUri.getPath.stripPrefix("bucket/").stripPrefix("/bucket/"))
      assert(got.length === keys.size)
      assert(got.count(_.contains("b&c<d")) === 1200,
        "XML-escaped keys must round-trip through pagination")
    }
  }

  test("a sink failure mid-drain releases every shard worker (no parked threads)") {
    withStore { (server, fs) =>
      (0 until 3000).foreach(i =>
        server.seed(f"bucket/t3/part-$i%06d.parquet", Array[Byte](1)))
      val before = Thread.activeCount()
      var n = 0
      val boom = intercept[RuntimeException] {
        fs.listFlatShardedForeach(new Path("s3://bucket/t3"), threads = 8) { _ =>
          n += 1
          if (n == 100) throw new RuntimeException("sink boom")
        }
      }
      assert(boom.getMessage === "sink boom")
      // workers drain out within a beat; a leak here means put() parked
      Thread.sleep(500)
      assert(Thread.activeCount() <= before + 2,
        "shard workers must not stay parked after a sink abort")
    }
  }

  test("serial listStatus still pages correctly against the paginated fake") {
    withStore { (server, fs) =>
      // the fake now truncates at max-keys=1000: the token loop in the
      // PLAIN lister must still see everything (regression guard for the
      // pagination this round added to FakeS3Server)
      (0 until 2345).foreach(i =>
        server.seed(f"bucket/t4/part-$i%06d.parquet", Array[Byte](1)))
      val got = fs.listStatus(new Path("s3://bucket/t4"))
      assert(got.length === 2345)
    }
  }
}
