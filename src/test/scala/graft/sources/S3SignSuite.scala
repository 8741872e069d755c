package graft.sources

import java.net.{HttpURLConnection, URL}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** SigV4 host-header pinning: the JDK ignores setRequestProperty("Host")
  * (restricted header) and derives Host from the URL, DROPPING the port
  * when it equals the scheme default — so the SIGNED host string must
  * follow the same rule, or an endpoint like `http://host:80` signs
  * `host:80` while the wire carries `Host: host` and every request fails
  * verification against a strict server. */
class S3SignSuite extends AnyFunSuite {

  private val EmptySha =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  private def newFs(): S3FileSystem = {
    val conf = new Configuration(false)
    conf.set("fs.s3.endpoint", "http://example.com")
    conf.set("fs.s3.access.key", "ak")
    conf.set("fs.s3.secret.key", "sk")
    val fs = new S3FileSystem
    fs.initialize(java.net.URI.create("s3://bucket"), conf)
    fs
  }

  /** Sign a never-sent connection; sign() RETURNS the Authorization value
    * (the JDK filters security headers out of getRequestProperty). */
  private def signed(fs: S3FileSystem, urlStr: String): (String, String) = {
    val conn = new URL(urlStr).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val auth = fs.sign(conn, "GET", "/bucket/key", Nil, EmptySha)
    assert(auth != null && auth.contains("Signature="))
    (auth, conn.getRequestProperty("x-amz-date"))
  }

  test("explicit scheme-default port signs identically to no port (http:80, https:443)") {
    val fs = newFs()
    // sign() timestamps with now(); compare only same-second pairs
    def samePair(u1: String, u2: String): Unit = {
      var done = false
      var attempts = 0
      while (!done && attempts < 10) {
        val (a1, d1) = signed(fs, u1)
        val (a2, d2) = signed(fs, u2)
        if (d1 == d2) {
          assert(a1 === a2,
            s"signature must not depend on an explicit default port: $u1 vs $u2")
          done = true
        }
        attempts += 1
      }
      assert(done, "could not get two signatures inside the same second")
    }
    samePair("http://example.com:80/bucket/key", "http://example.com/bucket/key")
    samePair("https://example.com:443/bucket/key", "https://example.com/bucket/key")
  }

  test("a NON-default port stays in the signed host string") {
    val fs = newFs()
    var done = false
    var attempts = 0
    while (!done && attempts < 10) {
      val (a1, d1) = signed(fs, "http://example.com:9000/bucket/key")
      val (a2, d2) = signed(fs, "http://example.com/bucket/key")
      if (d1 == d2) {
        assert(a1 !== a2, "host:9000 and host must produce different signatures")
        done = true
      }
      attempts += 1
    }
    assert(done, "could not get two signatures inside the same second")
  }
}
