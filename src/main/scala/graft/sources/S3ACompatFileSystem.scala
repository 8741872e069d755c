package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration

/** `s3a://` scheme served by the first-party [[S3FileSystem]] — closes
  * the reference's env-creds S3 mapping (`/root/reference/src/
  * object_store.rs:42-47`: `AWS_ACCESS_KEY_ID`/`AWS_SECRET_ACCESS_KEY`/
  * endpoint override) for the URL scheme Spark users actually type,
  * WITHOUT the hadoop-aws jar this environment cannot ship. hadoop-aws's
  * `S3AFileSystem` remains a drop-in upgrade on a real cluster (set
  * `fs.s3a.impl` back to it and the same `fs.s3a.*` keys apply); this
  * class accepts that same standard key namespace and translates it:
  *
  *  - `fs.s3a.endpoint` → `fs.s3.endpoint` (falling back to the
  *    `AWS_ENDPOINT_URL` env var — the MinIO/localstack flow the
  *    reference's `examples/s3_standalone.rs:15-18` configures by env)
  *  - `fs.s3a.access.key` / `fs.s3a.secret.key` → `fs.s3.access.key` /
  *    `fs.s3.secret.key` (the base class already falls back to
  *    `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY`)
  *  - `fs.s3a.endpoint.region` → `fs.s3.region`
  *  - `fs.s3a.path.style.access` is accepted and ignored: this store is
  *    ALWAYS path-style (the MinIO shape)
  *  - timeout/retry tuning stays on the store's own `fs.s3.*` keys
  *    (hadoop-common ships defaults under `fs.s3a.*`, so those cannot
  *    distinguish a user override from a foreign default)
  *
  * Everything else — SigV4 signing, conditional-PUT atomic commits,
  * multipart, retry/backoff, bulk delete — is inherited unchanged, and
  * every `FileStatus` this FS emits carries `s3a://` paths so Spark's
  * round-trips (status → open) resolve back here. Registered for tests
  * via `fs.s3a.impl = graft.sources.S3ACompatFileSystem`. */
class S3ACompatFileSystem extends S3FileSystem {

  override def getScheme: String = "s3a"

  override def initialize(name: URI, conf: Configuration): Unit = {
    val mapped = new Configuration(conf)
    def fwd(s3aKey: String, s3Key: String, envFallback: Option[String] = None): Unit =
      Option(conf.get(s"fs.s3a.$s3aKey"))
        .orElse(envFallback.flatMap(sys.env.get))
        .foreach(v => mapped.set(s"fs.s3.$s3Key", v))
    fwd("endpoint", "endpoint", envFallback = Some("AWS_ENDPOINT_URL"))
    fwd("access.key", "access.key")
    fwd("secret.key", "secret.key")
    fwd("endpoint.region", "region")
    // timeout/retry knobs are NOT forwarded from the fs.s3a.* namespace:
    // hadoop-common's core-default SHIPS values there (fs.s3a.retry.limit=7,
    // fs.s3a.connection.timeout="200s" duration syntax), so a forward
    // cannot tell a user override from a foreign default and would
    // silently reconfigure this store's retry policy. Tuning uses the
    // store's own fs.s3.retry.* / fs.s3.*.timeout.ms keys directly.
    super.initialize(name, mapped)
  }
}
