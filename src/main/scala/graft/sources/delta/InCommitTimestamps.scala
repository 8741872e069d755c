package graft.sources.delta

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession

/** In-commit timestamps (the Delta `inCommitTimestamp` writer feature,
  * `delta.enableInCommitTimestamps=true`): each commit's commitInfo
  * carries a MONOTONIC `inCommitTimestamp` — `max(wall clock, previous
  * commit's ict + 1)` — that timestamp time travel, DESCRIBE HISTORY and
  * CDF `_commit_timestamp` use instead of log-file modification times.
  * File mtimes are rewritten by storage migrations/copies/backups; the
  * in-commit value survives them, which is why the protocol grew the
  * feature. delta-rs (the reference's reader, `Cargo.toml:16`) consumes
  * these; both sides are implemented here from the published spec.
  *
  * Scale posture: stamping reads ONE previous commit JSON per commit
  * attempt (O(1), metadata plane). Timestamp-based travel on an ict table
  * reads each candidate commit's commitInfo — O(commits-since-checkpoint)
  * small reads, only on that rare path, and skipped entirely for non-ict
  * tables (detected from the newest commit).
  */
object InCommitTimestamps {

  val EnableKey = "delta.enableInCommitTimestamps"
  val EnablementVersionKey = "delta.inCommitTimestampEnablementVersion"
  val EnablementTimestampKey = "delta.inCommitTimestampEnablementTimestamp"
  val Feature = "inCommitTimestamp"

  private val mapper = new ObjectMapper()

  def enabled(configuration: Map[String, String]): Boolean =
    configuration.get(EnableKey).exists(_.trim.equalsIgnoreCase("true"))

  /** The ict recorded in `version`'s commitInfo, if any. */
  def readIct(spark: SparkSession, tablePath: String, version: Long): Option[Long] = {
    val dir = DeltaLog.logDir(tablePath)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(dir, f"$version%020d.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      ictOfCommitContent(content)
    }
  }

  /** The ict inside one commit JSON's content, if any. */
  def ictOfCommitContent(content: String): Option[Long] =
    content.linesIterator.filter(_.trim.nonEmpty)
      .map(mapper.readTree)
      .collectFirst { case n if n.has("commitInfo") => n.get("commitInfo") }
      .flatMap(ci =>
        if (ci.has("inCommitTimestamp")) Some(ci.get("inCommitTimestamp").asLong())
        else None)

  /** The monotonic ict for the commit FOLLOWING `prevVersion` under
    * `configuration` (the configuration the commit runs under — pass the
    * NEW configuration from metadata commits so the enabling commit itself
    * is stamped). None when the feature is off. */
  def next(
      spark: SparkSession, tablePath: String,
      configuration: Map[String, String], prevVersion: Long): Option[Long] =
    if (!enabled(configuration)) None
    else {
      val prev =
        if (prevVersion < 0) None
        else readIct(spark, tablePath, prevVersion)
      Some(math.max(System.currentTimeMillis(), prev.map(_ + 1L).getOrElse(0L)))
    }

  /** Stamp `ci` (a commitInfo node under construction) with the next ict;
    * returns the stamped value. */
  def stamp(
      spark: SparkSession, tablePath: String,
      configuration: Map[String, String], prevVersion: Long,
      ci: ObjectNode): Option[Long] = {
    val ict = next(spark, tablePath, configuration, prevVersion)
    ict.foreach(t => ci.put("inCommitTimestamp", t))
    ict
  }

  /** Effective commit time for timestamp resolution: the ict when present,
    * else the commit file's modification time. `content` spares a re-read
    * when the caller already has the JSON. */
  def effectiveTime(content: String, mtime: Long): Long =
    ictOfCommitContent(content).getOrElse(mtime)
}
