package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Running per-user total with a typed ValueState variable. Top-level
  * (not an inner class): a processor nested in the suite would capture
  * the non-serializable suite instance in its closure. */
private[graft] class RunningTotalProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Double)] {
  @transient private var total: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Double](
      "total", org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Double)] = {
    val t = (if (total.exists()) total.get() else 0.0) + rows.map(_._2).sum
    total.update(t)
    Iterator((key, t))
  }
}

/** Spark 4's `transformWithState` — the successor arbitrary-state API to
  * (flat)mapGroupsWithState (SURVEY §2.5 mapping), with typed state
  * variables managed by the RocksDB state store. One spec pins the repo's
  * claimed mapping for custom streaming state at the new API level. */
class TransformWithStateSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transformWithState: typed ValueState running totals over RocksDB") {
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)]
      val totals = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningTotalProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = totals.toDF("user", "total").writeStream.format("memory")
        .queryName("tws_totals").outputMode(OutputMode.Update).start()
      try {
        in.addData((1L, 10.0), (2L, 5.0))
        q.processAllAvailable()
        in.addData((1L, 7.0), (3L, 1.0))
        q.processAllAvailable()
        val latest = spark.table("tws_totals")
          .groupBy("user").agg(org.apache.spark.sql.functions.max("total").as("total"))
          .as[(Long, Double)].collect().toMap
        assert(latest === Map(1L -> 17.0, 2L -> 5.0, 3L -> 1.0))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
