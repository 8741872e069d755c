package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join tool the 100 TB posture calls for —
  * two tables bucketed by the same key join WITHOUT a shuffle on either
  * side (SortMergeJoin reads bucket files directly). On a real cluster
  * this is the difference between a terabyte-scale shuffle and none. */
class BucketingSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      val shuffleBeforeJoin = plan.linesIterator
        .takeWhile(!_.contains("HashAggregate")) // ignore agg exchanges
        .exists(_.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !shuffleBeforeJoin,
        s"bucketed join should not shuffle either side:\n$plan")
      // and the values agree with the plain-parquet join
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().map(_.toString).toSeq
      assert(joined.orderBy("o_orderstatus").collect().map(_.toString).toSeq === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
