package graft

import org.scalatest.funsuite.AnyFunSuite

/** information_schema parity (SURVEY §2.2 last row): the reference enables
  * DataFusion's information_schema (`src/lib.rs:19`); Spark's catalog
  * surface — SHOW TABLES / DESCRIBE / spark.catalog — is the mapped
  * equivalent. */
class CatalogSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withViews[T](f: => T): T = {
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("cat_region")
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("cat_nation")
    try f finally {
      spark.catalog.dropTempView("cat_region")
      spark.catalog.dropTempView("cat_nation")
    }
  }

  test("SHOW TABLES lists registered views") {
    withViews {
      val names = spark.sql("SHOW TABLES").select("tableName")
        .collect().map(_.getString(0)).toSet
      assert(names.contains("cat_region") && names.contains("cat_nation"))
    }
  }

  test("DESCRIBE TABLE reports the parquet schema") {
    withViews {
      val cols = spark.sql("DESCRIBE TABLE cat_region")
        .select("col_name").collect().map(_.getString(0)).toSet
      assert(cols === Set("r_regionkey", "r_name"))
    }
  }

  test("spark.catalog API mirrors the SQL surface") {
    withViews {
      assert(spark.catalog.tableExists("cat_nation"))
      val cols = spark.catalog.listColumns("cat_nation")
        .collect().map(_.name).toSet
      assert(cols.contains("n_nationkey") && cols.contains("n_name"))
    }
  }
}
