package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage: csv and json round-trips, partitioned
  * parquet writes with partition pruning on read — the layout the
  * engine would use for a 100 TB fact table (partition by coarse
  * time, prune at plan time).
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves rows and schema") {
    val orders = Tables(spark, sf).orders
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    orders.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/orders_csv")
    val back = spark.read.option("header", "true")
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .csv(s"$tmp/orders_csv")
    assert(back.count() == orders.count())
    assert(back.agg(sum($"o_totalprice")).first().getDouble(0) > 0)
  }

  test("json round-trip preserves nested structure") {
    val docs = Tables(spark, sf).documents
      .select($"doc_id", struct($"lang", $"source", $"n_chars").as("meta"))
    docs.write.mode("overwrite").json(s"$tmp/docs_json")
    val back = spark.read.json(s"$tmp/docs_json")
    assert(back.count() == docs.count())
    assert(back.select($"meta.lang").distinct().count() == 5)
  }

  test("partitioned parquet write enables partition pruning") {
    Tables(spark, sf).orders
      .withColumn("order_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("order_year")
      .parquet(s"$tmp/orders_by_year")
    val pruned = spark.read.parquet(s"$tmp/orders_by_year")
      .filter($"order_year" === 1997)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(order_year"),
      "partition filter missing from scan")
    assert(pruned.count() > 0)
    // pruning actually restricted the files read
    val allYears = spark.read.parquet(s"$tmp/orders_by_year")
    assert(pruned.count() < allYears.count())
  }

  test("sorted-within-partitions write keeps min/max stats tight") {
    Tables(spark, sf).lineitem
      .repartition($"l_returnflag")
      .sortWithinPartitions($"l_shipdate")
      .write.mode("overwrite").parquet(s"$tmp/lineitem_sorted")
    val back = spark.read.parquet(s"$tmp/lineitem_sorted")
      .filter($"l_shipdate" < lit("1995-06-01").cast("timestamp"))
    assert(back.count() > 0)
  }
}
