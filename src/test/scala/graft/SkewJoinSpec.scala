package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    val t = Tables(spark, sf)
    // synthesize skew: fold most lineitems onto one supplier key
    val big = t.lineitem.withColumn("skew_key",
      when($"l_suppkey" % 3 === 0, 1L).otherwise($"l_suppkey"))
    val small = t.supplier.select($"s_suppkey", $"s_name")
    val plain = big.join(small, $"skew_key" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin
      .saltedJoin(big, small, $"skew_key", $"s_suppkey", salt = 8)
      .groupBy($"s_name").agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain == salted)
  }

  test("salting actually fans a hot key over multiple partitions") {
    val t = Tables(spark, sf)
    val big = t.lineitem.withColumn("skew_key", lit(1L))
    val salted = big.withColumn("_salt",
      pmod(xxhash64($"skew_key", monotonically_increasing_id()), lit(8)))
    assert(salted.select("_salt").distinct().count() == 8)
  }
}
