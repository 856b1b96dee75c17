package graft

import graft.core.Transforms
import graft.sinks.Sinks.BucketedTable
import org.apache.spark.sql.functions._

/** The explicit scale idioms: salted joins / salted distinct counts for
  * skew, bucketed tables for exchange-free co-located joins. Each test
  * pins BOTH the result equivalence and (where it is the point) the plan
  * property.
  */
class ScaleIdiomsSpec extends SparkSpec {

  test("saltedJoin is row-identical to a plain equi-join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, "l_orderkey")
    val salted = Transforms.saltedJoin(li, o, "l_orderkey", "l_linenumber", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedCountDistinct equals count_distinct per key") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Transforms.saltedCountDistinct(ev, "event_type", "user_id", salt = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join with zero shuffle exchange") {
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    BucketedTable.write(c, "bt_customer", "c_custkey", buckets = 8)
    BucketedTable.write(o, "bt_orders", "c_custkey", buckets = 8)
    val joined = spark.table("bt_customer").join(spark.table("bt_orders"), "c_custkey")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$physical")
    // and it is still correct
    val expected = c.join(o, "c_custkey").count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS bt_customer")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
  }
}
