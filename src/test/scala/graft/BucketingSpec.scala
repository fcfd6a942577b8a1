package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed co-located join: result parity with the shuffle join AND a
  * plan-level assertion that the bucket join has no Exchange. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("co-located bucket join plans without exchanges and matches shuffle join") {
    val db = "bucket_test"
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    Bucketing.writeBucketed(li, db, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, db, "o_b", "o_orderkey", 8)

    // AQE keeps the bucket-scan distribution only when it does not
    // coalesce; assert on the pre-AQE plan by checking the initial
    // physical plan string.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, db, "li_b", "o_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
