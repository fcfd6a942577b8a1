package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator smoke + semantic checks over sf0.001 (SURVEY.md §5
  * item 2). Value-level correctness is owned by the DuckDB oracle gate
  * (Verify + oracleSql); these pin the semantics the oracle can't see
  * and that every query at least executes. */
class OperatorSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("every declared query runs and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k),
      s"oracleSql['$k'] has no matching query"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup sketch paths track the exact-jaccard anchor") {
    import org.apache.spark.sql.functions.col
    val exact = SparkEntry.queries("d04_dedup_ngram_jaccard")(spark, sf)
      .filter(col("jac") >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = SparkEntry.queries("d02_dedup_minhash_lsh")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // LSH is probabilistic; demand ≥80% recall on this fixture and no
    // false positives below the rescore threshold (rescore is exact).
    assert((exact & minhash).size >= (exact.size * 0.8).toInt)
    assert(minhash.subsetOf(exact))
  }

  test("ANN brute force is the exact top-k baseline") {
    val bf = SparkEntry.queries("s01_ann_bruteforce")(spark, sf).collect()
    assert(bf.length == 15) // 5 queries × k=3
    val byQ = bf.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), "ranks follow cosine desc")
    }
  }

  test("streaming hourly agg equals its batch equivalent") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("st01_stream_hourly")(spark, sf)
    val batch = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    assert(streamed.count() == batch.count())
  }
}
