package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeCapture

/** Differential test: snapshotDiff vs a driver-side brute-force
  * classification on random before/after tables (the StarComponentsSpec
  * pattern — the distributed kernel must agree with the obvious
  * sequential one on inputs it was not written against). */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("snapshotDiff matches brute-force classification on random snapshots") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val keys = (0 until 200).filter(_ => rnd.nextDouble() < 0.7)
      val before = keys.filter(_ => rnd.nextDouble() < 0.9)
        .map(k => (k.toLong, rnd.nextInt(5).toLong))
      val after = keys.filter(_ => rnd.nextDouble() < 0.9)
        .map(k => (k.toLong, rnd.nextInt(5).toLong))
      val bm = before.toMap
      val am = after.toMap
      val expected = (bm.keySet ++ am.keySet).toSeq.map { k =>
        val t = (bm.get(k), am.get(k)) match {
          case (None, Some(_))          => "added"
          case (Some(_), None)          => "removed"
          case (Some(x), Some(y)) if x != y => "changed"
          case _                        => "unchanged"
        }
        k -> t
      }.toMap

      import spark.implicits._
      val got = ChangeCapture.snapshotDiff(
          before.toDF("k", "v"), after.toDF("k", "v"), "k", Seq("v"))
        .select(col("k"), col("change_type"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("null comparand values classify null-safely") {
    import spark.implicits._
    val before = Seq((1L, Option(10L)), (2L, None), (3L, None)).toDF("k", "v")
    val after = Seq((1L, Option(10L)), (2L, Option(5L)), (3L, None: Option[Long])).toDF("k", "v")
    val got = ChangeCapture.snapshotDiff(before, after, "k", Seq("v"))
      .select(col("k"), col("change_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
  }

  test("scd2Build collapses NULL runs and treats value→NULL as a change") {
    // the review scenario: (v0=NULL, v1=NULL, v2=5, v3=NULL) must yield
    // exactly [0,2) NULL, [2,3) 5, [3,∞) NULL — an isNull-based
    // run-head filter would split the leading NULL run, and a
    // non-null-safe change test would drop the 5→NULL transition
    import spark.implicits._
    val hist = Seq(
      (1L, 0L, None: Option[Long]), (1L, 1L, None: Option[Long]),
      (1L, 2L, Option(5L)), (1L, 3L, None: Option[Long]),
      (2L, 0L, Option(7L)), (2L, 1L, Option(7L))).toDF("k", "v", "bal")
    val got = ChangeCapture.scd2Build(hist, "k", "v", "bal")
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      (1L, None, 0L, Some(2L), false),
      (1L, Some(5L), 2L, Some(3L), false),
      (1L, None, 3L, None, true),
      (2L, Some(7L), 0L, None, true)))
  }
}
