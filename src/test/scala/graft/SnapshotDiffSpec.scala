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
}
