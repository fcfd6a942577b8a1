package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder-prompt "salting for skew").
  *
  * `saltedEquiJoin` implements the classic hot-key split: the big
  * (skewed) side gets a per-row salt in [0, salts); the small side is
  * replicated `salts` times; the join key becomes (key, salt), so one
  * hot key's rows spread over `salts` shuffle partitions instead of
  * hammering one reducer. The result set is identical to the unsalted
  * join (every big-side row still meets every matching small-side row
  * exactly once), which is what the q28 equivalence oracle checks.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; manual
  * salting remains the tool for aggregations-after-join and for engines
  * of record where the skew is known ahead of time.
  */
object Skew {

  /** @param saltOf per-row salt expression for the big side — any
    *   deterministic-per-row value works; vary it WITHIN a key (e.g. a
    *   line number, or a hash of non-key columns) or the hot key still
    *   lands on one partition. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int, saltOf: Column): DataFrame = {
    val b = big.withColumn("_salt", pmod(saltOf, lit(salts)).cast("int"))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("_salt") === s("_salt"))
      .drop("_salt")
  }
}
