package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (units, cents): quantity-weighted price observation. */
case class WMIn(w: Long, x: Long)

/** Exact running state: Σw and Σw·x in int64. */
case class WMBuf(sw: Long, swx: Long)

/** Quantity-weighted mean unit price as a typed [[Aggregator]] — the
  * `Aggregator` + `functions.udaf` surface (SURVEY.md §2.10), the
  * third custom-aggregate API next to the Catalyst
  * `TypedImperativeAggregate` (TopKAggregate) and the built-in
  * aggregate catalog. An Aggregator is the right tool when the state
  * is a small case class and the merge is algebraic: Spark plans it as
  * a normal two-phase aggregate (map-side partial `reduce`, shuffled
  * `merge`, final `finish`), so it scales exactly like a built-in sum.
  *
  * Oracle discipline: inputs are pre-converted to INTEGER cents/units,
  * the buffer is two longs (exact, associative, order-free), and the
  * only floating-point step is the single final division — which both
  * engines evaluate identically on identical longs. A double-valued
  * running mean (Welford or sum-of-doubles) would be order-dependent
  * and never hash-match a differential oracle.
  *
  * Buffer bounds: per-row contribution ≤ 50 units × 10^7 cents = 5e8;
  * int64 overflows past ~1.8e10 rows per GROUP — far beyond any
  * per-group cardinality here, and the failure mode at 100 TB scale
  * would be ANSI overflow, not silent wrap, if groups ever got there.
  */
object WeightedMeanAggregator extends Aggregator[WMIn, WMBuf, Double] {
  type In = WMIn
  type Buf = WMBuf

  override def zero: Buf = WMBuf(0L, 0L)

  override def reduce(b: Buf, a: In): Buf = WMBuf(b.sw + a.w, b.swx + a.w * a.x)

  override def merge(b1: Buf, b2: Buf): Buf = WMBuf(b1.sw + b2.sw, b1.swx + b2.swx)

  /** Mean in CENTS (double); empty groups yield NaN like avg-of-nothing
    * would yield null — callers guard with a HAVING-style filter. */
  override def finish(b: Buf): Double =
    if (b.sw == 0L) Double.NaN else b.swx.toDouble / b.sw.toDouble

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
