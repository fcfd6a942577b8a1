package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The hand-rolled Avro connector's schema contract: the reader's
  * schema comes from the container file's embedded writer schema
  * (names, types, `[null, T]` nullable unions), and NULL values
  * survive the round trip. Value fidelity at fixture scale is q89's
  * CORRECTNESS row; this pins the header-driven inference path the
  * oracle can't see. */
class AvroSourceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("schema and nulls round-trip through the container header") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a"), 1.5, Option(7)),
      (2L, None: Option[String], -0.5, None: Option[Int]),
      (3L, Option("c"), 0.0, Option(9)))
      .toDF("k", "s", "v", "oi")
    val dir = graft.Scratch.dir(spark, "graft_avro_spec", "t1")
    graft.sources.AvroFiles.write(df.repartition(2), dir)
    val back = spark.read.format("graft.sources.AvroSourceProvider")
      .option("path", dir).load()
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // nullable columns really carry their unions
    assert(back.schema("s").nullable && back.schema("oi").nullable)
    assert(back.orderBy(col("k")).collect().toSeq ==
      df.orderBy(col("k")).collect().toSeq)
    // one container file per non-empty partition
    assert(graft.sources.AvroFiles.listAvro(dir).length == 2)
  }
}
