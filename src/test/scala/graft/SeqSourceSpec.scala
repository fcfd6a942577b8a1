package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.SeqSource

/** The custom DSv2 connector's three contracts, each observed rather
  * than assumed:
  *  - filter pushdown PRUNES GENERATION (the emission counter, not the
  *    result, proves rows outside the range never existed);
  *  - column pruning reaches the reader (the scan's output schema);
  *  - planInputPartitions drives real parallelism.
  */
class SeqSourceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def seq(rows: Long, parts: Int) =
    spark.read.format("graft.sources.SeqSourceProvider")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("range filter is pushed into generation, not applied after") {
    SeqSource.rowsEmitted.set(0)
    val n = seq(100000, 8)
      .filter(col("id") >= 25000L && col("id") < 75000L)
      .count()
    assert(n == 50000)
    // conservative pushdown re-evaluates the filters but must only
    // GENERATE the narrowed range (plus nothing: 50k exactly)
    assert(SeqSource.rowsEmitted.get == 50000,
      s"source generated ${SeqSource.rowsEmitted.get} rows for a 50k-row range")
  }

  test("equality pushdown narrows to a single row") {
    SeqSource.rowsEmitted.set(0)
    val r = seq(100000, 8).filter(col("id") === 41L)
      .select(col("val")).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(SeqSource.valueOf(41L)))
    assert(SeqSource.rowsEmitted.get == 1)
  }

  test("column pruning reaches the reader") {
    val df = seq(1000, 2).select(col("bucket"))
    df.collect()
    val scans = PlanWalk.allNodes(df.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.output.map(_.name) == Seq("bucket")),
      scans.map(_.output.map(_.name)).toString)
  }

  test("the scan plans the requested partition count") {
    assert(seq(1000, 7).rdd.getNumPartitions == 7)
  }

  test("ungrouped count/min/max are answered without generating a single row") {
    SeqSource.rowsEmitted.set(0)
    val r = seq(1000000, 8)
      .selectExpr("count(*) AS n", "min(id) AS mn", "max(id) AS mx")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1000000L, 0L, 999999L))
    assert(SeqSource.rowsEmitted.get == 0,
      s"aggregate pushdown did not engage: ${SeqSource.rowsEmitted.get} ids generated")
  }

  test("grouped count/min/max by bucket are answered without generating a row") {
    SeqSource.rowsEmitted.set(0)
    val rs = seq(1000000, 8)
      .groupBy(col("bucket"))
      .agg(expr("count(*)").as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"))
      .orderBy(col("bucket"))
      .collect()
    assert(rs.length == 100)
    assert(rs.forall(r => r.getLong(1) == 10000L))
    assert((rs(7).getLong(2), rs(7).getLong(3)) == (7L, 999907L))
    assert(SeqSource.rowsEmitted.get == 0,
      s"grouped pushdown did not engage: ${SeqSource.rowsEmitted.get} ids generated")
  }

  test("grouped pushdown disengages when the group key is not bucket") {
    // val = Lehmer(id) has no closed form here — the builder must
    // refuse, Spark aggregates the generated rows, results stay right
    SeqSource.rowsEmitted.set(0)
    val n = seq(1000, 2).groupBy(col("val") % 2).count().count()
    assert(n == 2)
    assert(SeqSource.rowsEmitted.get == 1000,
      "refused pushdown must fall back to full generation")
  }

  test("LIMIT and ORDER BY id LIMIT generate only the prefix/suffix") {
    SeqSource.rowsEmitted.set(0)
    assert(seq(1000000, 8).limit(5).collect().length == 5)
    val plainLimit = SeqSource.rowsEmitted.get
    assert(plainLimit == 5, s"limit pushdown generated $plainLimit ids")
    SeqSource.rowsEmitted.set(0)
    val head = seq(1000000, 8).orderBy(col("id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(head == (0L until 5L), s"topN asc: $head")
    val headGen = SeqSource.rowsEmitted.get
    assert(headGen == 5, s"topN asc generated $headGen ids")
    SeqSource.rowsEmitted.set(0)
    val tail = seq(1000000, 8).orderBy(col("id").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(tail == (999999L to 999995L by -1L), s"topN desc: $tail")
    val tailGen = SeqSource.rowsEmitted.get
    assert(tailGen == 5, s"topN desc generated $tailGen ids")
  }

  test("streaming offsets round-trip through a checkpoint (restart is a no-op)") {
    // first AvailableNow run drains all 10k ids in 4 batches; a second
    // run against the SAME checkpoint must deserialize the committed
    // SeqOffset and admit nothing new — the st09 contract, but through
    // offsets the connector itself defines and serializes
    // foreachBatch, not the memory sink: memory sinks refuse
    // checkpoint recovery at resolve time
    val ckpt = graft.Scratch.dir(spark, "graft_seqstream_ckpt", "spec")
    def drain(): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("graft.sources.SeqSourceProvider")
        .option("rows", "10000").option("parts", "4")
        .option("batchRows", "2500").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      seen.get
    }
    assert(drain() == 10000)
    assert(drain() == 0,
      "restart against the committed checkpoint re-emitted rows")
  }

  test("runtime filtering prunes generation to the join's observed keys") {
    // q105's contract observed directly: the 1M-row scan must GENERATE
    // only the dimension's ~3 ids once the runtime In-filter lands —
    // not the 1M-row range. A bound of 1000 separates "runtime filter
    // engaged" (3 ids, maybe re-planned once or twice) from "it fell
    // back to a full scan" (1M) with six orders of headroom.
    SeqSource.rowsEmitted.set(0)
    val rows = SparkEntry.queries("q105_runtime_filter")(spark, SparkSuite.sf)
      .collect()
    assert(rows.length >= 2, "dimension filter matched too few nations")
    assert(rows.forall(r => r.getLong(r.fieldIndex("val")) ==
      SeqSource.valueOf(r.getLong(r.fieldIndex("id")))))
    val emitted = SeqSource.rowsEmitted.get
    assert(emitted <= 1000,
      s"runtime filter did not prune generation: $emitted ids generated")
  }

  test("unpushable filters still evaluate correctly (residual path)") {
    // bucket filters are NOT pushed (only id ranges are) — the
    // conservative residual re-evaluation must produce exact results
    val n = seq(10000, 4).filter(col("bucket") === 3).count()
    assert(n == 100)
  }

  test("streaming sink: a re-delivered epoch commit is a no-op") {
    // st29's exactly-once claim, exercised directly: deliver epoch 7,
    // then deliver it AGAIN (the driver-retry-after-commit case) —
    // the cumulative state must not double-merge.
    import graft.sources.{AggPartial, AggSink, AggStreamingWrite}
    val tag = "retry_guard_test"
    AggSink.streamState.remove(tag)
    val w = new AggStreamingWrite(tag)
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(AggPartial(n = 3, sum = 30, min = 1, max = 9))
    w.commit(7L, msgs)
    w.commit(7L, msgs) // retry of the same epoch
    w.commit(8L, Array(AggPartial(n = 2, sum = 12, min = 0, max = 5)))
    val (epochs, (n, sum, mn, mx)) = AggSink.streamState(tag)
    assert(epochs == Set(7L, 8L))
    assert((n, sum, mn, mx) == (5L, 42L, Some(0L), Some(9L)),
      s"retried epoch double-merged: ($n, $sum, $mn, $mx)")
    AggSink.streamState.remove(tag)
  }
}
