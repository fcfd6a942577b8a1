package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM worker for [[CrossProcessCommitSpec]]: a SECOND driver
  * process committing SQL DML against the shared warehouse passed via
  * `-Dgraft.warehouse.root`. Each program argument is one SQL
  * statement, executed in order against a fresh local session with
  * the `graft_dml` catalog registered. Exits 0 on success; any
  * failure prints its stack to stderr and exits 1 (the spec asserts
  * on the exit code, so a worker-side OCC refusal is observable). */
object CrossProcessWorker {
  def main(args: Array[String]): Unit = {
    val code =
      try {
        val s = SparkSession.builder()
          .master("local[2]")
          .appName("graft-xproc-worker")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.catalog.graft_dml",
            "graft.sources.GraftCatalog")
          .getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        args.foreach(sql => s.sql(sql).collect())
        s.stop()
        0
      } catch { case t: Throwable => t.printStackTrace(); 1 }
    sys.exit(code)
  }
}
