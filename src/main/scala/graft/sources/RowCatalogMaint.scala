package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Maintenance/observability rows of the DML catalog registry — the
  * round-13 family file under the 1,500-line discipline (RowCatalog
  * aggregates these maps; SparkEntry and every spec key are
  * untouched). */
object RowCatalogMaintQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── q162: DELETION-VECTOR ACCOUNTING IN `.files` — the health
    // question a MOR+dv table answers before OPTIMIZE (Iceberg's
    // rewrite_position_deletes decision input): how many vectors,
    // each covering how many rows, from metadata alone. The fixture
    // inserts one base file per group, then TWO overlapping DELETEs
    // (k%97, then k%5 — rows divisible by both exercise the
    // union-replace), so the head manifest carries EXACTLY ONE
    // vector per group whose popcount is the union of both deletes —
    // which the oracle restates relationally (k % 4 is the default
    // bucket function for sequential long keys). A double-counted
    // union, a second vector on a file, or a lost target breaks the
    // row. DeletionVectorSpec pins the lifecycle half: dv rows
    // appear on delete and disappear after OPTIMIZE.
    "q162_dml_files_dv" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q162_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.fdv")
      s.sql("CREATE TABLE graft_dml.ns.fdv " +
        "(k BIGINT, cents BIGINT, status STRING) " +
        "TBLPROPERTIES ('format'='mor','deletes'='dv')")
      s.sql("""INSERT INTO graft_dml.ns.fdv
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus
        FROM q162_orders WHERE o_orderkey % 7 = 0""")
      s.sql("DELETE FROM graft_dml.ns.fdv WHERE k % 97 = 0")
      s.sql("DELETE FROM graft_dml.ns.fdv WHERE k % 5 = 0")
      s.table("graft_dml.ns.fdv.files")
        .filter(col("kind") === "dv")
        .selectExpr("grp", "kind", "dv_deleted_rows",
          "dv_target IS NOT NULL AS has_target")
        .orderBy(col("grp"))
    })
  )

  val oracles: Map[String, String] = Map(
    // exactly one vector per group; its popcount is the union of both
    // delete predicates over the inserted slice
    "q162_dml_files_dv" ->
      """SELECT CAST(o_orderkey % 4 AS INTEGER) AS grp, 'dv' AS kind,
        |  COUNT(*) AS dv_deleted_rows, TRUE AS has_target
        |FROM orders
        |WHERE o_orderkey % 7 = 0
        |  AND (o_orderkey % 97 = 0 OR o_orderkey % 5 = 0)
        |GROUP BY 1 ORDER BY grp""".stripMargin
  )
}
