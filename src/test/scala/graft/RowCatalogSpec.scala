package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DML catalog's statement surface beyond q106's MERGE+DELETE row:
  * UPDATE (RewriteUpdateTable's group-based path), DELETE of
  * everything-matching, and catalog plumbing (exists/drop). Each
  * statement's end state is asserted against values computed here —
  * tiny fixture, exact expectations. */
class RowCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("UPDATE, DELETE and catalog plumbing against the DML catalog") {
    val s = spark
    s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
    s.sql("DROP TABLE IF EXISTS graft_dml.spec.t")
    s.sql("CREATE TABLE graft_dml.spec.t (k BIGINT, v BIGINT, tag STRING)")
    s.sql("INSERT INTO graft_dml.spec.t VALUES " +
      "(1, 10, 'a'), (2, 20, 'b'), (3, 30, 'a'), (4, 40, 'b'), (5, 50, 'a')")

    // UPDATE through the row-level operation (group-based rewrite:
    // scan all rows, recompute, replace)
    s.sql("UPDATE graft_dml.spec.t SET v = v + 1000 WHERE tag = 'a'")
    val afterUpdate = s.table("graft_dml.spec.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(afterUpdate == Seq((1L, 1010L, "a"), (2L, 20L, "b"),
      (3L, 1030L, "a"), (4L, 40L, "b"), (5L, 1050L, "a")))

    // DELETE with a predicate no metadata shortcut can answer
    s.sql("DELETE FROM graft_dml.spec.t WHERE v % 20 = 0")
    val afterDelete = s.table("graft_dml.spec.t").orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(afterDelete == Seq(1L, 3L, 5L))

    // INSERT OVERWRITE replaces the table contents (truncating write)
    s.sql("INSERT OVERWRITE graft_dml.spec.t VALUES (9, 90, 'z')")
    assert(s.table("graft_dml.spec.t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((9L, 90L, "z")))
    // rebuild the 3-row state the later assertions expect
    s.sql("INSERT OVERWRITE graft_dml.spec.t VALUES " +
      "(1, 10, 'a'), (3, 1030, 'a'), (5, 1050, 'a')")

    // additive schema evolution: existing rows (and retained
    // versions) surface NULL for the new column; DML can then fill it
    s.sql("ALTER TABLE graft_dml.spec.t ADD COLUMN score BIGINT")
    assert(s.table("graft_dml.spec.t").collect()
      .forall(_.isNullAt(3)), "pre-evolution rows must surface NULL")
    s.sql("UPDATE graft_dml.spec.t SET score = k * 100 WHERE k >= 3")
    val scores = s.table("graft_dml.spec.t").orderBy("k")
      .collect().map(r => if (r.isNullAt(3)) -1L else r.getLong(3)).toSeq
    assert(scores == Seq(-1L, 300L, 500L))
    // a pre-evolution version read under the new schema: NULL-padded
    val v1 = s.sql("SELECT * FROM graft_dml.spec.t VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("k", "v", "tag", "score"))
    assert(v1.count() == 5 && v1.collect().forall(_.isNullAt(3)))

    // catalog plumbing
    assert(s.catalog.tableExists("graft_dml.spec.t"))
    s.sql("DROP TABLE graft_dml.spec.t")
    assert(!s.catalog.tableExists("graft_dml.spec.t"))
  }
}
