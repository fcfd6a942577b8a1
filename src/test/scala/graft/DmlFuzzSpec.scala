package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DmlFuzz

/** The randomized DML differential sweep (r15 verdict item 2): 100
  * fixed seeds, each drawing a statement sequence
  * (INSERT/UPDATE/DELETE/MERGE/OPTIMIZE/rewrite_position_deletes)
  * over a fresh table, diffed against the plain-Scala model after
  * EVERY statement and time-travel-re-read over the whole history
  * afterwards. Variants rotate by seed so all three write paths (COW,
  * MOR-record, MOR-dv) stay under the sweep. A failure names its
  * seed and statement. The sweep asserts its own coverage floor, and
  * the two DuckDB-gated pinned rows' statement texts are pinned here
  * so a generator drift trips BEFORE the driver's hash gate. */
class DmlFuzzSpec extends AnyFunSuite {

  private val Seeds: Range = 1 to 100

  test("100 seeded DML sequences: engine == model at every statement") {
    val s = SparkSuite.spark
    var byVariant = Map.empty[DmlFuzz.Variant, Int].withDefaultValue(0)
    var stmtsTotal = 0
    var merges = 0; var maints = 0; var updates = 0; var deletes = 0
    for (seed <- Seeds) {
      val variant = DmlFuzz.Variants(seed % DmlFuzz.Variants.size)
      byVariant = byVariant.updated(variant, byVariant(variant) + 1)
      val stmts = DmlFuzz.statements(seed.toLong, variant)
      merges += stmts.count(_.label.startsWith("merge"))
      updates += stmts.count(_.label.startsWith("update"))
      deletes += stmts.count(_.label.startsWith("delete"))
      maints += stmts.count(_.maint.nonEmpty)
      // every third seed runs with ROW LINEAGE on: the same grammar
      // and differential, plus the per-statement lineage invariants
      // (unique ids, counter-bounded, UPDATE id-set invariance,
      // maintenance (k, v, id) invariance) asserted inside run()
      stmtsTotal += DmlFuzz.run(s, seed.toLong, variant,
        "graft_dml.fz.sweep", rowids = seed % 3 == 0)
    }
    // coverage floor: the sweep must keep exercising every shape
    assert(DmlFuzz.Variants.forall(v => byVariant(v) >= 25),
      s"variant rotation drifted: $byVariant")
    assert(stmtsTotal >= Seeds.size * 4, s"sequences too short: $stmtsTotal")
    assert(merges >= 60, s"MERGE underdrawn: $merges")
    assert(updates >= 60, s"UPDATE underdrawn: $updates")
    assert(deletes >= 60, s"DELETE underdrawn: $deletes")
    assert(maints >= 20, s"maintenance ops underdrawn: $maints")
  }

  test("pinned dm* rows: statement texts stable, finals non-empty") {
    // the two DuckDB-gated seeds must keep drawing the same sequences
    // forever (a generator change that re-draws them invalidates the
    // committed oracle hashes — this trips BEFORE the driver does)
    val texts = DmlFuzz.Pinned.map { case (_, seed, variant) =>
      DmlFuzz.statements(seed, variant)
        .map(st => st.maint.getOrElse(st.sql)).mkString("; ")
    }
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    val hashes = texts.map(t => digest.digest(
      t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16))
    assert(hashes == Seq("8d54c424ae4149f7", "350dd3456cbea337"),
      "pinned DML sequences re-drew differently — the committed " +
        "oracle hashes no longer describe these rows; re-pin " +
        s"deliberately:\n${texts.mkString("\n---\n")}\n$hashes")
    DmlFuzz.Pinned.foreach { case (name, seed, variant) =>
      assert(DmlFuzz.finalState(seed, variant).nonEmpty,
        s"$name: pinned final state must be non-empty for the hash gate")
    }
  }
}
