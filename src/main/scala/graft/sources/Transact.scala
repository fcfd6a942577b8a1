package graft.sources

import java.nio.file.{Files, Path, Paths}

/** MULTI-STATEMENT CROSS-TABLE TRANSACTIONS — the general form of
  * q176's atomic publish (r14 verdict item 7): BEGIN … any DML across
  * several `graft_dml` tables … COMMIT, all-or-nothing, with snapshot
  * isolation in between.
  *
  * Mechanism: snapshot-isolated WORKING CLONES, not staged branches —
  * branch staging only composes appends (the WAP contract), while a
  * transaction needs full DML generality:
  *
  *   - BEGIN: per declared table, record its base version and
  *     zero-copy shallow-clone it ([[RowStoreOps.snapshotTable]] —
  *     metadata-only, no data bytes move) to `<table>__txn<id>`.
  *     Statements then run against the clones with EVERYTHING the
  *     engine supports (MERGE/UPDATE/DELETE/INSERT/OPTIMIZE): a clone
  *     is a real table. Readers of the base tables see the pre-txn
  *     snapshots throughout — isolation by construction.
  *   - COMMIT (one commitLock section): OCC-validate EVERY base table
  *     is still at its recorded version — refuse all-or-nothing
  *     otherwise (table-granular write-write conflict detection: the
  *     conservative choice; a production format refines this to
  *     partition- or column-level validation, same shape) — then
  *     ADOPT each clone's current snapshot into its base: files the
  *     txn wrote (they live in the clone's data dir) MOVE by same-fs
  *     rename into the base's data dir, untouched entries (absolute
  *     references into the base's own data dir, the shallow-clone
  *     form) relativize back to leaf names, true external references
  *     (add_files imports) carry verbatim. Leaf names never change,
  *     so `leaf#pos` rid addressing — and with it every delta record
  *     and deletion-vector pairing — survives adoption untouched.
  *     Every table's next manifest is STAGED before any publishes,
  *     then all link atomically (the publish_branches two-phase
  *     discipline); the clones drop.
  *   - ROLLBACK: drop the clones. The bases were never touched.
  *
  * Scale note: BEGIN and COMMIT are metadata-sized (manifest entries ×
  * tables); the only per-file work at COMMIT is one rename per file
  * the transaction actually wrote. Nothing row-sized ever rides the
  * driver.
  *
  * Confinements (documented, spec-pinned): transaction state (the
  * id → tables map) is driver-process-scoped — the clones themselves
  * are ordinary on-disk tables, so a crashed transaction's debris is
  * visible (`<table>__txn<n>`) and reclaimable by DROP, and the bases
  * are untouched by construction (crash-safe in effect: an
  * uncommitted txn IS its clones). Schema evolution inside a
  * transaction refuses at COMMIT (adoption carries entries, not
  * metadata). */
object Transact {

  final case class Txn(id: Long, tables: Seq[String],
    bases: Map[String, Int])

  private val nextId = new java.util.concurrent.atomic.AtomicLong(1L)
  private val live =
    new java.util.concurrent.ConcurrentHashMap[Long, Txn]()

  def cloneKey(table: String, id: Long): String = s"${table}__txn$id"

  /** Start a transaction over `tables` (store keys). Returns the txn
    * whose clones (`cloneKey(t, id)`) statements should target. */
  def begin(tables: Seq[String]): Txn = RowStore.commitLock.synchronized {
    require(tables.nonEmpty, "begin_transaction: no tables")
    require(tables.distinct.size == tables.size,
      "begin_transaction: a table may appear once")
    tables.foreach(t => require(RowStore.exists(t),
      s"begin_transaction: $t does not exist"))
    val id = nextId.getAndIncrement()
    val bases = tables.map(t => t -> RowStore.currentVersion(t)).toMap
    tables.foreach(t => RowStoreOps.snapshotTable(t, cloneKey(t, id)))
    val txn = Txn(id, tables, bases)
    live.put(id, txn)
    txn
  }

  /** Abandon the transaction: drop the clones, bases untouched. */
  def rollback(id: Long): Int = {
    val txn = live.remove(id)
    require(txn != null, s"rollback_transaction: no open transaction $id")
    txn.tables.count(t => RowStore.drop(cloneKey(t, id)))
  }

  /** Publish every clone's snapshot onto its base, all-or-nothing.
    * Returns the new version per table (input order). On an OCC
    * refusal the transaction STAYS OPEN (nothing adopted, no file
    * moved) — the caller rolls back or retries after inspecting. */
  def commit(id: Long): Seq[Int] = {
    val txn = live.get(id)
    require(txn != null, s"commit_transaction: no open transaction $id")
    RowStore.commitLock.synchronized {
      // phase 0 — OCC + schema validation, ALL before ANY mutation
      txn.tables.foreach { t =>
        val cur = RowStore.currentVersion(t)
        if (cur != txn.bases(t))
          throw new java.util.ConcurrentModificationException(
            s"$t: transaction $id began at version ${txn.bases(t)} but " +
              s"the table is now at $cur — NOTHING was committed " +
              "(all-or-nothing); rollback or re-begin")
        val ck = cloneKey(t, id)
        require(RowStore.readMeta(ck) == RowStore.readMeta(t),
          s"$t: schema/metadata evolved inside transaction $id — DDL " +
            "in transactions is not supported; rollback")
      }
      // phase 1 — adopt + stage every table's next manifest
      val staged = txn.tables.map { t =>
        val ck = cloneKey(t, id)
        val baseData = RowStore.dataDir(t)
        val cloneData = RowStore.dataDir(ck)
        def adopt(n: String): String =
          if (!n.startsWith("/")) {
            // clone-relative = a file THIS transaction wrote: move it
            // into the base's data dir (same filesystem, pure rename).
            // UUID leaf names make collisions impossible.
            Files.move(Paths.get(cloneData, n), Paths.get(baseData, n))
            n
          } else if (n.startsWith(baseData + "/"))
            n.stripPrefix(baseData + "/") // untouched shallow-clone ref
          else n // genuine external reference (add_files import)
        // a dv TARGET is an address, never an owned file — rewrite its
        // form (absolute base ref back to the leaf) without moving
        // anything; relative targets are already canonical leaf names
        def readdress(n: String): String =
          if (n.startsWith(baseData + "/")) n.stripPrefix(baseData + "/")
          else n
        val entries = RowStore
          .readManifest(ck, RowStore.currentVersion(ck))
          .map(e => e.copy(name = adopt(e.name),
            dvTarget = e.dvTarget.map(readdress)))
        val cur = RowStore.currentVersion(t)
        (t, cur, RowStore.stageManifest(t, cur + 1, entries))
      }
      // phase 2 — link all (atomic create-if-absent per table; the
      // lock + phase-0 validation make an in-flight loss impossible
      // in-process, and a cross-process interloper fails loudly)
      val versions =
        try staged.map { case (t, cur, tmp) =>
          RowStore.publishStaged(t, cur + 1, tmp)
          cur + 1
        } finally staged.foreach { case (_, _, tmp) =>
          Files.deleteIfExists(tmp); ()
        }
      txn.tables.foreach(t => RowStore.drop(cloneKey(t, id)))
      live.remove(id)
      versions
    }
  }
}
