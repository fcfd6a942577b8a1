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

  /** Ids seed from the JVM start time (ms, shifted to leave counter
    * room) rather than 1: clone names land on SHARED disk, so two
    * driver processes — or a restart after a crash that left
    * `<table>__txnN` debris — must never draw an id a sibling or a
    * corpse already used (the review finding: per-JVM `1` collided
    * both ways). */
  private val nextId = new java.util.concurrent.atomic.AtomicLong(
    System.currentTimeMillis() << 12)
  private val live =
    new java.util.concurrent.ConcurrentHashMap[Long, Txn]()

  def cloneKey(table: String, id: Long): String = s"${table}__txn$id"

  /** Start a transaction over `tables` (store keys). Returns the txn
    * whose clones (`cloneKey(t, id)`) statements should target. A
    * begin that fails mid-way (e.g. a clone-name collision on table
    * 3 of 4) drops the clones it already made — no leaked debris
    * without a rollback handle. */
  def begin(tables: Seq[String]): Txn = RowStore.commitLock.synchronized {
    require(tables.nonEmpty, "begin_transaction: no tables")
    require(tables.distinct.size == tables.size,
      "begin_transaction: a table may appear once")
    tables.foreach(t => require(RowStore.exists(t),
      s"begin_transaction: $t does not exist"))
    val id = nextId.getAndIncrement()
    val bases = tables.map(t => t -> RowStore.currentVersion(t)).toMap
    val made = scala.collection.mutable.ListBuffer.empty[String]
    try tables.foreach { t =>
      RowStoreOps.snapshotTable(t, cloneKey(t, id)); made += t
    } catch { case e: Throwable =>
      made.foreach(t => RowStore.drop(cloneKey(t, id)))
      throw e
    }
    val txn = Txn(id, tables, bases)
    live.put(id, txn)
    txn
  }

  /** Abandon the transaction: drop the clones, bases untouched. Runs
    * under the commit lock and atomically claims the id, so a
    * rollback can never race a concurrent commit on the same
    * transaction into deleting clone files mid-adoption. */
  def rollback(id: Long): Int = RowStore.commitLock.synchronized {
    val txn = live.remove(id)
    require(txn != null, s"rollback_transaction: no open transaction $id")
    txn.tables.count(t => RowStore.drop(cloneKey(t, id)))
  }

  /** Publish every clone's snapshot onto its base, all-or-nothing.
    * Returns the new version per table (input order). On a PHASE-0
    * (OCC/schema) refusal the transaction STAYS OPEN — nothing
    * adopted, no file moved — and the caller rolls back or re-begins.
    * A failure AFTER phase 0 (an IO error mid-adoption, or the
    * cross-process window below) CLOSES the transaction instead:
    * retrying would re-move already-moved files, so the clones drop,
    * the id dies, and the error says so — already-published tables
    * are durable, unpublished bases are untouched, and any moved-but-
    * unreferenced files are debris `remove_orphan_files` reclaims. */
  def commit(id: Long): Seq[Int] = {
    RowStore.commitLock.synchronized {
      val txn = live.get(id)
      require(txn != null, s"commit_transaction: no open transaction $id")
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
      // phases 1+2 mutate (file moves, links): any failure past this
      // point CLOSES the transaction — see the scaladoc contract
      try commitAdopt(txn)
      catch { case e: Throwable =>
        txn.tables.foreach(t => RowStore.drop(cloneKey(t, id)))
        live.remove(id)
        throw new IllegalStateException(
          s"transaction $id failed mid-adoption and was CLOSED " +
            "(already-published tables are durable, unpublished bases " +
            "untouched, moved-but-unreferenced files reclaim via " +
            "remove_orphan_files); re-begin to retry", e)
      }
    }
  }

  /** Phases 1+2 of [[commit]] (caller holds the lock and owns the
    * failure contract). */
  private def commitAdopt(txn: Txn): Seq[Int] = {
    val id = txn.id
      // staged-temp ledger spanning BOTH phases: a phase-1 failure on
      // table N (adopt IO error, stageManifest throw) must still
      // reclaim tables 1..N-1's already-staged temps — the phase-2
      // finally alone only covers a fully-built `staged` collection
      // (r15 advisor finding). deleteIfExists is idempotent against
      // publishStaged's own cleanup.
      val stagedTmps = scala.collection.mutable.ListBuffer.empty[Path]
      try {
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
        // a dv TARGET is an address, never an owned file — clones now
        // keep it in canonical leaf form (snapshotTable), so this is
        // normally the identity; it still strips a base-absolute form
        // defensively so a legacy-shaped manifest can never leak an
        // absolutized target into the base
        def readdress(n: String): String =
          if (n.startsWith(baseData + "/")) n.stripPrefix(baseData + "/")
          else n
        val entries = RowStore
          .readManifest(ck, RowStore.currentVersion(ck))
          .map(e => e.copy(name = adopt(e.name),
            dvTarget = e.dvTarget.map(readdress)))
        val cur = RowStore.currentVersion(t)
        val tmp = RowStore.stageManifest(t, cur + 1, entries)
        stagedTmps += tmp
        (t, cur, tmp)
      }
      // phase 2 — link all (atomic create-if-absent per table; the
      // lock + phase-0 validation make an in-flight loss impossible
      // in-process, and a cross-process interloper fails loudly).
      // KNOWN WINDOW (the copy_into/publish_branches documentation
      // discipline): a cross-process writer that commits a version
      // number between phase 0 and a later table's link makes that
      // link throw CommitConflictException with EARLIER tables
      // already published and the remaining clones' txn-written files
      // already moved — the already-published tables are correct and
      // durable, the unpublished tables are untouched, and the moved
      // files are unreferenced debris remove_orphan_files reclaims;
      // the residual transaction should be rolled back, not retried.
      // Single-writer-per-table deployments (this harness) never hit
      // it; a real format closes it with a catalog-service CAS over
      // the whole table set.
      val versions = staged.map { case (t, cur, tmp) =>
        RowStore.publishStaged(t, cur + 1, tmp)
        cur + 1
      }
      txn.tables.foreach(t => RowStore.drop(cloneKey(t, id)))
      live.remove(id)
      versions
      } finally stagedTmps.foreach { tmp =>
        Files.deleteIfExists(tmp); ()
      }
  }
}
