package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsRowLevelOperations, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DSv2 TABLE CATALOG with SQL DML — the connector-matrix cell the
  * path-based providers (SeqSource/AggSink/AvroSource/SpjSource) can't
  * reach: `CREATE TABLE` / `INSERT INTO` / `MERGE INTO` / `UPDATE` /
  * `DELETE FROM` against `graft_dml.<ns>.<table>` identifiers, i.e.
  * the lake-format DML surface (Iceberg/Delta's headline feature) that
  * q51's hand-rolled changeset apply emulates with joins.
  *
  * MERGE/UPDATE/DELETE run through [[SupportsRowLevelOperations]] in
  * its GROUP-BASED (copy-on-write) form: Spark's own
  * RewriteMergeIntoTable / RewriteUpdateTable / RewriteDeleteFromTable
  * rules plan the operation as "scan the affected groups through the
  * operation's ScanBuilder, compute replacement rows, hand them to the
  * operation's WriteBuilder" — the engine computes the merge; the
  * connector only reads and replaces groups. This table is a single
  * group (the whole table), which is copy-on-write at its simplest;
  * a real format partitions groups by file and implements
  * `requiredMetadataAttributes` for finer granularity — the API shape
  * here is exactly that one, minus the bookkeeping.
  *
  * STORAGE IS A STAND-IN (the m02 stubbed-codec convention): rows live
  * in a JVM-global map, value-converted to plain JVM types so readers
  * and writers serialize cleanly. Every API surface above it — the
  * catalog plumbing, scan/write builders, the row-level operation —
  * is the real contract a storage engine implements; only `load`/
  * `replace` would change. Supported column types: BIGINT and STRING
  * (the demo schema; a format adds a type bridge, not new plumbing).
  */
object RowStore {
  /** table key → (schema, committed rows as plain JVM values). */
  val tables = new ConcurrentHashMap[String, (StructType, Array[Array[Any]])]()

  /** table key → snapshot per committed version: history(v) is the
    * state after v commits (v0 = the empty table at CREATE). Every
    * write commit appends — the retained-snapshot model behind
    * `VERSION AS OF` (a real format would expire old versions; the
    * lifecycle here is bounded by DROP TABLE). */
  val history = new ConcurrentHashMap[String, Vector[Array[Array[Any]]]]()

  def externalize(row: InternalRow, schema: StructType): Array[Any] = {
    require(row.numFields == schema.length,
      s"row has ${row.numFields} fields, write schema has ${schema.length}: $schema")
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType   => if (row.isNullAt(i)) null else row.getLong(i)
        case StringType =>
          if (row.isNullAt(i)) null else row.getUTF8String(i).toString
        case other => sys.error(s"RowStore: unsupported type $other")
      }
    }
  }

  def internalize(vals: Array[Any]): InternalRow =
    new GenericInternalRow(vals.map {
      case s: String => UTF8String.fromString(s)
      case v         => v
    })
}

class GraftCatalog extends TableCatalog {
  private var catName = "graft_dml"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private def key(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val prefix = (catName +: ns).mkString(".") + "."
    RowStore.tables.keySet().asScala.toArray
      .filter(_.startsWith(prefix))
      .map(k => Identifier.of(ns, k.stripPrefix(prefix)))
  }

  override def loadTable(ident: Identifier): Table =
    Option(RowStore.tables.get(key(ident))) match {
      case Some((schema, _)) => new RowTable(key(ident), schema)
      case None              => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty, "RowStore tables are unpartitioned")
    RowStore.tables.put(key(ident), (schema, Array.empty))
    RowStore.history.put(key(ident), Vector(Array.empty))
    new RowTable(key(ident), schema)
  }

  /** `VERSION AS OF v` — SQL time travel resolves here: a read-only
    * table pinned to the retained snapshot after v commits. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (schema, _) = Option(RowStore.tables.get(key(ident)))
      .getOrElse(throw new NoSuchTableException(ident))
    val snaps = RowStore.history.getOrDefault(key(ident), Vector.empty)
    val v = version.toInt
    require(v >= 0 && v < snaps.length,
      s"no version $v for ${key(ident)} (have 0..${snaps.length - 1})")
    new RowTable(key(ident), schema, pinned = Some(snaps(v)))
  }

  /** Schema evolution, additive form (the lake-format default):
    * ALTER TABLE ADD COLUMN appends a nullable field and pads every
    * committed row — current AND retained versions, so VERSION AS OF
    * reads stay readable under the new schema (how a format's
    * schema-id indirection behaves for added columns: old snapshots
    * surface NULL). Other changes are rejected. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val k = key(ident)
    RowStore.tables.synchronized {
      val (schema, rows) = Option(RowStore.tables.get(k))
        .getOrElse(throw new NoSuchTableException(ident))
      val newSchema = changes.foldLeft(schema) {
        case (sch, add: TableChange.AddColumn) =>
          require(add.fieldNames().length == 1,
            "nested ADD COLUMN not supported")
          StructType(sch.fields :+
            org.apache.spark.sql.types.StructField(
              add.fieldNames()(0), add.dataType(), nullable = true))
        case (_, other) => throw new UnsupportedOperationException(
          s"unsupported table change: $other")
      }
      val extra = newSchema.length - schema.length
      def pad(rs: Array[Array[Any]]): Array[Array[Any]] =
        rs.map(r => r ++ Array.fill[Any](extra)(null))
      RowStore.tables.put(k, (newSchema, pad(rows)))
      RowStore.history.computeIfPresent(k, (_, snaps) => snaps.map(pad))
      new RowTable(k, newSchema)
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    RowStore.history.remove(key(ident))
    RowStore.tables.remove(key(ident)) != null
  }

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

class RowTable(tableKey: String, tableSchema: StructType,
    pinned: Option[Array[Array[Any]]] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = tableKey
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new RowScan(tableKey, tableSchema, pinned)

  /** INSERT INTO path: append. (RowWrite IS its own WriteBuilder —
    * WriteBuilder.build() is a default method, so no SAM lambda.)
    * INSERT OVERWRITE arrives as `truncate()` on the same builder
    * (the engine's always-true OverwriteByExpression collapses to a
    * truncating write) and flips it to replace mode. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new RowWrite(tableKey, info.schema(), replace = false)

  /** MERGE/UPDATE/DELETE path: Spark rewrites the statement into
    * scan-groups → compute replacement → replace-groups using this
    * operation's builders. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => new RowScan(tableKey, tableSchema)
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
        new RowWrite(tableKey, info.schema(), replace = true)
    }
}

/** Scan over the committed snapshot: one partition carrying the
  * (already-external) row values — the snapshot rides the closure the
  * same way a real scan's partition carries file splits. */
class RowScan(tableKey: String, scanSchema: StructType,
    pinned: Option[Array[Array[Any]]] = None) extends Scan with Batch {
  override def readSchema(): StructType = scanSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val rows = pinned.getOrElse(
      Option(RowStore.tables.get(tableKey))
        .getOrElse(sys.error(s"no such table: $tableKey"))._2)
    Array(RowsPartition(rows))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[RowsPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = RowStore.internalize(rows(i))
          override def close(): Unit = ()
        }
    }
}

case class RowsPartition(rows: Array[Array[Any]]) extends InputPartition

/** Append (INSERT) or replace (row-level ops) write: per-task writers
  * externalize rows into commit messages; commit publishes atomically
  * under the store's lock — the copy-on-write swap. */
class RowWrite(tableKey: String, writeSchema: StructType, replace: Boolean)
    extends WriteBuilder with Write with BatchWrite
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def truncate(): WriteBuilder =
    new RowWrite(tableKey, writeSchema, replace = true)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new RowWriterFactory(writeSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.flatMap(_.asInstanceOf[RowsMessage].rows)
    RowStore.tables.synchronized {
      val (schema, existing) = Option(RowStore.tables.get(tableKey))
        .getOrElse(sys.error(s"no such table: $tableKey"))
      val next = if (replace) incoming else existing ++ incoming
      RowStore.tables.put(tableKey, (schema, next))
      // retain the snapshot: every commit is a readable version
      RowStore.history.merge(tableKey, Vector(next), (old, add) => old ++ add)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class RowsMessage(rows: Array[Array[Any]]) extends WriterCommitMessage

/** Driver-contract entries for the DML catalog. */
object RowCatalogQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.col

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── q106: SQL MERGE INTO + DELETE FROM against the DSv2 catalog —
    // the full DML lifecycle: CREATE a catalog table, INSERT a seed
    // slice of orders, MERGE a second slice (conditional UPDATE /
    // DELETE on match, INSERT on miss), then a row-level DELETE with a
    // non-pushable predicate. All four statements are Spark's own SQL
    // planning over the connector's row-level operation — the engine
    // computes the merge, the connector only scans and replaces
    // groups. The oracle restates the end state relationally from the
    // raw orders table, so a wrong clause anywhere (e.g. DELETE firing
    // for 'F' rows, or the merge updating with the target's own cents)
    // breaks the hash.
    "q106_merge_into" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml",
        "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q106_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.accounts")
      s.sql("CREATE TABLE graft_dml.ns.accounts " +
        "(k BIGINT, cents BIGINT, status STRING)")
      s.sql("""INSERT INTO graft_dml.ns.accounts
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT),
               o_orderstatus
        FROM q106_orders WHERE o_orderkey % 7 = 0""")
      s.sql("""MERGE INTO graft_dml.ns.accounts t
        USING (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderstatus AS status
               FROM q106_orders WHERE o_orderkey % 5 = 0) s
        ON t.k = s.k
        WHEN MATCHED AND t.status = 'F' THEN
          UPDATE SET cents = t.cents + s.cents
        WHEN MATCHED AND t.status <> 'F' THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, cents, status)
          VALUES (s.k, s.cents, s.status)""")
      s.sql("DELETE FROM graft_dml.ns.accounts WHERE k % 97 = 0")
      s.table("graft_dml.ns.accounts").orderBy(col("k"))
    }),

    // ── q107: SQL TIME TRAVEL (`VERSION AS OF`) — st30 reads one
    // mid-version of a file layout; this is the CATALOG form every
    // lake format exposes: each DML commit retains a snapshot, and
    // `SELECT … FROM t VERSION AS OF v` resolves through the
    // catalog's versioned loadTable to a read-only pinned table. The
    // query replays q106's lifecycle on its own table (v0 CREATE,
    // v1 INSERT seed, v2 MERGE, v3 DELETE) and aggregates EVERY
    // version in one statement — so a wrong snapshot anywhere (a
    // version mutated in place, an off-by-one pin) shifts a row the
    // oracle, restating all four states from raw orders, will catch.
    "q107_version_asof" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml",
        "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q107_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.accounts_v")
      s.sql("CREATE TABLE graft_dml.ns.accounts_v " +
        "(k BIGINT, cents BIGINT, status STRING)")
      s.sql("""INSERT INTO graft_dml.ns.accounts_v
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT),
               o_orderstatus
        FROM q107_orders WHERE o_orderkey % 7 = 0""")
      s.sql("""MERGE INTO graft_dml.ns.accounts_v t
        USING (SELECT o_orderkey AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderstatus AS status
               FROM q107_orders WHERE o_orderkey % 5 = 0) s
        ON t.k = s.k
        WHEN MATCHED AND t.status = 'F' THEN
          UPDATE SET cents = t.cents + s.cents
        WHEN MATCHED AND t.status <> 'F' THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, cents, status)
          VALUES (s.k, s.cents, s.status)""")
      s.sql("DELETE FROM graft_dml.ns.accounts_v WHERE k % 97 = 0")
      s.sql("""
        SELECT 0 AS version, COUNT(*) AS n,
               CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_cents
        FROM graft_dml.ns.accounts_v VERSION AS OF 0
        UNION ALL
        SELECT 1, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM graft_dml.ns.accounts_v VERSION AS OF 1
        UNION ALL
        SELECT 2, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM graft_dml.ns.accounts_v VERSION AS OF 2
        UNION ALL
        SELECT 3, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM graft_dml.ns.accounts_v VERSION AS OF 3
        ORDER BY version""")
    })
  )

  val oracles: Map[String, String] = Map(
    // the four statements folded into one relational restatement over
    // the raw table: matched-and-F rows add the source cents,
    // matched-and-not-F rows vanish, unmatched source rows insert,
    // then the k % 97 delete
    "q106_merge_into" ->
      """WITH t0 AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |src AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |merged AS (
        |  SELECT t.k,
        |    CASE WHEN s.k IS NOT NULL AND t.status = 'F'
        |         THEN t.cents + s.cents ELSE t.cents END AS cents,
        |    t.status
        |  FROM t0 t LEFT JOIN src s ON t.k = s.k
        |  WHERE s.k IS NULL OR t.status = 'F'
        |  UNION ALL
        |  SELECT s.k, s.cents, s.status
        |  FROM src s LEFT JOIN t0 t ON t.k = s.k WHERE t.k IS NULL)
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // the four retained versions restated from raw orders: v0 empty,
    // v1 the seed, v2 post-merge, v3 post-delete (q106's CTE chain)
    "q107_version_asof" ->
      """WITH t0 AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |src AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |merged AS (
        |  SELECT t.k,
        |    CASE WHEN s.k IS NOT NULL AND t.status = 'F'
        |         THEN t.cents + s.cents ELSE t.cents END AS cents
        |  FROM t0 t LEFT JOIN src s ON t.k = s.k
        |  WHERE s.k IS NULL OR t.status = 'F'
        |  UNION ALL
        |  SELECT s.k, s.cents
        |  FROM src s LEFT JOIN t0 t ON t.k = s.k WHERE t.k IS NULL)
        |SELECT 0 AS version, CAST(0 AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS sum_cents
        |UNION ALL
        |SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM t0
        |UNION ALL
        |SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |UNION ALL
        |SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |  WHERE k % 97 <> 0
        |ORDER BY version""".stripMargin
  )
}

class RowWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length + 1) {
          // group-based MERGE layout: Spark's MergeRows prefixes each
          // replacement row with an int op-code column
          // (RowDeltaUtils.OPERATION_COLUMN). Writers whose operation
          // declares metadata attributes get this projected away by
          // DataAndMetadataWritingSparkTask; the no-metadata path
          // (this table: the whole table is one group, no _file/_pos)
          // hands it through raw, so strip it here and drop DELETEs
          // (kept/carryover rows arrive as WRITE_OPERATION).
          val op = row.getInt(0)
          if (op != org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION) {
            buf += RowStore.externalize(new OffsetRow(row, 1), schema)
          }
        } else {
          buf += RowStore.externalize(row, schema)
        }
      override def commit(): WriterCommitMessage = RowsMessage(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** View of `row` with the first `off` fields hidden (the op-code
  * prefix); only the accessors RowStore.externalize uses. */
class OffsetRow(row: InternalRow, off: Int) extends GenericInternalRow(0) {
  override def numFields: Int = row.numFields - off
  override def isNullAt(i: Int): Boolean = row.isNullAt(i + off)
  override def getLong(i: Int): Long = row.getLong(i + off)
  override def getUTF8String(i: Int): UTF8String = row.getUTF8String(i + off)
}
