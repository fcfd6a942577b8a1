package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.RowDeltaUtils
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, Expressions, NamedReference, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDelta, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DSv2 TABLE CATALOG with SQL DML over FILE-GROUP storage — the
  * connector-matrix cell the path-based providers (SeqSource/AggSink/
  * AvroSource/SpjSource) can't reach: `CREATE TABLE` / `INSERT INTO` /
  * `MERGE INTO` / `UPDATE` / `DELETE FROM` / `VERSION AS OF` against
  * `graft_dml.<ns>.<table>` identifiers — the lake-format surface
  * (Iceberg/Delta's headline feature) that q51's hand-rolled changeset
  * apply emulates with joins.
  *
  * STORAGE IS REAL FILES, in real groups (the copy-on-write unit every
  * lake format shares):
  *
  *   - Committed rows live in immutable PARQUET files under a
  *     per-session scratch dir, one file per (writer task, group);
  *     group = hash bucket of the FIRST table column (the demo's
  *     bucketing convention). Executors write and read the files
  *     directly — nothing data-sized ever rides the driver.
  *   - Every commit writes a new MANIFEST (`v<N>.manifest`) listing
  *     the files visible at that version. Files are immutable, so
  *     `VERSION AS OF v` is just "plan from manifest v", and an
  *     untouched group's files are REUSED across versions — which is
  *     also what makes the change feed (q109) read only changed
  *     groups.
  *
  * MERGE/UPDATE/DELETE run through BOTH halves of the DSv2 row-level
  * matrix, chosen per table by `TBLPROPERTIES('format'=...)`:
  *
  *   - COPY-ON-WRITE (default): [[SupportsRowLevelOperations]] in its
  *     group-based form. The operation declares `_group` in
  *     `requiredMetadataAttributes`, its scan exposes `_group` through
  *     [[SupportsRuntimeV2Filtering]], and Spark's runtime group
  *     filtering evaluates the MERGE/DELETE condition FIRST, then
  *     hands the scan an `In(_group, …)` — so only groups that
  *     actually contain matched rows are read and rewritten. A MERGE
  *     touching 1 of 4 groups rewrites exactly 1 group's files
  *     (pinned in RowCatalogSpec); at 100 TB this is the difference
  *     between rewriting a partition and rewriting the table.
  *   - MERGE-ON-READ (`'format'='mor'`): [[SupportsDelta]]. The
  *     engine streams per-row insert/update/delete records (keyed by
  *     the `_rid` row id = base file + position, Iceberg's position
  *     delete model) into a DELTA file; base files are never
  *     rewritten, and the scan merges base + deltas per group at read
  *     time. The write-amplification/read-amplification trade every
  *     lake format exposes, both sides real.
  *
  * Scale notes: group resolution state is BUCKET-sized (a real format
  * adds spilling/compaction, not a different shape); the manifest is
  * metadata-sized; scan column pruning reaches the parquet reads via
  * [[SupportsPushDownRequiredColumns]] + a parquet projection schema.
  * Supported column types: BIGINT, INT, STRING (the demo schema — a
  * format adds a type bridge, not new plumbing).
  */
object RowStore {
  /** Driver-side commit lock: manifests advance atomically per JVM
    * (a real format uses an atomic rename / metastore swap here). */
  private[sources] val commitLock = new Object

  /** Plan-time observability for the spec (the SeqSourceSpec
    * emission-counter discipline): base files planned / skipped by
    * the LAST GroupScan planning on this driver. */
  val lastPlannedBaseFiles = new java.util.concurrent.atomic.AtomicInteger(0)
  val lastSkippedBaseFiles = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Column names reserved for metadata / delta-record bookkeeping. */
  private[sources] val Reserved =
    Set("_group", "_rid", "_change", "_op", "_grp")

  /** Test seam: invoked at the top of every batch-write commit BEFORE
    * the lock is taken. The concurrency spec points it at a latch so
    * two contending row-level operations both finish their scans
    * before either commits — the interleaving the OCC validation
    * exists for, made deterministic. Production value is a no-op. */
  @volatile private[graft] var preCommitHook: () => Unit = () => ()

  /** `bucketCol` is the declared partition column (`PARTITIONED BY
    * (bucket(n, col))` — Iceberg's bucket transform); empty = the
    * pre-transform default, first column. [[keyCol]] is the single
    * column every piece of group machinery routes through: write
    * distribution, writer-side bucketing, zone-map stats, and the
    * scan's key-range file skipping. */
  /** `dropped` remembers every column name ever DROPped: readers
    * project by NAME (no Iceberg field-id indirection), so re-adding a
    * dropped name would resurrect the old files' values instead of
    * NULL-padding — the catalog refuses it loudly. */
  /** `transform` is the ACTIVE partition transform: `bucket` (group =
    * hash mod numGroups — the default), `truncate` (group =
    * floorDiv(key, tparam): contiguous key ranges per group, Iceberg's
    * truncate width), or `days` (group = epoch day of a TIMESTAMP
    * column). `specId` counts partition-spec EVOLUTIONS: every data
    * file records the spec it was written under, so a scan plans old
    * groups by their original layout and new writes use the active one
    * — Iceberg's spec-evolution model. */
  /** `renames` maps a column's CURRENT (display) name to the name its
    * values are stored under in data files (its name at column
    * creation — identity entries are omitted). RENAME COLUMN is
    * metadata-only: files never rewrite; readers translate
    * display→storage at the parquet boundary and writers keep writing
    * the storage name, so old and new files stay mutually readable —
    * the name-mapping half of Iceberg's field-id indirection. */
  case class Meta(schema: StructType, numGroups: Int, mor: Boolean,
      bucketCol: String = "", dropped: Seq[String] = Seq.empty,
      transform: String = "bucket", tparam: Long = 0L, specId: Int = 0,
      renames: Map[String, String] = Map.empty) {
    def keyCol: String = if (bucketCol.nonEmpty) bucketCol else schema.head.name
    /** The name column `n`'s values are stored under in data files. */
    def storageOf(n: String): String = renames.getOrElse(n, n)
  }

  /** One manifest entry: `kind` ∈ base|delta; base entries carry the
    * group they belong to, delta entries apply table-wide (each record
    * inside names its group). Base entries written by this version
    * also carry the FIRST column's [min, max] — the zone-map stats
    * file skipping plans from (None for string keys, delta files, and
    * entries written before stats existed; statless files are never
    * skipped). */
  case class FileEntry(kind: String, group: Int, name: String,
      minK: Option[Long] = None, maxK: Option[Long] = None,
      rows: Option[Long] = None, spec: Int = 0)

  /** Per-session table root (Scratch semantics: per-applicationId,
    * deleted on JVM exit). All catalog/commit calls run on the driver;
    * executors only ever see absolute file paths. */
  private def root(): String =
    graft.Scratch.dir(SparkSession.active, "graft_rowcat", "tables")

  private[sources] def tableDir(key: String): String = s"${root()}/$key"
  private[sources] def dataDir(key: String): String = {
    val d = s"${tableDir(key)}/data"
    Files.createDirectories(Paths.get(d))
    d
  }
  private def metaPath(key: String): Path =
    Paths.get(tableDir(key), "meta")

  def exists(key: String): Boolean = Files.exists(metaPath(key))

  /** Meta serialization is line-oriented `k=v` with the dropped list
    * comma-joined, so a column name containing ',', '=', or layout
    * whitespace would corrupt the file (and silently split the dropped
    * list, defeating the re-add guard). Validated at every write. */
  private[sources] def validateColName(n: String): Unit =
    require(!n.exists(c => c == ',' || c == '=' || c == '\n' ||
      c == '\r' || c == '\t' || c == '>'),
      s"column name ${n.replace("\n", "\\n")} contains a character " +
        "reserved by the catalog's metadata layout (, = > tab newline)")

  private def renderRenames(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (d, s) => s"$d>$s" }.mkString(",")

  private def parseRenames(v: String): Map[String, String] =
    v.split(",").filter(_.nonEmpty).map { p =>
      val Array(d, s) = p.split(">", 2); (d, s)
    }.toMap

  def writeMeta(key: String, m: Meta): Unit = {
    (m.schema.fieldNames ++ m.dropped ++
      m.renames.keys ++ m.renames.values).foreach(validateColName)
    Files.createDirectories(Paths.get(tableDir(key)))
    Files.writeString(metaPath(key),
      s"groups=${m.numGroups}\nmor=${m.mor}\npcol=${m.bucketCol}\n" +
        s"ptf=${m.transform}\nparg=${m.tparam}\nspec=${m.specId}\n" +
        s"dropped=${m.dropped.mkString(",")}\n" +
        s"renames=${renderRenames(m.renames)}\nschema=${m.schema.json}\n")
  }

  def readMeta(key: String): Meta = {
    val kv = Files.readAllLines(metaPath(key)).asScala
      .filter(_.contains("=")).map(l => l.splitAt(l.indexOf("="))).toMap
      .map { case (k, v) => (k, v.drop(1)) }
    Meta(DataType.fromJson(kv("schema")).asInstanceOf[StructType],
      kv("groups").toInt, kv("mor").toBoolean,
      kv.getOrElse("pcol", ""),
      kv.getOrElse("dropped", "").split(",").filter(_.nonEmpty).toSeq,
      kv.getOrElse("ptf", "bucket"),
      kv.getOrElse("parg", "0").toLong,
      kv.getOrElse("spec", "0").toInt,
      parseRenames(kv.getOrElse("renames", "")))
  }

  def listTableKeys(): Seq[String] = {
    val r = Paths.get(root())
    if (!Files.isDirectory(r)) Seq.empty
    else {
      val stream = Files.list(r)
      try stream.iterator().asScala.filter(Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    }
  }

  def versions(key: String): Seq[Int] = {
    val d = Paths.get(tableDir(key))
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val stream = Files.list(d)
      try stream.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt }
        .toSeq.sorted
      finally stream.close()
    }
  }

  def currentVersion(key: String): Int = versions(key).lastOption.getOrElse(
    sys.error(s"no committed version for $key"))

  def readManifest(key: String, v: Int): Seq[FileEntry] =
    parseEntries(Files.readAllLines(
      Paths.get(tableDir(key), s"v$v.manifest")).asScala.toSeq)

  private def parseEntries(all: Seq[String]): Seq[FileEntry] =
    all.filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
        // after the fixed `kind group name` prefix the tokens are
        // self-describing: a bare-number PAIR = the zone-map [min,max],
        // `r<count>` = the file's exact row count (what answers
        // COUNT(*) at plan time), `s<spec>` = the partition spec the
        // file was written under (omitted for spec 0, so pre-evolution
        // manifests parse unchanged)
        val toks = l.split("\t")
        if (toks.length < 3) sys.error(s"corrupt manifest line: $l")
        var minK, maxK: Option[Long] = None
        var rows: Option[Long] = None
        var spec = 0
        toks.drop(3).foreach { t =>
          if (t.startsWith("r") && t.tail.nonEmpty &&
            t.tail.forall(_.isDigit)) rows = Some(t.tail.toLong)
          else if (t.startsWith("s") && t.tail.nonEmpty &&
            t.tail.forall(_.isDigit)) spec = t.tail.toInt
          else if (minK.isEmpty) minK = Some(t.toLong)
          else if (maxK.isEmpty) maxK = Some(t.toLong)
          else sys.error(s"corrupt manifest line: $l")
        }
        require(minK.isDefined == maxK.isDefined,
          s"corrupt manifest line (unpaired stats): $l")
        FileEntry(toks(0), toks(1).toInt, toks(2), minK, maxK, rows, spec)
      }

  private def renderEntries(entries: Seq[FileEntry]): String =
    entries.map { e =>
      val stats = (e.minK, e.maxK) match {
        case (Some(mn), (Some(mx))) => s"\t$mn\t$mx"
        case _ => ""
      }
      val rows = e.rows.map(r => s"\tr$r").getOrElse("")
      val spec = if (e.spec != 0) s"\ts${e.spec}" else ""
      s"${e.kind}\t${e.group}\t${e.name}$stats$rows$spec"
    }.mkString("", "\n", "\n")

  /** Streaming-append high-water mark for ONE streaming query: the
    * last epoch whose commit landed in the manifest chain. Epoch ids
    * restart at 0 per checkpoint, so the mark must be per-QUERY — a
    * table-wide mark would silently drop a second query's early
    * batches. Recorded ATOMICALLY in the committing manifest's header
    * (`#ep\t<queryId>\t<n>`): a crash between "manifest written" and
    * "mark written" cannot exist, so a replayed epoch can never
    * double-commit. Resolution scans retained versions newest-first;
    * like Delta's txn retention, VACUUMing past a query's last commit
    * ends its replay-dedup window. -1 = nothing committed yet. */
  /** In-memory high-water cache: every epoch commit runs on this
    * driver under [[commitLock]], so once a (table, query) mark is
    * resolved from the manifests, later commits keep it current in
    * memory — without it, each epoch commit re-reads every retained
    * manifest newest-first (O(versions) file IO per epoch, O(V²) over
    * a long-running query into a table with deep history). Entries
    * drop with the table ([[drop]]), and the map is access-order LRU
    * bounded (same discipline as [[graft.SessionLruCache]] — which
    * doesn't fit directly: epoch marks need overwrite-put on commit
    * and per-table invalidation, and the commit path has no session in
    * scope). Eviction is cheap-and-correct: a dropped mark re-resolves
    * from the manifests on next touch. */
  private val EpochCacheCap = 1024
  private val epochCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), java.lang.Long](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), java.lang.Long]) =
        size > EpochCacheCap
    })

  def lastStreamEpoch(key: String, queryId: String): Long = {
    val ck = (key, queryId)
    val cached = epochCache.get(ck)
    if (cached != null) cached.longValue
    else {
      val pre = s"#ep\t$queryId\t"
      val resolved = versions(key).sorted.reverse.iterator.map { v =>
        Files.readAllLines(Paths.get(tableDir(key), s"v$v.manifest")).asScala
          .collectFirst { case l if l.startsWith(pre) =>
            l.stripPrefix(pre).toLong }
      }.collectFirst { case Some(n) => n }.getOrElse(-1L)
      epochCache.put(ck, java.lang.Long.valueOf(resolved))
      resolved
    }
  }

  /** Record a just-committed epoch (called under [[commitLock]] right
    * after the manifest carrying its `#ep` header is written). */
  private[sources] def recordStreamEpoch(key: String, queryId: String,
      epoch: Long): Unit =
    epochCache.put((key, queryId), java.lang.Long.valueOf(epoch))

  /** Test seam for commit wall-clock (TIMESTAMP AS OF resolution). */
  @volatile private[graft] var clock: () => Long =
    () => System.currentTimeMillis()

  /** The schema a version was committed under ([[writeManifest]]'s
    * `#schema` header) — what `VERSION/TIMESTAMP AS OF` reads resolve
    * against. None for manifests written before the header existed
    * (callers fall back to the current schema). */
  def versionSchema(key: String, v: Int): Option[StructType] = {
    val p = Paths.get(tableDir(key), s"v$v.manifest")
    if (!Files.exists(p)) None
    else Files.readAllLines(p).asScala.collectFirst {
      case l if l.startsWith("#schema\t") =>
        DataType.fromJson(l.stripPrefix("#schema\t")).asInstanceOf[StructType]
    }
  }

  /** The display→storage rename mapping a version was committed under
    * (`#renames` manifest header). Empty for versions committed while
    * no column was renamed — identity mapping, which is correct for
    * that era by construction. */
  def versionRenames(key: String, v: Int): Map[String, String] = {
    val p = Paths.get(tableDir(key), s"v$v.manifest")
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.collectFirst {
      case l if l.startsWith("#renames\t") =>
        parseRenames(l.stripPrefix("#renames\t"))
    }.getOrElse(Map.empty)
  }

  /** A version's recorded commit time (ms). Header line written by
    * [[writeManifest]]; manifests from before the header existed fall
    * back to file mtime. */
  def commitTimeMs(key: String, v: Int): Long = {
    val p = Paths.get(tableDir(key), s"v$v.manifest")
    Files.readAllLines(p).asScala.collectFirst {
      case l if l.startsWith("#ms\t") => l.stripPrefix("#ms\t").toLong
    }.getOrElse(Files.getLastModifiedTime(p).toMillis)
  }

  def writeManifest(key: String, v: Int, entries: Seq[FileEntry],
      extraHeader: Seq[String] = Seq.empty): Unit = {
    // STRICTLY monotonic commit times per table: two sub-millisecond
    // commits must never share a timestamp, or TIMESTAMP AS OF the
    // earlier one would silently resolve to the later
    val ms = {
      val now = clock()
      if (v == 0) now
      else try math.max(now, commitTimeMs(key, v - 1) + 1)
      catch { case _: java.io.IOException => now }
    }
    // every version PINS the schema it was committed under (Iceberg/
    // Delta's snapshot-schema rule): time travel reads this, not the
    // current meta, so DROP COLUMN can't silently lose a column from
    // historical reads. Schema JSON is single-line (column names are
    // validated against layout characters at writeMeta).
    val schemaHeader =
      if (Files.exists(metaPath(key))) {
        val m = readMeta(key)
        Seq(s"#schema\t${m.schema.json}") ++
          // the era's display→storage mapping rides with its schema,
          // so a time-travel read of a post-RENAME version projects
          // files by the right stored names
          (if (m.renames.nonEmpty)
            Seq(s"#renames\t${renderRenames(m.renames)}")
          else Seq.empty)
      } else Seq.empty
    Files.writeString(Paths.get(tableDir(key), s"v$v.manifest"),
      s"#ms\t$ms\n" + (schemaHeader ++ extraHeader).map(_ + "\n").mkString +
        renderEntries(entries))
  }

  // ── BRANCHES (Iceberg's write-audit-publish surface): a branch
  // manifest is a STAGED next snapshot — full entry list plus the
  // `#base` header recording the version it forked from. Plain reads
  // never see it; a read with option `branch=<name>` plans from it;
  // [[RowStoreOps.publishBranch]] promotes it to the next committed
  // version under the same OCC rule as any rewrite.

  private def branchPath(key: String, name: String): Path = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"branch name '$name' must be alphanumeric")
    Paths.get(tableDir(key), s"branch-$name.manifest")
  }

  def branchExists(key: String, name: String): Boolean =
    Files.exists(branchPath(key, name))

  def writeBranchManifest(key: String, name: String, base: Int,
      entries: Seq[FileEntry]): Unit =
    Files.writeString(branchPath(key, name),
      s"#base\t$base\n" + renderEntries(entries))

  /** (fork-base version, staged entries). */
  def readBranchManifest(key: String, name: String): (Int, Seq[FileEntry]) = {
    val all = Files.readAllLines(branchPath(key, name)).asScala.toSeq
    val base = all.collectFirst {
      case l if l.startsWith("#base\t") => l.stripPrefix("#base\t").toInt
    }.getOrElse(sys.error(s"branch $name of $key has no #base header"))
    (base, parseEntries(all))
  }

  def dropBranch(key: String, name: String): Unit = {
    Files.deleteIfExists(branchPath(key, name)); ()
  }

  def drop(key: String): Boolean = {
    // the epoch high-water cache follows the table: a re-created table
    // with the same name starts a fresh manifest chain, so stale marks
    // must not survive the drop (iteration under the map's own monitor
    // — synchronizedMap views aren't safe to traverse unsynchronized)
    epochCache.synchronized {
      epochCache.keySet.asScala.filter(_._1 == key).toList
        .foreach(epochCache.remove)
    }
    val d = Paths.get(tableDir(key))
    if (!Files.exists(d)) false
    else {
      val walk = Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
      true
    }
  }

  /** Hash bucket of a row's first-column value — the group function.
    * Longs bucket by value (engine-portable, easy to reason about in
    * specs); strings by hashCode. Null → group 0. */
  def groupOf(v: Any, n: Int): Int = v match {
    case null                    => 0
    case l: java.lang.Long       => Math.floorMod(l.longValue, n.toLong).toInt
    case i: java.lang.Integer    => Math.floorMod(i.intValue, n)
    case u: UTF8String           => Math.floorMod(u.toString.hashCode, n)
    case s: String               => Math.floorMod(s.hashCode, n)
    case other                   => Math.floorMod(other.hashCode, n)
  }

  private val MicrosPerDay = 86400000000L

  /** A row's partition (group) value under a declared transform —
    * the single function writers, DML routing, and the spec all agree
    * on. `bucket` is [[groupOf]]; `truncate` is Iceberg's width
    * transform expressed as the RANGE INDEX floorDiv(key, w) (same
    * grouping as `v - v mod w`, integer-compact); `days` is the epoch
    * day of a TIMESTAMP column (internal micros). Null → group 0, like
    * the bucket default. */
  def partValueOf(transform: String, tparam: Long, numGroups: Int,
      v: Any): Int = transform match {
    case "bucket" => groupOf(v, numGroups)
    // identity: group = the value itself (the classic low-cardinality
    // layout — `PARTITIONED BY (region)`); integer columns only, and
    // the value must fit the 32-bit group space
    case "identity" =>
      val k = v match {
        case null                 => 0L
        case l: java.lang.Long    => l.longValue
        case i: java.lang.Integer => i.longValue
        case other => sys.error(s"identity: non-integer key $other")
      }
      require(k >= Int.MinValue && k <= Int.MaxValue,
        s"identity partition value $k exceeds the 32-bit group space")
      k.toInt
    case "truncate" =>
      val k = v match {
        case null                 => 0L
        case l: java.lang.Long    => Math.floorDiv(l.longValue, tparam)
        case i: java.lang.Integer => Math.floorDiv(i.longValue, tparam)
        case other => sys.error(s"truncate: non-integer key $other")
      }
      require(k >= Int.MinValue && k <= Int.MaxValue,
        s"truncate($tparam) group $k exceeds the 32-bit group space")
      k.toInt
    case "days" =>
      val d = v match {
        case null              => 0L
        case l: java.lang.Long => Math.floorDiv(l.longValue, MicrosPerDay)
        case other => sys.error(s"days: non-timestamp value $other")
      }
      d.toInt // epoch micros / day always fits
    case "hours" =>
      val h = v match {
        case null              => 0L
        case l: java.lang.Long => Math.floorDiv(l.longValue, 3600000000L)
        case other => sys.error(s"hours: non-timestamp value $other")
      }
      // epoch-micros/hour exceeds Int past ~±245,000 years — representable
      // by Spark, so guard like identity/truncate: the pruning path's
      // NonFatal catch saturates to the open bound instead of wrapping
      require(h >= Int.MinValue && h <= Int.MaxValue,
        s"hours partition value $h exceeds the 32-bit group space")
      h.toInt
    // months/years are CALENDAR transforms (Iceberg's definition:
    // months since 1970-01 / years since 1970, UTC proleptic) — not a
    // fixed-width division, so they go through LocalDate
    case "months" =>
      val ld = java.time.LocalDate.ofEpochDay(v match {
        case null              => 0L
        case l: java.lang.Long => Math.floorDiv(l.longValue, MicrosPerDay)
        case other => sys.error(s"months: non-timestamp value $other")
      })
      (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
    case "years" =>
      java.time.LocalDate.ofEpochDay(v match {
        case null              => 0L
        case l: java.lang.Long => Math.floorDiv(l.longValue, MicrosPerDay)
        case other => sys.error(s"years: non-timestamp value $other")
      }).getYear - 1970
    case other => sys.error(s"unknown partition transform $other")
  }
}

/** Executor-side parquet IO for group/delta files, via the public
  * parquet-hadoop example Group API — real columnar files (DuckDB
  * could read them), with column projection pushed into the read. */
object RowFiles {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{Path => HPath}
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader, ParquetWriter}
  import org.apache.parquet.hadoop.api.ReadSupport
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  def messageType(schema: Seq[StructField]): MessageType = {
    val b = Types.buildMessage()
    schema.foreach { f =>
      f.dataType match {
        case LongType =>
          b.addField(Types.optional(PrimitiveTypeName.INT64).named(f.name))
        case IntegerType =>
          b.addField(Types.optional(PrimitiveTypeName.INT32).named(f.name))
        case TimestampType =>
          // Spark's internal representation (micros since epoch, UTC)
          // stored verbatim — the annotation keeps the file honest for
          // external readers
          b.addField(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name))
        case StringType =>
          b.addField(Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case other => sys.error(s"RowStore: unsupported column type $other")
      }
    }
    b.named("row")
  }

  /** Open one parquet writer; caller feeds externalized values aligned
    * to `schema` and closes. */
  final class FileWriter(file: String, schema: Seq[StructField]) {
    private val msg = messageType(schema)
    private val factory = new SimpleGroupFactory(msg)
    private val w: ParquetWriter[Group] =
      ExampleParquetWriter.builder(new HPath(file))
        .withConf(new Configuration()).withType(msg).build()
    var rows = 0
    def write(vals: Array[Any]): Unit = {
      val g = factory.newGroup()
      schema.zipWithIndex.foreach { case (f, i) =>
        vals(i) match {
          case null              => ()
          case l: java.lang.Long => g.add(f.name, l.longValue)
          case n: java.lang.Integer => g.add(f.name, n.intValue)
          case s: String         => g.add(f.name, s)
          case u: UTF8String     => g.add(f.name, u.toString)
          case other => sys.error(s"RowStore: unsupported value $other")
        }
      }
      w.write(g)
      rows += 1
    }
    def close(): Unit = w.close()
  }

  /** Read one file, projected to `wanted` (null-padded for columns the
    * file predates — additive schema evolution without rewrites). The
    * result is group/bucket-sized by construction, so an eager read is
    * the honest cost model; `wanted`-empty reads touch only the footer
    * (row counts), no data pages. */
  /** Files opened across this JVM's readers (test observability — the
    * SeqSource.rowsEmitted discipline: proves the manifest-count path
    * opened NOTHING, not merely that the answer matched). */
  val filesOpened = new java.util.concurrent.atomic.AtomicLong(0L)

  def readRows(file: String, wanted: Seq[StructField]): Array[Array[Any]] = {
    filesOpened.incrementAndGet()
    val conf = new Configuration()
    val in = HadoopInputFile.fromPath(new HPath(file), conf)
    val footer = ParquetFileReader.open(in)
    val (fileSchema, rowCount) =
      try (footer.getFooter.getFileMetaData.getSchema,
        footer.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
      finally footer.close()
    val present = wanted.filter(f => fileSchema.containsField(f.name))
    if (present.isEmpty) {
      Array.fill(rowCount.toInt)(new Array[Any](wanted.length))
    } else {
      conf.set(ReadSupport.PARQUET_READ_SCHEMA, messageType(present).toString)
      val r = ParquetReader.builder(new GroupReadSupport(), new HPath(file))
        .withConf(conf).build()
      val out = Array.newBuilder[Array[Any]]
      try {
        var g = r.read()
        while (g != null) {
          out += wanted.map { f =>
            if (!fileSchema.containsField(f.name) ||
              g.getFieldRepetitionCount(f.name) == 0) null
            else f.dataType match {
              case LongType      => Long.box(g.getLong(f.name, 0))
              case TimestampType => Long.box(g.getLong(f.name, 0))
              case IntegerType   => Int.box(g.getInteger(f.name, 0))
              case StringType    => g.getString(f.name, 0)
              case other => sys.error(s"unsupported $other")
            }
          }.toArray
          g = r.read()
        }
      } finally r.close()
      out.result()
    }
  }
}

/** Group-state resolution shared by the table scan, the row-level
  * operation scans, and the change feed: base files in manifest order,
  * then delta records (MOR) replayed in commit order. Row identity is
  * `file#pos` — Iceberg's position-delete model. */
object RowResolve {
  val DeleteOp = 1
  val UpdateOp = 2
  val InsertOp = 3

  val DeltaMetaFields: Seq[StructField] = Seq(
    StructField("_op", IntegerType), StructField("_rid", StringType),
    StructField("_grp", IntegerType))

  private def leaf(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Visible (rid, values) of one group at one version. `wanted` is
    * the projected DATA columns. */
  def resolve(group: Int, baseFiles: Seq[String], deltaFiles: Seq[String],
      wanted: Seq[StructField]): Seq[(String, Array[Any])] = {
    val base = baseFiles.iterator.flatMap { f =>
      val n = leaf(f)
      RowFiles.readRows(f, wanted).iterator.zipWithIndex
        .map { case (v, i) => (s"$n#$i", v) }
    }
    if (deltaFiles.isEmpty) base.toSeq
    else {
      // LinkedHashMap keeps a row's original position across updates,
      // so resolution order is deterministic (base order + insert order)
      val m = new java.util.LinkedHashMap[String, Array[Any]]()
      base.foreach { case (rid, v) => m.put(rid, v) }
      deltaFiles.foreach { f =>
        val n = leaf(f)
        RowFiles.readRows(f, DeltaMetaFields ++ wanted).zipWithIndex.foreach {
          case (rec, i) =>
            val grp = rec(2).asInstanceOf[java.lang.Integer]
            if (grp != null && grp.intValue == group) {
              val rid = rec(1).asInstanceOf[String]
              val data = rec.drop(DeltaMetaFields.length)
              rec(0).asInstanceOf[java.lang.Integer].intValue match {
                case DeleteOp => m.remove(rid)
                case UpdateOp => if (m.containsKey(rid)) m.put(rid, data)
                case InsertOp => m.put(s"$n#$i", data)
                case other => sys.error(s"corrupt delta record op=$other")
              }
            }
        }
      }
      m.asScala.toSeq
    }
  }
}

class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catName = "graft_dml"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  /** DEFAULT column values: declaring the capability lets Spark's
    * analyzer accept `DEFAULT <expr>` in CREATE TABLE (the default
    * rides the schema's field metadata, which the meta file's schema
    * JSON round-trips) and fill omitted columns at INSERT analysis —
    * the connector's writers always see complete rows, so no storage
    * change is involved. CREATE-time defaults only: ALTER ADD COLUMN
    * with a default would need exists-default semantics in the
    * reader's null-padding path, which the catalog does not claim. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    Set(org.apache.spark.sql.connector.catalog.TableCatalogCapability
      .SUPPORT_COLUMN_DEFAULT_VALUE).asJava

  /** The `bucket` V2 function the writes' required distribution
    * resolves through (Iceberg's storage-partitioned-write shape):
    * Spark shuffles write input by bucket(numGroups, firstCol) BEFORE
    * the writers run, so each group's rows land in exactly one task —
    * one file per group per commit, at any parallelism. */
  override def listFunctions(ns: Array[String]): Array[Identifier] =
    Array.empty
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private def key(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val prefix = (catName +: ns).mkString(".") + "."
    RowStore.listTableKeys().toArray
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix))
      // only DIRECT children: a table in a nested namespace would
      // otherwise surface here under a mangled dotted name
      .filter(!_.contains("."))
      .map(Identifier.of(ns, _))
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    if (RowStore.exists(k))
      new RowTable(k, RowStore.readMeta(k), RowStore.currentVersion(k))
    else if (ident.name() == "changes" && ident.namespace().nonEmpty) {
      // Iceberg-style metadata table: `<table>.changes` reads the diff
      // between two versions (options from/to on the scan)
      val ns = ident.namespace()
      val base = key(Identifier.of(ns.dropRight(1), ns.last))
      if (RowStore.exists(base))
        new ChangesTable(base, RowStore.readMeta(base))
      else throw new NoSuchTableException(ident)
    } else if (ident.name() == "history" && ident.namespace().nonEmpty) {
      // `<table>.history` — snapshot lineage from the manifest chain
      val ns = ident.namespace()
      val base = key(Identifier.of(ns.dropRight(1), ns.last))
      if (RowStore.exists(base)) new HistoryTable(base)
      else throw new NoSuchTableException(ident)
    } else if (ident.name() == "files" && ident.namespace().nonEmpty) {
      // `<table>.files` — the current snapshot's file-level metadata
      val ns = ident.namespace()
      val base = key(Identifier.of(ns.dropRight(1), ns.last))
      if (RowStore.exists(base)) new FilesTable(base)
      else throw new NoSuchTableException(ident)
    } else throw new NoSuchTableException(ident)
  }

  /** `VERSION AS OF v` — SQL time travel: a read-only table pinned to
    * manifest v (files are immutable, so this is pure planning). The
    * SNAPSHOT-TIME schema rides the manifest's `#schema` header
    * (Iceberg/Delta's rule): after ADD/DROP COLUMN, older versions
    * keep the shape they were committed under instead of being
    * silently re-projected through the current schema. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val k = key(ident)
    if (!RowStore.exists(k)) throw new NoSuchTableException(ident)
    val v = version.toInt
    val have = RowStore.versions(k)
    require(have.contains(v), s"no version $v for $k (have $have)")
    val meta = RowStore.readMeta(k)
    new RowTable(k,
      meta.copy(schema = RowStore.versionSchema(k, v).getOrElse(meta.schema),
        renames = RowStore.versionRenames(k, v)),
      v)
  }

  /** `PARTITIONED BY (bucket(n, col))` — the Iceberg-shaped partition
    * transform: n becomes the group count and col the group key, so
    * groups, write distribution, zone maps, and file skipping all
    * follow the DECLARED layout instead of the first-column default.
    * Only `bucket` is supported: the catalog's column types are
    * INT/LONG/STRING, so the temporal transforms (`days`/`hours`)
    * have no legal input column here and fail loudly. */
  /** `TIMESTAMP AS OF t` — Spark hands MICROseconds since epoch; the
    * snapshot is the LATEST version committed at or before t
    * (Iceberg/Delta's as-of rule). Commit times are recorded in the
    * manifest header and strictly monotonic per table, so the mapping
    * is total and unambiguous; a timestamp before the first commit
    * fails loudly. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val k = key(ident)
    if (!RowStore.exists(k)) throw new NoSuchTableException(ident)
    val have = RowStore.versions(k).sorted
    val atOrBefore = have.filter(v =>
      RowStore.commitTimeMs(k, v) * 1000L <= timestampMicros)
    require(atOrBefore.nonEmpty,
      s"no snapshot of $k at or before timestamp ${timestampMicros}us " +
        s"(earliest commit: ${RowStore.commitTimeMs(k, have.head)}ms)")
    val v = atOrBefore.max
    val meta = RowStore.readMeta(k)
    new RowTable(k,
      meta.copy(schema = RowStore.versionSchema(k, v).getOrElse(meta.schema),
        renames = RowStore.versionRenames(k, v)),
      v)
  }

  /** (transform, tparam, col, numGroups) from a declared transform.
    * SQL and programmatic forms order (literal, ref) differently, so
    * each argument is picked by type. */
  private def parseSpec(name: String, args: Array[VExpression],
      schema: StructType): (String, Long, String, Int) = {
    val litArg: Option[Long] = args.collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value() match {
          case i: java.lang.Integer => i.longValue
          case l2: java.lang.Long   => l2.longValue
          case other => sys.error(s"$name: non-integer argument $other")
        }
    }
    val colArg: String = args.collectFirst { case r: NamedReference =>
      require(r.fieldNames().length == 1,
        s"$name over a nested column is not supported")
      r.fieldNames()(0)
    }.getOrElse(sys.error(s"$name transform carries no column"))
    resolveSpec(name, litArg, colArg, schema)
  }

  /** Validate + canonicalize a (transform name, literal, column) spec
    * against a schema — shared by CREATE's Transform path and ALTER's
    * `TBLPROPERTIES('partition'='…')` evolution path. */
  private def resolveSpec(name: String, litArg: Option[Long],
      colArg: String, schema: StructType): (String, Long, String, Int) = {
    val f = schema.fields.find(_.name == colArg)
      .getOrElse(sys.error(s"partition column $colArg not in schema"))
    name match {
      case "bucket" =>
        val n = litArg.getOrElse(
          sys.error("bucket transform carries no bucket count")).toInt
        require(n > 0, s"bucket(n, col): n must be positive, got $n")
        require(f.dataType == LongType || f.dataType == IntegerType ||
          f.dataType == StringType,
          s"bucket: unsupported column type ${f.dataType}")
        ("bucket", 0L, colArg, n)
      case "truncate" =>
        val w = litArg.getOrElse(
          sys.error("truncate transform carries no width"))
        require(w > 0, s"truncate(w, col): w must be positive, got $w")
        require(f.dataType == LongType || f.dataType == IntegerType,
          s"truncate: unsupported column type ${f.dataType} (integer only)")
        ("truncate", w, colArg, 0)
      case t @ ("days" | "hours" | "months" | "years") =>
        require(f.dataType == TimestampType,
          s"$t: column $colArg must be TIMESTAMP, got ${f.dataType}")
        (t, 0L, colArg, 0)
      case "identity" =>
        require(f.dataType == LongType || f.dataType == IntegerType,
          s"identity: unsupported column type ${f.dataType} (integer only)")
        ("identity", 0L, colArg, 0)
      case other => sys.error(
        s"unsupported partition transform $other — PARTITIONED BY (col) " +
          "/ bucket(n, col) / truncate(w, col) / " +
          "days|hours|months|years(ts) are supported")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.length <= 1,
      "RowStore tables take at most one partition transform")
    schema.fieldNames.foreach(n => require(!RowStore.Reserved(n),
      s"column name $n is reserved"))
    val spec: Option[(String, Long, String, Int)] = partitions.headOption
      .map(t => parseSpec(t.name(), t.arguments(), schema))
    val k = key(ident)
    val numGroups = spec.map(_._4).filter(_ > 0)
      .orElse(Option(properties.get("groups")).map(_.toInt)).getOrElse(4)
    val mor = Option(properties.get("format")).contains("mor")
    require(!mor || spec.forall(_._1 == "bucket"),
      "merge-on-read tables support only the bucket transform (delta " +
        "records can target any group; an unbounded group space cannot " +
        "be planned ahead)")
    RowStore.writeMeta(k, RowStore.Meta(schema, numGroups, mor,
      spec.map(_._3).getOrElse(""),
      transform = spec.map(_._1).getOrElse("bucket"),
      tparam = spec.map(_._2).getOrElse(0L)))
    RowStore.writeManifest(k, 0, Seq.empty) // v0 = empty table at CREATE
    new RowTable(k, RowStore.readMeta(k), 0)
  }

  /** Schema evolution, additive form (the lake-format default): ADD
    * COLUMN rewrites ONLY the schema file — no data files move; old
    * files (and therefore old `VERSION AS OF` reads) surface NULL for
    * the new column via read-time padding. */
  /** Partition-spec EVOLUTION (Iceberg's `REPLACE PARTITION FIELD`
    * shape, surfaced through the one ALTER hook Spark SQL gives a
    * custom catalog): `ALTER TABLE t SET TBLPROPERTIES('partition' =
    * 'truncate(1000, k)')` — bumps the spec id, so files already
    * written KEEP their old group layout (the scan plans across both)
    * while every subsequent write routes by the new transform. MOR
    * tables refuse (delta records can't span spec layouts); row-level
    * ops refuse until the table is migrated (INSERT OVERWRITE). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val k = key(ident)
    RowStore.commitLock.synchronized {
      if (!RowStore.exists(k)) throw new NoSuchTableException(ident)
      val meta = RowStore.readMeta(k)
      val (specChanges, colChanges) = changes.partition {
        case p: TableChange.SetProperty => p.property() == "partition"
        case _ => false
      }
      require(specChanges.size <= 1,
        "at most one partition evolution per ALTER statement")
      var droppedNow = Seq.empty[String]
      var renamesNow = meta.renames
      var pcolNow = meta.bucketCol
      val newSchema = colChanges.foldLeft(meta.schema) {
        case (sch, add: TableChange.AddColumn) =>
          require(add.fieldNames().length == 1,
            "nested ADD COLUMN not supported")
          require(!RowStore.Reserved(add.fieldNames()(0)),
            s"column name ${add.fieldNames()(0)} is reserved")
          // no field-id indirection: retained files still CONTAIN a
          // dropped column's values under its name, and readers
          // project by name — re-adding the name would resurrect them
          // (or crash on a type change) instead of NULL-padding
          require(!meta.dropped.contains(add.fieldNames()(0)) &&
            !droppedNow.contains(add.fieldNames()(0)),
            s"cannot re-add previously dropped column " +
              s"${add.fieldNames()(0)}: retained files still carry its " +
              "old values under that name")
          // ditto for a name files store ANOTHER column's values under
          // (the renamed-away display name of a live column)
          require(!sch.fieldNames.exists(n =>
            renamesNow.getOrElse(n, n) == add.fieldNames()(0)),
            s"cannot add column ${add.fieldNames()(0)}: retained files " +
              "store another column's values under that name")
          // defaults resolve at CREATE time only: the capability makes
          // the analyzer route ADD COLUMN ... DEFAULT here, and storing
          // the field without its CURRENT_DEFAULT metadata would fill
          // NULL where the user asked for the default — refuse loudly
          require(add.defaultValue() == null,
            s"ADD COLUMN ${add.fieldNames()(0)} DEFAULT is not " +
              "supported: this catalog resolves DEFAULT at CREATE " +
              "TABLE time only")
          StructType(sch.fields :+
            StructField(add.fieldNames()(0), add.dataType(), nullable = true))
        // DROP COLUMN, the other metadata-only evolution: files are
        // untouched (readers project by NAME, so a dropped column's
        // bytes simply stop being read — Iceberg's lazy-delete
        // economics). The group-key column can never drop: grouping,
        // zone maps, and the write distribution all route through it.
        case (sch, del: TableChange.DeleteColumn) =>
          require(del.fieldNames().length == 1,
            "nested DROP COLUMN not supported")
          val name = del.fieldNames()(0)
          require(sch.fieldNames.contains(name),
            s"cannot drop missing column $name")
          require(name != meta.keyCol,
            s"cannot drop the group-key column ${meta.keyCol}")
          // blacklist the STORAGE name — that's what retained files
          // carry the values under (== display name unless renamed)
          droppedNow = droppedNow :+ renamesNow.getOrElse(name, name)
          renamesNow = renamesNow - name
          StructType(sch.fields.filterNot(_.name == name))
        // RENAME COLUMN — metadata-only (Iceberg's rename): files keep
        // their written name; the display→storage mapping bridges.
        case (sch, ren: TableChange.RenameColumn) =>
          require(!meta.mor, "RENAME COLUMN is not supported for " +
            "merge-on-read tables (delta records are projected by " +
            "written name)")
          require(ren.fieldNames().length == 1,
            "nested RENAME COLUMN not supported")
          val from = ren.fieldNames()(0)
          val to = ren.newName()
          require(sch.fieldNames.contains(from),
            s"cannot rename missing column $from")
          require(!sch.fieldNames.contains(to),
            s"cannot rename $from to $to: column $to already exists")
          RowStore.validateColName(to)
          require(!RowStore.Reserved(to), s"column name $to is reserved")
          require(!meta.dropped.contains(to) && !droppedNow.contains(to),
            s"cannot rename to previously dropped name $to: retained " +
              "files still carry its old values")
          // another live column's storage name is equally off-limits
          require(!sch.fieldNames.filter(_ != from).exists(n =>
            renamesNow.getOrElse(n, n) == to),
            s"cannot rename $from to $to: retained files store another " +
              "column's values under that name")
          val storage = renamesNow.getOrElse(from, from)
          renamesNow = renamesNow - from
          if (to != storage) renamesNow = renamesNow + (to -> storage)
          if (pcolNow == from) pcolNow = to
          StructType(sch.fields.map(f =>
            if (f.name == from) f.copy(name = to) else f))
        case (_, other) => throw new UnsupportedOperationException(
          s"unsupported table change: $other")
      }
      require(newSchema.nonEmpty, "cannot drop every column")
      var m2 = meta.copy(schema = newSchema,
        dropped = meta.dropped ++ droppedNow,
        renames = renamesNow, bucketCol = pcolNow)
      specChanges.headOption.foreach { case p: TableChange.SetProperty =>
        require(!meta.mor, "partition-spec evolution is not supported " +
          "for merge-on-read tables (delta records cannot span spec " +
          "layouts)")
        val (name, lit, col) = parsePartitionProperty(p.value())
        val (tf, w, c, n) = resolveSpec(name, lit, col, m2.schema)
        m2 = m2.copy(bucketCol = c, transform = tf, tparam = w,
          numGroups = if (n > 0) n else m2.numGroups,
          specId = m2.specId + 1)
      }
      RowStore.writeMeta(k, m2)
      // schema/spec evolution COMMITS a version (same file entries,
      // new `#schema` header): time travel to any pre-ALTER version
      // keeps the old shape, the new head pins the new one. Without
      // this, the evolution would be invisible to the manifest chain
      // and historical reads would silently re-project through
      // whatever schema is current.
      val cur = RowStore.currentVersion(k)
      RowStore.writeManifest(k, cur + 1, RowStore.readManifest(k, cur))
      new RowTable(k, RowStore.readMeta(k), cur + 1)
    }
  }

  /** `'partition'='bucket(4, k)' | 'truncate(1000, k)' | 'days(ts)'`
    * → (transform name, integer literal, column). The integer and
    * column argument may come in either order (Iceberg writes
    * truncate(col, w), Spark DDL bucket(n, col)). */
  private def parsePartitionProperty(v: String): (String, Option[Long], String) = {
    val m = java.util.regex.Pattern
      .compile("""\s*(\w+)\s*\(\s*([^)]*)\s*\)\s*""").matcher(v)
    require(m.matches(), s"cannot parse partition spec '$v' — expected " +
      "transform(args), e.g. bucket(4, k) / truncate(1000, k) / days(ts)")
    val name = m.group(1)
    val parts = m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
    require(parts.nonEmpty && parts.length <= 2,
      s"partition spec '$v' takes one or two arguments")
    val (lits, cols) = parts.partition(_.forall(_.isDigit))
    require(cols.length == 1,
      s"partition spec '$v' must name exactly one column")
    (name, lits.headOption.map(_.toLong), cols.head)
  }

  override def dropTable(ident: Identifier): Boolean =
    RowStore.drop(key(ident))

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

/** `bucket(numBuckets, col)` bound to the SAME hash the writers use
  * ([[RowStore.groupOf]]) — the distribution's clustering and the
  * files' grouping provably agree. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): the row-group hash of the DML catalog"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (numBuckets, col), got $inputType")
    val colType = inputType.fields(1).dataType
    require(colType == LongType || colType == IntegerType ||
      colType == StringType, s"bucket: unsupported column type $colType")
    new ScalarFunction[Int] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, colType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket($colType)"
      override def produceResult(input: InternalRow): Int = {
        val n = input.getInt(0)
        val v: Any =
          if (input.isNullAt(1)) null
          else colType match {
            case LongType    => Long.box(input.getLong(1))
            case IntegerType => Int.box(input.getInt(1))
            case StringType  => input.getUTF8String(1)
          }
        RowStore.groupOf(v, n)
      }
    }
  }
}

/** The `_group` / `_rid` metadata columns every scan can surface —
  * what the row-level rewrites read via requiredMetadataAttributes /
  * rowId, exactly Iceberg's `_file`/`_pos` shape. */
private object GroupMetaCol extends MetadataColumn {
  override def name(): String = "_group"
  override def dataType(): DataType = IntegerType
  override def isNullable: Boolean = false
}
private object RidMetaCol extends MetadataColumn {
  override def name(): String = "_rid"
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
}

class RowTable(tableKey: String, meta: RowStore.Meta, version: Int)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2 {
  override def name(): String = tableKey
  override def schema(): StructType = meta.schema

  /** Metadata delete for the UNCONDITIONAL case only: `DELETE FROM t`
    * (no WHERE, or one folded to true) optimizes the row-level
    * rewrite's scan into an empty relation — the scan is never
    * planned, and the COW commit (correctly) refuses a rewrite with
    * no planned scan. Spark's OptimizeMetadataOnlyDeleteFromTable
    * asks here FIRST: a truncate is a pure manifest swap (new empty
    * version, files retained for time travel / VACUUM — Iceberg's
    * truncate semantics). Any real predicate declines and takes the
    * rewrite path. */
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    predicates.isEmpty || predicates.forall(_.name() == "ALWAYS_TRUE")
  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    RowStore.commitLock.synchronized {
      val cur = RowStore.currentVersion(tableKey)
      RowStore.writeManifest(tableKey, cur + 1, Seq.empty)
    }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE).asJava
  override def metadataColumns(): Array[MetadataColumn] =
    Array(GroupMetaCol, RidMetaCol)
  /** Surface the declared layout (DESCRIBE, storage-partitioned-join
    * eligibility): the ACTIVE spec's transform — bucket by the
    * declared (or default first) column, or the temporal/range
    * transform when one was declared. */
  override def partitioning(): Array[Transform] = meta.transform match {
    case "days"     => Array(Expressions.days(meta.keyCol))
    case "hours"    => Array(Expressions.hours(meta.keyCol))
    case "months"   => Array(Expressions.months(meta.keyCol))
    case "years"    => Array(Expressions.years(meta.keyCol))
    case "identity" => Array(Expressions.identity(meta.keyCol))
    case "truncate" => Array(Expressions.apply("truncate",
      Expressions.literal(meta.tparam), Expressions.column(meta.keyCol)))
    case _          => Array(Expressions.bucket(meta.numGroups, meta.keyCol))
  }

  /** Read option `groups=g1,g2,…` (or `compact=…`, the one-option
    * OPTIMIZE handshake) statically restricts the scan to those groups
    * — the compaction read path: only dirty groups are read, so only
    * dirty groups are rewritten. The SAME `compact` key drives both
    * the read restriction and the write's manifest swap because
    * Spark's V2Writes asserts the (deduplicated) relation options and
    * the write options agree — two different keys on the same table
    * trip it. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GroupScanBuilder(tableKey, meta, version, None,
      Option(options.get("groups"))
        .map(_.split(",").map(_.trim.toInt).toSet)
        .orElse(Option(options.get("compact"))
          .map(v => GroupWrite.parseCompact(v)._2)),
      // streaming start version (readStream.option("from", v))
      streamFrom = Option(options.get("from")).map(_.toInt).getOrElse(0),
      // `branch=<name>` reads the STAGED snapshot (WAP audit read)
      branch = Option(options.get("branch")))

  /** INSERT INTO path: append; INSERT OVERWRITE arrives as
    * `truncate()` on the same builder and flips it to replace-all.
    * Write option `compact=g1,g2,…` commits the incoming files as the
    * REPLACEMENT of exactly those groups' base+delta entries (the
    * OPTIMIZE swap — see [[RowStoreOps.compact]]). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    Option(info.options().get("compact"))
      .map(GroupWrite.parseCompact) match {
      case Some((base, gs)) =>
        new GroupWrite(tableKey, meta, info.schema(),
          GroupWrite.Compact(base, gs))
      case None =>
        Option(info.options().get("branch")) match {
          // write option `branch=<name>`: the append STAGES into the
          // named branch (WAP) — files land on disk, but no table
          // version commits until publishBranch
          case Some(b) => new GroupWrite(tableKey, meta, info.schema(),
            GroupWrite.StageBranch(b))
          case None => new GroupWrite(tableKey, meta, info.schema(),
            GroupWrite.Append, Option(info.queryId()).getOrElse(""))
        }
    }

  /** MERGE/UPDATE/DELETE: Spark rewrites the statement against this
    * operation's builders — copy-on-write group replacement by
    * default, delta (merge-on-read) when the table was created with
    * 'format'='mor'. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (meta.mor) () => new DeltaRowLevelOp(tableKey, meta, info.command())
    else () => new GroupRowLevelOp(tableKey, meta, info.command())
}

/** Copy-on-write row-level operation: its scan records which groups
  * survived runtime group filtering; its write replaces EXACTLY those
  * groups' files at commit. The scan↔write handshake rides this
  * object — the same contract Iceberg's copy-on-write scan/write pair
  * uses. */
class GroupRowLevelOp(tableKey: String, meta: RowStore.Meta,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  /** Groups the operation's (possibly runtime-pruned) scan planned;
    * None = scan never planned (plan dropped) → replace nothing. */
  @volatile private[sources] var scannedGroups: Option[Set[Int]] = None
  /** Version the operation's scan read — the optimistic-concurrency
    * base: commit refuses if another commit advanced the table past
    * it (the rewrite would silently drop that commit's changes). */
  @volatile private[sources] var baseVersion: Option[Int] = None

  override def command(): RowLevelOperation.Command = cmd
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_group"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = RowStore.currentVersion(tableKey)
    baseVersion = Some(v)
    new GroupScanBuilder(tableKey, meta, v, Some(this))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GroupWrite(tableKey, meta, info.schema(),
      GroupWrite.ReplaceGroups(this))
}

class GroupScanBuilder(tableKey: String, meta: RowStore.Meta, version: Int,
    op: Option[GroupRowLevelOp], staticGroups: Option[Set[Int]] = None,
    streamFrom: Int = 0, branch: Option[String] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources.{EqualTo => SEq, Filter => SFilter, GreaterThan => SGt, GreaterThanOrEqual => SGe, In => SIn, LessThan => SLt, LessThanOrEqual => SLe}

  // ── COUNT(*)/MIN(key)/MAX(key) from manifest metadata (Iceberg's
  // snapshot-summary answer): every base file records its exact row
  // count and the key column's [min, max] at commit, so an unfiltered
  // count — and, for a LONG key column, the key's global extrema —
  // of a CLEAN snapshot is a plan-time fold over the manifest: zero
  // files opened. Engages ONLY when provably exact: no delta files at
  // this version (deltas add/remove/move rows at read time), no
  // static group restriction (the compact handshake), no row-level
  // operation scan, no branch read, single partition spec (a retired
  // spec's stats were computed on ITS key column), and every entry
  // carries the needed stat (a legacy/statless entry refuses). Any
  // WHERE leaves residual filters, which blocks aggregate pushdown in
  // Spark's own rule — so a filtered aggregate never reaches this
  // path.
  private var aggPushed = false
  private var pushedValues: Seq[Long] = Seq.empty

  // one manifest read per scan build: the (tableKey, version) manifest
  // is immutable, and supportCompletePushDown/pushAggregation/build
  // would otherwise each re-read it
  private lazy val manifestEntries: Seq[RowStore.FileEntry] =
    RowStore.readManifest(tableKey, version)

  private lazy val manifestCount: Option[Long] = {
    val es = manifestEntries
    if (es.exists(_.kind == "delta") || es.exists(_.rows.isEmpty)) None
    else Some(es.map(_.rows.get).sum)
  }

  /** Key extrema from per-file zone maps — defined only when every
    * base file carries stats on the ACTIVE spec's (LONG) key column
    * and the fold is over at least one file (the empty case must
    * return SQL NULL, which declining the pushdown handles for us). */
  private lazy val manifestMinMax: Option[(Long, Long)] = {
    val es = manifestEntries
    val base = es.filter(_.kind == "base")
    val keyIsLong =
      meta.schema.fields.find(_.name == meta.keyCol).exists(_.dataType == LongType)
    if (es.exists(_.kind == "delta") || base.isEmpty || !keyIsLong ||
      base.exists(e => e.minK.isEmpty || e.spec != meta.specId)) None
    else Some((base.flatMap(_.minK).min, base.flatMap(_.maxK).max))
  }

  private def keyColRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames().sameElements(Array(meta.keyCol))
      case _ => false
    }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = pushAggregationCheck(agg)

  private def pushAggregationCheck(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    op.isEmpty && staticGroups.isEmpty && branch.isEmpty &&
      agg.groupByExpressions.isEmpty &&
      // nonEmpty matters: a count-over-count query collapses to an
      // EMPTY aggregation (0 output columns, 1 row) that a vacuous
      // forall would accept and then answer with the wrong arity
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => manifestCount.isDefined
        case m: Min => keyColRef(m.column) && manifestMinMax.isDefined
        case m: Max => keyColRef(m.column) && manifestMinMax.isDefined
        case _ => false
      }
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    aggPushed = pushAggregationCheck(agg)
    if (aggPushed) pushedValues = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => manifestCount.get
      case _: Min       => manifestMinMax.get._1
      case _: Max       => manifestMinMax.get._2
      case other => sys.error(s"unreachable pushed agg $other")
    }
    aggPushed
  }

  // default = full data schema; Spark prunes to referenced data +
  // metadata columns (so the parquet reads project, and a COUNT(*)
  // scan reads only footers)
  private var required: StructType = meta.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** FILE SKIPPING (zone maps): range predicates on the FIRST column
    * narrow a [lo, hi] window the scan checks against each base
    * file's manifest stats. CONSERVATIVE on every axis: all filters
    * come back as residuals (Spark re-evaluates them — a skipping bug
    * can cost performance, never correctness), non-numeric and
    * unrecognized shapes are ignored, and the scan only ever skips
    * clean groups on plain reads (see planInputPartitions). */
  private var keyLo = Long.MinValue
  private var keyHi = Long.MaxValue
  private var accepted: Array[SFilter] = Array.empty

  private def narrow(lo: Long, hi: Long): Unit = {
    keyLo = math.max(keyLo, lo); keyHi = math.min(keyHi, hi)
  }
  /** Pushed-filter literal → the key's internal long form. TIMESTAMP
    * literals arrive as java.sql/java.time values (by the session's
    * java8API setting), never as raw micros — converting them is what
    * makes day-range predicates on a `days(ts)` table prune files and
    * groups at all. */
  private def num(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case t: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case _ => None
  }

  override def pushFilters(filters: Array[SFilter]): Array[SFilter] = {
    val k = meta.keyCol
    accepted = filters.filter {
      case SEq(`k`, v) => num(v).exists { x => narrow(x, x); true }
      case SGt(`k`, v) => num(v).exists { x => narrow(x + 1, Long.MaxValue); true }
      case SGe(`k`, v) => num(v).exists { x => narrow(x, Long.MaxValue); true }
      case SLt(`k`, v) => num(v).exists { x => narrow(Long.MinValue, x - 1); true }
      case SLe(`k`, v) => num(v).exists { x => narrow(Long.MinValue, x); true }
      case SIn(`k`, vs) if vs.nonEmpty && vs.forall(num(_).isDefined) =>
        val xs = vs.flatMap(num); narrow(xs.min, xs.max); true
      case _ => false
    }
    filters // everything is residual
  }
  override def pushedFilters(): Array[SFilter] = accepted

  override def build(): Scan =
    if (aggPushed) new ManifestAggScan(pushedValues)
    else new GroupScan(tableKey, meta, version,
    required, op, staticGroups,
    if (keyLo == Long.MinValue && keyHi == Long.MaxValue) None
    else Some((keyLo, keyHi)), streamFrom, branch)
}

/** Manifest-planned scan: one partition per surviving group, carrying
  * that group's base files (+ the table's delta files for MOR). With a
  * row-level operation attached it implements runtime group filtering:
  * Spark evaluates the DML condition first and hands back
  * `In(_group, …)`, and only those groups are planned — and therefore
  * only those groups are rewritten. */
class GroupScan(tableKey: String, meta: RowStore.Meta, version: Int,
    required: StructType, op: Option[GroupRowLevelOp],
    staticGroups: Option[Set[Int]] = None,
    keyRange: Option[(Long, Long)] = None,
    streamFrom: Int = 0, branch: Option[String] = None)
    extends Scan with Batch with SupportsRuntimeV2Filtering
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The (tableKey, version) manifest is immutable, and Spark calls
    * outputPartitioning/estimateStatistics/planInputPartitions
    * repeatedly per scan while planning a multi-join query — read and
    * parse it once per scan instance. */
  private lazy val versionEntries: Seq[RowStore.FileEntry] =
    RowStore.readManifest(tableKey, version)

  /** STORAGE-PARTITIONED JOIN eligibility: a plain read of a clean
    * single-spec bucket table reports KeyGroupedPartitioning over the
    * SAME `bucket(n, key)` V2 function the writers cluster by — so two
    * co-bucketed catalog tables JOIN WITH ZERO SHUFFLE under
    * `spark.sql.sources.v2.bucketing.enabled` (SPARK-37375, Iceberg's
    * SPJ). Guarded to exactly the cases where one partition == one
    * bucket: no row-level op scan, no compact restriction, no branch,
    * bucket transform, and every file on the active spec (after an
    * evolution two partitions can share a group NUMBER — not a valid
    * key grouping). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val singleSpecBucket = meta.transform == "bucket" &&
      op.isEmpty && staticGroups.isEmpty && branch.isEmpty &&
      versionEntries.forall(_.spec == meta.specId)
    if (singleSpecBucket)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(Expressions.bucket(meta.numGroups, meta.keyCol)),
          meta.numGroups)
    else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(0)
  }

  /** Manifest-derived size estimate — what lets Catalyst's join
    * planning AUTO-BROADCAST a small catalog table (without it, a DSv2
    * scan defaults to "unknown = huge" and a dimension-sized DML table
    * always shuffle-joins). Sum of this version's on-disk file sizes:
    * an UNDERestimate of row-format in-memory size, but parquet
    * encodes denser than runtime rows by less than the 10 MB default
    * threshold's safety margin; estimates feed planning only, never
    * correctness. */
  private lazy val cachedStats: Statistics = {
    val dir = RowStore.dataDir(tableKey)
    val bytes = versionEntries
      .map(e => new java.io.File(s"$dir/${e.name}").length()).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def estimateStatistics(): Statistics = cachedStats

  private var groupKeep: Option[Set[Int]] = None

  /** Runtime-filterable on `_group` — but ONLY when this scan actually
    * outputs it (the row-level operation scans, which read it via
    * requiredMetadataAttributes). Advertising an attribute the plan
    * can't resolve would break UNRELATED joins against this table
    * (e.g. a MERGE whose source is another catalog table). */
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains("_group"))
      Array(Expressions.column("_group"))
    else Array.empty

  /** Streaming read of the TABLE (Delta's `readStream.table` shape):
    * offset = committed version, one version per micro-batch, each
    * batch the files that commit ADDED. Sound only for APPEND-ONLY
    * history — a commit that replaced/removed files (DML, OPTIMIZE,
    * INSERT OVERWRITE) or wrote deltas fails loudly at plan time
    * instead of silently re-emitting or dropping rows. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // the stream plans from the COMMITTED manifest chain; silently
    // serving it for a branch read would hand the WAP auditor data
    // that excludes everything staged on the branch
    require(branch.isEmpty,
      s"$tableKey: streaming reads of a WAP branch are not supported " +
        "— audit a staged branch with a batch read")
    new AppendTableStream(tableKey, meta, streamFrom,
      createReaderFactory())
  }

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      parseGroupPredicate(p).foreach { ks =>
        groupKeep = Some(groupKeep.fold(ks)(_ intersect ks))
      }
    }

  /** `IN(_group, ints…)` / `=(_group, int)` → the kept-group set; any
    * other shape (or any non-int literal) is IGNORED — under-pruning
    * is sound (the operation re-applies its own condition), silently
    * dropping a value would over-prune. */
  private def parseGroupPredicate(p: Predicate): Option[Set[Int]] = {
    import org.apache.spark.sql.connector.expressions.{Literal => VLit}
    val ch = p.children()
    val onGroup = ch.headOption.exists {
      case r: NamedReference => r.fieldNames().sameElements(Array("_group"))
      case _ => false
    }
    if (!onGroup || (p.name() != "IN" && p.name() != "=")) None
    else {
      val vals = ch.drop(1).map {
        case l: VLit[_] => l.value() match {
          case i: java.lang.Integer => Some(i.intValue)
          case _ => None
        }
        case _ => None
      }
      if (vals.exists(_.isEmpty)) None else Some(vals.flatten.toSet)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // a branch read plans from the STAGED manifest (WAP audit); all
    // other machinery is identical — staged entries are ordinary
    // immutable files the branch commit added
    val entries = branch match {
      case Some(b) => RowStore.readBranchManifest(tableKey, b)._2
      case None    => versionEntries
    }
    val baseEntries = entries.filter(_.kind == "base")
    val deltas = entries.filter(_.kind == "delta")
    val dir = RowStore.dataDir(tableKey)
    // SPEC EVOLUTION boundary: files written under a retired partition
    // spec keep their original group layout; a plain read plans across
    // every spec. Rewriting machinery stays on the ACTIVE spec only —
    // group numbers are not comparable across specs, so row-level ops,
    // the OPTIMIZE handshake, and MOR deltas refuse loudly until the
    // table is migrated (INSERT OVERWRITE rewrites everything under
    // the active spec).
    val multiSpec = entries.exists(_.spec != meta.specId)
    if (multiSpec) {
      require(op.isEmpty,
        s"$tableKey: row-level operations on a table whose files span " +
          "partition specs are not supported — migrate with INSERT " +
          "OVERWRITE onto the active spec first")
      require(staticGroups.isEmpty,
        s"$tableKey: OPTIMIZE across partition specs is not supported")
      require(deltas.isEmpty,
        s"$tableKey: delta files across partition specs are not supported")
    }
    // partition identity = (spec, group): after an evolution two files
    // can share a group NUMBER while meaning different row sets
    // (bucket 3 vs epoch-day 3). The active spec plans EVERY bucket
    // group (bounded space; MOR delta inserts may target a group with
    // no base file yet); unbounded transforms (days/truncate) plan
    // only groups the manifest observed — an unobserved group has no
    // rows, so nothing is lost.
    val observed = baseEntries.map(e => (e.spec, e.group)).distinct
    val active: Seq[(Int, Int)] =
      if (meta.transform == "bucket")
        (0 until meta.numGroups).map(g => (meta.specId, g))
      else Seq.empty
    // PARTITION PRUNING for the monotonic transforms (truncate/days/
    // hours/months/years — NOT bucket): group g only holds rows whose
    // transform value IS g, so a pushed key range [lo, hi] bounds the
    // reachable groups to [T(lo), T(hi)] regardless of file stats
    // (covers statless files too — this is the time-series lake
    // table's day-range scan). Only ACTIVE-spec groups prune: a
    // retired spec's group numbers mean a different layout.
    // each side saturates to its OPEN bound when the range is
    // one-sided (the Long.MinValue/MaxValue sentinels — transforming
    // those would wrap Int and silently plan zero groups) or when the
    // literal falls outside the transform's group space (identity/
    // truncate throw there) — under-prune, never wrap or throw; the
    // residual filter re-checks rows regardless
    val groupRange: Option[(Int, Int)] =
      keyRange.filter(_ => meta.transform != "bucket").map {
        case (lo, hi) =>
          def side(v: Long, open: Int): Int =
            if (v == Long.MinValue || v == Long.MaxValue) open
            else try RowStore.partValueOf(meta.transform, meta.tparam,
              meta.numGroups, Long.box(v))
            catch { case scala.util.control.NonFatal(_) => open }
          (side(lo, Int.MinValue), side(hi, Int.MaxValue))
      }
    val kept = (observed ++ active).distinct.sorted
      .filter { case (sp, g) => groupKeep.forall(_.contains(g)) &&
        staticGroups.forall(_.contains(g)) &&
        groupRange.forall { case (glo, ghi) =>
          sp != meta.specId || (g >= glo && g <= ghi) } }
    // the COW write replaces exactly what this plan read
    op.foreach(_.scannedGroups = Some(kept.map(_._2).toSet))
    var planned, skipped = 0
    val parts = kept.map { case (sp, g) =>
      val groupDeltas = deltas.filter(e => e.group == g || e.group < 0)
      val base = baseEntries.filter(e => e.spec == sp && e.group == g)
      // FILE SKIPPING by manifest stats — only when provably sound:
      // plain reads (a COW rewrite replaces whole groups with what it
      // read, so a skipped file's rows would vanish) of CLEAN groups
      // (an update delta can move a row's key outside its base file's
      // stats). Statically-restricted scans (the OPTIMIZE handshake
      // read, whose output REPLACES the group wholesale) never skip
      // either — a filtered compact read would silently drop skipped
      // files' rows from the rewritten group. Files from a RETIRED
      // spec never skip: their stats were computed on that spec's key
      // column, which the pushed range may not refer to. Statless
      // files never skip.
      val visible =
        if (op.nonEmpty || staticGroups.nonEmpty || groupDeltas.nonEmpty ||
          keyRange.isEmpty || sp != meta.specId) base
        else base.filter(e => (e.minK, e.maxK) match {
          case (Some(mn), Some(mx)) =>
            val (lo, hi) = keyRange.get
            mx >= lo && mn <= hi
          case _ => true
        })
      planned += visible.size
      skipped += base.size - visible.size
      GroupFilesPartition(g, visible.map(e => s"$dir/${e.name}"),
        // group-tagged delta files: only this group's records can be
        // inside (records re-check, so an untagged file stays sound)
        groupDeltas.map(e => s"$dir/${e.name}")): InputPartition
    }.toArray
    RowStore.lastPlannedBaseFiles.set(planned)
    RowStore.lastSkippedBaseFiles.set(skipped)
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GroupReaderFactory(required, meta.schema, meta.renames)
}

case class GroupFilesPartition(group: Int, baseFiles: Seq[String],
    deltaFiles: Seq[String]) extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  /** The partition's bucket value — must type-match the reported
    * KeyGroupedPartitioning expression's result (bucket → INT). */
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](group))
}

/** One-row scan answering completely-pushed manifest-metadata
  * aggregates (COUNT(*) / MIN(key) / MAX(key)) — no data file is ever
  * opened. One LONG column per pushed aggregate, in pushdown order. */
class ManifestAggScan(values: Seq[Long]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    values.indices.map(i => StructField(s"agg_$i", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GroupFilesPartition(0, Seq.empty, Seq.empty))
  override def createReaderFactory(): PartitionReaderFactory = {
    val vs = values.toArray
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow =
            new GenericInternalRow(vs.map(Long.box).toArray[Any])
          override def close(): Unit = ()
        }
    }
  }
}

class GroupReaderFactory(required: StructType, dataSchema: StructType,
    renames: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GroupFilesPartition]
    val dataNames = dataSchema.fieldNames.toSet
    val wanted = required.fields.filter(f => dataNames(f.name)).toSeq
    val wantedIdx = wanted.map(_.name).zipWithIndex.toMap
    // files store a renamed column under its STORAGE name — project by
    // that, emit under the display name (same positions)
    val wantedStorage = wanted.map(f =>
      f.copy(name = renames.getOrElse(f.name, f.name)))
    val rows = RowResolve.resolve(part.group, part.baseFiles,
      part.deltaFiles, wantedStorage)
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: (String, Array[Any]) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(
        required.fields.map { f =>
          f.name match {
            case "_group" => Int.box(part.group)
            case "_rid"   => UTF8String.fromString(cur._1)
            case n => cur._2(wantedIdx(n)) match {
              case s: String => UTF8String.fromString(s)
              case v         => v
            }
          }
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

/** Batch write: executors bucket rows by the first-column hash and
  * write one parquet file per (task, non-empty group); commit messages
  * carry FILE METADATA only (name/group/rowcount — never rows), and the
  * driver swaps the manifest. Modes: append (INSERT), overwrite
  * (INSERT OVERWRITE via truncate()), replace-groups (the COW swap). */
object GroupWrite {
  sealed trait Mode extends Serializable
  case object Append extends Mode
  case object Overwrite extends Mode
  case class ReplaceGroups(op: GroupRowLevelOp) extends Mode
  /** WAP staging: the append lands in branch `name`'s manifest, not
    * the committed chain. */
  case class StageBranch(name: String) extends Mode
  /** OPTIMIZE: the incoming files replace EXACTLY these groups'
    * base+delta entries — a group that resolved to zero visible rows
    * writes no file but still sheds its old entries. `base` is the
    * version the compaction read, for the OCC commit check. */
  case class Compact(base: Int, groups: Set[Int]) extends Mode

  /** Option value codec for the compact handshake: `<ver>:<g1>,<g2>`. */
  def parseCompact(v: String): (Int, Set[Int]) = {
    val Array(ver, gs) = v.split(":", 2)
    (ver.toInt, gs.split(",").map(_.trim.toInt).toSet)
  }
}

class GroupWrite(tableKey: String, meta: RowStore.Meta,
    writeSchema: StructType, mode: GroupWrite.Mode,
    queryId: String = "")
    extends WriteBuilder with Write with BatchWrite with SupportsTruncate
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def truncate(): WriteBuilder = {
    require(!mode.isInstanceOf[GroupWrite.StageBranch],
      s"$tableKey: INSERT OVERWRITE into a branch is not supported — " +
        "branches stage appends only (WAP)")
    new GroupWrite(tableKey, meta, writeSchema, GroupWrite.Overwrite, queryId)
  }

  // storage-aligned write: cluster incoming rows by the group hash so
  // each group is written by exactly one task — one file per touched
  // group per commit instead of (tasks × groups) fragments. Temporal/
  // range transforms cluster by the raw column (equal values co-locate
  // ⊆ equal partition values; Spark resolves identity natively, no V2
  // function needed) — a group may then span tasks, which the
  // one-file-per-(task, group) model already allows.
  override def requiredDistribution(): Distribution = meta.transform match {
    case "bucket" => Distributions.clustered(Array[VExpression](
      Expressions.bucket(meta.numGroups, meta.keyCol)))
    case _ => Distributions.clustered(Array[VExpression](
      Expressions.identity(meta.keyCol)))
  }
  override def requiredOrdering(): Array[SortOrder] = Array.empty

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GroupWriterFactory(RowStore.dataDir(tableKey), writeSchema,
      meta.keyCol, meta.numGroups, meta.transform, meta.tparam,
      meta.renames)

  /** `writeStream.toTable` — the native streaming APPEND (Delta's
    * shape): each epoch commits one manifest version, and a
    * RE-DELIVERED epoch (post-failure replay of a batch whose commit
    * already landed) is recognized from the recorded high-water mark
    * and skipped — files written by the replay are simply never
    * referenced, which is exactly how manifest-based exactly-once
    * works. Append-only: OVERWRITE/complete modes refuse at plan. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(mode == GroupWrite.Append,
      s"streaming writes into $tableKey are append-only (got $mode)")
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
        new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
          private val inner = new GroupWriterFactory(
            RowStore.dataDir(tableKey), writeSchema, meta.keyCol,
            meta.numGroups, meta.transform, meta.tparam, meta.renames)
          override def createWriter(partitionId: Int, taskId: Long,
              epochId: Long): DataWriter[InternalRow] =
            inner.createWriter(partitionId, taskId)
        }
      override def commit(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit =
        RowStore.commitLock.synchronized {
          require(queryId.nonEmpty,
            s"$tableKey: streaming write without a query id")
          if (epochId > RowStore.lastStreamEpoch(tableKey, queryId)) {
            val added = messages.flatMap(_.asInstanceOf[FilesMessage].files)
              .map(f => RowStore.FileEntry("base", f.group, f.name,
                f.minK, f.maxK, f.rows, meta.specId)).toSeq
            val cur = RowStore.currentVersion(tableKey)
            RowStore.writeManifest(tableKey, cur + 1,
              RowStore.readManifest(tableKey, cur) ++ added,
              extraHeader = Seq(s"#ep\t$queryId\t$epochId"))
            RowStore.recordStreamEpoch(tableKey, queryId, epochId)
          }
        }
      override def abort(epochId: Long,
          messages: Array[WriterCommitMessage]): Unit = ()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.flatMap(_.asInstanceOf[FilesMessage].files)
      .map(f => RowStore.FileEntry("base", f.group, f.name, f.minK, f.maxK,
        f.rows, meta.specId))
      .toSeq
    RowStore.preCommitHook()
    RowStore.commitLock.synchronized {
      val cur = RowStore.currentVersion(tableKey)
      val old = RowStore.readManifest(tableKey, cur)
      mode match {
        case GroupWrite.StageBranch(name) =>
          // WAP staging: fold into the branch manifest (stacked audit
          // appends compose); NO table version commits. Fork base is
          // recorded on first stage — publish validates against it.
          val (base, existing) =
            if (RowStore.branchExists(tableKey, name))
              RowStore.readBranchManifest(tableKey, name)
            else (cur, old)
          RowStore.writeBranchManifest(tableKey, name, base,
            existing ++ added)
          return
        case _ => ()
      }
      val next = mode match {
        case GroupWrite.StageBranch(_) =>
          sys.error("unreachable: staged above")
        case GroupWrite.Append    => old ++ added
        case GroupWrite.Overwrite => added
        case GroupWrite.ReplaceGroups(op) =>
          // a rewrite commit whose scan was never planned has nothing
          // sound to replace — defaulting to "replace nothing, append
          // the rewrite's files" would duplicate every carried-over
          // row, so fail loudly instead
          require(op.baseVersion.isDefined && op.scannedGroups.isDefined,
            s"$tableKey: row-level operation committing without a " +
              "planned scan — refusing to append rewrite output over " +
              "intact groups")
          val base = op.baseVersion.get
          // replace exactly the groups the operation's scan read; a
          // group the runtime filter pruned keeps its files verbatim
          val replaced = op.scannedGroups.get
          // optimistic concurrency, Iceberg's validate-then-swap: the
          // rewrite was computed against `base`'s snapshot. Appends
          // and rewrites of OTHER groups compose — only a group this
          // commit replaces that CHANGED since its scan is a real
          // conflict (the swap would silently drop that change).
          // Per-group file signatures (incl. table-wide deltas, which
          // affect every group) decide; untouched → rebase onto the
          // current manifest, touched → refuse and let the caller
          // retry against the new snapshot.
          if (base != cur) {
            val baseMan =
              try RowStore.readManifest(tableKey, base)
              catch { case _: Exception =>
                throw new java.util.ConcurrentModificationException(
                  s"$tableKey: row-level operation read version $base " +
                    "whose manifest is no longer retained — cannot " +
                    "validate the rewrite; retry the statement")
              }
            def sig(man: Seq[RowStore.FileEntry], g: Int) =
              man.filter(e => e.group == g ||
                (e.kind == "delta" && e.group < 0)).toSet
            val conflicting = replaced.filter(g => sig(baseMan, g) != sig(old, g))
            if (conflicting.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"$tableKey: row-level operation read version $base but " +
                  s"groups ${conflicting.toSeq.sorted.mkString(",")} " +
                  s"changed by version $cur — retry the statement")
          }
          // spec-qualified: group ids are only unique WITHIN a spec
          // (the scan refuses row-level ops on multi-spec tables, so
          // in practice every entry is on the active spec — the
          // qualifier keeps the swap sound if that ever changes)
          old.filterNot(e => e.kind == "base" && e.spec == meta.specId &&
            replaced(e.group)) ++ added
        case GroupWrite.Compact(base, gs) =>
          if (base != cur)
            throw new java.util.ConcurrentModificationException(
              s"$tableKey: compaction planned at version $base but the " +
                s"table is now at $cur — retry")
          // dropping a compacted group's deltas is only sound when
          // every delta entry is group-tagged (ours always are; an
          // untagged table-wide delta would re-apply onto the freshly
          // resolved base rows)
          require(old.forall(e => e.kind != "delta" || e.group >= 0),
            s"$tableKey has untagged delta files — cannot compact")
          old.filterNot(e => e.spec == meta.specId && gs(e.group)) ++ added
      }
      RowStore.writeManifest(tableKey, cur + 1, next)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class FileMeta(group: Int, name: String, minK: Option[Long],
    maxK: Option[Long], rows: Option[Long] = None)
case class FilesMessage(files: Seq[FileMeta]) extends WriterCommitMessage

class GroupWriterFactory(dir: String, writeSchema: StructType,
    bucketCol: String, numGroups: Int,
    transform: String = "bucket", tparam: Long = 0L,
    renames: Map[String, String] = Map.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val fields = writeSchema.fields.toSeq
      // files ALWAYS store a renamed column under its storage name, so
      // pre- and post-rename files stay mutually readable
      private val fileFields = fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name)))
      private val bucketIdx = writeSchema.fieldNames.indexOf(bucketCol)
      private val writers =
        scala.collection.mutable.Map.empty[Int, (String, RowFiles.FileWriter)]
      // zone-map stats of the bucket column per file (numeric keys
      // only; a null or string key leaves the file statless = never
      // skipped)
      private val stats =
        scala.collection.mutable.Map.empty[Int, (Long, Long)]
      private val statless = scala.collection.mutable.Set.empty[Int]

      private def trackStats(g: Int, v: Any): Unit = v match {
        case l: java.lang.Long =>
          val k = l.longValue
          stats.get(g) match {
            case Some((mn, mx)) =>
              stats(g) = (math.min(mn, k), math.max(mx, k))
            case None => stats(g) = (k, k)
          }
        case i: java.lang.Integer => trackStats(g, Long.box(i.longValue))
        case _ => statless += g; ()
      }

      private def externalize(row: InternalRow): Array[Any] =
        fields.zipWithIndex.map { case (f, i) =>
          if (row.isNullAt(i)) null
          else f.dataType match {
            case LongType      => Long.box(row.getLong(i))
            case TimestampType => Long.box(row.getLong(i))
            case IntegerType   => Int.box(row.getInt(i))
            case StringType    => row.getUTF8String(i).toString
            case other       => sys.error(s"unsupported type $other")
          }
        }.toArray

      override def write(row: InternalRow): Unit = {
        // Defense for the no-metadata ReplaceData layout (op-code int
        // prefixed): with requiredMetadataAttributes declared Spark's
        // DataAndMetadataWritingSparkTask strips it before us, so an
        // unexpected width fails LOUDLY rather than corrupting rows.
        val vals =
          if (row.numFields == fields.length) externalize(row)
          else if (row.numFields == fields.length + 1) {
            val opc = row.getInt(0)
            require(opc == RowDeltaUtils.WRITE_OPERATION ||
              opc == RowDeltaUtils.DELETE_OPERATION ||
              opc == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
              s"unexpected op code $opc in op-prefixed write row")
            if (opc == RowDeltaUtils.DELETE_OPERATION) return
            externalize(new OffsetRow(row, 1))
          } else sys.error(s"write row has ${row.numFields} fields, " +
            s"schema has ${fields.length}")
        val g =
          if (bucketIdx < 0) 0
          else RowStore.partValueOf(transform, tparam, numGroups,
            vals(bucketIdx))
        val (_, w) = writers.getOrElseUpdate(g, {
          val name = s"g$g-${UUID.randomUUID()}.parquet"
          (name, new RowFiles.FileWriter(s"$dir/$name", fileFields))
        })
        if (bucketIdx >= 0) trackStats(g, vals(bucketIdx)) else statless += g
        w.write(vals)
      }

      // metadata-carrying form (WRITE_WITH_METADATA rows): the source
      // group rides `metadata`, but this writer re-buckets by content,
      // so the metadata is advisory only
      override def write(metadata: InternalRow, record: InternalRow): Unit =
        write(record)

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._2.close())
        FilesMessage(writers.map { case (g, (n, w)) =>
          val st = if (statless(g)) None else stats.get(g)
          FileMeta(g, n, st.map(_._1), st.map(_._2), Some(w.rows.toLong))
        }.toSeq)
      }
      override def abort(): Unit = writers.values.foreach(_._2.close())
      override def close(): Unit = ()
    }
}

/** Merge-on-read row-level operation ([[SupportsDelta]]): the engine
  * hands per-row insert/update/delete calls keyed by `_rid`; one delta
  * parquet file per writer task records them, the manifest appends it,
  * and NO base file is rewritten (pinned in RowCatalogSpec). */
class DeltaRowLevelOp(tableKey: String, meta: RowStore.Meta,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {
  /** OCC base, as in [[GroupRowLevelOp]]: delta records reference
    * `_rid`s of this snapshot — replaying them over a different one
    * could hit relocated/compacted rows. */
  @volatile private[sources] var baseVersion: Option[Int] = None

  override def command(): RowLevelOperation.Command = cmd
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_rid"))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_group"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = RowStore.currentVersion(tableKey)
    baseVersion = Some(v)
    new GroupScanBuilder(tableKey, meta, v, None)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new RowDeltaWrite(tableKey, meta, info.schema(), Some(this))
}

class RowDeltaWrite(tableKey: String, meta: RowStore.Meta,
    rowSchema: StructType, op: Option[DeltaRowLevelOp] = None)
    extends DeltaWriteBuilder with DeltaWrite
    with DeltaBatchWrite {
  override def build(): DeltaWrite = this
  override def toBatch: DeltaBatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new RowDeltaWriterFactory(RowStore.dataDir(tableKey), rowSchema,
      meta.keyCol, meta.numGroups)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.flatMap(_.asInstanceOf[FilesMessage].files)
      .map(f => RowStore.FileEntry("delta", f.group, f.name,
        spec = meta.specId)).toSeq
    RowStore.commitLock.synchronized {
      val cur = RowStore.currentVersion(tableKey)
      op.flatMap(_.baseVersion).filter(_ != cur).foreach { v =>
        throw new java.util.ConcurrentModificationException(
          s"$tableKey: delta operation read version $v but the table " +
            s"is now at $cur — its _rids may no longer resolve; retry")
      }
      RowStore.writeManifest(tableKey, cur + 1,
        RowStore.readManifest(tableKey, cur) ++ added)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class RowDeltaWriterFactory(dir: String, rowSchema: StructType,
    bucketCol: String, numGroups: Int) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val fields = rowSchema.fields.toSeq
      private val bucketIdx = rowSchema.fieldNames.indexOf(bucketCol)
      private val fileSchema = RowResolve.DeltaMetaFields ++ fields
      // one delta file per (task, touched group): group-tagged in the
      // manifest, so reads replay only the deltas that can affect the
      // group they're resolving
      private val writers =
        scala.collection.mutable.Map.empty[Int, (String, RowFiles.FileWriter)]
      private def writer(g: Int): RowFiles.FileWriter =
        writers.getOrElseUpdate(g, {
          val name = s"d$g-${UUID.randomUUID()}.parquet"
          (name, new RowFiles.FileWriter(s"$dir/$name", fileSchema))
        })._2

      private def dataVals(row: InternalRow): Array[Any] =
        fields.zipWithIndex.map { case (f, i) =>
          if (row == null || row.isNullAt(i)) null
          else f.dataType match {
            case LongType      => Long.box(row.getLong(i))
            case TimestampType => Long.box(row.getLong(i))
            case IntegerType   => Int.box(row.getInt(i))
            case StringType    => row.getUTF8String(i).toString
            case other       => sys.error(s"unsupported type $other")
          }
        }.toArray

      private def rec(op: Int, rid: String, grp: Int, row: InternalRow): Unit =
        writer(grp).write(
          Array[Any](Int.box(op), rid, Int.box(grp)) ++ dataVals(row))

      /** metadata = [_group] (the row's RESIDENT group — where the rid
        * lives, not where the new values would hash; MOR never
        * relocates rows, compaction does). id = [_rid]. */
      override def delete(metadata: InternalRow, id: InternalRow): Unit =
        rec(RowResolve.DeleteOp, id.getUTF8String(0).toString,
          metadata.getInt(0), null)
      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        rec(RowResolve.UpdateOp, id.getUTF8String(0).toString,
          metadata.getInt(0), row)
      override def insert(row: InternalRow): Unit = {
        val vals = dataVals(row)
        val g = if (bucketIdx < 0) 0
          else RowStore.groupOf(vals(bucketIdx), numGroups)
        writer(g).write(Array[Any](Int.box(RowResolve.InsertOp), null,
          Int.box(g)) ++ vals)
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._2.close())
        FilesMessage(writers.map { case (g, (n, _)) =>
          FileMeta(g, n, None, None) }.toSeq)
      }
      override def abort(): Unit = writers.values.foreach(_._2.close())
      override def close(): Unit = ()
    }
}

/** The CHANGE FEED read (`<table>.changes` with options from/to):
  * restates inserts/deletes between two retained versions. Because
  * files are immutable and manifests are per-version, a group whose
  * file set is IDENTICAL at both versions provably contributed no
  * change — it is never read. Only changed groups are resolved and
  * multiset-diffed (an update surfaces as delete+insert; COW storage
  * keeps no row identity across rewrites, which is the honest
  * value-based CDF every COW format exposes). */
class ChangesTable(baseKey: String, meta: RowStore.Meta)
    extends Table with SupportsRead {
  override def name(): String = s"$baseKey.changes"
  override def schema(): StructType =
    StructType(meta.schema.fields :+
      StructField("_change", StringType, nullable = false))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val from = Option(options.get("from")).map(_.toInt).getOrElse(0)
    val to = Option(options.get("to")).map(_.toInt)
      .getOrElse(RowStore.currentVersion(baseKey))
    () => new ChangesScan(baseKey, meta, schema(), from, to)
  }
}

/** Version-diff planning shared by the batch change-feed scan and the
  * streaming one: only groups whose file signature differs between the
  * two manifests are planned. */
object ChangesPlanning {
  def partitions(baseKey: String, meta: RowStore.Meta, from: Int,
      to: Int): Array[InputPartition] = {
    val dir = RowStore.dataDir(baseKey)
    def side(v: Int): (Map[Int, Seq[String]], Map[Int, Seq[String]]) = {
      val es = RowStore.readManifest(baseKey, v)
      def paths(kind: String) = es.filter(_.kind == kind).groupBy(_.group)
        .map { case (g, fs) => (g, fs.map(e => s"$dir/${e.name}")) }
      (paths("base"), paths("delta"))
    }
    // the `group < 0` TABLE-WIDE sentinel applies to DELTA files only
    // (MOR is bucket-transform-only, so a real delta group is never
    // negative) — BASE groups can be legitimately negative under the
    // unbounded transforms (days(ts) pre-epoch, truncate of negative
    // keys), so base lookups are exact-group and negative base groups
    // are planned like any other
    def baseFor(m: Map[Int, Seq[String]], g: Int): Seq[String] =
      m.getOrElse(g, Seq.empty)
    def deltaFor(m: Map[Int, Seq[String]], g: Int): Seq[String] =
      m.getOrElse(g, Seq.empty) ++ m.filter(_._1 < 0).values.flatten
    val (fBase, fDelta) = side(from)
    val (tBase, tDelta) = side(to)
    // plan the groups OBSERVED in either manifest (a group with no
    // files on both sides has no diff) — not 0 until numGroups, which
    // would miss groups outside the bucket range after a partition-
    // spec evolution to an unbounded transform
    (fBase.keys ++ tBase.keys ++
      (fDelta.keys ++ tDelta.keys).filter(_ >= 0))
      .toSeq.distinct.sorted.filter { g =>
      // unchanged file signature ⇒ unchanged group ⇒ skip entirely
      baseFor(fBase, g) != baseFor(tBase, g) ||
        deltaFor(fDelta, g) != deltaFor(tDelta, g)
    }.map { g =>
      ChangesPartition(g, baseFor(fBase, g), deltaFor(fDelta, g),
        baseFor(tBase, g), deltaFor(tDelta, g))
    }.toArray
  }
}

class ChangesScan(baseKey: String, meta: RowStore.Meta, out: StructType,
    from: Int, to: Int) extends Scan with Batch {
  override def readSchema(): StructType = out
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    ChangesPlanning.partitions(baseKey, meta, from, to)

  /** Streaming CDF: the same diff read, micro-batched ONE VERSION per
    * batch (offset = committed version) — `readStream.table(
    * "….changes")` follows the table's history exactly the way
    * Delta/Iceberg CDF streaming reads do. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ChangesMicroBatchStream(baseKey, meta, from,
      createReaderFactory())

  override def createReaderFactory(): PartitionReaderFactory = {
    // project files by STORAGE names (output is positional, so the
    // display schema's order carries the values out unchanged).
    // Computed OUTSIDE the anonymous factory: a lambda on the inner
    // class would pin a non-serializable $outer (this Scan) into the
    // task closure.
    val storageFields = meta.schema.fields.toSeq.map(f =>
      f.copy(name = meta.storageOf(f.name)))
    new PartitionReaderFactory {
      private val dataFields = storageFields
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val c = p.asInstanceOf[ChangesPartition]
        // multiset diff of the two resolved group states
        val counts = new java.util.LinkedHashMap[Seq[Any], Int]()
        RowResolve.resolve(c.group, c.toBase, c.toDelta, dataFields)
          .foreach { case (_, v) =>
            counts.merge(v.toSeq, 1, (a, b) => a + b) }
        RowResolve.resolve(c.group, c.fromBase, c.fromDelta, dataFields)
          .foreach { case (_, v) =>
            counts.merge(v.toSeq, -1, (a, b) => a + b) }
        val rows = counts.asScala.iterator.flatMap { case (v, n) =>
          val tag = if (n > 0) "insert" else "delete"
          Iterator.fill(math.abs(n))((v, tag))
        }
        new PartitionReader[InternalRow] {
          private var cur: (Seq[Any], String) = _
          override def next(): Boolean =
            { val h = rows.hasNext; if (h) cur = rows.next(); h }
          override def get(): InternalRow = new GenericInternalRow(
            (cur._1.map {
              case s: String => UTF8String.fromString(s)
              case v         => v
            } :+ UTF8String.fromString(cur._2)).toArray[Any])
          override def close(): Unit = ()
        }
      }
    }
  }
}

case class ChangesPartition(group: Int, fromBase: Seq[String],
    fromDelta: Seq[String], toBase: Seq[String], toDelta: Seq[String])
    extends InputPartition

/** Offset = committed table version. */
case class VersionOffset(v: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** Streaming read of an APPEND-ONLY table's history: one committed
  * version per micro-batch, each batch exactly the base files that
  * commit added (Delta's `readStream.table` contract). Append-only is
  * ENFORCED at plan time: a step whose start manifest is not a subset
  * of its end manifest (a rewrite/OPTIMIZE/OVERWRITE), or that added
  * delta files, fails loudly — silently re-emitting a rewritten
  * group's rows (or dropping a replaced file's) is the corruption
  * mode this check exists for. */
class AppendTableStream(tableKey: String, meta: RowStore.Meta,
    from: Int, factory: PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  @volatile private var target: Int = RowStore.currentVersion(tableKey)
  override def prepareForTriggerAvailableNow(): Unit =
    target = RowStore.currentVersion(tableKey)
  override def initialOffset(): Offset = VersionOffset(from)
  override def latestOffset(): Offset = sys.error(
    "admission-controlled source: latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    VersionOffset(math.min(start.asInstanceOf[VersionOffset].v + 1, target))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = VersionOffset(target)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    val before = RowStore.readManifest(tableKey, s)
    val after = RowStore.readManifest(tableKey, e)
    val beforeNames = before.map(_.name).toSet
    require(beforeNames.subsetOf(after.map(_.name).toSet),
      s"$tableKey: version $s -> $e removed or replaced files — the " +
        "table stream is append-only; use the .changes feed for DML " +
        "history")
    val added = after.filterNot(x => beforeNames(x.name))
    require(added.forall(_.kind == "base"),
      s"$tableKey: version $s -> $e wrote delta files — the table " +
        "stream is append-only; use the .changes feed")
    val dir = RowStore.dataDir(tableKey)
    added.groupBy(_.group).map { case (g, fs) =>
      GroupFilesPartition(g, fs.map(x => s"$dir/${x.name}"),
        Seq.empty): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = factory
}

/** The streaming half of the change feed: admission-controlled to ONE
  * version per micro-batch (so each batch is exactly one commit's
  * changes — the shape CDC consumers key their exactly-once logic on),
  * with the AvailableNow target latched at prepare time (SeqSource's
  * discipline). Planning per batch is the shared version-diff: only
  * groups whose file signature changed in that commit are read. */
class ChangesMicroBatchStream(baseKey: String, meta: RowStore.Meta,
    from: Int, factory: PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  @volatile private var target: Int = RowStore.currentVersion(baseKey)
  override def prepareForTriggerAvailableNow(): Unit =
    target = RowStore.currentVersion(baseKey)
  override def initialOffset(): Offset = VersionOffset(from)
  override def latestOffset(): Offset = sys.error(
    "admission-controlled source: latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    VersionOffset(math.min(start.asInstanceOf[VersionOffset].v + 1, target))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = VersionOffset(target)
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    ChangesPlanning.partitions(baseKey, meta,
      start.asInstanceOf[VersionOffset].v, end.asInstanceOf[VersionOffset].v)
  override def createReaderFactory(): PartitionReaderFactory = factory
}

/** View of `row` with the first `off` fields hidden (the op-code
  * prefix); only the accessors the externalizer uses. */
class OffsetRow(row: InternalRow, off: Int) extends GenericInternalRow(0) {
  override def numFields: Int = row.numFields - off
  override def isNullAt(i: Int): Boolean = row.isNullAt(i + off)
  override def getLong(i: Int): Long = row.getLong(i + off)
  override def getInt(i: Int): Int = row.getInt(i + off)
  override def getUTF8String(i: Int): UTF8String = row.getUTF8String(i + off)
}

/** Table-maintenance procedures — the OPTIMIZE / VACUUM half of the
  * lake-format lifecycle (Iceberg's rewrite_data_files /
  * expire_snapshots, Delta's OPTIMIZE / VACUUM). Both are
  * metadata-planned on the driver (manifest-sized); OPTIMIZE's data
  * movement is a regular distributed read→write. */
object RowStoreOps {
  import org.apache.spark.sql.SparkSession

  /** OPTIMIZE: rewrite only DIRTY groups — any delta file (MOR
    * read-amplification) or >1 base file (append fragmentation) — into
    * one fresh base file per group, committed as a new version. Clean
    * groups' files are NEVER read or rewritten (at 100 TB compaction
    * that rewrites the table is a non-starter); the read is statically
    * pruned to the dirty groups via the scan's `groups` option and the
    * commit swaps exactly those groups' base+delta entries. Content is
    * observationally unchanged — q110's oracle checks that, the spec
    * pins the file accounting. Returns the dirty-group set and the
    * manifest entry count before/after. */
  def compact(s: SparkSession, table: String): (Set[Int], Int, Int) = {
    val base = RowStore.currentVersion(table)
    val man = RowStore.readManifest(table, base)
    val dirty = man.groupBy(_.group).collect {
      case (g, es) if g >= 0 && (es.exists(_.kind == "delta") ||
        es.count(_.kind == "base") > 1) => g
    }.toSet
    if (dirty.nonEmpty) {
      val hs = s"$base:" + dirty.toSeq.sorted.mkString(",")
      s.read.option("compact", hs).table(table)
        .writeTo(table).option("compact", hs).append()
    }
    val after = RowStore.readManifest(table, RowStore.currentVersion(table))
    (dirty, man.size, after.size)
  }

  /** VACUUM: retain the newest `keepLast` versions; delete expired
    * manifests and every data file no retained manifest references.
    * Time travel to a retained version keeps working (files are
    * immutable and still referenced); an expired version fails at
    * ANALYSIS (the manifest is gone), never with a dangling file read.
    * Returns (retained versions, files physically deleted). */
  def vacuum(table: String, keepLast: Int): (Seq[Int], Int) =
    RowStore.commitLock.synchronized {
      require(keepLast >= 1, "must retain at least the current version")
      val vs = RowStore.versions(table)
      val (expired, retained) = vs.splitAt(math.max(0, vs.size - keepLast))
      // staged branch manifests keep their files alive too — VACUUM
      // must not strand an un-published WAP branch
      val branchKeep = {
        val td = Paths.get(RowStore.tableDir(table))
        val stream = Files.list(td)
        val names = try stream.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("branch-") && n.endsWith(".manifest"))
          .map(_.stripPrefix("branch-").stripSuffix(".manifest")).toSeq
        finally stream.close()
        names.flatMap(b => RowStore.readBranchManifest(table, b)._2)
          .map(_.name).toSet
      }
      val keep = retained.flatMap(v => RowStore.readManifest(table, v))
        .map(_.name).toSet ++ branchKeep
      expired.foreach { v =>
        Files.deleteIfExists(
          Paths.get(RowStore.tableDir(table), s"v$v.manifest")); ()
      }
      val dir = Paths.get(RowStore.dataDir(table))
      val stream = Files.list(dir)
      // data files only — Hadoop's LocalFileSystem writes hidden
      // `.<name>.crc` sidecars, which ride along with their data file
      val dead = try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => !n.startsWith(".") && !keep(n)).toSeq
      finally stream.close()
      dead.foreach { n =>
        Files.deleteIfExists(dir.resolve(n))
        Files.deleteIfExists(dir.resolve(s".$n.crc")); ()
      }
      (retained, dead.size)
    }

  /** ROLLBACK to an earlier snapshot (Iceberg's
    * `rollback_to_snapshot`): commits a NEW version whose entry list
    * is version `v`'s — history is never rewritten (the bad versions
    * stay visible to time travel until VACUUM expires them), the head
    * just points at the old state again. Files are immutable, so this
    * is pure manifest metadata. Returns the new head version. */
  def rollback(table: String, v: Int): Int =
    RowStore.commitLock.synchronized {
      val have = RowStore.versions(table)
      require(have.contains(v),
        s"cannot roll back $table to version $v (have $have)")
      val cur = RowStore.currentVersion(table)
      RowStore.writeManifest(table, cur + 1, RowStore.readManifest(table, v))
      cur + 1
    }

  /** PUBLISH a staged branch (the WAP fast-forward): the branch's
    * snapshot becomes the next committed version — atomically, under
    * the same OCC rule as any rewrite: if the table advanced past the
    * branch's fork base, the staged snapshot no longer contains those
    * commits and publishing it would silently drop them, so refuse
    * and let the caller re-stage. Returns the published version. */
  def publishBranch(table: String, name: String): Int =
    RowStore.commitLock.synchronized {
      val (base, entries) = RowStore.readBranchManifest(table, name)
      val cur = RowStore.currentVersion(table)
      if (cur != base)
        throw new java.util.ConcurrentModificationException(
          s"$table: branch $name forked at version $base but the table " +
            s"is now at $cur — publishing would drop the interleaved " +
            "commits; re-stage against the current snapshot")
      RowStore.writeManifest(table, cur + 1, entries)
      RowStore.dropBranch(table, name)
      cur + 1
    }
}

/** `<table>.history` — the snapshot-lineage metadata table (Iceberg's
  * `history`/`snapshots` surface): one row per committed version with
  * its manifest-derived file and row counts. Metadata-sized by
  * construction — the scan reads manifests only, never data files. */
class HistoryTable(baseKey: String) extends Table with SupportsRead {
  override def name(): String = s"$baseKey.history"
  override def schema(): StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("is_current", org.apache.spark.sql.types.BooleanType,
      nullable = false)))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = HistoryTable.this.schema()
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        // computed at plan time on the driver (manifest-sized) and
        // shipped in the partition — the executor only replays rows
        val vs = RowStore.versions(baseKey)
        val cur = vs.max
        val rows = vs.map { v =>
          val es = RowStore.readManifest(baseKey, v)
          val base = es.filter(_.kind == "base")
          // exact only when every base entry carries a count and no
          // deltas mutate rows at read time — else unknown (NULL)
          val nRows: Option[Long] =
            if (es.exists(_.kind == "delta") || base.exists(_.rows.isEmpty))
              None
            else Some(base.map(_.rows.get).sum)
          HistoryRow(v, es.size.toLong, nRows, v == cur)
        }
        Array(HistoryPartition(rows))
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition)
              : PartitionReader[InternalRow] = {
            val it = p.asInstanceOf[HistoryPartition].rows.iterator
            new PartitionReader[InternalRow] {
              private var cur: HistoryRow = _
              override def next(): Boolean =
                { val h = it.hasNext; if (h) cur = it.next(); h }
              override def get(): InternalRow = new GenericInternalRow(
                Array[Any](cur.version, cur.nFiles,
                  cur.nRows.map(Long.box).orNull, cur.isCurrent))
              override def close(): Unit = ()
            }
          }
        }
    }
}

case class HistoryRow(version: Int, nFiles: Long, nRows: Option[Long],
    isCurrent: Boolean)
case class HistoryPartition(rows: Seq[HistoryRow]) extends InputPartition

/** `<table>.files` — Iceberg's files metadata table: one row per data
  * file in the CURRENT snapshot with its group, kind, spec, recorded
  * row count and key zone map. Pure manifest metadata (zero data files
  * open) — the plan-time debugging surface for layout questions
  * ("which groups are fragmented / delta-dirty / statless?"). */
class FilesTable(baseKey: String) extends Table with SupportsRead {
  override def name(): String = s"$baseKey.files"
  override def schema(): StructType = StructType(Seq(
    StructField("grp", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("spec", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("min_k", LongType, nullable = true),
    StructField("max_k", LongType, nullable = true)))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = FilesTable.this.schema()
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(FilesPartition(RowStore.readManifest(baseKey,
          RowStore.currentVersion(baseKey))))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition)
              : PartitionReader[InternalRow] = {
            val it = p.asInstanceOf[FilesPartition].entries.iterator
            new PartitionReader[InternalRow] {
              private var cur: RowStore.FileEntry = _
              override def next(): Boolean =
                { val h = it.hasNext; if (h) cur = it.next(); h }
              override def get(): InternalRow = new GenericInternalRow(
                Array[Any](cur.group, UTF8String.fromString(cur.kind),
                  cur.spec, cur.rows.map(Long.box).orNull,
                  cur.minK.map(Long.box).orNull,
                  cur.maxK.map(Long.box).orNull))
              override def close(): Unit = ()
            }
          }
        }
    }
}

case class FilesPartition(entries: Seq[RowStore.FileEntry])
    extends InputPartition

/** Driver-contract entries for the DML catalog. */
object RowCatalogQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{col, lit}

  /** Scoped session confs (q43/q53's save/restore pattern): set for
    * the duration of `body` — which must EXECUTE its plans, not just
    * construct them — then restored. */
  private[graft] def withScopedConfs[T](s: SparkSession,
      confs: Map[String, String])(body: => T): T = {
    val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** q106/q108 share one lifecycle (CREATE → INSERT seed → MERGE →
    * DELETE) differing only in table name and format; the oracle
    * restates the end state relationally from raw orders, so a wrong
    * clause anywhere (DELETE firing for 'F' rows, the merge updating
    * with the target's own cents, a delta misapplied) breaks the hash. */
  private[graft] def dmlLifecycle(s: SparkSession, d: String, table: String,
      viewTag: String, tblProps: String): Unit = {
    s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
    graft.Tables(s, d, "orders").createOrReplaceTempView(s"${viewTag}_orders")
    s.sql(s"DROP TABLE IF EXISTS $table")
    s.sql(s"CREATE TABLE $table (k BIGINT, cents BIGINT, status STRING)" +
      tblProps)
    s.sql(s"""INSERT INTO $table
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT),
             o_orderstatus
      FROM ${viewTag}_orders WHERE o_orderkey % 7 = 0""")
    s.sql(s"""MERGE INTO $table t
      USING (SELECT o_orderkey AS k,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                    o_orderstatus AS status
             FROM ${viewTag}_orders WHERE o_orderkey % 5 = 0) s
      ON t.k = s.k
      WHEN MATCHED AND t.status = 'F' THEN
        UPDATE SET cents = t.cents + s.cents
      WHEN MATCHED AND t.status <> 'F' THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, cents, status)
        VALUES (s.k, s.cents, s.status)""")
    s.sql(s"DELETE FROM $table WHERE k % 97 = 0")
  }

  /** ONE committed lifecycle per (session, dataset, format), shared by
    * every consumer that only READS the committed table afterwards
    * (q106 final state, q107 time travel, q109 batch CDF, st33
    * streaming CDF on COW; q108 on MOR). Before this cache the bench
    * ran five full 4-commit lifecycles per round with ~95% of q109's
    * 4.7 s in setup shared with its siblings. Mutating consumers
    * (q110 OPTIMIZE, q111 VACUUM) keep private tables — their
    * operations add versions/delete files, which would break the
    * sharers' version-count and time-travel contracts. Keyed by
    * dataset tag so a session verifying several SFs never cross-reads;
    * `synchronized` because Verify/bench are single-threaded but spec
    * suites may share the session. */
  // keyed by applicationId (what the scratch table dirs actually
  // scope by) — holding SparkSession references would pin stopped
  // sessions for the JVM lifetime
  private val lifecycleBuilt = scala.collection.mutable.Set.empty[String]

  private[graft] def sharedLifecycle(s: SparkSession, d: String,
      mor: Boolean): String = lifecycleBuilt.synchronized {
    s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
    val fmt = if (mor) "mor" else "cow"
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    // cache key = the SAME sanitized tag the table name embeds: two
    // datasets that sanitize alike MUST share one cache entry, or the
    // second would rebuild (DROP) the first's table under a distinct
    // key and its consumers would silently read the wrong data
    val table = s"graft_dml.ns.shared_${fmt}_$tag"
    val ck = s.sparkContext.applicationId + "|" + tag + "|" + fmt
    if (!lifecycleBuilt.contains(ck)) {
      dmlLifecycle(s, d, table, s"dml_${fmt}_$tag",
        if (mor) " TBLPROPERTIES ('format'='mor')" else "")
      // marked built only AFTER success — a failed build must retry,
      // not poison every later consumer with a half-made table
      lifecycleBuilt.add(ck); ()
    }
    table
  }

  /** The lifecycle's four statements folded into one relational
    * restatement over the raw table (shared by q106/q108/q109). */
  private[graft] val lifecycleCtes =
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
      |  FROM src s LEFT JOIN t0 t ON t.k = s.k WHERE t.k IS NULL)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── q106: SQL MERGE INTO + DELETE FROM against the DSv2 catalog —
    // the full DML lifecycle over COPY-ON-WRITE file groups. All four
    // statements are Spark's own SQL planning over the connector's
    // row-level operation: the engine computes the merge, runtime
    // group filtering prunes the scan to matched groups, and the
    // connector replaces exactly those groups' parquet files.
    "q106_merge_into" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.table(t).orderBy(col("k"))
    }),

    // ── q107: SQL TIME TRAVEL (`VERSION AS OF`) — each DML commit
    // writes a manifest over immutable files, and `SELECT … VERSION
    // AS OF v` plans from manifest v (v0 CREATE, v1 INSERT seed,
    // v2 MERGE, v3 DELETE). Aggregating EVERY version in one statement
    // means a wrong snapshot anywhere (a replaced group leaking into
    // an old version, an off-by-one pin) shifts a row the oracle,
    // restating all four states from raw orders, will catch.
    "q107_version_asof" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.sql(s"""
        SELECT 0 AS version, COUNT(*) AS n,
               CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_cents
        FROM $t VERSION AS OF 0
        UNION ALL
        SELECT 1, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM $t VERSION AS OF 1
        UNION ALL
        SELECT 2, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM $t VERSION AS OF 2
        UNION ALL
        SELECT 3, COUNT(*), CAST(COALESCE(SUM(cents), 0) AS BIGINT)
        FROM $t VERSION AS OF 3
        ORDER BY version""")
    }),

    // ── q108: the SAME lifecycle against a MERGE-ON-READ table
    // ('format'='mor', SupportsDelta): MERGE/DELETE write row-level
    // delta records instead of rewriting groups, and the scan merges
    // base + deltas at read time. Identical oracle to q106 — the two
    // storage strategies must be observationally equivalent.
    "q108_merge_mor" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = true)
      s.table(t).orderBy(col("k"))
    }),

    // ── q109: CHANGE-DATA-FEED read — `<table>.changes` with
    // from/to options restates the inserts and deletes between two
    // retained versions (an update = delete+insert, the value-based
    // CDF of a COW format). Groups whose file signature is identical
    // at both versions are never read. The oracle recomputes the diff
    // between the v1 (seed) and v3 (final) states from raw orders.
    "q109_change_feed" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.read.option("from", "1").option("to", "3")
        .table(s"$t.changes")
        .orderBy(col("k"), col("_change"))
    }),

    // ── q110: OPTIMIZE (targeted compaction) — the MOR lifecycle
    // leaves delta files the scan must replay on every read; compact
    // rewrites ONLY the dirty groups (any delta, or fragmented base)
    // into one base file each and drops their deltas, as a new
    // version. The oracle is q108's content restatement verbatim:
    // compaction must be observationally invisible. The file-level
    // half of the contract (only dirty groups rewritten, deltas gone,
    // pre-compact version still resolves) is pinned in RowCatalogSpec.
    "q110_dml_optimize" -> ((s, d) => {
      dmlLifecycle(s, d, "graft_dml.ns.accounts_o", "q110",
        " TBLPROPERTIES ('format'='mor')")
      RowStoreOps.compact(s, "graft_dml.ns.accounts_o")
      s.table("graft_dml.ns.accounts_o").orderBy(col("k"))
    }),

    // ── q111: VACUUM (version retention) — after the COW lifecycle
    // (v0..v3), retain the last 2 versions and physically delete the
    // files only expired manifests reference. The row restates the
    // THREE contract halves: current content unchanged (count +
    // cents over the post-vacuum table), storage actually reclaimed
    // (files deleted — v2's rewrite orphaned v1 files at every SF),
    // and expired time travel failing at analysis rather than
    // dangling into deleted files.
    // ── q115: MANIFEST-STATS FILE SKIPPING — the zone-map read path
    // every lake format plans with: three INSERT commits land three
    // disjoint key bands (epoch·10⁷ offsets), each base file carrying
    // its key [min, max] in the manifest; the banded SELECT pushes
    // its range down and the scan plans ONLY the middle epoch's files
    // (RowCatalogSpec pins the planned/skipped accounting, including
    // the delta-dirty group that must never skip). All filters stay
    // residual — skipping can cost performance, never correctness —
    // and the oracle restates the band from raw orders.
    "q115_dml_file_skip" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q115_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.ledger")
      s.sql("CREATE TABLE graft_dml.ns.ledger " +
        "(k BIGINT, cents BIGINT, status STRING)")
      // epoch offset = the first power of 10 above max(o_orderkey)
      // (floor 1e7, matching the benched SFs): orderkey reaches
      // 6M·SF, so a FIXED offset would overlap the key bands around
      // SF 1.7 and silently diverge from the oracle's `% 3` band
      // restatement. A 1-row bounds fetch is planning metadata (the
      // q69 discipline), never data.
      val mxK = s.sql("SELECT CAST(max(o_orderkey) AS BIGINT) " +
        "FROM q115_orders").head().getLong(0)
      var off = 10000000L
      while (off <= mxK) off *= 10
      for (e <- 0 until 3)
        s.sql(s"""INSERT INTO graft_dml.ns.ledger
          SELECT CAST(o_orderkey AS BIGINT) + ${e}L * ${off}L,
                 CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus
          FROM q115_orders WHERE o_orderkey % 3 = $e""")
      s.sql(s"""SELECT status, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM graft_dml.ns.ledger
        WHERE k >= ${off}L AND k < ${2 * off}L
        GROUP BY status ORDER BY status""")
    }),

    "q111_dml_vacuum" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, lit, sum}
      val t = "graft_dml.ns.accounts_vac"
      dmlLifecycle(s, d, t, "q111", "")
      val (retained, deleted) = RowStoreOps.vacuum(t, keepLast = 2)
      val expiredFails =
        try { s.sql(s"SELECT * FROM $t VERSION AS OF 1"); false }
        catch { case _: Exception => true }
      s.table(t).agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("sum_cents"))
        .select(col("n_rows"), col("sum_cents"),
          lit(retained.size).as("n_versions"),
          lit(deleted > 0).as("reclaimed"),
          lit(expiredFails).as("expired_read_fails"))
    }),

    // ── q116: PARTITION-TRANSFORM DDL — `PARTITIONED BY (bucket(6,k))`
    // with k deliberately NOT the first column, so a correct result
    // proves the DECLARED transform (not the first-column default)
    // drives grouping end to end: the INSERT's write distribution
    // clusters by bucket(6, k), zone maps track k, and the MERGE —
    // whose source keys all satisfy k ≡ 2 (mod 6) — runtime-filters
    // to that single bucket and rewrites exactly one group
    // (RowCatalogSpec pins the one-group-rewritten file accounting;
    // this row pins the arithmetic). Oracle restates insert+merge
    // relationally from raw orders.
    "q116_dml_bucket_transform" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q116_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.bucketed")
      s.sql("CREATE TABLE graft_dml.ns.bucketed " +
        "(cents BIGINT, k BIGINT, status STRING) " +
        "PARTITIONED BY (bucket(6, k))")
      s.sql("""INSERT INTO graft_dml.ns.bucketed
        SELECT CAST(round(o_totalprice * 100) AS BIGINT),
               CAST(o_orderkey AS BIGINT), o_orderstatus
        FROM q116_orders WHERE o_orderkey % 11 = 0""")
      // source keys ≡ 44 (mod 66): every one is a multiple of 11 (so
      // it matches a seeded row) and ≡ 2 (mod 6) (so every touched
      // row lives in bucket 2 — the one-group rewrite the spec pins)
      s.sql("""MERGE INTO graft_dml.ns.bucketed t
        USING (SELECT CAST(o_orderkey AS BIGINT) AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM q116_orders WHERE o_orderkey % 66 = 44) src
        ON t.k = src.k
        WHEN MATCHED THEN UPDATE SET cents = t.cents + src.cents""")
      s.table("graft_dml.ns.bucketed").orderBy(col("k"))
    }),

    // ── q132: CTAS + RTAS — `CREATE TABLE … PARTITIONED BY (bucket)
    // AS SELECT` materializes a query straight into the catalog (the
    // transform routes the write like any declared table), and
    // `REPLACE TABLE … AS SELECT` swaps the definition and contents in
    // one statement (Spark's create-then-append path over this
    // catalog's createTable/dropTable). The in-plan `ctas_ok` pin
    // hash-checks that the intermediate CTAS state really held the
    // parent slice before the REPLACE narrowed it.
    "q132_dml_ctas" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q132_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.ctas")
      s.sql("""CREATE TABLE graft_dml.ns.ctas PARTITIONED BY (bucket(4, k))
        AS SELECT CAST(o_orderkey AS BIGINT) AS k,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM q132_orders WHERE o_orderkey % 14 = 0""")
      val ctasN = s.table("graft_dml.ns.ctas").count()
      val wantN = s.sql("SELECT COUNT(*) FROM q132_orders " +
        "WHERE o_orderkey % 14 = 0").head().getLong(0)
      s.sql("""REPLACE TABLE graft_dml.ns.ctas
        AS SELECT CAST(o_orderkey AS BIGINT) AS k,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                       > 20000000 THEN 'BIG' ELSE 'SMALL' END AS size
        FROM q132_orders WHERE o_orderkey % 28 = 0""")
      s.table("graft_dml.ns.ctas")
        .withColumn("ctas_ok", lit(ctasN == wantN))
        .orderBy(col("k"))
    }),

    // ── q131: STORAGE-PARTITIONED JOIN between two LAKE TABLES —
    // q91's zero-shuffle contract on the DML catalog itself: both
    // tables declare `bucket(8, k)`, the writers cluster by the SAME
    // V2 bucket function the scans report as KeyGroupedPartitioning,
    // so the k-equi-join aligns key groups instead of shuffling either
    // side (SPARK-37375 / Iceberg SPJ — spec pins the exchange-free
    // join plan). At 100 TB co-bucketing fact and dim at write time
    // and joining shuffle-free is the single biggest join economy a
    // lake layout buys. Broadcast is disabled in scope for the same
    // reason as q43/q53: the demo models sides too big to broadcast;
    // the write+read-back keeps the session confs scoped.
    "q131_dml_spj" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q131_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.spja")
      s.sql("CREATE TABLE graft_dml.ns.spja (k BIGINT, cents BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql("""INSERT INTO graft_dml.ns.spja
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q131_orders WHERE o_orderkey % 6 = 0""")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.spjb")
      s.sql("CREATE TABLE graft_dml.ns.spjb (k BIGINT, cust BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql("""INSERT INTO graft_dml.ns.spjb
        SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT)
        FROM q131_orders WHERE o_orderkey % 10 = 0""")
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val out = graft.Scratch.dir(s, "graft_q131", tag)
      withScopedConfs(s, Map(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
        import org.apache.spark.sql.functions.{count, sum}
        s.table("graft_dml.ns.spja")
          .join(s.table("graft_dml.ns.spjb"), "k")
          .groupBy((col("k") % 8).as("band"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).cast("long").as("sum_cents"),
            sum(col("cust")).cast("long").as("sum_cust"))
          .write.mode("overwrite").parquet(out)
      }
      s.read.parquet(out).orderBy(col("band"))
    }),

    // ── q130: DEFAULT COLUMN VALUES — the SQL-surface feature every
    // warehouse schema relies on: `CREATE TABLE … (v BIGINT DEFAULT
    // 42, status STRING DEFAULT 'NEW')`, then an INSERT naming only
    // some columns has the rest filled by the ANALYZER (the catalog
    // declares SUPPORT_COLUMN_DEFAULT_VALUE; defaults ride the schema
    // metadata the meta file round-trips, and writers always see
    // complete rows). One slice inserts only keys (defaults fill),
    // one inserts explicit values, and the read-back must show
    // exactly which rows got which — restated relationally.
    "q130_dml_default_columns" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q130_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.defs")
      s.sql("CREATE TABLE graft_dml.ns.defs (k BIGINT, " +
        "cents BIGINT DEFAULT 42, status STRING DEFAULT 'NEW')")
      s.sql("""INSERT INTO graft_dml.ns.defs (k)
        SELECT CAST(o_orderkey AS BIGINT)
        FROM q130_orders WHERE o_orderkey % 12 = 0""")
      s.sql("""INSERT INTO graft_dml.ns.defs
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus
        FROM q130_orders WHERE o_orderkey % 12 = 5""")
      s.table("graft_dml.ns.defs").orderBy(col("k"))
    }),

    // ── q129: MIN/MAX FROM ZONE-MAP STATS — q124's metadata economics
    // extended to the key column's extrema: every base file records
    // [min, max] of the key at commit, so an unfiltered MIN(k)/MAX(k)
    // over a clean single-spec snapshot folds over the manifest at
    // plan time — zero data files opened (spec pins the files-opened
    // counter at 0 for the three-aggregate statement). At 100 TB this
    // is the difference between a full-column scan and a metadata
    // lookup for the watermark/extent queries every pipeline runs.
    "q129_dml_stats_minmax" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.sql(s"SELECT MIN(k) AS min_k, MAX(k) AS max_k, COUNT(*) AS n FROM $t")
    }),

    // ── q127: `.history` METADATA TABLE — the snapshot-lineage
    // surface (Iceberg's `history`, Delta's DESCRIBE HISTORY): one row
    // per committed version with manifest-derived file/row counts and
    // the current-pointer flag, answered ENTIRELY from manifests (no
    // data file opens — q124's economics applied to the whole chain).
    // Over the shared lifecycle every column is deterministic: row
    // counts restate q107's per-version aggregates, and file counts
    // equal the distinct non-empty groups at each stage because the
    // clustered write distribution provably emits ONE file per touched
    // group per commit — so the oracle recomputes both relationally.
    "q127_dml_history" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.table(s"$t.history").orderBy(col("version"))
    }),

    // ── q128: WRITE-AUDIT-PUBLISH (branch staging) — Iceberg's WAP
    // pattern (spark.wap.branch): a producer APPENDS into a named
    // branch (files land, no table version commits), an auditor reads
    // the STAGED snapshot via the `branch` read option while every
    // plain reader still sees the published table, and a successful
    // audit FAST-FORWARDS the branch into the next committed version.
    // The two in-plan pins make the isolation itself hash-checked:
    // `staged_invisible` (the main table did NOT see the staged slice
    // before publish) and `audit_saw_staged` (the branch read DID).
    // RowCatalogSpec pins the OCC refusal when the table advances
    // under a staged branch.
    "q128_dml_wap" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q128_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.wap")
      s.sql("CREATE TABLE graft_dml.ns.wap (k BIGINT, cents BIGINT)")
      s.sql("""INSERT INTO graft_dml.ns.wap
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q128_orders WHERE o_orderkey % 8 = 0""")
      // stage the second slice into branch "audit" — no version commit
      s.sql("""SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM q128_orders WHERE o_orderkey % 8 = 3""")
        .writeTo("graft_dml.ns.wap").option("branch", "audit").append()
      val seedN = s.sql("SELECT COUNT(*) FROM q128_orders " +
        "WHERE o_orderkey % 8 = 0").head().getLong(0)
      val stagedN = s.sql("SELECT COUNT(*) FROM q128_orders " +
        "WHERE o_orderkey % 8 = 3").head().getLong(0)
      val mainPre = s.table("graft_dml.ns.wap").count()
      val auditN = s.read.option("branch", "audit")
        .table("graft_dml.ns.wap").count()
      RowStoreOps.publishBranch("graft_dml.ns.wap", "audit")
      s.table("graft_dml.ns.wap")
        .withColumn("staged_invisible", lit(mainPre == seedN))
        .withColumn("audit_saw_staged", lit(auditN == seedN + stagedN))
        .orderBy(col("k"))
    }),

    // ── q125: PARTITION-SPEC EVOLUTION — Iceberg's headline layout
    // feature: the table starts bucket(4, k), EVOLVES to
    // truncate(100000, k) via `ALTER TABLE … SET TBLPROPERTIES
    // ('partition'=…)`, and a second slice is appended under the new
    // layout. Files already written keep their bucket groups verbatim
    // (spec-tagged in the manifest — RowCatalogSpec pins old+new
    // routing and the migration path); the final read plans across
    // BOTH specs, so a planner bug on either side of the boundary
    // (dropped old group, misrouted new write, group-number collision
    // between bucket 2 and range 2) shifts the aggregate the oracle
    // restates from raw orders.
    "q125_dml_spec_evolution" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q125_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.evo")
      s.sql("CREATE TABLE graft_dml.ns.evo (k BIGINT, cents BIGINT) " +
        "PARTITIONED BY (bucket(4, k))")
      s.sql("""INSERT INTO graft_dml.ns.evo
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q125_orders WHERE o_orderkey % 13 = 0""")
      s.sql("ALTER TABLE graft_dml.ns.evo " +
        "SET TBLPROPERTIES('partition'='truncate(100000, k)')")
      s.sql("""INSERT INTO graft_dml.ns.evo
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q125_orders WHERE o_orderkey % 13 = 5""")
      s.sql("""SELECT CAST(k % 8 AS BIGINT) AS band, COUNT(*) AS n,
        CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM graft_dml.ns.evo GROUP BY 1 ORDER BY band""")
    }),

    // ── q126: `days(ts)` TEMPORAL PARTITION TRANSFORM — the other
    // half of the Iceberg transform family: a TIMESTAMP column routes
    // each row to its UTC epoch-day group (RowCatalogSpec pins the
    // boundary at midnight), the layout every time-series lake table
    // uses so day-ranged scans touch only their days' files. The
    // catalog stores timestamps as their internal micros (INT64,
    // annotated); the daily rollup read back must match the oracle's
    // restatement over raw events exactly — a truncation or timezone
    // slip anywhere moves boundary events across days.
    "q126_dml_days_transform" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "events").createOrReplaceTempView("q126_events")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.daily")
      s.sql("CREATE TABLE graft_dml.ns.daily (ts TIMESTAMP, v BIGINT) " +
        "PARTITIONED BY (days(ts))")
      s.sql("""INSERT INTO graft_dml.ns.daily
        SELECT ts, CAST(round(value * 100) AS BIGINT)
        FROM q126_events WHERE event_id % 17 = 0""")
      s.sql("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v
        FROM graft_dml.ns.daily GROUP BY 1 ORDER BY day_start""")
    }),

    // ── q137: IDENTITY PARTITION TRANSFORM — `PARTITIONED BY (col)`,
    // the classic low-cardinality layout (region/date-id/tenant):
    // group = the value itself, so an equality or range predicate on
    // the partition column IS partition pruning (the monotonic-
    // transform group-range path; RowCatalogSpec pins in-range files
    // only). The band-range rollup read back must match the oracle's
    // restatement over raw orders.
    "q137_dml_identity_transform" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q137_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.ident")
      s.sql("CREATE TABLE graft_dml.ns.ident " +
        "(band BIGINT, k BIGINT, cents BIGINT) PARTITIONED BY (band)")
      s.sql("""INSERT INTO graft_dml.ns.ident
        SELECT CAST(o_orderkey % 10 AS BIGINT), CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q137_orders WHERE o_orderkey % 7 = 0""")
      s.sql("""SELECT band, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT)
          AS sum_cents
        FROM graft_dml.ns.ident WHERE band BETWEEN 3 AND 5
        GROUP BY band ORDER BY band""")
    }),

    // ── q136: `.files` METADATA TABLE — Iceberg's files table: one
    // row per data file in the current snapshot with its group, kind,
    // recorded row count and key zone map, straight from the manifest
    // (zero data files open). On the shared COW lifecycle the
    // clustered write distribution emits ONE file per touched group
    // per commit and COW replaces groups wholesale, so the head has
    // exactly one base file per group and the per-FILE stats ARE the
    // per-GROUP stats — which the oracle restates relationally
    // (k % 4 is the group function for sequential long keys). A
    // wrong zone map, a lost rewrite, or a phantom delta file all
    // break the hash.
    "q136_dml_files_table" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.table(s"$t.files")
        .selectExpr("grp", "kind", "n_rows", "min_k", "max_k")
        .orderBy(col("grp"))
    }),

    // ── q134: `months(ts)` CALENDAR TRANSFORM — the rest of the
    // Iceberg temporal family (hours/months/years landed with it):
    // unlike days/hours these are NOT fixed-width divisions — a month
    // boundary is calendar arithmetic, so a proleptic-calendar slip
    // (or a local-time one) moves boundary rows into the wrong group.
    // The monthly rollup read back must match the oracle's
    // restatement over raw events exactly; RowCatalogSpec pins the
    // group numbers (months since 1970-01) at a month boundary.
    "q134_dml_months_transform" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q134_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.monthly")
      s.sql("CREATE TABLE graft_dml.ns.monthly (ts TIMESTAMP, v BIGINT) " +
        "PARTITIONED BY (months(ts))")
      // orders span ~80 calendar months (1995–2001) — a real monthly
      // layout, one group per month
      s.sql("""INSERT INTO graft_dml.ns.monthly
        SELECT o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q134_orders WHERE o_orderkey % 19 = 0""")
      s.sql("""SELECT CAST(date_trunc('month', ts) AS TIMESTAMP)
          AS month_start,
        COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v
        FROM graft_dml.ns.monthly GROUP BY 1 ORDER BY month_start""")
    }),

    // ── q135: ROLLBACK TO SNAPSHOT — Iceberg's incident-recovery
    // surface: a bad statement lands (here a DELETE), rollback commits
    // a NEW head pointing at the pre-incident entry list (history is
    // append-only — the bad version STAYS time-travelable until
    // VACUUM). The output pins both sides: current content == the
    // seed again, and `VERSION AS OF 2` still shows which rows the
    // bad DELETE removed.
    "q135_dml_rollback" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q135_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.rb")
      s.sql("CREATE TABLE graft_dml.ns.rb (k BIGINT, cents BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql("""INSERT INTO graft_dml.ns.rb
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q135_orders WHERE o_orderkey % 6 = 1""")                  // v1
      s.sql("DELETE FROM graft_dml.ns.rb WHERE k % 5 = 0")             // v2
      val newHead = RowStoreOps.rollback("graft_dml.ns.rb", 1)         // v3
      require(newHead == 3, s"rollback committed version $newHead")
      s.sql("""SELECT t.k, t.cents, (v2.k IS NULL) AS deleted_in_v2
        FROM graft_dml.ns.rb t
        LEFT JOIN (SELECT k FROM graft_dml.ns.rb VERSION AS OF 2) v2
          ON t.k = v2.k
        ORDER BY t.k""")
    }),

    // ── q133: RENAME COLUMN — the third leg of schema evolution
    // (ADD/DROP/RENAME), Iceberg's metadata-only rename: no file
    // rewrites; a display→storage name mapping bridges, so files
    // written BEFORE the rename (storing `cents`) and AFTER it (still
    // storing `cents` on disk) read back as one column `amount`, and
    // a COW UPDATE rewrites rows through the mapping. The time-travel
    // leg joins the v1 snapshot — which surfaces the SNAPSHOT-TIME
    // name `cents` — against the head, so a mapping slip on either
    // side (NULL column after rename, resurrection under the old
    // name, a mistranslated rewrite) breaks the hash. RowCatalogSpec
    // pins the refusal surface (re-use of a stored name, MOR).
    "q133_dml_rename_column" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q133_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.ren")
      s.sql("CREATE TABLE graft_dml.ns.ren (k BIGINT, cents BIGINT) " +
        "PARTITIONED BY (bucket(8, k))")
      s.sql("""INSERT INTO graft_dml.ns.ren
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q133_orders WHERE o_orderkey % 4 = 1""")                  // v1
      s.sql("ALTER TABLE graft_dml.ns.ren RENAME COLUMN cents TO amount") // v2
      s.sql("""INSERT INTO graft_dml.ns.ren
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT)
        FROM q133_orders WHERE o_orderkey % 4 = 2""")                  // v3
      s.sql("UPDATE graft_dml.ns.ren SET amount = amount + 7 " +
        "WHERE k % 10 = 3")                                            // v4
      s.sql("""SELECT t.k, t.amount, v.cents AS cents_v1
        FROM graft_dml.ns.ren t
        LEFT JOIN (SELECT k, cents FROM graft_dml.ns.ren VERSION AS OF 1) v
          ON t.k = v.k
        ORDER BY t.k""")
    }),

    // ── q117: TRI-CLAUSE MERGE — `WHEN NOT MATCHED BY SOURCE` is the
    // clause that turns MERGE into full table synchronization (the
    // warehouse-sync shape Delta/Iceberg document): rows ABSENT from
    // the source are archived or deleted in the same statement that
    // updates matches and inserts new keys. Spark's rewrite plans the
    // target as the outer side (every target row must be inspected,
    // so runtime group filtering correctly keeps ALL groups — the
    // opposite scope of q116's one-bucket rewrite), and the connector
    // replaces what the scan read. Target = orders k≡0 (mod 10),
    // source = k≡0 (mod 15): matched = k≡0 (30), inserts = source
    // only, and the not-matched-by-source leg splits on the seeded
    // cents — big ones deleted, the rest stamped archived.
    "q117_dml_merge_sync" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q117_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.sync")
      s.sql("CREATE TABLE graft_dml.ns.sync " +
        "(k BIGINT, cents BIGINT, status STRING)")
      s.sql("""INSERT INTO graft_dml.ns.sync
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus
        FROM q117_orders WHERE o_orderkey % 10 = 0""")
      s.sql("""MERGE INTO graft_dml.ns.sync t
        USING (SELECT CAST(o_orderkey AS BIGINT) AS k,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      o_orderstatus AS status
               FROM q117_orders WHERE o_orderkey % 15 = 0) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET cents = t.cents + s.cents
        WHEN NOT MATCHED THEN INSERT (k, cents, status)
          VALUES (s.k, s.cents, s.status)
        WHEN NOT MATCHED BY SOURCE AND t.cents > 25000000 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'S'""")
      s.table("graft_dml.ns.sync").orderBy(col("k"))
    }),

    // ── q124: COUNT(*) FROM MANIFEST ROW COUNTS — Iceberg's
    // snapshot-summary answer: every base file records its exact row
    // count at commit, so an unfiltered count of a clean (delta-free)
    // snapshot is a plan-time sum over the manifest — zero data files
    // opened (RowCatalogSpec pins the files-opened counter at 0, and
    // that a delta-bearing MOR snapshot refuses the shortcut). The
    // oracle recomputes the same count relationally.
    "q124_dml_manifest_count" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.sql(s"SELECT COUNT(*) AS n FROM $t")
    }),

    // ── q123: `TIMESTAMP AS OF` TIME TRAVEL — q107's version pin by
    // WALL CLOCK: commit times are recorded (strictly monotonic) in
    // each manifest header, and the as-of read resolves to the latest
    // version committed at or before the given instant. The query
    // reads v2's own recorded time back and asks for exactly that
    // instant — boundary-inclusive resolution must return the MERGE
    // state (the oracle's `merged` restatement), not the DELETE that
    // followed a tick later. RowCatalogSpec pins the between-versions
    // and before-first-commit cases under a controlled clock.
    "q123_dml_timestamp_travel" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      val ms = RowStore.commitTimeMs(t, 2)
      // epoch-based timestamp expression, NOT a zone-less string
      // literal: a wall-clock literal parses in the session timezone,
      // silently coupling snapshot resolution to a UTC session config
      s.sql(s"""SELECT COUNT(*) AS n,
               CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_cents
        FROM $t TIMESTAMP AS OF timestamp_millis(${ms}L)""")
    }),

    // ── q122: CATALOG STATS → CBO BROADCAST — the scan reports its
    // manifest-derived size (SupportsReportStatistics), so joining the
    // dimension-sized DML table to the parquet fact auto-plans a
    // BroadcastHashJoin with the CATALOG side as build (spec-pinned) —
    // no hint, no shuffle of the fact. Without reported stats a DSv2
    // scan is "unknown = huge" and this join would shuffle both sides
    // at any scale. Every k came from o_orderkey, so the oracle joins
    // the lifecycle restatement back to raw orders.
    "q122_dml_stats_join" -> ((s, d) => {
      import org.apache.spark.sql.functions.{count, lit, sum}
      val t = sharedLifecycle(s, d, mor = false)
      s.table(t)
        .join(graft.Tables(s, d, "orders"), col("k") === col("o_orderkey"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).cast("long").as("sum_cents"),
          sum(col("o_custkey")).cast("long").as("cust_sum"))
        .orderBy(col("status"))
    }),

    // ── q121: SUBQUERY-CONDITIONED DML — `DELETE/UPDATE … WHERE k IN
    // (SELECT …)`: the predicate is a JOIN Spark's row-level rewrite
    // must plan (no metadata shortcut can answer a subquery), the
    // everyday Delta/Iceberg shape for "remove the keys some other
    // query produced". Both statements run through the group-based
    // rewrite against subqueries over the raw orders view; the oracle
    // restates the surviving keys and the conditional bump
    // arithmetically.
    "q121_dml_subquery" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_dml", "graft.sources.GraftCatalog")
      graft.Tables(s, d, "orders").createOrReplaceTempView("q121_orders")
      s.sql("DROP TABLE IF EXISTS graft_dml.ns.subq")
      s.sql("CREATE TABLE graft_dml.ns.subq " +
        "(k BIGINT, cents BIGINT, status STRING)")
      s.sql("""INSERT INTO graft_dml.ns.subq
        SELECT CAST(o_orderkey AS BIGINT),
               CAST(round(o_totalprice * 100) AS BIGINT), o_orderstatus
        FROM q121_orders WHERE o_orderkey % 9 = 0""")
      s.sql("""DELETE FROM graft_dml.ns.subq
        WHERE k IN (SELECT CAST(o_orderkey AS BIGINT)
                    FROM q121_orders WHERE o_orderkey % 18 = 0)""")
      s.sql("""UPDATE graft_dml.ns.subq SET cents = cents + 1000
        WHERE k IN (SELECT CAST(o_orderkey AS BIGINT)
                    FROM q121_orders WHERE o_orderkey % 27 = 0)""")
      s.table("graft_dml.ns.subq").orderBy(col("k"))
    }),

    // ── q120: METADATA COLUMNS as a USER surface — Iceberg's
    // `_file`/`_pos` pattern: the `_group` metadata column the DML
    // machinery reads internally (requiredMetadataAttributes) is also
    // directly selectable, which is how operators audit physical
    // layout (rows per group/file) without any side channel. The
    // oracle restates residency from the group function itself
    // (groupOf(long) = k mod 4 on the default 4-group layout), so a
    // drifting writer-vs-reader group assignment breaks the hash.
    "q120_metadata_columns" -> ((s, d) => {
      val t = sharedLifecycle(s, d, mor = false)
      s.sql(s"""SELECT _group, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM $t GROUP BY _group ORDER BY _group""")
    })
  )

  val oracles: Map[String, String] = Map(
    "q106_merge_into" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // the four retained versions restated from raw orders: v0 empty,
    // v1 the seed, v2 post-merge, v3 post-delete
    "q107_version_asof" ->
      s"""$lifecycleCtes
        |SELECT 0 AS version, CAST(0 AS BIGINT) AS n,
        |       CAST(0 AS BIGINT) AS sum_cents
        |UNION ALL
        |SELECT 1, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM t0
        |UNION ALL
        |SELECT 2, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |UNION ALL
        |SELECT 3, COUNT(*), CAST(SUM(cents) AS BIGINT) FROM merged
        |  WHERE k % 97 <> 0
        |ORDER BY version""".stripMargin,

    "q108_merge_mor" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    "q109_change_feed" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0),
        |ins AS (SELECT k, cents, status FROM fin
        |        EXCEPT ALL SELECT k, cents, status FROM t0),
        |del AS (SELECT k, cents, status FROM t0
        |        EXCEPT ALL SELECT k, cents, status FROM fin)
        |SELECT k, cents, status, 'insert' AS _change FROM ins
        |UNION ALL
        |SELECT k, cents, status, 'delete' AS _change FROM del
        |ORDER BY k, _change""".stripMargin,

    // compaction must be observationally invisible — q108's content
    // restatement verbatim
    "q110_dml_optimize" ->
      s"""$lifecycleCtes
        |SELECT k, cents, status FROM merged
        |WHERE k % 97 <> 0 ORDER BY k""".stripMargin,

    // the middle band restated from raw orders
    "q115_dml_file_skip" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 3 = 1
        |GROUP BY 1 ORDER BY status""".stripMargin,

    // the manifest-answered count recomputed relationally
    "q124_dml_manifest_count" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n FROM merged WHERE k % 97 <> 0""".stripMargin,

    // as-of v2's instant == the post-MERGE pre-DELETE state
    "q123_dml_timestamp_travel" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM merged""".stripMargin,

    // the broadcast-enrichment join restated over the lifecycle CTEs
    "q122_dml_stats_join" ->
      s"""$lifecycleCtes
        |SELECT m.status, COUNT(*) AS n,
        |  CAST(SUM(m.cents) AS BIGINT) AS sum_cents,
        |  CAST(SUM(o.o_custkey) AS BIGINT) AS cust_sum
        |FROM merged m JOIN orders o ON o.o_orderkey = m.k
        |WHERE m.k % 97 <> 0
        |GROUP BY m.status ORDER BY m.status""".stripMargin,

    // the two subquery legs restated: survivors are the seed minus the
    // deleted keys; the bump hits survivors in the update subquery
    "q121_dml_subquery" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    + (CASE WHEN o_orderkey % 27 = 0 THEN 1000 ELSE 0 END) AS cents,
        |  o_orderstatus AS status
        |FROM orders
        |WHERE o_orderkey % 9 = 0 AND o_orderkey % 18 <> 0
        |ORDER BY k""".stripMargin,

    // physical residency restated from the group function: the final
    // lifecycle state bucketed by k mod 4
    "q120_metadata_columns" ->
      s"""$lifecycleCtes
        |SELECT CAST(k % 4 AS INTEGER) AS _group, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM merged WHERE k % 97 <> 0
        |GROUP BY 1 ORDER BY _group""".stripMargin,

    // the three-way sync restated: matched keys (mod 30) doubled,
    // source-only keys inserted as seeded, target-only keys deleted
    // when the PRE-merge cents exceeded the threshold else archived
    "q117_dml_merge_sync" ->
      """WITH u AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c0,
        |    o_orderstatus AS st,
        |    o_orderkey % 30 = 0 AS matched,
        |    o_orderkey % 10 = 0 AS in_target
        |  FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 15 = 0)
        |SELECT k,
        |  CAST(c0 * (CASE WHEN matched THEN 2 ELSE 1 END) AS BIGINT)
        |    AS cents,
        |  CASE WHEN in_target AND NOT matched THEN 'S' ELSE st END
        |    AS status
        |FROM u
        |WHERE NOT (in_target AND NOT matched AND c0 > 25000000)
        |ORDER BY k""".stripMargin,

    // the post-REPLACE state restated; ctas_ok is TRUE by contract
    "q132_dml_ctas" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) > 20000000
        |       THEN 'BIG' ELSE 'SMALL' END AS size,
        |  TRUE AS ctas_ok
        |FROM orders WHERE o_orderkey % 28 = 0 ORDER BY k""".stripMargin,

    // the co-bucketed join restated: keys in both slices are % 30 = 0
    "q131_dml_spj" ->
      """SELECT CAST(o_orderkey % 8 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(SUM(CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey % 30 = 0
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // default-filled and explicit slices restated side by side
    "q130_dml_default_columns" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CASE WHEN o_orderkey % 12 = 0 THEN 42
        |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents,
        |  CASE WHEN o_orderkey % 12 = 0 THEN 'NEW'
        |       ELSE o_orderstatus END AS status
        |FROM orders WHERE o_orderkey % 12 IN (0, 5)
        |ORDER BY k""".stripMargin,

    // the metadata-answered extrema recomputed relationally
    "q129_dml_stats_minmax" ->
      s"""$lifecycleCtes
        |SELECT CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k, COUNT(*) AS n
        |FROM merged WHERE k % 97 <> 0""".stripMargin,

    // the snapshot lineage recomputed relationally: rows per version
    // from the lifecycle CTEs, files per version = distinct non-empty
    // groups (one file per touched group per commit, by the clustered
    // write distribution)
    "q127_dml_history" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0),
        |h AS (
        |  SELECT 0 AS version, 0 AS n_files, 0 AS n_rows
        |  UNION ALL SELECT 1, COUNT(DISTINCT k % 4), COUNT(*) FROM t0
        |  UNION ALL SELECT 2, COUNT(DISTINCT k % 4), COUNT(*) FROM merged
        |  UNION ALL SELECT 3, COUNT(DISTINCT k % 4), COUNT(*) FROM fin)
        |SELECT CAST(version AS INTEGER) AS version,
        |  CAST(n_files AS BIGINT) AS n_files,
        |  CAST(n_rows AS BIGINT) AS n_rows,
        |  version = 3 AS is_current
        |FROM h ORDER BY version""".stripMargin,

    // published state = both slices; the isolation pins are TRUE by
    // the WAP contract
    "q128_dml_wap" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS staged_invisible, TRUE AS audit_saw_staged
        |FROM orders WHERE o_orderkey % 8 IN (0, 3) ORDER BY k""".stripMargin,

    // both slices restated from raw orders — the engine's answer must
    // be layout-invariant across the spec boundary
    "q125_dml_spec_evolution" ->
      """SELECT CAST(o_orderkey % 8 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 13 IN (0, 5)
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // the daily rollup restated over raw events
    "q126_dml_days_transform" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events WHERE event_id % 17 = 0
        |GROUP BY 1 ORDER BY day_start""".stripMargin,

    // the band rollup restated over raw orders
    "q137_dml_identity_transform" ->
      """SELECT CAST(o_orderkey % 10 AS BIGINT) AS band, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders WHERE o_orderkey % 7 = 0
        |  AND o_orderkey % 10 BETWEEN 3 AND 5
        |GROUP BY 1 ORDER BY band""".stripMargin,

    // one base file per group on the lifecycle head — per-file rows
    // and zone maps restated as per-group aggregates of the final
    // state
    "q136_dml_files_table" ->
      s"""$lifecycleCtes,
        |fin AS (SELECT k, cents, status FROM merged WHERE k % 97 <> 0)
        |SELECT CAST(k % 4 AS INTEGER) AS grp, 'base' AS kind,
        |  COUNT(*) AS n_rows, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM fin GROUP BY 1 ORDER BY grp""".stripMargin,

    // the monthly rollup restated over raw orders (date_trunc returns
    // DATE in DuckDB — cast to TIMESTAMP for schema parity)
    "q134_dml_months_transform" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |    AS month_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_v
        |FROM orders WHERE o_orderkey % 19 = 0
        |GROUP BY 1 ORDER BY month_start""".stripMargin,

    // post-rollback head == the seed; the bad DELETE's victims are
    // exactly the k ≡ 0 (mod 5) seed rows
    "q135_dml_rollback" ->
      """WITH seed AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 6 = 1)
        |SELECT k, cents, (k % 5 = 0) AS deleted_in_v2
        |FROM seed ORDER BY k""".stripMargin,

    // the whole lifecycle restated: seed (pre-rename files) + second
    // slice (post-rename files) + the COW update, with the v1 snapshot
    // re-joined under its snapshot-time column name
    "q133_dml_rename_column" ->
      """WITH seed AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 4 = 1),
        |add2 AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 4 = 2),
        |fin AS (SELECT k,
        |    CASE WHEN k % 10 = 3 THEN cents + 7 ELSE cents END AS amount
        |  FROM (SELECT * FROM seed UNION ALL SELECT * FROM add2))
        |SELECT f.k, f.amount, s.cents AS cents_v1
        |FROM fin f LEFT JOIN seed s USING (k)
        |ORDER BY f.k""".stripMargin,

    // insert + self-merge restated: a key ≡ 44 (mod 66) had its cents
    // doubled by the MERGE (t.cents + src.cents with src ≡ the seed)
    "q116_dml_bucket_transform" ->
      """SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |    * (CASE WHEN o_orderkey % 66 = 44 THEN 2 ELSE 1 END) AS cents,
        |  CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status
        |FROM orders WHERE o_orderkey % 11 = 0 ORDER BY k""".stripMargin,

    // post-vacuum current content + the retention contract literals
    "q111_dml_vacuum" ->
      s"""$lifecycleCtes
        |SELECT COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  2 AS n_versions, TRUE AS reclaimed, TRUE AS expired_read_fails
        |FROM merged WHERE k % 97 <> 0""".stripMargin
  )
}
