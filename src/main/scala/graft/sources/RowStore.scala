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
  /** Driver-side commit lock: the FAST PATH for same-JVM commit
    * ordering. Cross-process atomicity does NOT rest on it — every
    * manifest publishes via [[publishStaged]]'s atomic
    * create-if-absent (write the rendered manifest to a temp file,
    * then hard-link it to `v<N>.manifest`, which FAILS if another
    * process already committed that version). A loser gets
    * [[CommitConflictException]] and re-validates against the new
    * head — the atomic-rename / metastore-swap commit rule every
    * real lake format uses, so two driver processes against one
    * warehouse can never interleave half-written manifests or
    * silently clobber each other's commits
    * (CrossProcessCommitSpec forks a second JVM to prove it). */
  private[sources] val commitLock = new Object

  /** Thrown when a manifest publish loses the cross-process
    * create-if-absent race: another writer committed the same version
    * number first. The in-JVM [[commitLock]] makes this unreachable
    * for same-process contention; callers with rebase logic
    * (GroupWrite's OCC validation) catch it, re-read the head,
    * re-validate, and retry — everyone else surfaces it as a loud
    * retry-the-statement error. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Plan-time observability for the spec (the SeqSourceSpec
    * emission-counter discipline): base files planned / skipped by
    * the LAST GroupScan planning on this driver. */
  val lastPlannedBaseFiles = new java.util.concurrent.atomic.AtomicInteger(0)
  val lastSkippedBaseFiles = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Column names reserved for metadata / delta-record bookkeeping. */
  private[sources] val Reserved =
    Set("_group", "_rid", "_change", "_op", "_grp", "_zv",
      "_row_id", "_rowid")

  /** Test seam: invoked at the top of every batch-write commit BEFORE
    * the lock is taken. The concurrency spec points it at a latch so
    * two contending row-level operations both finish their scans
    * before either commits — the interleaving the OCC validation
    * exists for, made deterministic. Production value is a no-op. */
  @volatile private[graft] var preCommitHook: () => Unit = () => ()

  /** Test seam: invoked after a batch-write commit has computed its
    * next manifest from the head it read, immediately BEFORE the
    * atomic publish. The cross-process spec points it at a wait so a
    * SECOND PROCESS can commit inside the window — forcing the
    * create-if-absent loss and the rebase-retry deterministically.
    * Production value is a no-op. */
  @volatile private[graft] var prePublishHook: () => Unit = () => ()

  /** Test seam: observes the java-serialized byte size of each MOR
    * delta commit's WriterCommitMessage array. DeletionVectorSpec
    * pins through it that the dv payload transiting the driver is
    * O(touched files) — a regression back to bitmap words in the
    * message (rows/8 bytes per file) shows up as message bytes
    * scaling with deleted-row count. Production value is null. */
  @volatile private[graft] var commitBytesProbe: Long => Unit = null

  /** Java-serialized size of `o`, counted without buffering the
    * bytes (the probe's measuring stick). */
  private[graft] def serializedSize(o: AnyRef): Long = {
    class Counter extends java.io.OutputStream {
      var n = 0L
      override def write(b: Int): Unit = n += 1
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        n += len
    }
    val c = new Counter
    val oos = new java.io.ObjectOutputStream(c)
    oos.writeObject(o)
    oos.close()
    c.n
  }

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
  /** `dv` (TBLPROPERTIES('deletes'='dv'), MOR only): row deletions
    * commit as one DELETION-VECTOR bitmap per touched data file
    * instead of row-granularity position-delete records — Delta's DVs
    * / Iceberg v3's puffin delete vectors. The invariant that makes
    * high-churn MOR readable at 100 TB: a file has AT MOST ONE vector
    * regardless of how many delete commits touched it, so replay cost
    * tracks touched-file count, never deleted-row count. */
  /** `rowids` (TBLPROPERTIES('rowids'='on'), CREATE-time only): ROW
    * LINEAGE — Iceberg v3's row-lineage / Delta's row-tracking model.
    * Every committed row gets a STABLE unique `_row_id`, assigned at
    * manifest-commit time from a per-table monotone counter
    * (`#nextrowid` manifest header): each new row-bearing entry
    * receives a contiguous id range `[firstRowId, firstRowId+rows)`
    * and a row's id is VIRTUALLY inherited as firstRowId + its
    * position — zero bytes stored per row on the append path. Writers
    * that RELOCATE rows (COW rewrites, OPTIMIZE/clustering/binpack)
    * MATERIALIZE the carried id into a reserved `_rowid` file column,
    * which the reader prefers over inheritance — so ids survive every
    * rewrite. Assignment lives in [[stageManifest]] (the one funnel
    * every version commit passes through), so concurrent rebased
    * commits re-assign from the new head and ids can never collide. */
  case class Meta(schema: StructType, numGroups: Int, mor: Boolean,
      bucketCol: String = "", dropped: Seq[String] = Seq.empty,
      transform: String = "bucket", tparam: Long = 0L, specId: Int = 0,
      renames: Map[String, String] = Map.empty,
      bloomCols: Seq[String] = Seq.empty, dv: Boolean = false,
      ndvCols: Seq[String] = Seq.empty, check: String = "",
      rowids: Boolean = false, gen: String = "") {
    def keyCol: String = if (bucketCol.nonEmpty) bucketCol else schema.head.name
    /** The name column `n`'s values are stored under in data files. */
    def storageOf(n: String): String = renames.getOrElse(n, n)
  }

  /** One manifest entry: `kind` ∈ base|delta; base entries carry the
    * group they belong to, delta entries apply table-wide (each record
    * inside names its group). Base entries written by this version
    * also carry the key column's [min, max] — the zone-map stats file
    * skipping plans from: `minK`/`maxK` for numeric/temporal keys,
    * `minS`/`maxS` TRUNCATED bounds (Iceberg's string-stats model,
    * [[StrBounds]]) for string keys. None for delta files, entries
    * written before stats existed, and string prefixes the truncation
    * can't bound soundly; statless files are never skipped.
    *
    * `colsN`/`colsS` are PER-COLUMN zone maps (Iceberg's
    * lower_bounds/upper_bounds, which it records for EVERY column):
    * exact [min, max] of each numeric/temporal column and truncated
    * string bounds of each string column, keyed by the column's
    * STORAGE name (stable across RENAME). Bounds cover the column's
    * NON-NULL values — sound for the pushed comparison shapes, which
    * no NULL satisfies. A column absent from the map (all-NULL file,
    * unsound truncation, pre-stats manifest) never skips. */
  /** `ndv` (opt-in via TBLPROPERTIES('ndv'='col,...')): per-column
    * KMV DISTINCT-COUNT sketches — the K smallest distinct value
    * hashes, unsigned-sorted. Mergeable across files by construction
    * (union, keep K smallest), which is the whole point: Iceberg
    * ships theta-sketch NDVs in puffin blobs for the same reason —
    * per-file sketches fold to a table-level distinct count at plan
    * time, feeding CBO join-cardinality estimation, without any
    * full-column scan. ≤ K longs per (file, column). */
  /** `firstRowId` (rowids tables): the first id of this entry's
    * contiguous row-id range — a row's inherited id is
    * firstRowId + its position (base files) / record index (delta
    * files). Assigned exactly once, at the entry's first version
    * commit, and carried verbatim through every later manifest
    * (rollback, branch publish, clone, transaction adoption), which
    * is what makes the ids stable. None on non-rowids tables, dv
    * entries, and rows staged-but-not-yet-committed. */
  case class FileEntry(kind: String, group: Int, name: String,
      minK: Option[Long] = None, maxK: Option[Long] = None,
      rows: Option[Long] = None, spec: Int = 0,
      minS: Option[String] = None, maxS: Option[String] = None,
      colsN: Map[String, (Long, Long)] = Map.empty,
      colsS: Map[String, (String, String)] = Map.empty,
      blooms: Map[String, String] = Map.empty,
      ndv: Map[String, (Long, Seq[Long])] = Map.empty,
      dvTarget: Option[String] = None,
      firstRowId: Option[Long] = None)

  /** TRUNCATED string bounds — Iceberg's string zone-map model
    * (iceberg UnicodeUtil.truncateStringMax): bounds are capped at
    * [[StrBounds.Len]] chars so a long-key table's manifest stays
    * metadata-sized. The lower bound truncates plainly (a prefix is ≤
    * the full string in binary order); the upper bound truncates and
    * INCREMENTS its last char so it stays ≥ every string it covers.
    * Soundness guard: bounds are recorded only when the truncated
    * prefix is pure ASCII (and, for an incremented upper, the last
    * char has ASCII headroom) — there UTF-16 char order, UTF-8 byte
    * order (Spark's string comparison), and the +1 increment all
    * agree. Anything else degrades to statless = never skipped;
    * skipping may lose performance, never correctness. */
  object StrBounds {
    val Len = 16

    def enc(s: String): String =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

    /** Spark's string ordering (UTF8String binary compare). */
    def cmp(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

    private def asciiOnly(s: String): Boolean = s.forall(_ < 0x80)

    /** (lower, upper) truncated bounds covering exact [mn, mx], or
      * None when no sound truncation exists. A string short enough to
      * store exactly is sound for ANY content (the writer tracked the
      * extrema in UTF8 order already); only truncation needs the
      * ASCII guard. */
    def truncated(mn: String, mx: String): Option[(String, String)] = {
      val lo =
        if (mn.length <= Len) Some(mn)
        else Some(mn.take(Len)).filter(asciiOnly)
      val up =
        if (mx.length <= Len) Some(mx)
        else {
          val p = mx.take(Len)
          // incrementing the last char makes p' > any string with
          // prefix p — valid in byte order only with ASCII headroom
          if (asciiOnly(p) && p.last < 0x7f) Some(p.init + (p.last + 1).toChar)
          else None
        }
      for (l <- lo; u <- up) yield (l, u)
    }
  }

  /** OPT-IN per-column BLOOM FILTERS for equality-predicate file
    * skipping (Delta's per-column bloom index, manifest-resident like
    * Iceberg's puffin blobs): zone maps only skip when the data is
    * CLUSTERED by the predicate column — a point lookup on an
    * unclustered column finds every file's [min, max] straddling the
    * value and reads everything. A small per-file bloom answers
    * "definitely absent" for exactly that shape. Opt-in via
    * `TBLPROPERTIES('bloom'='col,...')` because the bytes are paid per
    * (file, column): sized at 8 bits per distinct value (power of
    * two, [2^10, 2^16] bits → ≤8 KiB per column per file), k=3
    * probes; a column exceeding [[MaxDistinct]] distinct values in
    * one file records NO bloom (a saturated filter skips nothing but
    * still costs bytes — sound either way, absence just means "never
    * skip"). Hashing is engine-internal (never compared to an
    * oracle): splitmix64 over the long form / FNV-1a over UTF-8 for
    * strings, double hashing for the probe sequence. */
  object Bloom {
    val K = 3
    val MinBits = 1 << 10
    val MaxBits = 1 << 16
    val MaxDistinct = 16384
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** The column types whose canonical externalized form [[hashOf]]
      * tracks — ONE definition for the bloom and ndv property checks
      * at CREATE and the compute_table_stats validation (divergence
      * between them would let ANALYZE accept what CREATE refuses). */
    def trackable(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | TimestampType | StringType |
        org.apache.spark.sql.types.DateType => true
      case d: org.apache.spark.sql.types.DecimalType => d.precision <= 18
      case _ => false
    }

    /** Hash of a stored value's EXTERNALIZED form (what the writer
      * sees): longs/ints/timestamp-micros via the long form, strings
      * via FNV-1a. None = untracked type, no bloom participation. */
    def hashOf(v: Any): Option[Long] = v match {
      case l: java.lang.Long    => Some(mix(l.longValue))
      case i: java.lang.Integer => Some(mix(i.longValue))
      case s: String =>
        var h = 0xcbf29ce484222325L
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
          h ^= (b & 0xffL); h *= 0x100000001b3L
        }
        Some(mix(h))
      case _ => None
    }
    def sizedBits(nDistinct: Int): Int = {
      var m = MinBits
      while (m < nDistinct * 8 && m < MaxBits) m <<= 1
      m
    }
    private def probe(words: Array[Long], m: Int, h: Long,
        set: Boolean): Boolean = {
      val h2 = mix(h) | 1L
      var i = 0
      var all = true
      while (i < K) {
        val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, m).toInt
        if (set) words(bit >> 6) |= 1L << (bit & 63)
        else if ((words(bit >> 6) & (1L << (bit & 63))) == 0L) all = false
        i += 1
      }
      all
    }
    def build(hashes: Iterable[Long], m: Int): Array[Long] = {
      val words = new Array[Long](m / 64)
      hashes.foreach(h => probe(words, m, h, set = true))
      words
    }
    def contains(words: Array[Long], m: Int, h: Long): Boolean =
      probe(words, m, h, set = false)
    def enc(m: Int, words: Array[Long]): String = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      words.foreach(bb.putLong)
      s"$m:" + java.util.Base64.getEncoder.withoutPadding
        .encodeToString(bb.array)
    }
    def dec(s: String): (Int, Array[Long]) = {
      val i = s.indexOf(':')
      val m = s.substring(0, i).toInt
      val bytes = java.util.Base64.getDecoder.decode(s.substring(i + 1))
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val words = new Array[Long](bytes.length / 8)
      var j = 0
      while (j < words.length) { words(j) = bb.getLong; j += 1 }
      (m, words)
    }
  }

  /** KMV (k-minimum-values) distinct-count sketch: keep the K
    * smallest DISTINCT hashes of a column's values in unsigned order.
    * Union-mergeable (union, keep K smallest) — the property that
    * lets per-file sketches recorded at write time fold into a
    * table-level NDV at plan time, the same economics as Iceberg's
    * puffin theta sketches. Estimator: exact when fewer than K
    * distinct hashes were ever seen; otherwise the classic
    * (K−1)/R with R = the Kth smallest hash as a fraction of the
    * hash space (Bar-Yossef et al.), ±~8% at K = 256. Hashes come
    * from [[Bloom.hashOf]]'s canonical externalized forms, so DATE/
    * DECIMAL columns sketch the same values the files store. */
  object Kmv {
    val K = 256
    private def uDouble(x: Long): Double =
      if (x >= 0L) x.toDouble else (x >>> 1).toDouble * 2.0 + (x & 1L)
    /** Merge two unsigned-sorted distinct sketches → K smallest. */
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val out = new scala.collection.mutable.ArrayBuffer[Long](K)
      var i = 0
      var j = 0
      while (out.length < K && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length &&
          java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (out.isEmpty || out.last != v) out += v
      }
      out.toSeq
    }
    /** Estimated distinct count from a (possibly merged) sketch. */
    def estimate(sk: Seq[Long]): Long =
      if (sk.size < K) sk.size.toLong
      else math.max(K.toLong, math.round(
        (K - 1).toDouble * 1.8446744073709552e19 / uDouble(sk.last)))
    /** A fresh bounded sketch accumulator (unsigned-ordered). */
    def newSet(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long](
        (a: java.lang.Long, b: java.lang.Long) =>
          java.lang.Long.compareUnsigned(a, b))
    /** Fold one hash into a bounded accumulator (keep K smallest). */
    def add(set: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
      set.add(h)
      if (set.size > K) { set.pollLast(); () }
    }
    def toSeq(set: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
      val it = set.iterator()
      val buf = new scala.collection.mutable.ArrayBuffer[Long](set.size)
      while (it.hasNext) buf += it.next().longValue
      buf.toSeq
    }

    def enc(sk: Seq[Long]): String = {
      val bb = java.nio.ByteBuffer.allocate(sk.length * 8)
      sk.foreach(bb.putLong)
      java.util.Base64.getEncoder.withoutPadding.encodeToString(bb.array)
    }
    def dec(s: String): Seq[Long] = {
      val bytes = java.util.Base64.getDecoder.decode(s)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      (0 until bytes.length / 8).map(_ => bb.getLong)
    }
  }

  /** DELETION-VECTOR blob codec (Delta's DV files / Iceberg v3's
    * puffin delete vectors, minus the roaring compression a production
    * format adds): one blob per TARGET data file — line 1 the target's
    * leaf name, line 2 a base64 word bitmap of its deleted positions.
    * Position bits address the target's rids (`<leaf>#<pos>`), so a
    * vector is confluent: rid-deletes are terminal (no later record
    * can resurrect a rid — inserts mint NEW rids, updates no-op on
    * absent ones), which is what makes union-merging vectors across
    * commits and carrying the merged blob at the LATEST commit's
    * manifest position observationally identical to per-commit delete
    * records. Blob size is rows-per-file/8 bytes — file-level
    * metadata, never data. */
  object Dv {
    def union(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.max(a.length, b.length))
      a.copyToArray(out)
      var i = 0
      while (i < b.length) { out(i) |= b(i); i += 1 }
      out
    }
    def cardinality(words: Array[Long]): Int =
      words.map(java.lang.Long.bitCount).sum
    def foreachSet(words: Array[Long])(f: Int => Unit): Unit = {
      var w = 0
      while (w < words.length) {
        var bits = words(w)
        while (bits != 0L) {
          val bit = java.lang.Long.numberOfTrailingZeros(bits)
          f(w * 64 + bit)
          bits &= bits - 1
        }
        w += 1
      }
    }
    def write(path: String, target: String, words: Array[Long]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      words.foreach(bb.putLong)
      Files.writeString(Paths.get(path), target + "\n" +
        java.util.Base64.getEncoder.withoutPadding
          .encodeToString(bb.array) + "\n")
      ()
    }
    /** (target leaf name, position bitmap words). */
    def read(path: String): (String, Array[Long]) = {
      val lines = Files.readAllLines(Paths.get(path)).asScala
      val bytes = java.util.Base64.getDecoder.decode(lines(1))
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val words = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < words.length) { words(i) = bb.getLong; i += 1 }
      (lines(0), words)
    }
  }

  /** Per-session table root (Scratch semantics: per-applicationId,
    * deleted on JVM exit). All catalog/commit calls run on the driver;
    * executors only ever see absolute file paths.
    *
    * `-Dgraft.warehouse.root=<dir>` overrides the per-application
    * scratch with a SHARED warehouse — the deploy shape where several
    * driver processes commit against the same lake (what the atomic
    * create-if-absent publish exists for). The override directory is
    * caller-owned: nothing deletes it on exit. */
  private def root(): String =
    sys.props.get("graft.warehouse.root").getOrElse(
      graft.Scratch.dir(SparkSession.active, "graft_rowcat", "tables"))

  private[sources] def tableDir(key: String): String = s"${root()}/$key"
  private[graft] def dataDir(key: String): String = {
    val d = s"${tableDir(key)}/data"
    Files.createDirectories(Paths.get(d))
    d
  }
  private def metaPath(key: String): Path =
    Paths.get(tableDir(key), "meta")

  def exists(key: String): Boolean = Files.exists(metaPath(key))

  /** A manifest entry's on-disk path. Entry names are normally leaf
    * file names under the table's data dir; `add_files`-registered
    * entries carry ABSOLUTE paths (file identity preserved — zero
    * copies, the Iceberg add_files contract), marked by the leading
    * '/'. External files are referenced, never owned: VACUUM and
    * orphan cleanup sweep only the data dir's own listing. */
  def entryPath(dir: String, name: String): String =
    if (name.startsWith("/")) name else s"$dir/$name"

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

  /** The catalog's storable column types: the trackable set (long/int/
    * timestamp/date/decimal≤18/string — zone maps, blooms, NDV all
    * apply), the STATLESS scalars (double/float/binary — stored
    * natively, never skipped by stats), ARRAY of a primitive element
    * ([[RowNested.Arr]]'s blob encoding — the `ARRAY<FLOAT>` embedding
    * column an LLM-pipeline lake table holds on day one), MAP of
    * primitives ([[RowNested.Mp]]'s canonically-ordered blob — the
    * dynamic-key attribute bag JSON shredding spills into), and STRUCT
    * of storable fields (validated recursively). Checked at CREATE and
    * ADD COLUMN so an unstorable type fails at DDL time, not at the
    * first write. */
  def storable(dt: DataType): Boolean = dt match {
    case _ if Bloom.trackable(dt) => true
    case org.apache.spark.sql.types.DoubleType |
      org.apache.spark.sql.types.FloatType |
      org.apache.spark.sql.types.BinaryType => true
    case at: org.apache.spark.sql.types.ArrayType =>
      graft.sources.RowNested.Arr.supportedElem(at.elementType)
    case mt: org.apache.spark.sql.types.MapType =>
      graft.sources.RowNested.Mp.supported(mt.keyType, mt.valueType)
    case _: StructType => true // fields validated recursively below
    case _ => false
  }

  /** Every declared name at any nesting depth must be storable AND
    * free of '.' — the dot is the flattened-leaf path separator
    * (RowNested), so a declared name containing one would ambiguate
    * storage paths. Dropped/rename entries legitimately CARRY dotted
    * paths and validate via [[validateColName]] only. */
  private def validateFieldNames(fields: Seq[StructField]): Unit =
    fields.foreach { f =>
      validateColName(f.name)
      require(!f.name.contains('.'),
        s"column name ${f.name} may not contain '.' (reserved for " +
          "nested field paths)")
      require(storable(f.dataType),
        s"column ${f.name} has unstorable type ${f.dataType.simpleString}" +
          " — storable: BIGINT/INT/STRING/TIMESTAMP/DATE/DECIMAL(<=18)/" +
          "DOUBLE/FLOAT/BINARY/ARRAY<primitive>/MAP<primitive, " +
          "primitive>/STRUCT of those")
      f.dataType match {
        case st: StructType => validateFieldNames(st.fields.toSeq)
        case _              => ()
      }
    }

  def writeMeta(key: String, m: Meta): Unit = {
    validateFieldNames(m.schema.fields.toSeq)
    (m.dropped ++
      m.renames.keys ++ m.renames.values).foreach(validateColName)
    Files.createDirectories(Paths.get(tableDir(key)))
    Files.writeString(metaPath(key),
      s"groups=${m.numGroups}\nmor=${m.mor}\npcol=${m.bucketCol}\n" +
        s"ptf=${m.transform}\nparg=${m.tparam}\nspec=${m.specId}\n" +
        s"dropped=${m.dropped.mkString(",")}\n" +
        s"renames=${renderRenames(m.renames)}\n" +
        s"bloom=${m.bloomCols.mkString(",")}\ndv=${m.dv}\n" +
        s"ndv=${m.ndvCols.mkString(",")}\ncheck=${m.check}\n" +
        s"rowids=${m.rowids}\ngen=${m.gen}\n" +
        s"schema=${m.schema.json}\n")
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
      parseRenames(kv.getOrElse("renames", "")),
      kv.getOrElse("bloom", "").split(",").filter(_.nonEmpty).toSeq,
      kv.getOrElse("dv", "false").toBoolean,
      kv.getOrElse("ndv", "").split(",").filter(_.nonEmpty).toSeq,
      kv.getOrElse("check", ""),
      kv.getOrElse("rowids", "false").toBoolean,
      kv.getOrElse("gen", ""))
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

  /** Manifest CHAIN checkpoint cadence: a commit writes an INCREMENTAL
    * manifest (`#parent` + `#rm` removals + added entries — O(change),
    * the Delta-log commit model) unless its chain would exceed this
    * depth, where it writes a FULL (self-contained) manifest instead —
    * Delta's checkpoint-every-10 rule. Bounds planner read cost to
    * CheckpointEvery manifest files per snapshot even if nobody ever
    * calls rewrite_manifests; at a 100-TB commit cadence this is what
    * keeps commit cost O(delta) without letting read cost grow
    * O(history). */
  val CheckpointEvery = 16

  /** Number of manifest FILES walked to resolve version `v` — 1 for a
    * full (checkpointed) manifest, parent chain + 1 for incrementals.
    * The `rewrite_manifests` procedure reports and collapses this. */
  def manifestChainLength(key: String, v: Int): Int = {
    val lines = Files.readAllLines(
      Paths.get(tableDir(key), s"v$v.manifest")).asScala
    lines.collectFirst { case l if l.startsWith("#parent\t") =>
      l.stripPrefix("#parent\t").toInt } match {
      case Some(p) => 1 + manifestChainLength(key, p)
      case None    => 1
    }
  }

  /** EXACT row count of an entry list, defined only when provably so:
    * no delta/deletion-vector files (they add/remove/move rows at read
    * time) and every entry recorded a count — the one "clean snapshot"
    * rule the COUNT(*) pushdown and the reported CBO statistics both
    * apply, so the two can never silently diverge. */
  def exactRowCount(entries: Seq[FileEntry]): Option[Long] =
    if (entries.exists(_.kind != "base") ||
      entries.exists(_.rows.isEmpty)) None
    else Some(entries.map(_.rows.get).sum)

  /** Range-slice count for a clustering rewrite (sorted / z-order),
    * derived from the TABLE'S OWN SIZE instead of the session's core
    * count (optimization round 17, guide §2 — scale-adaptive
    * partitioning): slices = ceil(current base rows / target rows per
    * file), floored at `floor` so a small table still splits into
    * enough range-disjoint files for zone-map skipping (the rewrite's
    * whole point — AQE would coalesce an unpinned count to ONE slice
    * and silently recreate the group-wide files). Core-count-derived
    * counts made the SAME rewrite write 4× more files at local[32]
    * than local[8] (q161 2.0 s @32c vs 1.56 @8c) while the slice
    * count is a property of the data, not the box. The target is the
    * deployment's file-sizing knob (`spark.graft.rewrite.targetFileRows`,
    * default 4M rows ≈ a few hundred MB for typical lake rows — the
    * guide §6 output-file band); manifest row counts are plan-time
    * metadata, so this opens zero data files. */
  def rewriteSlices(tableKey: String, floor: Int): Int = {
    val target = org.apache.spark.sql.SparkSession.active.sessionState
      .conf.getConfString("spark.graft.rewrite.targetFileRows", "4000000")
      .toLong
    val rows = readManifest(tableKey, currentVersion(tableKey))
      .iterator.filter(_.kind == "base").flatMap(_.rows).sum
    math.max(floor, math.ceil(rows.toDouble / target.toDouble).toInt)
  }

  /** One version's manifest FILE shape (not its resolved snapshot):
    * (parent version if incremental, own entry-line count, removal
    * count) — what the `.manifests` metadata table surfaces so an
    * operator can see chain structure and per-commit write cost. */
  def manifestFileStats(key: String, v: Int): (Option[Int], Int, Int) = {
    val lines = Files.readAllLines(
      Paths.get(tableDir(key), s"v$v.manifest")).asScala.toSeq
    val parent = lines.collectFirst { case l if l.startsWith("#parent\t") =>
      l.stripPrefix("#parent\t").toInt }
    // count entry LINES (parseEntries' own keep-predicate) rather than
    // fully parsing per-column bounds and bloom blobs just for a size
    (parent, lines.count(l => l.nonEmpty && !l.startsWith("#")),
      lines.count(_.startsWith("#rm\t")))
  }

  /** Resolved-entry cache for [[readManifest]]: a committed version's
    * RESOLVED entry sequence is immutable (files never change meaning;
    * even [[materializeManifest]] rewrites only the FILE SHAPE — same
    * resolved entries by contract), so one (key, version) resolution
    * can be reused for the table's lifetime. Without it, every commit
    * on a deep incremental chain re-walks the chain's manifest FILES
    * (st31's per-micro-batch MERGE read the whole chain per epoch —
    * O(chain) file IO per commit, the round-11 regression), and every
    * scan build re-reads at least one file. LRU-bounded; purged per
    * table on [[drop]] and per version when VACUUM deletes a manifest
    * (a cached entry surviving expiry would let `VERSION AS OF` an
    * expired snapshot silently succeed — q111 pins that it fails). */
  private val ManifestCacheCap = 512
  private val manifestCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Int), Seq[FileEntry]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Seq[FileEntry]]) =
        size > ManifestCacheCap
    })

  private[sources] def purgeManifestCache(key: String, v: Int): Unit = {
    manifestCache.remove((tableDir(key), v)); ()
  }
  private def purgeManifestCacheTable(key: String): Unit =
    manifestCache.synchronized {
      manifestCache.keySet.asScala.filter(_._1 == tableDir(key)).toList
        .foreach(manifestCache.remove)
    }

  def readManifest(key: String, v: Int): Seq[FileEntry] = {
    // keyed by the PER-APPLICATION table dir (see epochCache): a
    // re-created same-named table under a new SparkSession's root
    // must never resolve through the old application's cache
    val ck = (tableDir(key), v)
    val cached = manifestCache.get(ck)
    if (cached != null) cached
    else {
      val lines = Files.readAllLines(
        Paths.get(tableDir(key), s"v$v.manifest")).asScala.toSeq
      val resolved = lines.collectFirst { case l if l.startsWith("#parent\t") =>
        l.stripPrefix("#parent\t").toInt } match {
        case None => parseEntries(lines)
        case Some(p) =>
          // incremental: parent's resolved entries minus this commit's
          // removals (relative order preserved), plus its additions
          // appended — exactly the sequence the commit validated at
          // write time, so manifest order (= commit order, what MOR
          // replay keys on) survives the chain encoding
          val removed = lines.collect {
            case l if l.startsWith("#rm\t") => l.stripPrefix("#rm\t") }.toSet
          readManifest(key, p).filterNot(e => removed(e.name)) ++
            parseEntries(lines)
      }
      manifestCache.put(ck, resolved)
      resolved
    }
  }

  /** Rewrite version `v`'s manifest as FULL (self-contained): same
    * resolved entries, same headers, chain length 1 — the
    * `rewrite_manifests` compaction and VACUUM's chain-cut. Byte
    * content of every snapshot is observationally unchanged (reads
    * resolve the identical entry sequence). Caller holds
    * [[commitLock]]. */
  private[sources] def materializeManifest(key: String, v: Int): Unit = {
    val p = Paths.get(tableDir(key), s"v$v.manifest")
    val lines = Files.readAllLines(p).asScala.toSeq
    if (lines.exists(_.startsWith("#parent\t"))) {
      val resolved = readManifest(key, v)
      val headers = lines.filter(l => l.startsWith("#") &&
        !l.startsWith("#parent\t") && !l.startsWith("#rm\t"))
      // write-to-temp + ATOMIC_MOVE: this is the ONE path that rewrites
      // a committed, reader-visible manifest, and readers (scan
      // planning) read manifests without the commit lock — an in-place
      // truncate-and-write would open a torn-read window where a
      // concurrent reader sees an empty or half-written file
      val tmp = Paths.get(tableDir(key), s".v$v.manifest.tmp")
      Files.writeString(tmp,
        headers.map(_ + "\n").mkString + renderEntries(resolved))
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

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
        var minS, maxS: Option[String] = None
        var rows: Option[Long] = None
        var spec = 0
        var colsN = Map.empty[String, (Long, Long)]
        var colsS = Map.empty[String, (String, String)]
        var blooms = Map.empty[String, String]
        var ndv = Map.empty[String, (Long, Seq[Long])]
        var dvTarget: Option[String] = None
        var firstRowId: Option[Long] = None
        toks.drop(3).foreach { t =>
          if (t.startsWith("r") && t.tail.nonEmpty &&
            t.tail.forall(_.isDigit)) rows = Some(t.tail.toLong)
          // `R<id>` = first row id of the entry's lineage range
          else if (t.startsWith("R") && t.tail.nonEmpty &&
            t.tail.forall(_.isDigit)) firstRowId = Some(t.tail.toLong)
          else if (t.startsWith("s") && t.tail.nonEmpty &&
            // import specs are NEGATIVE ids ("s-1") — see addFiles
            t.tail.forall(c => c.isDigit || c == '-')) spec = t.tail.toInt
          // `L<enc>`/`U<enc>` = URL-encoded truncated STRING bounds
          // (encoding keeps a bound containing tab/newline from
          // corrupting the line-oriented layout)
          else if (t.startsWith("L")) minS = Some(StrBounds.dec(t.tail))
          else if (t.startsWith("U")) maxS = Some(StrBounds.dec(t.tail))
          // `C<enc(col)>~<min>~<max>` / `T<enc(col)>~<encLo>~<encHi>`
          // = per-COLUMN numeric / truncated-string bounds (all three
          // parts URL-encoded, so `~` in a name or bound can't split)
          else if (t.startsWith("C")) {
            val Array(n, mn, mx) = t.tail.split("~", 3)
            colsN += StrBounds.dec(n) -> (mn.toLong, mx.toLong)
          } else if (t.startsWith("T")) {
            val Array(n, lo, hi) = t.tail.split("~", 3)
            colsS += StrBounds.dec(n) ->
              (StrBounds.dec(lo), StrBounds.dec(hi))
          }
          // `F<enc(col)>~<m>:<b64bits>` = opt-in per-column BLOOM
          // filter for equality-predicate file skipping
          else if (t.startsWith("F")) {
            val Array(n, b) = t.tail.split("~", 2)
            blooms += StrBounds.dec(n) -> b
          }
          // `D<enc(target)>` = a deletion-vector entry's target data
          // file, manifest-resident so a delete commit can find (and
          // replace) the touched files' vectors WITHOUT opening every
          // blob — keeping commit IO proportional to touched files
          else if (t.startsWith("D")) dvTarget = Some(StrBounds.dec(t.tail))
          // `N<enc(col)>~<nulls>~<b64longs>` = opt-in per-column KMV
          // distinct-count sketch with the column's null count
          // ([[Kmv]]; catalyst's join estimation requires BOTH —
          // ColumnStat.hasCountStats gates on distinct AND null counts)
          else if (t.startsWith("N")) {
            val Array(n, nu, b) = t.tail.split("~", 3)
            ndv += StrBounds.dec(n) -> ((nu.toLong, Kmv.dec(b)))
          }
          else if (minK.isEmpty) minK = Some(t.toLong)
          else if (maxK.isEmpty) maxK = Some(t.toLong)
          else sys.error(s"corrupt manifest line: $l")
        }
        require(minK.isDefined == maxK.isDefined,
          s"corrupt manifest line (unpaired stats): $l")
        require(minS.isDefined == maxS.isDefined,
          s"corrupt manifest line (unpaired string stats): $l")
        FileEntry(toks(0), toks(1).toInt, toks(2), minK, maxK, rows, spec,
          minS, maxS, colsN, colsS, blooms, ndv, dvTarget, firstRowId)
      }

  private def renderEntries(entries: Seq[FileEntry]): String =
    entries.map { e =>
      val stats = (e.minK, e.maxK) match {
        case (Some(mn), (Some(mx))) => s"\t$mn\t$mx"
        case _ => ""
      }
      val sstats = (e.minS, e.maxS) match {
        case (Some(mn), Some(mx)) =>
          s"\tL${StrBounds.enc(mn)}\tU${StrBounds.enc(mx)}"
        case _ => ""
      }
      val rows = e.rows.map(r => s"\tr$r").getOrElse("")
      val spec = if (e.spec != 0) s"\ts${e.spec}" else ""
      val cn = e.colsN.toSeq.sortBy(_._1).map { case (n, (mn, mx)) =>
        s"\tC${StrBounds.enc(n)}~$mn~$mx" }.mkString
      val cs = e.colsS.toSeq.sortBy(_._1).map { case (n, (lo, hi)) =>
        s"\tT${StrBounds.enc(n)}~${StrBounds.enc(lo)}~${StrBounds.enc(hi)}"
      }.mkString
      val bl = e.blooms.toSeq.sortBy(_._1).map { case (n, b) =>
        s"\tF${StrBounds.enc(n)}~$b" }.mkString
      val nd = e.ndv.toSeq.sortBy(_._1).map { case (n, (nu, sk)) =>
        s"\tN${StrBounds.enc(n)}~$nu~${Kmv.enc(sk)}" }.mkString
      val dvt = e.dvTarget.map(t => s"\tD${StrBounds.enc(t)}").getOrElse("")
      // `R<id>` = the entry's first row id (row lineage; uppercase R
      // is distinct from the lowercase `r<count>` row-count token)
      val frid = e.firstRowId.map(r => s"\tR$r").getOrElse("")
      s"${e.kind}\t${e.group}\t${e.name}$stats$sstats$rows$spec$cn$cs$bl$nd$dvt$frid"
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
    // keyed by the PER-APPLICATION table dir, not the bare name: a
    // second SparkSession in this JVM gets a fresh scratch root, and
    // a stale mark for a same-named table must not leak across
    val ck = (tableDir(key), queryId)
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
    epochCache.put((tableDir(key), queryId), java.lang.Long.valueOf(epoch))

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

  /** Render + stage version `v`'s manifest to a uniquely-named temp
    * file in the table dir (same filesystem as the target — the
    * precondition for an atomic link/rename), WITHOUT publishing it.
    * [[publishStaged]] makes it the committed version; the split
    * exists so multi-table publish (publish_branches) can stage
    * EVERY table's manifest before linking ANY of them, shrinking
    * the partial-publish crash window to the links alone. */
  /** The row-id high-water mark after version `v`'s commit (rowids
    * tables; `#nextrowid` manifest header). 0 for manifests that
    * predate row lineage — safe, because the assignment fold below
    * also maxes over the entries actually present. */
  def nextRowId(key: String, v: Int): Long = {
    val p = Paths.get(tableDir(key), s"v$v.manifest")
    if (!Files.exists(p)) 0L
    else {
      // header-block scan only: `#nextrowid` is written in the header
      // region, which always precedes the body (`#parent` for
      // incremental manifests, a plain entry line for full ones) — so
      // this reads a handful of lines, never O(entries)
      val r = Files.newBufferedReader(p)
      try {
        var line = r.readLine()
        var out = 0L
        var done = false
        while (!done && line != null) {
          if (line.startsWith("#nextrowid\t")) {
            out = line.stripPrefix("#nextrowid\t").toLong; done = true
          } else if (!line.startsWith("#") ||
            line.startsWith("#parent\t")) done = true
          else line = r.readLine()
        }
        out
      } finally r.close()
    }
  }

  def stageManifest(key: String, v: Int, entries0: Seq[FileEntry],
      extraHeader: Seq[String] = Seq.empty,
      rowIdFloor: Long = 0L): Path = {
    // ── ROW-LINEAGE ASSIGNMENT (rowids tables) — the one funnel every
    // version commit passes through (appends, COW swaps, MOR deltas,
    // streaming epochs, rollback, branch publish, cherry-pick,
    // transaction adoption), so ids are assigned exactly once per
    // entry and a rebased retry re-assigns from the head it actually
    // publishes onto. Each row-bearing entry WITHOUT an id gets the
    // next contiguous range [ctr, ctr + rows); entries that already
    // carry one (carried forward, cloned, adopted — possibly from a
    // clone whose counter ran ahead of ours) keep it, and the new
    // high-water mark maxes over BOTH sources so no later assignment
    // can ever overlap an adopted range. O(entries) driver work, zero
    // per-row cost — the ids themselves are virtual (firstRowId +
    // position) until a rewrite materializes them.
    // one meta read per stage, shared by the row-id assignment and
    // the schema header (the commit funnel is hot — review finding)
    val metaOpt: Option[Meta] =
      if (Files.exists(metaPath(key))) Some(readMeta(key)) else None
    val rowIdState: Option[(Seq[FileEntry], Long)] =
      if (!metaOpt.exists(_.rowids)) None
      else {
        val parentNext = if (v <= 0) 0L else nextRowId(key, v - 1)
        // `rowIdFloor`: an external counter seed — snapshot_table
        // passes the SOURCE table's counter so a clone can never
        // re-mint an id the source already retired
        var ctr = math.max(math.max(parentNext, rowIdFloor),
          entries0.flatMap(e =>
            e.firstRowId.map(_ + e.rows.getOrElse(0L))).maxOption
            .getOrElse(0L))
        val assigned = entries0.map { e =>
          if (e.kind == "dv" || e.firstRowId.isDefined) e
          else e.rows match {
            case Some(r) => val f = ctr; ctr += r
              e.copy(firstRowId = Some(f))
            case None => e
          }
        }
        Some((assigned, ctr))
      }
    val entries = rowIdState.map(_._1).getOrElse(entries0)
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
    val schemaHeader = metaOpt.map { m =>
      Seq(s"#schema\t${m.schema.json}") ++
        // the era's display→storage mapping rides with its schema,
        // so a time-travel read of a post-RENAME version projects
        // files by the right stored names
        (if (m.renames.nonEmpty)
          Seq(s"#renames\t${renderRenames(m.renames)}")
        else Seq.empty)
    }.getOrElse(Seq.empty)
    // INCREMENTAL encoding (the Delta-log commit model): when the new
    // entry list is the parent's with some names removed and new
    // entries appended — which every append/rewrite/compact commit is —
    // the manifest records only `#parent`, the `#rm` removals, and the
    // added entries: commit cost O(change), not O(table). The encoding
    // is taken ONLY when the reconstruction reproduces the entry
    // SEQUENCE exactly (order is commit order — MOR replay depends on
    // it), and the chain is capped at [[CheckpointEvery]] by writing a
    // full manifest past that depth, so snapshot reads stay bounded.
    val body = {
      val pv = v - 1
      val parentPath = Paths.get(tableDir(key), s"v$pv.manifest")
      if (v <= 0 || !Files.exists(parentPath)) renderEntries(entries)
      else if (manifestChainLength(key, pv) >= CheckpointEvery)
        renderEntries(entries)
      else {
        val parent = readManifest(key, pv)
        val newNames = entries.map(_.name).toSet
        val removedNames = parent.collect {
          case e if !newNames(e.name) => e.name }
        val rmSet = removedNames.toSet
        val parentNames = parent.map(_.name).toSet
        val added = entries.filterNot(e => parentNames(e.name))
        val reconstructed = parent.filterNot(e => rmSet(e.name)) ++ added
        if (reconstructed == entries)
          s"#parent\t$pv\n" +
            removedNames.map(n => s"#rm\t$n\n").mkString +
            renderEntries(added)
        else renderEntries(entries)
      }
    }
    val tmp = Files.createTempFile(
      Paths.get(tableDir(key)), s".v$v.manifest.", ".tmp")
    val rowIdHeader =
      rowIdState.map { case (_, ctr) => s"#nextrowid\t$ctr" }.toSeq
    Files.writeString(tmp,
      s"#ms\t$ms\n" +
        (schemaHeader ++ rowIdHeader ++ extraHeader).map(_ + "\n").mkString +
        body)
    tmp
  }

  // ── OBJECT-STORE COMMIT SEAM ──────────────────────────────────────
  // The commit protocol is three named steps — STAGE (write the next
  // manifest's full content to a private temp), CONDITIONAL-PUBLISH
  // (make it the version file iff no one else already did), READ-HEAD
  // (losers re-read, re-validate, retry) — and only the middle step
  // touches storage-specific atomicity. [[ManifestPublisher]] is that
  // step's seam. The local-fs instance uses link(2); on an object
  // store, where a 100 TB deployment actually lives, the SAME protocol
  // maps to the stores' native conditional writes:
  //   - S3:   PUT v<N>.manifest with `If-None-Match: *` (supported
  //           since 2024-08) — 412 Precondition Failed = conflict;
  //   - GCS:  upload with `x-goog-if-generation-match: 0` — 412;
  //   - ADLS: create with `If-None-Match: *` — 409/412.
  // Nothing else in the engine changes: staging is a plain object
  // write under a unique key, and reads are plain GETs (every
  // manifest is immutable once published). [[CasPublisher]] is a
  // second, in-memory instance of the seam modeling exactly that
  // compare-and-swap shape, exercised by the commit-seam spec.

  /** The conditional-publish step: make `target` exist with
    * `staged`'s content IFF `target` does not already exist, atomically
    * against concurrent publishers AND concurrent readers (a reader
    * sees the full content or no file — never a torn prefix). Must
    * throw [[java.nio.file.FileAlreadyExistsException]] when another
    * writer won (the condition-failed signal — S3's 412). `staged` is
    * consumed: deleted on every path. */
  trait ManifestPublisher {
    def publishIfAbsent(target: Path, staged: Path): Unit
  }

  /** Local-filesystem instance: on POSIX, link(2) FAILS if the target
    * exists, so exactly ONE writer (in this process or any other) can
    * ever publish a given version, and the link appears with its full
    * content or not at all. Filesystems without hard links fall back
    * to exists-check + ATOMIC_MOVE + content verify (atomic against
    * torn reads; the verify turns a sub-millisecond cross-process tie
    * from a silent clobber into a loud conflict — the POSIX link path
    * is the contract, the fallback keeps exotic mounts usable). */
  object HardLinkPublisher extends ManifestPublisher {
    def publishIfAbsent(target: Path, staged: Path): Unit =
      try {
        try Files.createLink(target, staged)
        catch {
          // no-hardlink mounts surface as UnsupportedOperationException
          // OR a generic FileSystemException ("Operation not permitted"
          // on CIFS/FAT/some NFS) — both route to the fallback; the
          // FileAlreadyExists subtype must NOT (it is the commit-race
          // signal, propagated)
          case e @ (_: UnsupportedOperationException |
            _: java.nio.file.FileSystemException)
            if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
            if (Files.exists(target))
              throw new java.nio.file.FileAlreadyExistsException(
                target.toString)
            // POSIX rename() REPLACES an existing target, so a
            // cross-process tie inside the exists→move window would
            // silently clobber the winner's manifest. Verify after the
            // move: re-read the published file and require it to be
            // EXACTLY what this writer staged — a mismatch means a
            // rival landed between this writer's move and its re-read,
            // and the loud conflict below replaces what would
            // otherwise be silent data loss (r15 advisor finding).
            // PRECISELY what this buys: the silent-loss window shrinks
            // from the whole exists→move gap to the sub-millisecond
            // move→re-read gap — a rival that lands AFTER this
            // writer's verify still clobbers it with both sides
            // reporting success. That residue is why this path is the
            // FALLBACK: link(2) (above) and an object store's
            // conditional PUT ([[CasPublisher]]'s model) are the
            // closed-window instances of the seam; a no-hardlink
            // mount narrows the race but does not close it.
            val stagedBytes = Files.readAllBytes(staged)
            Files.move(staged, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            if (!java.util.Arrays.equals(
                Files.readAllBytes(target), stagedBytes))
              throw new java.nio.file.FileAlreadyExistsException(
                s"$target (fallback publish verify: the published " +
                  "content is not this writer's staged content — a " +
                  "concurrent writer tied inside the move window)")
        }
      } finally {
        Files.deleteIfExists(staged); ()
      }
  }

  /** In-memory conditional-PUT instance (test-only by construction,
    * but a REAL second implementation of the seam): a process-wide
    * `putIfAbsent` on the target key decides the winner — exactly the
    * compare-and-swap an S3 `If-None-Match: *` PUT performs — and the
    * winner alone materializes the file so readers (which read the
    * filesystem) observe the same world. A key another publisher
    * already materialized (pre-existing versions) also refuses. */
  final class CasPublisher extends ManifestPublisher {
    private val published =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    def publishIfAbsent(target: Path, staged: Path): Unit =
      try {
        if (published.putIfAbsent(target.toString,
            java.lang.Boolean.TRUE) != null || Files.exists(target))
          throw new java.nio.file.FileAlreadyExistsException(
            s"$target (conditional PUT: precondition failed)")
        // only the CAS winner reaches here — the move can never race
        // another publisher of this key, and ATOMIC_MOVE keeps
        // concurrent readers un-torn
        Files.move(staged, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      } finally {
        Files.deleteIfExists(staged); ()
      }
  }

  /** The active publisher — swapped by the commit-seam spec; every
    * production path uses the local-fs instance. */
  @volatile private[graft] var publisher: ManifestPublisher =
    HardLinkPublisher

  /** PUBLISH a staged manifest as version `v` through the
    * [[ManifestPublisher]] seam. A loser's staged file is cleaned up
    * and [[CommitConflictException]] tells it to re-validate against
    * the new head. */
  def publishStaged(key: String, v: Int, staged: Path): Unit = {
    val target = Paths.get(tableDir(key), s"v$v.manifest")
    try publisher.publishIfAbsent(target, staged)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"$key: version $v was committed by another writer while " +
            s"this commit was staging (${e.getMessage}) — re-read the " +
            "head, re-validate, and retry")
    }
  }

  /** Commit version `v`: stage + atomically publish. Throws
    * [[CommitConflictException]] if another writer (any process) won
    * version `v` first — unreachable for in-JVM contention (callers
    * hold [[commitLock]]). */
  def writeManifest(key: String, v: Int, entries: Seq[FileEntry],
      extraHeader: Seq[String] = Seq.empty,
      rowIdFloor: Long = 0L): Unit =
    publishStaged(key, v,
      stageManifest(key, v, entries, extraHeader, rowIdFloor))

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
      entries: Seq[FileEntry]): Unit = {
    // branches are MUTABLE refs (stacked stages overwrite), so no
    // create-if-absent — but the overwrite is still temp + ATOMIC_MOVE
    // so a concurrent branch read (another process planning from
    // `branch=<name>`) can never see a torn file
    val tmp = Files.createTempFile(
      Paths.get(tableDir(key)), s".branch-$name.", ".tmp")
    Files.writeString(tmp, s"#base\t$base\n" + renderEntries(entries))
    Files.move(tmp, branchPath(key, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

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

  /** Names of every staged branch of `key`. */
  def listBranches(key: String): Seq[String] = {
    val td = Paths.get(tableDir(key))
    if (!Files.isDirectory(td)) Seq.empty
    else {
      val stream = Files.list(td)
      try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("branch-") && n.endsWith(".manifest"))
        .map(_.stripPrefix("branch-").stripSuffix(".manifest")).toSeq.sorted
      finally stream.close()
    }
  }

  // ── TAGS (Iceberg's named immutable snapshot refs): a tag pins a
  // COMMITTED version under a name — `VERSION AS OF '<tag>'` resolves
  // through it, and VACUUM retains a tagged version's manifest and
  // files regardless of the keepLast window (the "audited release"
  // use: tag it and it stays reproducible). Tags are immutable:
  // re-pointing a name is a loud error, not a silent move.

  private def tagPath(key: String, name: String): Path = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"tag name '$name' must be alphanumeric")
    // an all-digit tag would be unreachable: VERSION AS OF resolves
    // numerics as version ids first
    require(name.exists(!_.isDigit),
      s"tag name '$name' must contain a non-digit")
    Paths.get(tableDir(key), s"tag-$name.ref")
  }

  def tagExists(key: String, name: String): Boolean =
    Files.exists(tagPath(key, name))

  def createTag(key: String, name: String, v: Int): Unit =
    commitLock.synchronized {
      require(versions(key).contains(v),
        s"cannot tag $key@$v: no such committed version")
      require(!tagExists(key, name),
        s"tag '$name' of $key already exists (tags are immutable — " +
          "drop it first to re-point)")
      Files.writeString(tagPath(key, name), s"$v\n"); ()
    }

  def readTag(key: String, name: String): Int =
    Files.readString(tagPath(key, name)).trim.toInt

  def dropTag(key: String, name: String): Unit = {
    Files.deleteIfExists(tagPath(key, name)); ()
  }

  /** (name, version) of every tag of `key`. */
  def listTags(key: String): Seq[(String, Int)] = {
    val td = Paths.get(tableDir(key))
    if (!Files.isDirectory(td)) Seq.empty
    else {
      val stream = Files.list(td)
      val names = try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("tag-") && n.endsWith(".ref"))
        .map(_.stripPrefix("tag-").stripSuffix(".ref")).toSeq.sorted
      finally stream.close()
      names.map(n => (n, readTag(key, n)))
    }
  }

  def drop(key: String): Boolean = {
    // the epoch high-water cache follows the table: a re-created table
    // with the same name starts a fresh manifest chain, so stale marks
    // must not survive the drop (iteration under the map's own monitor
    // — synchronizedMap views aren't safe to traverse unsynchronized)
    epochCache.synchronized {
      epochCache.keySet.asScala.filter(_._1 == tableDir(key)).toList
        .foreach(epochCache.remove)
    }
    // the resolved-manifest cache follows the table for the same
    // reason: a re-created table starts a fresh manifest chain
    purgeManifestCacheTable(key)
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

