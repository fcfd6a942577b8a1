package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, TimestampType, BinaryType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side parquet IO for group/delta files, via the public
  * parquet-hadoop example Group API — real columnar files (DuckDB
  * could read them), with column projection pushed into the read. */
object RowFiles {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.metadata.ParquetMetadata
  import org.apache.parquet.io.{ColumnIOFactory, LocalInputFile, LocalOutputFile}
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
        case org.apache.spark.sql.types.DateType =>
          // epoch days (Spark's internal form) as annotated INT32
          b.addField(Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()).named(f.name))
        case d: org.apache.spark.sql.types.DecimalType if d.precision <= 18 =>
          // unscaled long at the declared scale — the canonical long
          // form the zone maps and blooms hash/compare (parquet's
          // standard INT64 decimal encoding)
          b.addField(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
            .named(f.name))
        case StringType =>
          b.addField(Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        // statless physical types (no zone maps/blooms/NDV — files
        // carrying only these columns' predicates are never skipped):
        // native DOUBLE/FLOAT, raw BINARY, and ARRAY columns as one
        // binary blob per row ([[RowNested.Arr]]'s codec)
        case org.apache.spark.sql.types.DoubleType =>
          b.addField(Types.optional(PrimitiveTypeName.DOUBLE).named(f.name))
        case org.apache.spark.sql.types.FloatType =>
          b.addField(Types.optional(PrimitiveTypeName.FLOAT).named(f.name))
        case org.apache.spark.sql.types.BinaryType |
          _: org.apache.spark.sql.types.ArrayType |
          _: org.apache.spark.sql.types.MapType =>
          b.addField(Types.optional(PrimitiveTypeName.BINARY).named(f.name))
        case other => sys.error(s"RowStore: unsupported column type $other")
      }
    }
    b.named("row")
  }

  /** Open one parquet writer; caller feeds externalized values aligned
    * to `schema` and closes.
    *
    * Hot-path discipline (optimization round 16, guide §1.2 step 2 —
    * per-task work): values land by FIELD INDEX (the message type is
    * built from `schema` in order, so index i IS field i) instead of
    * the Group API's name→index hash lookup per cell, and the file
    * opens through [[LocalOutputFile]] — the Hadoop Path route goes
    * through ChecksumFileSystem, which buffers every byte twice and
    * writes a `.crc` sidecar per file (pure overhead for a
    * manifest-committed store whose files are immutable and
    * content-addressed). Measured on the q134 write stage (80
    * one-group files, one task): 1.33 s → ~0.5 s. */
  final class FileWriter(file: String, schema: Seq[StructField]) {
    private val msg = messageType(schema)
    private val factory = new SimpleGroupFactory(msg)
    private val w: ParquetWriter[Group] =
      ExampleParquetWriter.builder(
        new LocalOutputFile(Paths.get(file))).withType(msg).build()
    private val n = schema.length
    var rows = 0
    def write(vals: Array[Any]): Unit = {
      val g = factory.newGroup()
      var i = 0
      while (i < n) {
        vals(i) match {
          case null              => ()
          case l: java.lang.Long => g.add(i, l.longValue)
          case x: java.lang.Integer => g.add(i, x.intValue)
          case s: String         => g.add(i, s)
          case u: UTF8String     => g.add(i, u.toString)
          case d: java.lang.Double => g.add(i, d.doubleValue)
          case fl: java.lang.Float => g.add(i, fl.floatValue)
          case b: Array[Byte] => g.add(i,
            org.apache.parquet.io.api.Binary.fromConstantByteArray(b))
          case other => sys.error(s"RowStore: unsupported value $other")
        }
        i += 1
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

  /** FOOTER CACHE (optimization round 16): every stored file is
    * IMMUTABLE and uniquely named (UUID data/delta/dv names;
    * add_files-imported trees are materialize-once snapshots), so a
    * path's footer can never change while it exists — cache it and
    * every re-read of the file (multi-statement DML lifecycles re-scan
    * their group files constantly) skips the footer IO AND its parse.
    * A deleted file's stale entry is harmless: nothing reads a path no
    * manifest references. Bounded by wholesale clear — footers are
    * ~1 KB and scratch tables die with their directories, so precise
    * LRU buys nothing here. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, ParquetMetadata]()
  private def footerOf(file: String): ParquetMetadata = {
    val hit = footerCache.get(file)
    if (hit != null) hit
    else {
      val f = ParquetFileReader.readFooter(
        new LocalInputFile(Paths.get(file)),
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      if (footerCache.size > 32768) footerCache.clear()
      footerCache.put(file, f)
      f
    }
  }

  /** Footer-only metadata of one parquet file: (row count, file
    * schema). The add_files registration pass — O(files) metadata
    * reads, no data pages (Iceberg's add_files does the same footer
    * walk to fill its manifest). Not counted in [[filesOpened]]:
    * that counter proves QUERY paths opened nothing; registration is
    * a one-time import cost by contract. */
  def footerMeta(file: String): (Long, MessageType) = {
    val footer = footerOf(file)
    (footer.getBlocks.asScala.map(_.getRowCount.toLong).sum,
      footer.getFileMetaData.getSchema)
  }

  // extraction tags, compiled once per (file, projection) — the
  // per-row loop below dispatches on an int instead of re-matching
  // Catalyst DataTypes per cell (guide §1.2 step 2)
  private final val TLong = 0; private final val TWidenedLong = 1
  private final val TInt = 2; private final val TString = 3
  private final val TDouble = 4; private final val TFloat = 5
  private final val TBinary = 6

  def readRows(file: String, wanted: Seq[StructField]): Array[Array[Any]] = {
    filesOpened.incrementAndGet()
    val footer = footerOf(file)
    val fileSchema = footer.getFileMetaData.getSchema
    val rowCount = footer.getBlocks.asScala.map(_.getRowCount.toLong).sum
    val n = wanted.length
    // compile the projection plan: output slot → (index in the
    // projected group, extraction tag); -1 = column absent from this
    // file (additive schema evolution) → null-pad. Projection uses the
    // FILE's own physical types: after ALTER COLUMN int→long (type
    // widening) the wanted type is INT64 while files committed earlier
    // keep INT32 — files never rewrite, readers widen at extraction.
    val projIdx = new Array[Int](n)
    val tags = new Array[Int](n)
    val presentTypes = Seq.newBuilder[org.apache.parquet.schema.Type]
    var pi = 0
    var wi = 0
    while (wi < n) {
      val f = wanted(wi)
      if (!fileSchema.containsField(f.name)) projIdx(wi) = -1
      else {
        val ft = fileSchema.getType(Seq(f.name): _*)
        presentTypes += ft
        projIdx(wi) = pi
        pi += 1
        val isInt32 = ft.isPrimitive &&
          ft.asPrimitiveType().getPrimitiveTypeName == PrimitiveTypeName.INT32
        tags(wi) = f.dataType match {
          case LongType if isInt32 => TWidenedLong
          case LongType | TimestampType => TLong
          // externalized forms match the writer's: date = epoch-day
          // int, decimal = unscaled long at the declared scale
          case IntegerType | DateType => TInt
          case _: DecimalType => TLong
          case StringType => TString
          case DoubleType => TDouble
          case FloatType => TFloat
          // all read back as the externalized byte form; ARRAY/MAP
          // blobs decode at the internalize boundary (RowNested)
          case BinaryType | _: org.apache.spark.sql.types.ArrayType |
            _: org.apache.spark.sql.types.MapType => TBinary
          case other => sys.error(s"unsupported $other")
        }
      }
      wi += 1
    }
    if (pi == 0) return Array.fill(rowCount.toInt)(new Array[Any](n))
    val projection = new MessageType("row", presentTypes.result(): _*)
    // ONE file open for the data pages, seeded with the cached footer
    // (the old GroupReadSupport route read the footer twice per file:
    // once for the schema probe, once inside the reader)
    val in = new LocalInputFile(Paths.get(file))
    val reader = ParquetFileReader.open(in,
      footer, org.apache.parquet.ParquetReadOptions.builder().build(),
      in.newStream())
    val out = new Array[Array[Any]](rowCount.toInt)
    var r = 0
    try {
      reader.setRequestedSchema(projection)
      val columnIO = new ColumnIOFactory().getColumnIO(projection, fileSchema)
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rr = pages.getRowCount
        val rec = columnIO.getRecordReader(pages,
          new GroupRecordConverter(projection))
        var k = 0L
        while (k < rr) {
          val g = rec.read()
          val row = new Array[Any](n)
          var i = 0
          while (i < n) {
            val p = projIdx(i)
            if (p >= 0 && g.getFieldRepetitionCount(p) != 0) {
              row(i) = tags(i) match {
                case TLong        => Long.box(g.getLong(p, 0))
                case TWidenedLong => Long.box(g.getInteger(p, 0).toLong)
                case TInt         => Int.box(g.getInteger(p, 0))
                case TString      => g.getString(p, 0)
                case TDouble      => Double.box(g.getDouble(p, 0))
                case TFloat       => Float.box(g.getFloat(p, 0))
                case TBinary      => g.getBinary(p, 0).getBytes
              }
            }
            i += 1
          }
          out(r) = row
          r += 1
          k += 1
        }
        pages = reader.readNextRowGroup()
      }
    } finally reader.close()
    require(r == out.length,
      s"$file: footer row count ${out.length} != rows read $r")
    out
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
  /** EQUALITY delete (Iceberg's second delete-file kind): the record
    * carries a KEY VALUE (in the key column's slot, no `_rid`), and
    * replay removes every row visible AT THAT POINT in commit order
    * whose key equals it — later inserts resurrect the key, exactly
    * Iceberg's sequence-number semantics expressed in replay order. */
  val EqDeleteOp = 4

  val DeltaMetaFields: Seq[StructField] = Seq(
    StructField("_op", IntegerType), StructField("_rid", StringType),
    StructField("_grp", IntegerType))

  private def leaf(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Visible (rid, values) of one group at one version — the
    * two-list form (all bases, then all deltas): correct whenever no
    * EQUALITY delete can appear, because positional records address
    * rids (a later base file's rids are never referenced by an
    * earlier delta). */
  def resolve(group: Int, baseFiles: Seq[String], deltaFiles: Seq[String],
      wanted: Seq[StructField], keyIdx: Int = -1): Seq[(String, Array[Any])] =
    resolveOrdered(group,
      baseFiles.map(("base", _)) ++ deltaFiles.map(("delta", _)),
      wanted, keyIdx)

  /** Visible (rid, values) of one group, replaying `items` (kind,
    * path) in MANIFEST ORDER — which is commit order, because every
    * commit appends its new entries after the carried-over ones. The
    * order is what gives EQUALITY deletes Iceberg's sequence-number
    * semantics: a value-addressed delete removes only rows from files
    * committed BEFORE it, and a later insert of the same key
    * resurrects. `wanted` is the projected DATA columns; `keyIdx` is
    * the key column's index within it (readers facing possible
    * equality deletes must include the key; -1 is valid only when no
    * eq-delete record can appear). */
  def resolveOrdered(group: Int, items: Seq[(String, String)],
      wanted: Seq[StructField], keyIdx: Int = -1): Seq[(String, Array[Any])] = {
    if (items.forall(_._1 == "base")) {
      // clean group: no delta can touch it, stream the files directly
      items.flatMap { case (_, f) =>
        val n = leaf(f)
        RowFiles.readRows(f, wanted).iterator.zipWithIndex
          .map { case (v, i) => (s"$n#$i", v) }
      }
    } else {
      // LinkedHashMap keeps a row's original position across updates,
      // so resolution order is deterministic (commit order + insert
      // order)
      val m = new java.util.LinkedHashMap[String, Array[Any]]()
      items.foreach {
        case ("base", f) =>
          val n = leaf(f)
          RowFiles.readRows(f, wanted).iterator.zipWithIndex
            .foreach { case (v, i) => m.put(s"$n#$i", v) }
        // DELETION VECTOR: one bitmap of deleted positions for ONE
        // target file — remove exactly those rids. Equivalent to a run
        // of positional DeleteOp records at this commit point (and,
        // because rid-deletes are terminal, to the same deletes at any
        // EARLIER point — the confluence the commit-time union-merge
        // relies on). No eq-delete state can be pending here: vectors
        // are whole files, and the per-file eq batch flushes at file
        // end.
        case ("dv", f) =>
          val (target, words) = RowStore.Dv.read(f)
          RowStore.Dv.foreachSet(words)(pos => { m.remove(s"$target#$pos"); () })
        case (_, f) =>
          val n = leaf(f)
          // CONSECUTIVE eq-delete records batch into one key set and
          // apply in a single sweep over the visible rows: records in
          // one file share a commit point, so a run of eq-deletes is
          // order-free among themselves — semantically identical to
          // per-record sweeps, but O(rows + keys) instead of
          // O(rows × keys) for CDC-sized delete files. The set flushes
          // before any non-eq record for this group (an interleaved
          // insert of a deleted key must still resurrect it).
          val pendingEq = new java.util.HashSet[Any]()
          def flushEq(): Unit = if (!pendingEq.isEmpty) {
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              if (pendingEq.contains(it.next().getValue()(keyIdx)))
                it.remove()
            }
            pendingEq.clear()
          }
          RowFiles.readRows(f, DeltaMetaFields ++ wanted).zipWithIndex
            .foreach { case (rec, i) =>
              val grp = rec(2).asInstanceOf[java.lang.Integer]
              if (grp != null && grp.intValue == group) {
                val rid = rec(1).asInstanceOf[String]
                val data = rec.drop(DeltaMetaFields.length)
                rec(0).asInstanceOf[java.lang.Integer].intValue match {
                  case DeleteOp => flushEq(); m.remove(rid); ()
                  case UpdateOp =>
                    flushEq(); if (m.containsKey(rid)) m.put(rid, data); ()
                  case InsertOp => flushEq(); m.put(s"$n#$i", data); ()
                  case EqDeleteOp =>
                    require(keyIdx >= 0, "equality-delete replay needs " +
                      "the key column in the resolved projection")
                    pendingEq.add(data(keyIdx)); ()
                  case other => sys.error(s"corrupt delta record op=$other")
                }
              }
            }
          flushEq()
      }
      m.asScala.toSeq
    }
  }
}

