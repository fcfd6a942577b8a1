package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Nested (STRUCT) column support for the DML catalog — the FLATTENED
  * LEAF encoding: a struct column never reaches the parquet writer as
  * a group; its leaves become independent top-level primitive columns
  * named by dotted path ("s.f", recursively "s.t.g"), preceded by an
  * INT32 PRESENCE marker under the struct's own name ("s" = 1 when
  * the struct value is non-null) so `NULL` and "struct of all NULLs"
  * stay distinguishable.
  *
  * Why flatten instead of writing real parquet groups: every layer
  * between the write and read boundaries — positional/equality delta
  * records, zone maps, blooms, NDV sketches, the change-feed multiset
  * diff, OPTIMIZE's rewrite — operates on flat primitive
  * externalized values. Flattening at the two boundaries means all
  * of that machinery (and its specs) applies to nested data
  * unchanged, and field-level evolution rides the SAME name-mapping
  * the top-level columns use: ADD/RENAME/DROP of "s.f" is an entry in
  * the dropped list / renames map keyed by the dotted display path.
  * Iceberg reaches the same property through field ids; dotted
  * storage names are this catalog's id-free equivalent (names may
  * not contain '.', enforced at writeMeta).
  *
  * The dotted names are purely internal: Spark sees real StructType
  * columns in every schema surface (CREATE, DESCRIBE, time travel's
  * pinned `#schema` headers round-trip nested JSON as-is). */
object RowNested {

  /** Flattened leaf fields of a (possibly struct-bearing) field list,
    * DISPLAY names. Identity for primitive-only schemas. */
  def flatLeaves(fields: Seq[StructField]): Seq[StructField] =
    fields.flatMap {
      case StructField(n, st: StructType, _, _) =>
        StructField(n, IntegerType, nullable = true) +:
          flatLeaves(st.fields.toSeq).map(l => l.copy(name = s"$n.${l.name}"))
      case f => Seq(f)
    }

  /** Number of flat slots field `f` occupies. */
  def leafCount(f: StructField): Int = f.dataType match {
    case st: StructType => 1 + st.fields.map(leafCount).sum
    case _ => 1
  }

  private def extPrim(dt: DataType, row: InternalRow, i: Int): Any =
    dt match {
      case LongType      => Long.box(row.getLong(i))
      case TimestampType => Long.box(row.getLong(i))
      case IntegerType   => Int.box(row.getInt(i))
      // canonical long forms (what zone maps and blooms hash):
      // date = epoch-day int, decimal = unscaled long at the
      // column's declared scale
      case DateType      => Int.box(row.getInt(i))
      case d: DecimalType =>
        Long.box(row.getDecimal(i, d.precision, d.scale).toUnscaledLong)
      case StringType    => row.getUTF8String(i).toString
      case other         => sys.error(s"unsupported type $other")
    }

  private val One = Int.box(1)

  /** Fill `out` from field `i` of `row` starting at flat slot `off`;
    * returns the next free slot. A null struct (or null `row` — a
    * delta DELETE record's payload) leaves its slots at the array's
    * null default. */
  private def fillField(out: Array[Any], off: Int, f: StructField,
      i: Int, row: InternalRow): Int = f.dataType match {
    case st: StructType =>
      if (row == null || row.isNullAt(i)) off + leafCount(f)
      else {
        out(off) = One // presence marker
        var o = off + 1
        val sub = row.getStruct(i, st.fields.length)
        var j = 0
        while (j < st.fields.length) {
          o = fillField(out, o, st.fields(j), j, sub)
          j += 1
        }
        o
      }
    case dt =>
      out(off) =
        if (row == null || row.isNullAt(i)) null else extPrim(dt, row, i)
      off + 1
  }

  /** Precompiled per-row externalizer: one flat Array[Any] per row,
    * no intermediate collections — this sits on every DML write's
    * per-row path, so the hot primitive-only case must cost what the
    * pre-nested inline loop did. */
  def externalizer(fields: Seq[StructField]): InternalRow => Array[Any] = {
    val fieldArr = fields.toArray
    val total = fields.map(leafCount).sum
    row => {
      val out = new Array[Any](total)
      var off = 0
      var i = 0
      while (i < fieldArr.length) {
        off = fillField(out, off, fieldArr(i), i, row)
        i += 1
      }
      out
    }
  }

  /** Resolve a dotted display path against the REAL (nested) schema —
    * the guard-side complement of [[flatLeaves]]: the flat list
    * contains a struct's presence MARKER under the struct's own name
    * (typed INT32), so any validation that must distinguish "a
    * primitive leaf" from "a struct column's marker" resolves here
    * instead. None = no such path. */
  def resolve(fields: Seq[StructField], path: String): Option[DataType] =
    path.split('.').toSeq
      .foldLeft[Option[DataType]](Some(StructType(fields.toArray))) {
        case (Some(st: StructType), n) =>
          st.fields.find(_.name == n).map(_.dataType)
        case _ => None
      }

  private def intPrim(dt: DataType, v: Any): Any = v match {
    case null      => null
    case s: String => UTF8String.fromString(s)
    // decimals ride the files as unscaled longs — rebuild the
    // internal Decimal at the column's declared scale
    case l: java.lang.Long if dt.isInstanceOf[DecimalType] =>
      val d = dt.asInstanceOf[DecimalType]
      Decimal(l.longValue, d.precision, d.scale)
    case other     => other
  }

  /** Internalize the flat slots of display field `f` starting at
    * `off` back into the engine value (nested GenericInternalRow for
    * structs, converted primitive otherwise). */
  def internalize(f: StructField, flat: Array[Any], off: Int): Any =
    f.dataType match {
      case st: StructType =>
        // marker null/0 = the struct itself was null (files that
        // PREDATE an added struct column read all-null too)
        if (flat(off) == null) null
        else {
          var o = off + 1
          val vals = st.fields.map { sf =>
            val v = internalize(sf, flat, o)
            o += leafCount(sf)
            v
          }
          new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        }
      case dt => intPrim(dt, flat(off))
    }

  /** (display field → flat offset) for a wanted field list — what the
    * readers index [[internalize]] with. */
  def offsets(fields: Seq[StructField]): Map[String, Int] = {
    var o = 0
    fields.map { f =>
      val e = f.name -> o
      o += leafCount(f)
      e
    }.toMap
  }

  /** True if any field (at any depth) is a struct. */
  def hasStruct(fields: Seq[StructField]): Boolean =
    fields.exists(_.dataType.isInstanceOf[StructType])
}
