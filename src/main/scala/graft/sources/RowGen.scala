package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.types._

/** GENERATED-COLUMN compiler — Delta's `GENERATED ALWAYS AS (expr)`
  * surface, declared at CREATE via
  * `TBLPROPERTIES('generated'='<col>: <expr>[; <col>: <expr>…]')`.
  *
  * Semantics (Delta's): on EVERY write path a generated column's
  * value is COMPUTED from the row's other columns — an omitted/NULL
  * incoming value is filled, a provided value must EQUAL the computed
  * one or the statement aborts (silently accepting a divergent value
  * would make the column lie about its own definition). Because the
  * computation is deterministic and runs on every writer (batch
  * INSERT, COW rewrites, MOR records, streaming — the same shared
  * factories as the CHECK constraint), a MERGE/UPDATE that changes a
  * source column automatically refreshes the generated value —
  * carried-over rows recompute to their stored value, so rewrites
  * are no-ops on them.
  *
  * The expression language is [[RowCheck.bindExpr]]'s session-free
  * subset. Generated columns must be atomic scalars, must not
  * reference themselves or other generated columns (no chains), and
  * the expression's type must match the column's declared type
  * exactly (cast explicitly in the expression text otherwise). The
  * declared bucket/partition column MAY be generated — Delta's
  * generated partition columns (date-from-timestamp) are the
  * headline use, and group routing runs after the fill. */
object RowGen {

  /** `'<col>: <expr>[; …]'` → ordered (column, expression-sql) pairs.
    * `;` is reserved out of expressions (like the newline in CHECK) —
    * the property is one line of metadata. */
  def parse(spec: String): Seq[(String, String)] =
    spec.split(";").map(_.trim).filter(_.nonEmpty).map { ent =>
      val cut = ent.indexOf(':')
      require(cut > 0,
        s"generated-column entry '$ent' must be '<col>: <expr>'")
      (ent.substring(0, cut).trim, ent.substring(cut + 1).trim)
    }.toSeq

  private def atomic(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType | BinaryType => false
    case _ => true
  }

  /** Bind every entry against `schema`, or fail loudly — shared by
    * CREATE-time validation and the executor-side compile. */
  private def bind(spec: String, schema: StructType)
      : Seq[(Int, DataType, Expression)] = {
    val entries = parse(spec)
    val names = entries.map(_._1.toLowerCase)
    require(names.distinct.size == names.size,
      s"duplicate generated column in '$spec'")
    val genIdx = entries.map { case (c, _) =>
      val i = schema.fields.indexWhere(_.name.equalsIgnoreCase(c))
      require(i >= 0, s"generated column $c is not in the table schema")
      i
    }.toSet
    entries.map { case (colName, exprSql) =>
      val idx = schema.fields.indexWhere(_.name.equalsIgnoreCase(colName))
      val field = schema.fields(idx)
      require(atomic(field.dataType), s"generated column $colName must " +
        s"be an atomic scalar type, got ${field.dataType.simpleString}")
      val bound = RowCheck.bindExpr(exprSql, schema,
        what = s"generated column $colName's expression")
      // no self-reference, no chains: the fill is ONE pass over the
      // incoming row, so a generated source would read the incoming
      // (possibly null) value, not the filled one
      bound.foreach {
        case b: BoundReference => require(!genIdx.contains(b.ordinal),
          s"generated column $colName references a generated column " +
            s"(${schema.fields(b.ordinal).name}) — chains are not " +
            "supported")
        case _ => ()
      }
      require(bound.dataType == field.dataType,
        s"generated column $colName is ${field.dataType.sql} but its " +
          s"expression computes ${bound.dataType.sql} — cast explicitly " +
          "in the expression")
      (idx, field.dataType, bound)
    }
  }

  /** CREATE-time validation: binding errors surface at DDL. */
  def validate(spec: String, schema: StructType): Unit = { bind(spec, schema); () }

  /** Executor-side compile: (logical row, strict) → logical row with
    * every generated column filled. `strict` marks USER-PROVIDED rows
    * (plain INSERT / streaming append / a MERGE's not-matched
    * inserts): a provided non-null value that diverges from the
    * computed one refuses — Delta's rule. Non-strict rows are the
    * engine's own (carried/updated rows of a COW swap, MOR update
    * postimages, maintenance rewrites): their incoming value is the
    * PRE-statement one, so the fill simply RECOMPUTES — which is what
    * refreshes a generated column when an UPDATE changes its source.
    * The returned row is a fresh GenericInternalRow — incoming rows
    * may be UnsafeRow, whose copy() cannot be mutated. */
  def compile(spec: String, schema: StructType)
      : (InternalRow, Boolean) => InternalRow = {
    val gens = bind(spec, schema)
    val types = schema.fields.map(_.dataType)
    val n = types.length
    (row, strict) => {
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        arr(i) = if (row.isNullAt(i)) null else row.get(i, types(i))
        i += 1
      }
      gens.foreach { case (idx, _, expr) =>
        val computed = expr.eval(row)
        val provided = arr(idx)
        if (strict && provided != null && provided != computed)
          sys.error(s"generated column ${schema.fields(idx).name} was " +
            s"given value $provided but its expression computes " +
            s"$computed — omit the column or match the definition; " +
            "the statement is aborted, nothing was committed")
        arr(idx) = computed
      }
      new GenericInternalRow(arr)
    }
  }
}
