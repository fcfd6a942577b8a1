package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types.{BooleanType, StructType}

/** CHECK-constraint compiler (Delta's table CHECK constraints /
  * SQL-standard CHECK semantics): a boolean SQL expression declared at
  * CREATE via `TBLPROPERTIES('check'='<expr>')` and enforced on EVERY
  * row the table's writers accept — batch INSERT, COW rewrites (a
  * MERGE whose update drives a row out of bounds aborts the
  * statement before any manifest commit), MOR delta insert/update
  * records, and streaming writes (one shared writer factory).
  *
  * Semantics are the SQL standard's: a row violates only when the
  * expression evaluates to FALSE — NULL (unknown) passes, which is
  * why the compiled form is `NOT coalesce(expr, TRUE)` evaluated as
  * "is this row a violation".
  *
  * The expression language is deliberately session-free (the writer
  * compiles on executors from the string alone): column references
  * (dotted paths reach struct fields), literals, comparisons,
  * boolean/arithmetic operators, IN lists, IS [NOT] NULL, CASE, CAST,
  * LIKE — anything [[CatalystSqlParser]] parses to a concrete
  * expression. Function CALLS (which would need a session's
  * FunctionRegistry) stay unresolved and are refused at CREATE, not
  * at write time. */
object RowCheck {

  /** Parse + bind an arbitrary session-free SQL expression against
    * `schema`, or fail loudly — the shared front half of the CHECK
    * compiler, also reused by [[RowGen]] (generated columns): parse,
    * bind column references to BoundReferences, minimal numeric
    * coercion, and the resolved/deterministic requirements. `what`
    * names the surface in error messages. */
  private[sources] def bindExpr(checkSql: String, schema: StructType,
      what: String = "check constraint"): Expression = {
    require(!checkSql.exists(c => c == '\n' || c == '\r'),
      s"$what must be a single line (the catalog's metadata " +
        "layout is line-oriented)")
    val parsed =
      try CatalystSqlParser.parseExpression(checkSql)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"$what does not parse: $checkSql (${e.getMessage})")
      }
    val resolver: (String, String) => Boolean = _ equalsIgnoreCase _
    val bound = parsed.transformUp {
      case u: UnresolvedAttribute =>
        val head = u.nameParts.head
        val idx = schema.fields.indexWhere(f => resolver(f.name, head))
        require(idx >= 0, s"$what references unknown column " +
          s"'${u.name}' (schema: ${schema.fieldNames.mkString(", ")})")
        val base: Expression =
          BoundReference(idx, schema.fields(idx).dataType,
            schema.fields(idx).nullable)
        u.nameParts.tail.foldLeft(base)((e, part) =>
          ExtractValue(e, Literal(part), resolver))
    }
    // minimal implicit type coercion (the analyzer isn't here to do
    // it): a BIGINT column compared to the parser's INT literal stays
    // unresolved without it. Numeric ladder widening plus
    // integral→decimal for decimal columns; anything else must cast
    // explicitly in the constraint text.
    import org.apache.spark.sql.types._
    val ladder: Seq[DataType] =
      Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    // integral↔decimal must widen to a decimal that can hold BOTH
    // sides: casting a BIGINT column to the LITERAL's precision
    // (`cents <= 99.5` → DECIMAL(3,1)) would overflow real values to
    // NULL and silently PASS violating rows (NULL passes by the SQL
    // rule below) — the constraint would be unenforced outside the
    // literal's range
    val intDigits = Map[DataType, Int](ByteType -> 3, ShortType -> 5,
      IntegerType -> 10, LongType -> 19)
    def holdsBoth(d: DecimalType, i: DataType): Option[DataType] = {
      val digits = math.max(intDigits(i), d.precision - d.scale)
      val p = digits + d.scale
      if (p <= 38) Some(DecimalType(p, d.scale)) else None
    }
    def wider(a: DataType, b: DataType): Option[DataType] = (a, b) match {
      case (x, y) if x == y => Some(x)
      case (d: DecimalType, i) if intDigits.contains(i) => holdsBoth(d, i)
      case (i, d: DecimalType) if intDigits.contains(i) => holdsBoth(d, i)
      case (x, y) if ladder.contains(x) && ladder.contains(y) =>
        Some(ladder(math.max(ladder.indexOf(x), ladder.indexOf(y))))
      case _ => None
    }
    def recast(e: Expression, t: DataType): Expression =
      if (e.dataType == t) e else Cast(e, t)
    val coerced = bound.transformUp {
      case b: BinaryOperator if b.left.resolved && b.right.resolved &&
          b.left.dataType != b.right.dataType =>
        wider(b.left.dataType, b.right.dataType)
          .map(t => b.withNewChildren(
            Seq(recast(b.left, t), recast(b.right, t))))
          .getOrElse(b)
      case in @ In(v, list) if v.resolved && list.forall(_.resolved) &&
          list.exists(_.dataType != v.dataType) =>
        if (list.forall(e => wider(v.dataType, e.dataType)
            .contains(v.dataType)))
          In(v, list.map(recast(_, v.dataType)))
        else in
    }
    require(coerced.resolved, s"$what '$checkSql' uses " +
      "constructs the writers cannot evaluate session-free " +
      s"(unresolved: ${coerced.collect {
        case e if !e.childrenResolved || !e.resolved => e.sql
      }.headOption.getOrElse(coerced.sql)}); use column references, " +
      "literals, comparisons, boolean/arithmetic operators, IN, " +
      "IS NULL, CASE, CAST, LIKE")
    require(coerced.deterministic,
      s"$what must be deterministic: $checkSql")
    coerced
  }

  /** Parse + bind `checkSql` against `schema`, or fail loudly. The
    * returned expression is the VIOLATION test (true = reject). */
  private[sources] def bind(checkSql: String,
      schema: StructType): Expression = {
    val coerced = bindExpr(checkSql, schema)
    require(coerced.dataType == BooleanType,
      s"check constraint must be boolean, got ${coerced.dataType.sql}: " +
        checkSql)
    Not(Coalesce(Seq(coerced, Literal(true))))
  }

  /** CREATE-time validation: binding errors surface at DDL, never at
    * write time. */
  def validate(checkSql: String, schema: StructType): Unit = {
    bind(checkSql, schema); ()
  }

  /** Executor-side compile: row => is-violation. */
  def compile(checkSql: String, schema: StructType): InternalRow => Boolean = {
    val pred = Predicate.createInterpreted(bind(checkSql, schema))
    pred.initialize(0)
    row => pred.eval(row)
  }
}
