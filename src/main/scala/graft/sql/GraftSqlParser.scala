package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL grammar for graft maintenance statements, Delta's vocabulary:
  *
  * {{{
  *   OPTIMIZE '<path>' [WHERE <predicate>] [ZORDER BY (c1, c2, ...)]
  *   VACUUM '<path>' [RETAIN <n> HOURS] [DRY RUN]
  *   RESTORE [TABLE] '<path>' [TO] VERSION AS OF <n>
  *   RESTORE [TABLE] '<path>' [TO] TIMESTAMP AS OF '<ts>'
  *   FSCK REPAIR TABLE '<path>' [DRY RUN]
  *   DESCRIBE HISTORY '<path>'
  *   DELETE FROM '<path>' [WHERE <predicate>]
  *   UPDATE '<path>' SET c1 = <expr> [, ...] [WHERE <predicate>]
  *   CONVERT TO GRAFT '<path>' [PARTITIONED BY (c1 type, ...)]
  * }}}
  *
  * Table references accept a single-quoted, double-quoted or backticked
  * path, optionally wrapped as `` graft.`<path>` `` (the format-qualified
  * form Delta uses). Anything that does not match a maintenance statement
  * delegates to Spark's parser untouched, so the extension is a pure
  * superset of Spark SQL. Register with
  * `spark.sql.extensions=graft.sql.GraftSparkSessionExtension`, or run a
  * single statement without registration via [[GraftSql.sql]].
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // `'path'` | `"path"` | `` `path` `` | graft.`path` (any of the quote forms)
  private val P = """(?:graft\s*\.\s*)?(?:'([^']+)'|"([^"]+)"|`([^`]+)`)"""
  private def pathOf(m: java.util.regex.Matcher, base: Int): String =
    Seq(base, base + 1, base + 2).iterator.map(m.group).find(_ != null).get

  private def rx(pattern: String) = java.util.regex.Pattern.compile(
    pattern, java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.DOTALL)

  private val optimize = rx(
    s"""^\\s*OPTIMIZE\\s+$P(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s+\\(?\\s*([\\w`",'\\s.]+?)\\s*\\)?)?\\s*;?\\s*$$""")
  private val vacuum = rx(
    s"""^\\s*VACUUM\\s+$P(?:\\s+RETAIN\\s+(\\d+(?:\\.\\d+)?)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val restoreV = rx(
    s"""^\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+(?:TO\\s+)?VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$""")
  private val restoreT = rx(
    s"""^\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+(?:TO\\s+)?TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$""")
  private val fsck = rx(
    s"""^\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$P(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val history = rx(
    s"""^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$P\\s*;?\\s*$$""")
  private val convert = rx(
    s"""^\\s*CONVERT\\s+TO\\s+GRAFT\\s+$P(?:\\s+PARTITIONED\\s+BY\\s+\\((.+?)\\))?\\s*;?\\s*$$""")
  // DML claimed ONLY for quoted-path targets — catalog-table DELETE/UPDATE
  // stays with Spark's parser (which routes them to the table's connector)
  private val delete = rx(
    s"""^\\s*DELETE\\s+FROM\\s+$P(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$""")
  private val update = rx(
    s"""^\\s*UPDATE\\s+$P\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$""")

  /** Split on commas outside parens/quotes (SET clause items can hold
    * function calls and string literals with commas).
    */
  private[sql] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inQ: Char = 0
    for (c <- s) {
      if (inQ != 0) { cur += c; if (c == inQ) inQ = 0 }
      else c match {
        case '\'' | '"' | '`'  => inQ = c; cur += c
        case '('               => depth += 1; cur += c
        case ')'               => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _                 => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def parseAssignments(clause: String): Seq[(String, String)] =
    splitTopLevel(clause).map { item =>
      val eq = item.indexOf('=')
      require(eq > 0, s"malformed SET assignment '$item' (expected col = expr)")
      (item.substring(0, eq).trim.stripPrefix("`").stripSuffix("`"),
        item.substring(eq + 1).trim)
    }

  /** The maintenance command for `sqlText`, or None when it is ordinary
    * Spark SQL. Kept regex-based deliberately: the grammar is six fixed
    * statement shapes over a quoted path — an ANTLR grammar would be more
    * machinery than language.
    */
  def parseMaintenance(sqlText: String): Option[LogicalPlan] = {
    val o = optimize.matcher(sqlText)
    if (o.matches()) {
      val cols = Option(o.group(5)).toSeq.flatMap(_.split(",").toSeq)
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      return Some(GraftOptimizeCommand(pathOf(o, 1), Option(o.group(4)).map(_.trim), cols))
    }
    val v = vacuum.matcher(sqlText)
    if (v.matches())
      return Some(GraftVacuumCommand(pathOf(v, 1),
        Option(v.group(4)).map(_.toDouble), v.group(5) != null))
    val rv = restoreV.matcher(sqlText)
    if (rv.matches())
      return Some(GraftRestoreCommand(pathOf(rv, 1), Some(rv.group(4).toLong), None))
    val rt = restoreT.matcher(sqlText)
    if (rt.matches())
      return Some(GraftRestoreCommand(pathOf(rt, 1), None, Some(rt.group(4))))
    val f = fsck.matcher(sqlText)
    if (f.matches())
      return Some(GraftFsckCommand(pathOf(f, 1), f.group(4) != null))
    val h = history.matcher(sqlText)
    if (h.matches())
      return Some(GraftDescribeHistoryCommand(pathOf(h, 1)))
    val cv = convert.matcher(sqlText)
    if (cv.matches())
      return Some(GraftConvertCommand(pathOf(cv, 1), Option(cv.group(4)).map(_.trim)))
    val d = delete.matcher(sqlText)
    if (d.matches())
      return Some(GraftDeleteCommand(pathOf(d, 1), Option(d.group(4)).map(_.trim)))
    val u = update.matcher(sqlText)
    if (u.matches())
      return Some(GraftUpdateCommand(pathOf(u, 1),
        Option(u.group(5)).map(_.trim), parseAssignments(u.group(4))))
    None
  }
}

/** `spark.sql.extensions=graft.sql.GraftSparkSessionExtension` — injects
  * [[GraftSqlParser]] in front of Spark's parser (the standard table-format
  * extension point; Delta registers its SQL surface the same way).
  */
class GraftSparkSessionExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectParser((_, delegate) => new GraftSqlParser(delegate))
}

/** Run one statement against `spark` with the graft grammar available even
  * when the session was built without the extension (maintenance commands
  * execute directly; everything else falls through to `spark.sql`).
  */
object GraftSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftSqlParser.parseMaintenance(sqlText) match {
      case Some(plan) => org.apache.spark.sql.graft.SparkBridge.ofPlan(spark, plan)
      case None       => spark.sql(sqlText)
    }
}
