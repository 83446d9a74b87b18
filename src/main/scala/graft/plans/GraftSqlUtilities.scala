package graft.plans

import scala.util.matching.Regex

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.table.MedallionTable

/** Delta's utility SQL statements for graft tables, via a delegating parser
  * (`injectParser` — the same mechanism as Delta's own `DeltaSqlParser`):
  *
  *   - `DESCRIBE HISTORY t | '<path>'`
  *   - `OPTIMIZE t [ZORDER BY (c1, c2)]`
  *   - `VACUUM t`
  *   - `RESTORE [TABLE] t TO VERSION AS OF n`
  *
  * Targets are either a catalog table created `USING graft` (resolved
  * through the session catalog at run time) or a quoted location. Anything
  * the grammar does not match falls through verbatim to the delegate —
  * the interceptor only ever claims statements Spark itself cannot parse
  * (plus `DESCRIBE HISTORY`, which Delta also shadows).
  *
  * All four lower onto the SAME table-layer maintenance calls the API
  * exposes (`history` / `compact(ZOrder)` / `vacuum` / `restoreVersion`),
  * so SQL and API users see one behavior — commit protocol, retention,
  * Z-order file-skipping layout included.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim.stripSuffix(";").trim
    t match {
      case DescribeHistoryRe(target) =>
        GraftDescribeHistoryCommand(target.trim)
      case OptimizeZOrderRe(target, cols) =>
        GraftOptimizeCommand(target.trim,
          cols.split(",").map(stripQuotes).toSeq.filter(_.nonEmpty))
      case OptimizeRe(target) =>
        GraftOptimizeCommand(target.trim, Nil)
      case VacuumRe(target) =>
        GraftVacuumCommand(target.trim)
      case RestoreRe(target, version) =>
        GraftRestoreCommand(target.trim, version.toInt)
      case AddConstraintRe(target, cname, cexpr) =>
        GraftAddConstraintCommand(target.trim, cname.trim, cexpr.trim)
      case DropConstraintRe(target, cname) =>
        GraftDropConstraintCommand(target.trim, cname.trim)
      case _ => resolveTimeTravel(delegate.parsePlan(sqlText))
    }
  }

  /** Inline `SELECT … FROM t VERSION AS OF n` / `TIMESTAMP AS OF ts` over
    * graft catalog tables: Spark parses these natively into
    * [[RelationTimeTravel]] but the session catalog cannot load versioned
    * tables, so the graft-owned nodes are swapped for the snapshot read
    * here (the relation carries the concrete table name — nothing else in
    * the query is touched, and non-graft targets pass through for Spark's
    * own handling). `TIMESTAMP AS OF` resolves to the newest commit at or
    * before the instant (Delta semantics) via the history mtimes.
    */
  private def resolveTimeTravel(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        graftSnapshotFor(tt).getOrElse(tt)
    }

  private def graftSnapshotFor(
      tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel)
      : Option[LogicalPlan] = {
    val identParts = tt.relation match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier
      case _ => return None
    }
    val ident = identParts match {
      case Seq(name)     => TableIdentifier(name)
      case Seq(db, name) => TableIdentifier(name, Some(db))
      case _             => return None
    }
    val catalog = spark.sessionState.catalog
    // temp views and foreign tables fall through to Spark's own handling
    if (catalog.isTempView(identParts) || !catalog.tableExists(ident)) return None
    val meta = catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) return None
    val mt = new MedallionTable(spark, meta.location.toString)
    val version = (tt.version, tt.timestamp) match {
      case (Some(v), _) => v.toLong
      case (None, Some(tsExpr)) =>
        // String instants go through Spark's own timestamp parser in the
        // SESSION time zone (accepts date-only forms too) — a JVM-default-
        // zone java.sql parse would shift the resolved snapshot.
        val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils
          .getZoneId(spark.sessionState.conf.sessionLocalTimeZone)
        val millis = tsExpr match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, StringType) =>
            org.apache.spark.sql.catalyst.util.DateTimeUtils
              .stringToTimestamp(
                org.apache.spark.unsafe.types.UTF8String.fromString(s.toString),
                zone)
              .getOrElse(throw new IllegalArgumentException(
                s"cannot parse TIMESTAMP AS OF instant: $s")) / 1000L
          case e => e.eval() match {
            case micros: java.lang.Long => micros / 1000L // TimestampType
            case other => throw new IllegalArgumentException(
              s"cannot evaluate TIMESTAMP AS OF expression: $other")
          }
        }
        val at = mt.history().filter(_._3 <= millis).map(_._1)
        if (at.isEmpty) throw new IllegalArgumentException(
          s"no retained version of ${ident.unquotedString} at or before " +
            new java.sql.Timestamp(millis))
        at.max
      case _ => return None
    }
    // The live state's ordinal is not an archived snapshot — read it live;
    // a commit recorded in history but pruned from snapshot retention must
    // refuse clearly, not die in the parquet scan with PATH_NOT_FOUND.
    val snapshot =
      if (version == mt.commitVersion) mt.read
      else if (mt.listVersions().contains(version.toInt)) mt.readVersion(version.toInt)
      else throw new IllegalArgumentException(
        s"version $version of ${ident.unquotedString} is not retained " +
          s"(retained: ${mt.listVersions().mkString(", ")}; live: ${mt.commitVersion})")
    // keep the table name as a qualifier so `t.col` references still
    // resolve against the substituted snapshot
    Some(SubqueryAlias(ident.table, snapshot.queryExecution.logical))
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // target = quoted path, backquoted identifier, or [db.]identifier
  private val T = """('[^']+'|`[^`]+`|[\w.]+)"""
  private[plans] val DescribeHistoryRe: Regex =
    s"""(?is)DESCRIBE\\s+HISTORY\\s+$T""".r
  private[plans] val OptimizeZOrderRe: Regex =
    s"""(?is)OPTIMIZE\\s+$T\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\)""".r
  private[plans] val OptimizeRe: Regex = s"""(?is)OPTIMIZE\\s+$T""".r
  private[plans] val VacuumRe: Regex = s"""(?is)VACUUM\\s+$T""".r
  private[plans] val RestoreRe: Regex =
    s"""(?is)RESTORE\\s+(?:TABLE\\s+)?$T\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)""".r
  // Delta's CHECK-constraint DDL: Spark's own ALTER TABLE grammar has no
  // ADD CONSTRAINT for v1 tables, so the shapes are free to claim.
  private[plans] val AddConstraintRe: Regex =
    s"""(?is)ALTER\\s+TABLE\\s+$T\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)""".r
  private[plans] val DropConstraintRe: Regex =
    s"""(?is)ALTER\\s+TABLE\\s+$T\\s+DROP\\s+CONSTRAINT\\s+(\\w+)""".r

  private[plans] def stripQuotes(s: String): String = {
    val t = s.trim
    if ((t.startsWith("'") && t.endsWith("'")) ||
        (t.startsWith("`") && t.endsWith("`"))) t.substring(1, t.length - 1)
    else t
  }

  /** Post-rewrite cache upkeep: refresh path-derived caches, and for
    * named targets also the catalog table entry (OPTIMIZE/RESTORE change
    * the files a cached plan pins).
    */
  private[plans] def refreshTarget(spark: SparkSession, target: String,
      path: String): Unit = {
    spark.catalog.refreshByPath(path)
    val t = target.trim
    if (!t.startsWith("'")) spark.catalog.refreshTable(stripQuotes(t))
  }

  /** Target → table location: a quoted string is a path; an identifier
    * resolves through the session catalog and must be a `USING graft`
    * table.
    */
  private[plans] def resolvePath(spark: SparkSession, target: String): String = {
    val t = target.trim
    if (t.startsWith("'")) stripQuotes(t)
    else {
      val parts = stripQuotes(t).split("\\.").toSeq
      val ident = parts match {
        case Seq(name)     => TableIdentifier(name)
        case Seq(db, name) => TableIdentifier(name, Some(db))
        case _ => throw new IllegalArgumentException(
          s"cannot resolve table identifier '$target'")
      }
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      if (!meta.provider.exists(_.equalsIgnoreCase("graft")))
        throw new IllegalArgumentException(
          s"$target is not a graft table (provider=${meta.provider.getOrElse("?")})")
      meta.location.toString
    }
  }
}

/** `DESCRIBE HISTORY` — (version, op, timestamp), newest first, bounded by
  * marker retention.
  */
final case class GraftDescribeHistoryCommand(target: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val mt = new MedallionTable(spark, GraftSqlParser.resolvePath(spark, target))
    mt.history().map { case (v, op, millis) =>
      Row(v, op, new java.sql.Timestamp(millis))
    }
  }
}

/** `OPTIMIZE [ZORDER BY (…)]` — compaction (+ Z-order clustering) through
  * the rewrite commit protocol; reports the parquet file count change.
  */
final case class GraftOptimizeCommand(target: String, zorderBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)())
  private def nParquet(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next().getPath
        // live data only: retained-version snapshots under _graft_meta
        // would otherwise inflate the counts on versioned tables
        if (f.getName.endsWith(".parquet") &&
            !f.toString.contains("_graft_meta")) n += 1
      }
      n
    }
  }
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    val before = nParquet(spark, path)
    val mt = new MedallionTable(spark, path)
    if (zorderBy.nonEmpty) mt.compactZOrder(zorderBy) else mt.compact()
    GraftSqlParser.refreshTarget(spark, target, path)
    Seq(Row(path, before, nParquet(spark, path)))
  }
}

/** `VACUUM` — removes crashed writers' leftover staging/backup directories
  * and stale locks next to the table.
  */
final case class GraftVacuumCommand(target: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("removed", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    Seq(Row(path, new MedallionTable(spark, path).vacuum()))
  }
}

/** `RESTORE … TO VERSION AS OF n` — rewrites the live table to a retained
  * snapshot (itself a new commit, so a restore is undoable).
  */
final case class GraftRestoreCommand(target: String, version: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("restored_version", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    new MedallionTable(spark, path).restoreVersion(version)
    GraftSqlParser.refreshTarget(spark, target, path)
    Seq(Row(path, version))
  }
}

/** `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)` — Delta's quality-gate
  * DDL: validates existing rows on add, then every write enforces the
  * predicate in the write pass (no extra scan) through the same registry
  * the API maintains.
  */
final case class GraftAddConstraintCommand(target: String, cname: String,
    cexpr: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    new MedallionTable(spark, path).addCheckConstraint(cname, cexpr)
    Seq.empty
  }
}

/** `ALTER TABLE … DROP CONSTRAINT name`. */
final case class GraftDropConstraintCommand(target: String, cname: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlParser.resolvePath(spark, target)
    new MedallionTable(spark, path).dropCheckConstraint(cname)
    Seq.empty
  }
}

/** Table-valued SQL functions for the read-side maintenance surfaces —
  * Delta's `table_changes(…)` analog plus history-as-a-table:
  *
  *   - `graft_table_changes('<path>', sinceVersion, 'k1' [, 'k2'…])`
  *   - `graft_table_history('<path>')`
  *
  * Arguments must be literals (they parameterize plan construction). The
  * changes TVF returns the keyed diff `MedallionTable.changesSince`
  * computes — inserts / updates (pre+post image) / deletes since the given
  * commit — so CDC consumers can stay in pure SQL.
  */
object GraftTableFunctions {
  type TvfInjection =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def litString(e: Expression, what: String): String = e.eval() match {
    case null => throw new IllegalArgumentException(s"$what must be a literal string")
    case v    => v.toString
  }

  val injections: Seq[TvfInjection] = Seq(
    (new FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo(classOf[MedallionTable].getName, "graft_table_changes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 3,
          "usage: graft_table_changes('<path>', sinceVersion, 'key1'[, 'key2'…])")
        val spark = SparkSession.active
        val path = litString(exprs.head, "path")
        val since = exprs(1).eval().asInstanceOf[Number].intValue()
        val keys = exprs.drop(2).map(litString(_, "key column"))
        new MedallionTable(spark, path).changesSince(since, keys)
          .queryExecution.logical
      }),
    (new FunctionIdentifier("graft_table_history"),
      new ExpressionInfo(classOf[MedallionTable].getName, "graft_table_history"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "usage: graft_table_history('<path>')")
        val spark = SparkSession.active
        val path = litString(exprs.head, "path")
        import spark.implicits._
        new MedallionTable(spark, path).history()
          .toDF("version", "operation", "ts_millis")
          .queryExecution.logical
      })
  )
}
