package graft.cv

import graft.cv.CvPlanner.CvOptions

/** SQL DDL front door — the reference's primary user interface
  * (commands.c:219-253 `PipelineProcessUtility`; option desugaring
  * analyzer.c:3714-3765 `GetContQueryAction` + 1771-1835
  * `ApplyStorageOptions`; every regress test is written in this dialect).
  * Parses the CREATE statements into the engine API calls:
  *
  *   CREATE STREAM s (key string, x bigint, ts timestamp)
  *   CREATE FOREIGN TABLE s (k text, n int8) SERVER pipelinedb   -- PG spelling
  *   CREATE CONTINUOUS VIEW v WITH (sw = '1 hour', step_factor = 10)
  *     AS SELECT key, count(*) AS n FROM s GROUP BY key
  *   CREATE VIEW v WITH (action = materialize, ttl = '1 day', ttl_column = m)
  *     AS SELECT ...                                             -- 1.0 spelling
  *   CREATE CONTINUOUS TRANSFORM t
  *     WITH (outputfunc = insert_into_stream('other'))
  *     AS SELECT ... FROM s WHERE ...
  *   INSERT INTO s (key, x) VALUES ('a', 1), ('b', 2)
  *   DROP CONTINUOUS VIEW v / DROP STREAM s
  *   ACTIVATE v / DEACTIVATE v
  *
  * The SELECT body itself is NOT parsed here — it goes verbatim to
  * [[CvPlanner]], which analyzes it with Catalyst against the registered
  * stream schemas (the reference likewise hands the view query to PG's
  * parser and only owns the WITH-clause surface).
  */
object CvDdl {

  sealed trait Stmt
  final case class CreateStream(name: String, schemaDdl: String) extends Stmt
  final case class CreateView(
      name: String, select: String, options: CvOptions, emitChanges: Boolean) extends Stmt
  final case class CreateTransform(
      name: String, select: String, sink: Option[String], emitChanges: Boolean) extends Stmt
  /** Transform whose outputfunc is one of the streaming dedup gates
    * (dedup_gate / neardup_gate / cosine_gate) — `gateSpec` carries the
    * raw outputfunc text, parsed by the engine. Beyond-ref DDL: declared
    * gates replay from the catalog (the Scala outputFunc callback can't),
    * so a restarted engine resumes suppression from the persisted store. */
  final case class CreateGateTransform(
      name: String, select: String, gateSpec: String, sink: String,
      ttl: Option[String] = None, ttlColumn: Option[String] = None,
      residentMb: Option[Long] = None,
      backend: Option[String] = None,
      stateParts: Option[Int] = None) extends Stmt
  final case class Activate(name: String) extends Stmt
  final case class Deactivate(name: String) extends Stmt
  /** kind ∈ view | transform | stream (plain DROP VIEW resolves either CQ kind). */
  final case class Drop(kind: String, name: String) extends Stmt
  final case class Rename(name: String, newName: String) extends Stmt
  final case class RenameStream(name: String, newName: String) extends Stmt
  /** ALTER VIEW cv ALTER [COLUMN] c SET/DROP DEFAULT … — an AlterTableStmt-
    * encoded view modification; always rejected for continuous views
    * (cont_alter.sql:7, commands.c:382-389 "continuous views cannot be
    * modified"). Parsed (not "unrecognized DDL") so the error matches the
    * reference's domain message, or PG's missing-relation error when the
    * target doesn't exist.
    */
  final case class AlterViewModify(name: String, action: String) extends Stmt
  /** ALTER TABLE `<cv>`_mrel ADD CONSTRAINT name CHECK (expr) —
    * matrel_constraints.sql.
    */
  final case class AddConstraint(table: String, conName: String, check: String) extends Stmt
  final case class CreateSchema(name: String) extends Stmt
  final case class DropSchema(name: String, cascade: Boolean) extends Stmt
  final case class RenameSchema(name: String, newName: String) extends Stmt
  final case class Insert(stream: String, columns: Option[Seq[String]], valuesSql: String)
    extends Stmt
  /** INSERT INTO s [(cols)] SELECT … (stream_insert_subselect.sql shapes,
    * incl. the parenthesized `INSERT INTO s (x) (SELECT …)` spelling).
    */
  final case class InsertSelect(
      stream: String, columns: Option[Seq[String]], select: String) extends Stmt
  /** UPDATE `<cv>_mrel` SET col = expr, … [WHERE pred] — direct matrel DML,
    * honored only under matrels_writable (cont_matrel.sql:12-23).
    */
  final case class Update(
      table: String, set: Seq[(String, String)], where: Option[String]) extends Stmt
  /** DELETE FROM `<cv>_mrel` [WHERE pred] (cont_matrel.sql:9,18). */
  final case class Delete(table: String, where: Option[String]) extends Stmt
  /** CREATE INDEX idx ON cv (cols…) — within-file clustering analogue
    * (cont_index.sql; the index name itself is cosmetic here).
    */
  final case class CreateIndex(view: String, columns: Seq[String]) extends Stmt

  private val StreamRe =
    """(?is)\s*CREATE\s+STREAM\s+([\w.]+)\s*\((.*)\)\s*;?\s*""".r
  private val ForeignTableRe =
    """(?is)\s*CREATE\s+FOREIGN\s+TABLE\s+([\w.]+)\s*\((.*)\)\s*SERVER\s+\w+\s*;?\s*""".r
  private val ContViewRe =
    """(?is)\s*CREATE\s+CONTINUOUS\s+VIEW\s+([\w.]+)\s*(?:WITH\s*\((.*?)\))?\s*AS\s+(SELECT\b.*?)\s*;?\s*""".r
  private val ContTransformRe =
    """(?is)\s*CREATE\s+CONTINUOUS\s+TRANSFORM\s+([\w.]+)\s*(?:WITH\s*\((.*?)\))?\s*AS\s+(SELECT\b.*?)\s*;?\s*""".r
  private val ViewWithRe =
    """(?is)\s*CREATE\s+VIEW\s+([\w.]+)\s+WITH\s*\((.*?)\)\s*AS\s+(SELECT\b.*?)\s*;?\s*""".r
  private val PlainViewRe =
    """(?is)\s*CREATE\s+VIEW\s+([\w.]+)\s+AS\s+(SELECT\b.*?)\s*;?\s*""".r
  private val ActivateRe = """(?is)\s*ACTIVATE\s+([\w.]+)\s*;?\s*""".r
  private val DeactivateRe = """(?is)\s*DEACTIVATE\s+([\w.]+)\s*;?\s*""".r
  private val AlterRenameRe =
    """(?is)\s*ALTER\s+(?:CONTINUOUS\s+)?VIEW\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*""".r
  private val AlterStreamRenameRe =
    """(?is)\s*ALTER\s+(?:STREAM|FOREIGN\s+TABLE)\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*""".r
  // narrow on purpose: ALTER VIEW … RENAME / SET SCHEMA are legal on CVs and
  // handled elsewhere; only column-default changes take this (rejecting) path
  private val AlterViewModifyRe =
    """(?is)\s*ALTER\s+(?:CONTINUOUS\s+)?VIEW\s+([\w.]+)\s+(ALTER\s+(?:COLUMN\s+)?\w+\s+(?:SET|DROP)\s+DEFAULT\b[^;]*)\s*;?\s*""".r
  private val CreateSchemaRe = """(?is)\s*CREATE\s+SCHEMA\s+(\w+)\s*;?\s*""".r
  private val DropSchemaRe =
    """(?is)\s*DROP\s+SCHEMA\s+(\w+)\s*(CASCADE)?\s*;?\s*""".r
  private val AlterSchemaRe =
    """(?is)\s*ALTER\s+SCHEMA\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*;?\s*""".r
  private val AlterTableRenameRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*""".r
  private val AddConstraintRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropRe =
    """(?is)\s*DROP\s+(CONTINUOUS\s+VIEW|CONTINUOUS\s+TRANSFORM|VIEW|STREAM|FOREIGN\s+TABLE)\s+([\w.]+)\s*;?\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?VALUES\s*(.+?)\s*;?\s*""".r
  private val InsertSelectRe =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(\s*(?!SELECT\b)([^)]*)\)\s*)?(\(?\s*SELECT\b.*?)\s*;?\s*""".r
  private val CreateIndexRe =
    """(?is)\s*CREATE\s+INDEX\s+[\w.]+\s+ON\s+([\w.]+)\s*\(([^)]*)\)\s*;?\s*""".r
  // SET/WHERE are split by a literal-aware scan in parse(), not here: a
  // regex `\s+WHERE\s+` would fire inside a string literal
  // (UPDATE v_mrel SET note = 'a WHERE b')
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)\s*;?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r

  /** `(SELECT …)` → `SELECT …` — only when the outer parens actually pair
    * with each other (a regex `\)?` would steal the closing paren of e.g.
    * `WHERE f(x)`).
    */
  private def stripOuterParens(s: String): String = {
    val t = s.trim
    if (!t.startsWith("(") || !t.endsWith(")")) return t
    var depth = 0
    var i = 0
    while (i < t.length - 1) {
      if (t(i) == '(') depth += 1
      else if (t(i) == ')') { depth -= 1; if (depth == 0) return t } // closes early
      i += 1
    }
    stripOuterParens(t.substring(1, t.length - 1))
  }

  def parse(ddl: String): Stmt = ddl match {
    case StreamRe(name, cols) => CreateStream(name, normalizeTypes(cols))
    case ForeignTableRe(name, cols) => CreateStream(name, normalizeTypes(cols))
    case ContViewRe(name, opts, select) =>
      buildQuery(name, select, parseOptions(opts), defaultAction = "materialize")
    case ContTransformRe(name, opts, select) =>
      buildQuery(name, select, parseOptions(opts), defaultAction = "transform")
    case ViewWithRe(name, opts, select) =>
      // no explicit action defaults to materialize, like the reference
      // (GetContQueryAction, analyzer.c:3752-3765: "If no action is
      // specified but the query reads from a stream, we default to
      // MATERIALIZE") — CREATE VIEW v WITH (sw = '1 minute') AS … is the
      // documented sliding-window spelling
      buildQuery(name, select, parseOptions(opts), defaultAction = "materialize")
    case PlainViewRe(name, select) =>
      // CREATE VIEW over a stream with no options at all is a continuous
      // view in the reference dialect (every cont_* regress test's shape)
      buildQuery(name, select, Map.empty, defaultAction = "materialize")
    case AlterRenameRe(name, newName) => Rename(name, newName)
    case AlterStreamRenameRe(name, newName) => RenameStream(name, newName)
    case AlterViewModifyRe(name, action) => AlterViewModify(name, action.trim)
    case AddConstraintRe(table, conName, check) =>
      AddConstraint(table, conName, stripOuterParens(check.trim))
    case CreateSchemaRe(name) => CreateSchema(name)
    case DropSchemaRe(name, cascade) => DropSchema(name, cascade != null)
    case AlterSchemaRe(name, newName) => RenameSchema(name, newName)
    case AlterTableRenameRe(name, _) =>
      // cont_alter.sql:6-7: matrels keep their name; renaming one directly
      // is refused like the reference's dependency check
      throw new IllegalArgumentException(
        if (name.endsWith("_mrel"))
          s"cannot rename materialization table \"$name\" for a continuous view"
        else s"ALTER TABLE is not supported (got rename of '$name')")
    case ActivateRe(name) => Activate(name)
    case DeactivateRe(name) => Deactivate(name)
    case DropRe(kind, name) =>
      val k = kind.toLowerCase.replaceAll("\\s+", " ") match {
        case "continuous view" | "view" => "view"
        case "continuous transform" => "transform"
        case _ => "stream" // STREAM | FOREIGN TABLE
      }
      Drop(k, name)
    case InsertRe(name, cols, values) =>
      val columns = Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      Insert(name, columns, values)
    case InsertSelectRe(name, cols, select) =>
      InsertSelect(name,
        Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
        stripOuterParens(select))
    case UpdateRe(table, tail) =>
      val wIdx = indexOfTopLevelWord(tail, "WHERE")
      val (setSql, where) =
        if (wIdx < 0) (tail, None)
        else (tail.substring(0, wIdx), Some(tail.substring(wIdx + "WHERE".length).trim))
      val set = splitTopLevel(setSql, ',').map { kv =>
        val eq = indexOfTopLevel(kv, '=')
        require(eq > 0, s"malformed SET assignment: '$kv' (expected col = expr)")
        kv.substring(0, eq).trim -> kv.substring(eq + 1).trim
      }
      Update(table, set, where.filter(_.nonEmpty))
    case DeleteRe(table, where) => Delete(table, Option(where).map(_.trim))
    case CreateIndexRe(view, cols) =>
      CreateIndex(view, cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    case other => throw new IllegalArgumentException(
      s"unrecognized DDL: ${other.trim.take(80)} — expected CREATE STREAM / " +
        "CREATE [CONTINUOUS] VIEW / CREATE CONTINUOUS TRANSFORM / CREATE INDEX / " +
        "DROP … / INSERT INTO … VALUES … / UPDATE … / DELETE FROM … / " +
        "ACTIVATE / DEACTIVATE")
  }

  private def buildQuery(
      name: String, select: String, opts: Map[String, String], defaultAction: String): Stmt = {
    val action = opts.getOrElse("action", defaultAction).toLowerCase
    val emitChanges = opts.get("changes").forall(_.toBoolean)
    val known = Set("action", "sw", "sw_column", "step_factor", "ttl", "ttl_column",
      "changes", "outputfunc", "sink", "pk", "fillfactor", "batch",
      "resident_mb", "backend", "state_parts")
    val unknown = opts.keySet -- known
    require(unknown.isEmpty, s"unknown WITH option(s): ${unknown.mkString(", ")}")
    action match {
      case "materialize" =>
        require(!opts.contains("outputfunc") && !opts.contains("sink"),
          "outputfunc/sink apply to transforms, not materialized views")
        require(!opts.contains("resident_mb") && !opts.contains("backend") &&
          !opts.contains("state_parts"),
          "resident_mb/backend/state_parts apply to gate transforms only")
        // create_cont_view.sql: "No sw option" — sw_column alone is an error
        require(!opts.contains("sw_column") || opts.contains("sw"),
          "sw_column can only be specified with sw")
        val defaults = CvOptions()
        CreateView(name, select, CvOptions(
          sw = opts.get("sw"),
          swColumn = opts.getOrElse("sw_column", defaults.swColumn),
          stepFactor = opts.get("step_factor").map(_.toDouble).getOrElse(defaults.stepFactor),
          ttl = opts.get("ttl"),
          ttlColumn = opts.get("ttl_column"),
          pk = opts.get("pk")), emitChanges)
      case "transform" =>
        require(Seq("sw", "step_factor").forall(!opts.contains(_)),
          "sw options apply to materialized views, not transforms")
        // outputfunc = insert_into_stream('s') is the one function the
        // reference ships for chaining (stream_fdw.c:589-640); arbitrary
        // trigger functions need the Scala API's outputFunc callback.
        // (?s): a gate spec may span lines (a contamination reference
        // SELECT, long key expressions) — the trailing .* must cross them
        val gateRe = """(?is)\s*(dedup_gate|neardup_gate|cosine_gate|jaccard_gate|contamination_gate)\s*\(.*""".r
        opts.get("outputfunc") match {
          case Some(f @ gateRe(_)) =>
            val sink = opts.getOrElse("sink", throw new IllegalArgumentException(
              s"outputfunc ${f.takeWhile(_ != '(')}(...) requires a sink " +
                "stream: add sink = '<stream>' to the WITH options"))
            // a silently-dropped option is worse than a missing feature:
            // gates forward through their sink only, no output_of stream
            require(!opts.get("changes").exists(_.toBoolean),
              "changes = true is not supported on gate transforms — the " +
                "gate's survivors flow to its sink stream, not output_of()")
            CreateGateTransform(name, select, f.trim, sink,
              ttl = opts.get("ttl"), ttlColumn = opts.get("ttl_column"),
              residentMb = opts.get("resident_mb").map(_.toLong),
              backend = opts.get("backend"),
              stateParts = opts.get("state_parts").map(_.toInt))
          case _ =>
            require(!opts.contains("ttl") && !opts.contains("ttl_column"),
              "ttl options on a transform apply to gates only " +
                "(windowed dedup_gate)")
            require(!opts.contains("resident_mb") && !opts.contains("backend") &&
              !opts.contains("state_parts"),
              "resident_mb/backend/state_parts apply to gate transforms only")
            val sink = opts.get("sink").orElse(opts.get("outputfunc").map { f =>
              val m = """(?i)(?:pipelinedb\.)?insert_into_stream\s*\(\s*'([^']+)'\s*\)""".r
              f match {
                case m(s) => s
                case other => throw new IllegalArgumentException(
                  s"unsupported outputfunc '$other' — only insert_into_stream('stream') " +
                    "and the gates (dedup_gate/neardup_gate/cosine_gate/jaccard_gate/contamination_gate) are " +
                    "expressible in DDL; pass a Scala callback to createContTransform " +
                    "for custom output functions")
              }
            })
            CreateTransform(name, select, sink, emitChanges)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown action '$other' " +
          "(expected materialize or transform)")
    }
  }

  /** Parse `k = v, k2 = 'v2', outputfunc = fn('arg')` — commas split only at
    * paren/quote depth zero, values lose one layer of single quotes.
    */
  private[cv] def parseOptions(opts: String): Map[String, String] = {
    if (opts == null || opts.trim.isEmpty) return Map.empty
    splitTopLevel(opts, ',').map { kv =>
      val eq = indexOfTopLevel(kv, '=')
      require(eq > 0, s"malformed WITH option: '$kv' (expected key = value)")
      val k = kv.substring(0, eq).trim.toLowerCase
      val raw = kv.substring(eq + 1).trim
      val v =
        if (raw.length >= 2 && raw.head == '\'' && raw.last == '\'' && !raw.drop(1).dropRight(1).contains('\''))
          raw.drop(1).dropRight(1)
        else raw
      k -> v
    }.toMap
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    s.foreach { c =>
      if (c == '\'') { inQuote = !inQuote; cur += c }
      else if (inQuote) cur += c
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.result(); cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Index of a keyword outside string literals and parens, -1 if absent. */
  private def indexOfTopLevelWord(s: String, word: String): Int = {
    def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    var inQuote = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') inQuote = !inQuote
      else if (!inQuote) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 &&
            s.regionMatches(true, i, word, 0, word.length) &&
            (i == 0 || !isWordChar(s(i - 1))) &&
            (i + word.length >= s.length || !isWordChar(s(i + word.length))))
          return i
      }
      i += 1
    }
    -1
  }

  private def indexOfTopLevel(s: String, c: Char): Int = {
    var inQuote = false
    var i = 0
    while (i < s.length) {
      if (s(i) == '\'') inQuote = !inQuote
      else if (s(i) == c && !inQuote) return i
      i += 1
    }
    -1
  }

  /** PostgreSQL type spellings → Spark DDL types, so reference-dialect
    * stream definitions (typed_streams.sql shapes) parse as-is. Unknown
    * words pass through for Spark's own DDL parser to judge.
    */
  private[cv] def normalizeTypes(cols: String): String = {
    val typeMap = Map(
      "text" -> "string", "varchar" -> "string", "char" -> "string",
      "int2" -> "smallint", "int4" -> "int", "int8" -> "bigint",
      "integer" -> "int", "serial" -> "int", "bigserial" -> "bigint",
      "float4" -> "float", "float8" -> "double",
      "real" -> "float", "numeric" -> "decimal(38,18)",
      "bool" -> "boolean", "bytea" -> "binary",
      "timestamptz" -> "timestamp", "timestamp_tz" -> "timestamp",
      "json" -> "string", "jsonb" -> "string", "uuid" -> "string")
    splitTopLevel(cols, ',').map { colDef =>
      val parts = colDef.trim.split("\\s+", 2)
      if (parts.length < 2) colDef
      else {
        val t = parts(1).trim
        val mapped = t.toLowerCase match {
          case v if v.matches("(?:var)?char\\s*\\(\\d+\\)") => "string"
          case n if n.startsWith("numeric") && n.contains("(") =>
            n.replaceFirst("numeric", "decimal")
          case other => typeMap.getOrElse(other, t)
        }
        s"${parts(0)} $mapped"
      }
    }.mkString(", ")
  }
}
