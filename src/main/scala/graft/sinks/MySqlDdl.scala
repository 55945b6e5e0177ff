package graft.sinks

/** MySQL 8 `CREATE TABLE` grammar validator (subset) — the sandbox has no
  * MySQL server (zero egress, no MySQL jar ships with Spark), so the
  * utf8mb4/TEXT dialect surface ([[JdbcLoad.mysqlWriteOptions]], mirroring
  * `/root/reference/data_loading_to_mysql_database.py:149-172`) is
  * EXECUTED against this grammar instead of being asserted as option
  * strings: the statement under test is the one Spark's own JDBC writer
  * constructs (via [[org.apache.spark.sql.GraftJdbcDdlBridge]] →
  * `JdbcUtils.createTable`'s `CREATE TABLE t (<schema>) <options>`), and
  * parsing it with MySQL's column/type/table-option grammar catches what
  * a string assert cannot:
  *
  *  - a wrong dialect leaking in (Derby/standard SQL emits `CLOB` —
  *    not a MySQL type; the MySQL dialect must map StringType to
  *    `LONGTEXT`);
  *  - structurally invalid DDL from `createTableColumnTypes` (missing
  *    VARCHAR length, stray commas, duplicate columns);
  *  - malformed `createTableOptions` (MySQL's `opt [=] value` list).
  *
  * Grammar (MySQL 8 reference, §13.1.20 CREATE TABLE, subset actually
  * reachable through Spark's JDBC writer):
  * {{{
  * statement  := CREATE TABLE tableName "(" colDef ("," colDef)* ")" [tableOpt*]
  * colDef     := ident dataType [colAttr*]
  * dataType   := typeName ["(" INT ["," INT] ")"]
  *               [CHARACTER SET ident] [COLLATE ident]
  * colAttr    := NOT NULL | NULL | DEFAULT literal | AUTO_INCREMENT
  *               | UNIQUE [KEY] | PRIMARY KEY | COMMENT string
  * tableOpt   := ENGINE [=] ident | [DEFAULT] CHARSET [=] ident
  *               | [DEFAULT] CHARACTER SET [=] ident | COLLATE [=] ident
  *               | AUTO_INCREMENT [=] INT | COMMENT [=] string
  * }}}
  * Semantic rules enforced beyond syntax: CHAR/VARCHAR require an explicit
  * length (1..65535 for VARCHAR — MySQL rejects a bare `VARCHAR`); type
  * arguments must be non-negative; type
  * keywords must be MySQL types (CLOB, TEXT[], BYTEA, NVARCHAR2 … are
  * rejected); column names must be unique case-insensitively (MySQL
  * folds identifiers on lookup).
  *
  * Lexical subset: string literals support MySQL's doubled-quote ('')
  * and backslash (\' \\) escapes (default sql_mode); integer literals
  * take an optional sign (DEFAULT -1). Out of scope for the
  * Spark-generated subset: double-quoted strings (ANSI_QUOTES),
  * hex/bit literals, and fractional DEFAULT values.
  */
object MySqlDdl {

  final case class Column(
      name: String,
      typeName: String,
      typeArgs: Seq[Long],
      charset: Option[String],
      collate: Option[String],
      notNull: Boolean)

  final case class CreateTable(
      table: String,
      columns: Seq[Column],
      options: Map[String, String])

  /** MySQL 8 data-type keywords reachable through JDBC DDL. */
  private val Types: Set[String] = Set(
    "BIT", "TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "REAL", "DECIMAL", "NUMERIC", "BOOLEAN", "BOOL",
    "CHAR", "VARCHAR", "BINARY", "VARBINARY",
    "TINYTEXT", "TEXT", "MEDIUMTEXT", "LONGTEXT",
    "TINYBLOB", "BLOB", "MEDIUMBLOB", "LONGBLOB",
    "DATE", "DATETIME", "TIMESTAMP", "TIME", "YEAR", "JSON")

  private val LengthRequired = Set("VARCHAR", "VARBINARY")

  // ---- tokenizer -------------------------------------------------------

  private sealed trait Tok
  private case class Word(s: String) extends Tok // bare word, case kept
  private case class Ident(s: String) extends Tok // `quoted` identifier
  private case class Num(v: Long) extends Tok
  private case class Str(s: String) extends Tok
  private case class Sym(c: Char) extends Tok

  /** Keyword view of a bare word — MySQL keywords are case-insensitive,
    * while identifier case is preserved (backtick-quoted always; bare
    * identifiers keep their spelling and only FOLD when matched against
    * a keyword position). */
  private object KW {
    def unapply(t: Tok): Option[String] = t match {
      case Word(s) => Some(s.toUpperCase(java.util.Locale.ROOT))
      case _ => None
    }
  }

  private def tokenize(in: String): Either[String, List[Tok]] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '`') {
        val j = in.indexOf('`', i + 1)
        if (j < 0) return Left(s"unterminated ` identifier at $i")
        out += Ident(in.substring(i + 1, j)); i = j + 1
      } else if (c == '\'') {
        // MySQL string literals escape an inner quote BOTH ways: '' and
        // \' (default sql_mode — NO_BACKSLASH_ESCAPES off); \\ is a
        // literal backslash. A COMMENT like 'user''s list' or 'a\'b'
        // must not end the token at the first inner quote (r15 advisor).
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < in.length && !closed) {
          val ch = in.charAt(j)
          if (ch == '\\' && j + 1 < in.length) {
            // translate MySQL's special escapes to their lexed VALUES
            // (manual §9.1.1: \0 \' \" \b \n \r \t \Z \\ \% \_ — the
            // last two keep the backslash, they are pattern escapes);
            // every other \x lexes as x. r16 appended the escaped char
            // verbatim, so 'a\nb' tokenized as "anb" — accept/reject
            // behavior matched MySQL but the Str VALUE was wrong (r16
            // advisor).
            sb.append(in.charAt(j + 1) match {
              case '0' => '\u0000' // NUL
              case 'b' => '\b'
              case 'n' => '\n'
              case 'r' => '\r'
              case 't' => '\t'
              case 'Z' => '\u001A' // SUB (Ctrl-Z)
              case '%' => sb.append('\\'); '%'
              case '_' => sb.append('\\'); '_'
              case other => other
            }); j += 2
          } else if (ch == '\'') {
            if (j + 1 < in.length && in.charAt(j + 1) == '\'') {
              sb.append('\''); j += 2
            } else { closed = true; j += 1 }
          } else { sb.append(ch); j += 1 }
        }
        if (!closed) return Left(s"unterminated string at $i")
        out += Str(sb.toString); i = j
      } else if (c.isDigit ||
        ((c == '-' || c == '+') && i + 1 < in.length &&
          in.charAt(i + 1).isDigit)) {
        // optional sign: DEFAULT -1 is valid MySQL DDL reachable via
        // createTableColumnTypes (r15 advisor); Long.parseLong accepts
        // the leading sign. '-'/'+' appear nowhere else in the grammar.
        var j = if (c.isDigit) i else i + 1
        while (j < in.length && in.charAt(j).isDigit) j += 1
        // Long-range guard: a > 19-digit (or overflowing signed) literal
        // must fail on the tokenizer's Either channel, not throw — the
        // r16 sign branch widened the reachable inputs here and the
        // property test feeds this path broadly (r16 advisor).
        try out += Num(in.substring(i, j).toLong)
        catch {
          case _: NumberFormatException =>
            return Left(s"numeric literal out of range at $i")
        }
        i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < in.length &&
          (in.charAt(j).isLetterOrDigit || in.charAt(j) == '_' ||
            in.charAt(j) == '$')) j += 1
        out += Word(in.substring(i, j))
        i = j
      } else if ("(),=".indexOf(c) >= 0) { out += Sym(c); i += 1 }
      else return Left(s"unexpected character '$c' at $i")
    }
    Right(out.result())
  }

  // ---- parser ----------------------------------------------------------

  /** Parse and validate; Left(reason) on any grammar or semantic error. */
  def parse(statement: String): Either[String, CreateTable] =
    tokenize(statement).flatMap { toks =>
      val p = new P(toks)
      try Right(p.statement())
      catch { case e: IllegalArgumentException => Left(e.getMessage) }
    }

  def validate(statement: String): Either[String, CreateTable] =
    parse(statement)

  private final class P(var toks: List[Tok]) {
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$msg (at ${toks.take(3).mkString(" ")})")

    private def pop(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => fail("unexpected end of statement")
    }
    private def peek: Option[Tok] = toks.headOption
    private def peekKw(w: String): Boolean = peek match {
      case Some(KW(k)) => k == w
      case _ => false
    }
    private def expectWord(w: String): Unit = pop() match {
      case KW(`w`) => ()
      case other => fail(s"expected $w, got $other")
    }
    private def expectSym(c: Char): Unit = pop() match {
      case Sym(`c`) => ()
      case other => fail(s"expected '$c', got $other")
    }
    private def ident(): String = pop() match {
      case Ident(s) => s
      case Word(s) => s
      case other => fail(s"expected identifier, got $other")
    }

    def statement(): CreateTable = {
      expectWord("CREATE"); expectWord("TABLE")
      val table = ident()
      expectSym('(')
      val cols = List.newBuilder[Column]
      cols += columnDef()
      while (peek.contains(Sym(','))) { pop(); cols += columnDef() }
      expectSym(')')
      val opts = tableOptions()
      if (toks.nonEmpty) fail(s"trailing tokens: ${toks.mkString(" ")}")
      val columns = cols.result()
      val dupes = columns.groupBy(_.name.toLowerCase(java.util.Locale.ROOT))
        .collect { case (n, cs) if cs.size > 1 => n }
      if (dupes.nonEmpty) fail(s"duplicate column name(s): ${dupes.mkString(", ")}")
      CreateTable(table, columns, opts)
    }

    private def columnDef(): Column = {
      val name = ident()
      val tn = pop() match {
        case KW(w) => w
        case other => fail(s"expected a type keyword, got $other")
      }
      // DOUBLE PRECISION is two words for one type
      val typeName =
        if (tn == "DOUBLE" && peekKw("PRECISION")) {
          pop(); "DOUBLE"
        } else tn
      if (!Types.contains(typeName))
        fail(s"'$typeName' is not a MySQL data type")
      val args = List.newBuilder[Long]
      if (peek.contains(Sym('('))) {
        pop()
        args += (pop() match {
          case Num(v) => v
          case other => fail(s"expected a length, got $other")
        })
        if (peek.contains(Sym(','))) {
          pop()
          args += (pop() match {
            case Num(v) => v
            case other => fail(s"expected a scale, got $other")
          })
        }
        expectSym(')')
      }
      val typeArgs = args.result()
      // the signed-number tokenizer branch makes DECIMAL(-1) lexable;
      // MySQL rejects negative precision/length/scale semantically
      if (typeArgs.exists(_ < 0))
        fail(s"negative type argument in $typeName(${typeArgs.mkString(",")})")
      if (LengthRequired.contains(typeName) && typeArgs.isEmpty)
        fail(s"$typeName requires an explicit length")
      if (typeName == "VARCHAR" &&
        typeArgs.headOption.exists(n => n < 1 || n > 65535))
        fail(s"VARCHAR length ${typeArgs.head} outside [1, 65535]")
      var charset: Option[String] = None
      var collate: Option[String] = None
      var notNull = false
      var more = true
      while (more) peek match {
        case Some(KW("CHARACTER")) =>
          pop(); expectWord("SET"); charset = Some(ident())
        case Some(KW("COLLATE")) => pop(); collate = Some(ident())
        case Some(KW("NOT")) => pop(); expectWord("NULL"); notNull = true
        case Some(KW("NULL")) => pop()
        case Some(KW("DEFAULT")) =>
          pop()
          pop() match {
            case Num(_) | Str(_) | KW("NULL") | KW("CURRENT_TIMESTAMP") => ()
            case other => fail(s"expected a DEFAULT literal, got $other")
          }
        case Some(KW("AUTO_INCREMENT")) => pop()
        case Some(KW("UNIQUE")) =>
          pop(); if (peekKw("KEY")) pop()
        case Some(KW("PRIMARY")) => pop(); expectWord("KEY")
        case Some(KW("COMMENT")) =>
          pop()
          pop() match {
            case Str(_) => ()
            case other => fail(s"expected a COMMENT string, got $other")
          }
        case _ => more = false
      }
      Column(name, typeName, typeArgs, charset, collate, notNull)
    }

    private def tableOptions(): Map[String, String] = {
      val opts = Map.newBuilder[String, String]
      var more = toks.nonEmpty
      while (more) {
        if (peek.contains(Sym(','))) pop() // options may be comma-separated
        peek match {
          case Some(KW("ENGINE")) =>
            pop(); eatEq(); opts += ("ENGINE" -> ident())
          case Some(KW("DEFAULT")) =>
            pop()
            peek match {
              case Some(KW("CHARSET")) =>
                pop(); eatEq(); opts += ("CHARSET" -> ident())
              case Some(KW("CHARACTER")) =>
                pop(); expectWord("SET"); eatEq()
                opts += ("CHARSET" -> ident())
              case Some(KW("COLLATE")) =>
                pop(); eatEq(); opts += ("COLLATE" -> ident())
              case other => fail(s"expected CHARSET/COLLATE after DEFAULT, got $other")
            }
          case Some(KW("CHARSET")) =>
            pop(); eatEq(); opts += ("CHARSET" -> ident())
          case Some(KW("CHARACTER")) =>
            pop(); expectWord("SET"); eatEq(); opts += ("CHARSET" -> ident())
          case Some(KW("COLLATE")) =>
            pop(); eatEq(); opts += ("COLLATE" -> ident())
          case Some(KW("AUTO_INCREMENT")) =>
            pop(); eatEq()
            pop() match {
              case Num(_) => ()
              case other => fail(s"expected a number, got $other")
            }
            opts += ("AUTO_INCREMENT" -> "")
          case Some(KW("COMMENT")) =>
            pop(); eatEq()
            pop() match {
              case Str(s) => opts += ("COMMENT" -> s)
              case other => fail(s"expected a string, got $other")
            }
          case None => more = false
          case other => fail(s"unknown table option: $other")
        }
        if (toks.isEmpty) more = false
      }
      opts.result()
    }

    private def eatEq(): Unit =
      if (peek.contains(Sym('='))) pop() // MySQL: '=' is optional
  }
}
