package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ES|QL (j188) — a compiler for the useful core of Elasticsearch's
  * piped query language: `FROM src | WHERE … | EVAL … | STATS … BY … |
  * SORT … | LIMIT n`. Like j172's query_string parser, ALL parsing and
  * compilation happens at plan-build time: each pipe stage folds into
  * the DataFrame plan (WHERE → filter that Catalyst can push, EVAL →
  * projection, STATS → one keyed aggregation with map-side combine,
  * SORT+LIMIT → TakeOrderedAndProject), so the executed plan is
  * indistinguishable from the hand-written DataFrame program — the
  * language is surface, Catalyst is the optimizer, exactly the ES|QL
  * architecture (its own engine compiles to a physical plan the same
  * way).
  *
  * Expression grammar (Pratt-style precedence): OR < AND < comparisons
  * (== != >= <= > <) < additive < multiplicative < unary/primary;
  * primaries are numbers, "strings", identifiers, parens, and a
  * whitelisted function set (scalar: ROUND, ABS; aggregate: COUNT(*),
  * COUNT, SUM, MIN, MAX, AVG). `%` is multiplicative. Aliases bind with
  * `name = expr` in EVAL/STATS/BY. */
object Esql {

  // ---------- lexer ----------
  private val tokenRe =
    """\s*(>=|<=|==|!=|\|\||&&|[(),=%*/+\-<>|]|"[^"]*"|[A-Za-z_][A-Za-z_0-9.]*|\d+\.\d+|\d+)"""
      .r

  private def lex(q: String): List[String] = {
    var rest = q.trim
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (rest.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) => out += m.group(1); rest = rest.drop(m.end).trim
        case None => throw new IllegalArgumentException(s"ES|QL lex error at: $rest")
      }
    }
    out.toList
  }

  // ---------- expression parser (over a mutable token cursor) ----------
  private class Cursor(var toks: List[String]) {
    def peek: Option[String] = toks.headOption
    def eat(): String = { val h = toks.head; toks = toks.tail; h }
    def expect(t: String): Unit = {
      val h = eat()
      require(h == t, s"expected '$t', got '$h'")
    }
  }

  private val aggFns = Set("COUNT", "SUM", "MIN", "MAX", "AVG")

  private def primary(c: Cursor): Column = c.eat() match {
    case "(" => val e = orExpr(c); c.expect(")"); e
    case "-" => negate(primary(c))
    case t if t.equalsIgnoreCase("NOT") => !primary(c)
    case t if t.startsWith("\"") => lit(t.stripPrefix("\"").stripSuffix("\""))
    case t if t.matches("""\d+\.\d+""") => lit(t.toDouble)
    case t if t.matches("""\d+""") => lit(t.toLong)
    case fn if c.peek.contains("(") && (aggFns(fn.toUpperCase) ||
        Set("ROUND", "ABS")(fn.toUpperCase)) =>
      c.expect("(")
      fn.toUpperCase match {
        case "COUNT" if c.peek.contains("*") =>
          c.eat(); c.expect(")"); count(lit(1))
        case "COUNT" => val a = orExpr(c); c.expect(")"); count(a)
        case "SUM" => val a = orExpr(c); c.expect(")"); sum(a)
        case "MIN" => val a = orExpr(c); c.expect(")"); min(a)
        case "MAX" => val a = orExpr(c); c.expect(")"); max(a)
        case "AVG" => val a = orExpr(c); c.expect(")"); avg(a)
        case "ABS" => val a = orExpr(c); c.expect(")"); abs(a)
        case "ROUND" =>
          val a = orExpr(c)
          if (c.peek.contains(",")) {
            c.eat()
            val digits = c.eat().toInt
            c.expect(")")
            round(a, digits)
          } else {
            c.expect(")")
            // scale-0 ROUND returns an integer in ES|QL — cast to long
            // so the integer semantics survive the hash compare
            round(a, 0).cast("long")
          }
      }
    case id => col(id)
  }

  private def negate(c: Column): Column = lit(0) - c

  private def mulExpr(c: Cursor): Column = {
    var l = primary(c)
    while (c.peek.exists(Set("*", "/", "%"))) c.eat() match {
      case "*" => l = l * primary(c)
      case "/" => l = l / primary(c)
      case "%" => l = l % primary(c)
    }
    l
  }

  private def addExpr(c: Cursor): Column = {
    var l = mulExpr(c)
    while (c.peek.exists(Set("+", "-"))) c.eat() match {
      case "+" => l = l + mulExpr(c)
      case "-" => l = l - mulExpr(c)
    }
    l
  }

  private def cmpExpr(c: Cursor): Column = {
    val l = addExpr(c)
    c.peek match {
      case Some("==") => c.eat(); l === addExpr(c)
      case Some("!=") => c.eat(); l =!= addExpr(c)
      case Some(">=") => c.eat(); l >= addExpr(c)
      case Some("<=") => c.eat(); l <= addExpr(c)
      case Some(">") => c.eat(); l > addExpr(c)
      case Some("<") => c.eat(); l < addExpr(c)
      case _ => l
    }
  }

  private def andExpr(c: Cursor): Column = {
    var l = cmpExpr(c)
    while (c.peek.exists(t => t.equalsIgnoreCase("AND") || t == "&&")) { c.eat(); l = l && cmpExpr(c) }
    l
  }

  private def orExpr(c: Cursor): Column = {
    var l = andExpr(c)
    while (c.peek.exists(t => t.equalsIgnoreCase("OR") || t == "||")) { c.eat(); l = l || andExpr(c) }
    l
  }

  /** Parse one full expression and REQUIRE every token consumed — an
    * unrecognized trailing operator must be an error, never a silently
    * truncated predicate (r7 review). */
  private[graft] def parseExpr(src: String): Column = {
    val c = new Cursor(lex(src))
    val e = orExpr(c)
    require(c.toks.isEmpty, s"unparsed ES|QL tokens: ${c.toks.mkString(" ")}")
    e
  }

  private val identRe = "[A-Za-z_][A-Za-z_0-9.]*"

  /** `name = expr` items separated by commas (EVAL / STATS / BY); an
    * item may also be an UNALIASED expression — a bare column keeps its
    * name, anything else gets an `exprN` auto-name (r7 review: the old
    * parser silently dropped the tail of an unaliased `user_id % 10`).
    * The list must consume the whole body. */
  private def aliasedList(c: Cursor, autoPrefix: String = "expr"): Seq[(String, Column)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Column)]
    var more = true
    var k = 0
    while (more) {
      k += 1
      if (c.toks.length >= 2 && c.toks(1) == "=" && c.toks.head.matches(identRe)) {
        val n = c.eat(); c.eat()
        out += n -> orExpr(c)
      } else {
        val before = c.toks
        val e = orExpr(c)
        val consumed = before.take(before.length - c.toks.length)
        val n =
          if (consumed.length == 1 && consumed.head.matches(identRe)) consumed.head
          else s"$autoPrefix$k"
        out += n -> e
      }
      more = c.peek.contains(",")
      if (more) c.eat()
    }
    require(c.toks.isEmpty, s"unparsed ES|QL tokens: ${c.toks.mkString(" ")}")
    out.toSeq
  }

  /** First top-level (outside quotes, whitespace-delimited,
    * case-insensitive) occurrence of `word` in `body`, or -1 — indexOf
    * would match inside string literals (r7 review). */
  private def findTopLevel(body: String, word: String): Int = {
    var i = 0
    var inQ = false
    while (i < body.length) {
      val ch = body.charAt(i)
      if (ch == '"') inQ = !inQ
      else if (!inQ && i + word.length <= body.length &&
        body.regionMatches(true, i, word, 0, word.length) &&
        (i == 0 || body.charAt(i - 1).isWhitespace) &&
        (i + word.length == body.length ||
          body.charAt(i + word.length).isWhitespace))
        return i
      i += 1
    }
    -1
  }

  // ---------- pipeline compiler ----------

  /** Compile an ES|QL pipeline against the fixture tables in `d`. */
  def compile(s: SparkSession, d: String, query: String): DataFrame = {
    // single '|' splits stages; '||' is the OR operator and must not
    // (r7 review — the old regex split it into a bogus empty stage)
    val stages = query.split(
      "(?<!\\|)\\|(?!\\|)(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")
      .map(_.trim).filter(_.nonEmpty)
    require(stages.head.toUpperCase.startsWith("FROM "),
      "ES|QL pipeline must start with FROM")
    val src = stages.head.drop(5).trim
    var df: DataFrame = src match {
      case "events" => Tables.events(s, d)
      case "events_us" => Tables.eventsUs(s, d)
      case other => Tables.read(s, d, other)
    }
    for (st <- stages.tail) {
      val sp = st.indexOf(' ')
      val (kw, body) =
        if (sp < 0) (st.toUpperCase, "")
        else (st.take(sp).toUpperCase, st.drop(sp + 1).trim)
      kw match {
        case "WHERE" => df = df.filter(parseExpr(body))
        case "EVAL" =>
          for ((n, e) <- aliasedList(new Cursor(lex(body))))
            df = df.withColumn(n, e)
        case "STATS" =>
          val byIdx = findTopLevel(body, "BY")
          val (aggPart, byPart) =
            if (byIdx < 0) (body, "")
            else (body.take(byIdx), body.drop(byIdx + 2))
          val aggs = aliasedList(new Cursor(lex(aggPart)), "agg")
            .map { case (n, e) => e.as(n) }
          df =
            if (byPart.isEmpty) df.agg(aggs.head, aggs.tail: _*)
            else {
              val keys = aliasedList(new Cursor(lex(byPart)), "key")
              val keyed = keys.foldLeft(df) { case (f, (n, e)) => f.withColumn(n, e) }
              keyed.groupBy(keys.map(k => col(k._1)): _*).agg(aggs.head, aggs.tail: _*)
            }
        case "SORT" =>
          val items = body.split(",").map(_.trim).map { it =>
            val parts = it.split("\\s+")
            if (parts.length > 1 && parts(1).equalsIgnoreCase("DESC"))
              col(parts(0)).desc
            else col(parts(0)).asc
          }
          df = df.orderBy(items.toIndexedSeq: _*)
        case "LIMIT" => df = df.limit(body.trim.toInt)
        case "KEEP" =>
          df = df.select(body.split(",").map(_.trim).map(col).toIndexedSeq: _*)
        case other => throw new IllegalArgumentException(s"unknown stage: $other")
      }
    }
    df
  }

  /** j188_esql — a representative pipeline exercising every supported
    * stage: filter + derived column + keyed aggregation + sort + limit.
    * The WHERE predicate reaches the parquet scan (PushedFilters), the
    * STATS is one map-combined aggregation, SORT+LIMIT plans as a
    * per-partition heap — all visible in `.explain`, none of it special-
    * cased: the compiler only folds stages into the DataFrame API. */
  val j188Query: String =
    """FROM events
      || WHERE event_type == "purchase" AND value >= 10
      || EVAL cents = ROUND(value * 100)
      || STATS cnt = COUNT(*), sum_cents = SUM(cents), max_cents = MAX(cents) BY band = user_id % 10
      || SORT sum_cents DESC, band
      || LIMIT 5""".stripMargin

  def j188(s: SparkSession, d: String): DataFrame =
    compile(s, d, j188Query)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j188_esql" -> j188)

  val oracle: Map[String, String] = Map(
    "j188_esql" ->
      """SELECT user_id % 10 AS band, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS max_cents
        |FROM 'events.parquet'
        |WHERE event_type = 'purchase' AND value >= 10
        |GROUP BY 1 ORDER BY sum_cents DESC, band ASC LIMIT 5""".stripMargin)
}
