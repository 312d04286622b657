package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** MERGE INTO SQL front-end for the merge builder (reference parses this
  * with ANTLR, CarbonAntlrParser.scala:25-40; semantics per
  * docs/scd-and-cdc-guide.md:94-128).
  *
  * Supported grammar (case-insensitive keywords):
  * {{{
  * MERGE INTO <target> [AS <ta>] USING <source> [AS <sa>] ON <cond>
  *   WHEN MATCHED [AND <cond>] THEN UPDATE SET c = <expr>[, ...]
  *   WHEN MATCHED [AND <cond>] THEN DELETE
  *   WHEN NOT MATCHED [AND <cond>] THEN INSERT *
  *   WHEN NOT MATCHED [AND <cond>] THEN INSERT (c[, ...]) VALUES (<expr>[, ...])
  * }}}
  * `<target>` resolves through `tables`; `<source>` through `tables` or
  * a temp view. Qualifiers `<target>.`/`<ta>.` and `<source>.`/`<sa>.`
  * are normalized to the builder's `t.`/`s.` aliases.
  */
object GraftSql {

  private val HeadRe =
    """(?is)^\s*MERGE\s+INTO\s+(\S+)(?:\s+AS\s+(\w+))?\s+USING\s+(\S+)(?:\s+AS\s+(\w+))?\s+ON\s+(.+)$""".r

  def mergeInto(
      spark: SparkSession,
      sql: String,
      tables: Map[String, GraftTable]): Option[Long] = {
    // split into the head and WHEN clauses at top level
    val parts = splitTopLevel(sql, "(?i)\\bWHEN\\b")
    require(parts.nonEmpty, "empty MERGE statement")
    val (target, tAlias, source, sAlias, onCond) = parts.head match {
      case HeadRe(tgt, ta, src, sa, cond) =>
        (tgt, Option(ta), src, Option(sa), cond)
      case other => throw new IllegalArgumentException(s"cannot parse MERGE head: $other")
    }
    val targetTable = tables.getOrElse(target,
      throw new IllegalArgumentException(s"unknown merge target $target"))
    val sourceDf: DataFrame = tables.get(source).map(_.read)
      .getOrElse(spark.table(source))

    def norm(e: String): String = {
      var r = e
      (Seq(target) ++ tAlias).foreach(a => r = r.replaceAll(s"(?i)\\b$a\\.", "t."))
      (Seq(source) ++ sAlias).foreach(a => r = r.replaceAll(s"(?i)\\b$a\\.", "s."))
      r
    }

    var b = targetTable.merge(sourceDf, expr(norm(onCond)))

    val ClauseRe =
      """(?is)^\s*(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+(.+)$""".r
    parts.tail.foreach {
      case ClauseRe(notM, cond, action) =>
        val condCol = Option(cond).map(c => expr(norm(c))).orNull
        val isMatched = notM == null
        val act = action.trim
        if (act.toUpperCase.startsWith("UPDATE SET")) {
          require(isMatched, "UPDATE requires WHEN MATCHED")
          val sets = splitTopLevel(act.substring("UPDATE SET".length), ",").map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"bad SET item: $kv")
            kv.take(i).trim -> expr(norm(kv.drop(i + 1)))
          }.toMap
          b = b.whenMatched(condCol).updateExpr(sets)
        } else if (act.toUpperCase.startsWith("DELETE")) {
          b = if (isMatched) b.whenMatched(condCol).delete()
          else b.whenNotMatchedAndExistsOnlyOnTarget(condCol).delete()
        } else if (act.trim.toUpperCase.matches("INSERT\\s*\\*")) {
          require(!isMatched, "INSERT requires WHEN NOT MATCHED")
          b = b.whenNotMatched(condCol).insertAll()
        } else if (act.toUpperCase.startsWith("INSERT")) {
          require(!isMatched, "INSERT requires WHEN NOT MATCHED")
          val InsRe = """(?is)^INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.+)\)\s*$""".r
          act match {
            case InsRe(cols, vals) =>
              val cs = cols.split(",").map(_.trim)
              val vs = splitTopLevel(vals, ",").map(v => expr(norm(v)))
              require(cs.length == vs.length, "INSERT columns/values mismatch")
              b = b.whenNotMatched(condCol).insertExpr(cs.zip(vs).toMap)
            case _ => throw new IllegalArgumentException(s"cannot parse: $act")
          }
        } else throw new IllegalArgumentException(s"unknown merge action: $act")
      case other => throw new IllegalArgumentException(s"cannot parse WHEN clause: $other")
    }
    b.execute()
  }

  /** Split on a regex only at paren/quote top level. */
  private[engine] def splitTopLevel(s: String, sepRe: String): Seq[String] = {
    val sep = sepRe.r
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQuote = false; var last = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQuote = !inQuote
      else if (!inQuote && (c == '(')) depth += 1
      else if (!inQuote && (c == ')')) depth -= 1
      else if (!inQuote && depth == 0) {
        sep.findPrefixMatchOf(s.substring(i)) match {
          case Some(m) if m.end > 0 =>
            out += s.substring(last, i)
            i += m.end - 1
            last = i + 1
          case _ =>
        }
      }
      i += 1
    }
    out += s.substring(last)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
