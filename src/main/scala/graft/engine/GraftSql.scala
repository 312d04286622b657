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

  /** Segment-management / MV command statements (the reference's
    * CarbonSpark2SqlParser command grammar, :75-788). Returns Some(df)
    * for statements that produce rows (SHOW …), Some(empty df) for
    * actions, None when `sql` is not a recognized command (caller falls
    * through to `spark.sql`). Table references resolve through `tables`
    * first, then as a filesystem path.
    *
    * Supported:
    * {{{
    * DESCRIBE [FORMATTED|EXTENDED] TABLE <t>
    * SHOW SEGMENTS FOR TABLE <t>
    * ALTER TABLE <t> COMPACT 'MINOR'|'MAJOR'|'CUSTOM' [WHERE SEGMENT.ID IN (1,2)]
    * CLEAN FILES FOR TABLE <t>
    * DELETE FROM TABLE <t> WHERE SEGMENT.ID IN (1,2)
    * DELETE FROM TABLE <t> WHERE SEGMENT.STARTTIME BEFORE '<ts millis or yyyy-MM-dd HH:mm:ss>'
    * ALTER TABLE <t> FINISH STREAMING
    * CREATE MATERIALIZED VIEW <name> STORED AT '<path>' AS <select sql>
    * REFRESH MATERIALIZED VIEW <name>
    * DROP MATERIALIZED VIEW <name>
    * CREATE TABLE <t> LIKE <src>   -- empty clone of schema/sort/partitions/props
    * SHOW SUMMARY FOR TABLE <t>    -- CarbonCli-style per-file metadata
    * }}}
    */
  def command(
      spark: SparkSession,
      sql: String,
      tables: Map[String, GraftTable] = Map.empty): Option[DataFrame] = {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def table(ref: String): GraftTable = {
      val clean = ref.stripPrefix("`").stripSuffix("`")
      tables.getOrElse(clean, GraftTable.at(spark, clean))
    }
    def ids(s: String): Seq[Long] = {
      val parsed = s.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      require(parsed.nonEmpty, s"empty segment id list in: $s")
      parsed
    }
    def done: DataFrame = spark.emptyDataFrame
    val Describe = """(?is)^\s*DESC(?:RIBE)?\s+(?:FORMATTED\s+|EXTENDED\s+)?TABLE\s+(\S+)\s*$""".r
    val ShowSegments = """(?is)^\s*SHOW\s+SEGMENTS\s+FOR\s+TABLE\s+(\S+)\s*$""".r
    val Compact = """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+COMPACT\s+'(\w+)'\s*(?:WHERE\s+SEGMENT\.ID\s+IN\s*\(([^)]*)\)\s*)?$""".r
    val CleanFiles = """(?is)^\s*CLEAN\s+FILES\s+FOR\s+TABLE\s+(\S+)\s*$""".r
    val DelSegIds = """(?is)^\s*DELETE\s+FROM\s+TABLE\s+(\S+)\s+WHERE\s+SEGMENT\.ID\s+IN\s*\(([^)]*)\)\s*$""".r
    val DelSegBefore = """(?is)^\s*DELETE\s+FROM\s+TABLE\s+(\S+)\s+WHERE\s+SEGMENT\.STARTTIME\s+BEFORE\s+'([^']+)'\s*$""".r
    val FinishStreaming = """(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+FINISH\s+STREAMING\s*$""".r
    val CreateMv = """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+STORED\s+AT\s+'([^']+)'\s+AS\s+(.+)$""".r
    val RefreshMv = """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r
    val DropMv = """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(\w+)\s*$""".r
    val CreateLike = """(?is)^\s*CREATE\s+TABLE\s+(\S+)\s+LIKE\s+(\S+)\s*$""".r
    val ShowSummary = """(?is)^\s*SHOW\s+SUMMARY\s+FOR\s+TABLE\s+(\S+)\s*$""".r
    sql match {
      case ShowSummary(t) => Some(table(t).describeFiles)
      // reference CarbonCreateTableLikeCommand: an empty table carrying
      // the source's schema, sort spec, partitioning, bucketing and
      // user properties (no data, no segments)
      case CreateLike(dst, src) =>
        val s0 = table(src)
        val m = s0.meta
        GraftTable.create(spark, dst.stripPrefix("`").stripSuffix("`"),
          s0.schema, m.sortColumns, m.sortScope, m.properties, m.partitionColumns)
        Some(done)
      case Describe(t) => Some(table(t).describe)
      case ShowSegments(t) =>
        Some(table(t).segments.map(s =>
          (s.id, s.status, s.format, s.rowCount, s.sizeBytes, s.files.size))
          .toDF("id", "status", "format", "row_count", "size_bytes", "file_count"))
      case Compact(t, kind, idList) =>
        table(t).compact(kind.toUpperCase,
          Option(idList).map(ids).getOrElse(Nil))
        Some(done)
      case CleanFiles(t) =>
        val removed = table(t).cleanFiles()
        Some(removed.map(Tuple1(_)).toDF("removed_segment_id"))
      case DelSegIds(t, idList) =>
        table(t).deleteSegmentsById(ids(idList)); Some(done)
      case DelSegBefore(t, ts) =>
        val millis =
          if (ts.forall(_.isDigit)) ts.toLong
          else java.sql.Timestamp.valueOf(ts).getTime
        table(t).deleteSegmentsBefore(millis); Some(done)
      case FinishStreaming(t) =>
        graft.engine.streaming.StreamManager.finishStreaming(table(t)); Some(done)
      case CreateMv(name, path, query) =>
        mv.Mv.create(spark, name, spark.sql(query), path); Some(done)
      case RefreshMv(name) =>
        mv.Mv.refreshIncremental(spark, name); Some(done)
      case DropMv(name) =>
        mv.Mv.drop(spark, name); Some(done)
      case _ => None
    }
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
