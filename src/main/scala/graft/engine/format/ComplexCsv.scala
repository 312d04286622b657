package graft.engine.format

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Complex-type (ARRAY / STRUCT / MAP) cells in delimited text loads —
  * the reference's COMPLEX_DELIMITER_LEVEL_1/2/3 contract
  * (docs/dml-of-carbondata.md:161-184; exercised by
  * integration/spark/src/test/scala/.../complexType/ over `Array.csv` /
  * `Struct.csv` fixtures):
  *
  *   - level-1 splits the outer elements:  a\001b\001c        → ARRAY(a,b,c)
  *   - level-2 splits one nesting deeper:  a\002b\001c\002d   → ARRAY<ARRAY> {{a,b},{c,d}}
  *   - maps use the entry delimiter at their own level and the NEXT
  *     level's delimiter between key and value:
  *     k\002v\001k\002v                                        → MAP(k→v, k→v)
  *   - level-3 serves the key-value split of a map nested one deep:
  *     a\003b\002b\003c\001aa\003bb\002cc\003dd               → ARRAY<MAP>
  *
  * Spark-first: the CSV is read with every complex column as a plain
  * string, then rebuilt declaratively with `split` / `transform` /
  * `map_from_arrays` / `struct` — all codegen'd Catalyst expressions, no
  * UDF, so a 100 TB CSV backfill parses complex cells inside
  * whole-stage codegen at scan parallelism.
  */
object ComplexCsv {

  /** Delimiters for nesting levels 1..3 (reference defaults
    * `\001`/`\002`/`\003`, docs/dml-of-carbondata.md:166,175,183). */
  case class Delims(d1: String = "\u0001", d2: String = "\u0002",
      d3: String = "\u0003") {
    private val all = Seq(d1, d2, d3)
    def at(level: Int): String = {
      require(level < all.size,
        s"complex nesting deeper than ${all.size} levels needs more " +
          "COMPLEX_DELIMITER_LEVELs than the format defines")
      all(level)
    }
  }

  def delimsFrom(options: Map[String, String]): Delims = {
    val norm = options.map { case (k, v) => k.toUpperCase -> v }
    Delims(
      norm.getOrElse("COMPLEX_DELIMITER_LEVEL_1", "\u0001"),
      norm.getOrElse("COMPLEX_DELIMITER_LEVEL_2", "\u0002"),
      norm.getOrElse("COMPLEX_DELIMITER_LEVEL_3", "\u0003"))
  }

  def isComplex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: StructType | _: MapType => true
    case _ => false
  }

  /** The schema the CSV parser sees: complex columns demoted to string
    * (the raw delimited cell), scalars unchanged. */
  def csvSchema(target: StructType): StructType =
    StructType(target.fields.map(f =>
      if (isComplex(f.dataType)) f.copy(dataType = StringType) else f))

  private def quoted(d: String): String = java.util.regex.Pattern.quote(d)

  /** Rebuild a typed complex value from its delimited string cell.
    * `level` is 0-based: a value's own elements split on `at(level)`;
    * its children parse at `level + 1` (maps consume two levels — entry
    * split at `level`, key/value split at `level + 1`, values parse at
    * `level + 2`). A NULL or empty cell is a NULL value at every level,
    * like the reference's null handling for complex cells. */
  def parse(e: Column, dt: DataType, delims: Delims, level: Int = 0): Column =
    dt match {
      case ArrayType(et, _) =>
        val parts = split(e, quoted(delims.at(level)))
        val arr = transform(parts, x => parse(x, et, delims, level + 1))
        when(e.isNull || e === "", lit(null).cast(ArrayType(et))).otherwise(arr)
      case st: StructType =>
        val parts = split(e, quoted(delims.at(level)))
        val s = struct(st.fields.zipWithIndex.map { case (f, i) =>
          parse(element_at(parts, i + 1), f.dataType, delims, level + 1)
            .as(f.name)
        }.toSeq: _*)
        when(e.isNull || e === "", lit(null).cast(st)).otherwise(s)
      case MapType(kt, vt, _) =>
        val entries = split(e, quoted(delims.at(level)))
        val kvd = quoted(delims.at(level + 1))
        val keys = transform(entries,
          x => parse(element_at(split(x, kvd), 1), kt, delims, level + 2))
        val vals = transform(entries,
          x => parse(element_at(split(x, kvd), 2), vt, delims, level + 2))
        when(e.isNull || e === "", lit(null).cast(MapType(kt, vt)))
          .otherwise(map_from_arrays(keys, vals))
      case scalar =>
        // try_cast: a bad leaf is NULL here and a bad-record there —
        // wellFormed decides; ANSI cast would abort the whole load job
        e.try_cast(scalar)
    }

  /** TRUE iff the cell parses cleanly — the complex-cell analog of the
    * CSV reader's malformed-row detection, feeding the same bad-record
    * action matrix (FAIL / IGNORE / REDIRECT). Malformed means: a
    * struct cell whose outer split arity differs from the field count, a
    * map entry without its key-value delimiter, or a non-empty scalar
    * leaf that casts to NULL. */
  def wellFormed(e: Column, dt: DataType, delims: Delims, level: Int = 0): Column =
    dt match {
      case ArrayType(et, _) =>
        val parts = split(e, quoted(delims.at(level)))
        e.isNull || e === "" ||
          forall(parts, x => wellFormed(x, et, delims, level + 1))
      case st: StructType =>
        val parts = split(e, quoted(delims.at(level)))
        e.isNull || e === "" ||
          (size(parts) === st.fields.length &&
            st.fields.zipWithIndex.map { case (f, i) =>
              wellFormed(element_at(parts, i + 1), f.dataType, delims, level + 1)
            }.reduce(_ && _))
      case MapType(kt, vt, _) =>
        val entries = split(e, quoted(delims.at(level)))
        val kvd = quoted(delims.at(level + 1))
        e.isNull || e === "" ||
          forall(entries, x =>
            size(split(x, kvd)) === 2 &&
              wellFormed(element_at(split(x, kvd), 1), kt, delims, level + 2) &&
              wellFormed(element_at(split(x, kvd), 2), vt, delims, level + 2))
      case StringType | BinaryType =>
        lit(true) // any text is a valid string leaf
      case scalar =>
        // a non-empty leaf that casts to NULL is a bad value (the
        // scalar-column equivalent is caught by the CSV parse mode)
        e.isNull || trim(e) === "" || e.try_cast(scalar).isNotNull
    }
}
