package graft.engine.format

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.scalatest.funsuite.AnyFunSuite

/** The r20 hand-rolled commit-log readers ([[MetaJson]]) must decode
  * EXACTLY what the databind writer encodes — for every field, default,
  * None/null form, escape and unicode shape the model can carry. The
  * writer stays databind ([[TableLayout.writeJsonAtomic]]), so
  * write-with-databind → read-with-MetaJson ≡ read-with-databind is the
  * whole correctness contract of the fast path. */
class MetaJsonSpec extends AnyFunSuite {

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private val segFull = SegmentMeta(
    id = 42L,
    status = SegmentStatus.Success,
    format = "parquet",
    files = Seq("part-0.parquet", "sub/dir=x/part-1.parquet"),
    rowCount = 123456789012L,
    sizeBytes = 987654321L,
    stats = Map(
      "k" -> ColumnStats(Some("1"), Some("9"), 3),
      "s" -> ColumnStats(None, Some("z\"quote\\backé中"), 0)),
    sortColumns = Seq("k", "s"),
    createdAt = 1700000000123L,
    externalPath = Some("/abs/external path/with spaces"),
    lastBatchId = 7L,
    fileMeta = Map(
      "part-0.parquet" -> FileMeta(10, 4096,
        Map("k" -> ColumnStats(Some("-5"), Some("0"), 1))),
      "sub/dir=x/part-1.parquet" -> FileMeta(0, 0, Map.empty)),
    removedFiles = Seq("gone-1.parquet"),
    deltas = Map("part-0.parquet" -> Seq("d/0.bin", "d/1.bin")),
    origin = "rewrite",
    retiredAt = 1700000099999L,
    rewriteOf = Seq("aabb", "ccdd"),
    rewriteFp = "eeff")

  private val segDefaults = SegmentMeta(
    0L, SegmentStatus.InProgress, "csv", Nil, -1L, 0L, Map.empty, Nil, 0L)

  private def roundtripSeg(s: SegmentMeta): Unit = {
    val json = mapper.writeValueAsBytes(s)
    val viaHand = MetaJson.segmentMetaOf(json, 0, json.length)
    val viaDatabind = mapper.readValue(json, classOf[SegmentMeta])
    assert(viaHand == viaDatabind)
    assert(viaHand == s)
  }

  test("SegmentMeta: full-field and all-defaults round trips match databind") {
    roundtripSeg(segFull)
    roundtripSeg(segDefaults)
  }

  test("SegmentMeta: offset slices parse from the middle of a shared buffer") {
    val a = mapper.writeValueAsBytes(segFull)
    val b = mapper.writeValueAsBytes(segDefaults)
    val buf = new Array[Byte](a.length + 1 + b.length)
    System.arraycopy(a, 0, buf, 0, a.length)
    buf(a.length) = '\n'
    System.arraycopy(b, 0, buf, a.length + 1, b.length)
    assert(MetaJson.segmentMetaOf(buf, 0, a.length) == segFull)
    assert(MetaJson.segmentMetaOf(buf, a.length + 1, b.length) == segDefaults)
  }

  test("unknown and derived fields are skipped (forward/derived compat)") {
    val json = ("""{"id":1,"status":"SUCCESS","format":"parquet","files":[],""" +
      """"rowCount":5,"sizeBytes":9,"stats":{},"sortColumns":[],"createdAt":3,""" +
      """"visible":true,"futureObj":{"deep":{"x":[1,2,{"y":null}]}},""" +
      """"futureArr":[[1],[2]],"futureStr":"s"}""").getBytes("UTF-8")
    val viaHand = MetaJson.segmentMetaOf(json, 0, json.length)
    val viaDatabind = mapper.readValue(json, classOf[SegmentMeta])
    assert(viaHand == viaDatabind)
    assert(viaHand.id == 1 && viaHand.rowCount == 5)
  }

  test("absent optional fields take case-class defaults, null maps to empty") {
    val json = ("""{"id":2,"status":"SUCCESS","format":"parquet",""" +
      """"files":null,"rowCount":1,"sizeBytes":1,"stats":null,""" +
      """"sortColumns":[],"createdAt":1,"externalPath":null,""" +
      """"fileMeta":null,"deltas":null}""").getBytes("UTF-8")
    val viaHand = MetaJson.segmentMetaOf(json, 0, json.length)
    assert(viaHand.externalPath.isEmpty)
    assert(viaHand.files.isEmpty && viaHand.stats.isEmpty &&
      viaHand.fileMeta.isEmpty && viaHand.deltas.isEmpty)
    assert(viaHand.lastBatchId == -1L && viaHand.origin == "load" &&
      viaHand.retiredAt == 0L && viaHand.rewriteOf.isEmpty && viaHand.rewriteFp == "")
  }

  test("TableStatus envelope + segments round trip matches databind") {
    val st = TableStatus(
      version = 12L,
      segments = Seq(segFull, segDefaults),
      ckptV = 9L, prevCkptV = 5L, ckptId = "abc123def456",
      maxSegmentId = 99L, committedAt = 1700000000555L)
    val json = mapper.writeValueAsBytes(st)
    val viaHand = MetaJson.tableStatusOf(json, 0, json.length)
    val viaDatabind = mapper.readValue(json, classOf[TableStatus])
    assert(viaHand == viaDatabind)
    assert(viaHand == st)
    // stream form decodes identically
    assert(MetaJson.tableStatusOf(new java.io.ByteArrayInputStream(json)) == st)
  }

  test("StatusDelta round trip matches databind (incl. removes)") {
    val d = StatusDelta(7L, Seq(segFull), Seq(1L, 2L, 3L), 1700000000999L)
    val json = mapper.writeValueAsBytes(d)
    val viaHand = MetaJson.statusDeltaOf(json, 0, json.length)
    assert(viaHand == mapper.readValue(json, classOf[StatusDelta]))
    assert(viaHand == d)
    assert(MetaJson.statusDeltaOf(new java.io.ByteArrayInputStream(json)) == d)
  }

  test("pretty-printed (inline-era) documents parse identically") {
    val st = TableStatus(3L, Seq(segFull), committedAt = 42L)
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(st)
    assert(MetaJson.tableStatusOf(json, 0, json.length) == st)
  }

  test("trailing pad whitespace (writeJsonAtomic) is tolerated") {
    val d = StatusDelta(1L, Nil, Nil, 5L)
    val json = (mapper.writeValueAsString(d) + "   ").getBytes("UTF-8")
    assert(MetaJson.statusDeltaOf(json, 0, json.length) == d)
  }
}
