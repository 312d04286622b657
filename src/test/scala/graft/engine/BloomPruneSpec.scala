package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end proof that a 'bloomfilter' index actually SKIPS ROW
  * GROUPS on a point lookup — the reference behavior of the bloom
  * coarse-grain index (reference
  * index/bloom/.../BloomCoarseGrainIndex.java:70,134: prune blocklets
  * whose bloom reports the probe value absent).
  *
  * The fixture is adversarial to every other pruning tier: the bloom
  * column is high-cardinality, NOT a sort column, and every row group's
  * (min, max) spans the full key range (keys are dealt round-robin), so
  * min-max stats can keep nothing out. The assertion runs the SAME
  * row-group filter machinery Spark's parquet reader runs at task
  * start (ParquetFileReader's RowGroupFilter) once with bloom off
  * (stats only) and once with bloom on: stats alone keep every row
  * group alive; bloom keeps exactly the one group that holds the key.
  */
class BloomPruneSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.parquet.HadoopReadOptions
  import org.apache.parquet.filter2.compat.FilterCompat
  import org.apache.parquet.filter2.predicate.FilterApi
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile

  private def survivors(file: String, probe: Long, bloom: Boolean): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val pred = FilterApi.eq(FilterApi.longColumn("k"),
      java.lang.Long.valueOf(probe))
    val opts = HadoopReadOptions.builder(conf)
      .withRecordFilter(FilterCompat.get(pred))
      .useStatsFilter(true)
      .useDictionaryFilter(false) // isolate the bloom tier
      .useColumnIndexFilter(false)
      .useBloomFilter(bloom)
      .build()
    val r = new ParquetFileReader(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf), opts)
    try r.getRowGroups.size finally r.close()
  }

  private def totalRowGroups(file: String): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
    try r.getFooter.getBlocks.size finally r.close()
  }

  test("bloom index skips row groups a min-max scan cannot") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_bloom_").toString + "/t"
    // 40k rows, keys 0..39999 dealt round-robin over partitions so every
    // row group spans [~0, ~39999]; tiny row groups force many groups
    // per file; v is the sort column, k deliberately is not. The long
    // filler column defeats dictionary/RLE compaction enough that the
    // 64 KB block-size knob yields multiple groups per file.
    val src = spark.range(0, 40000).select(
      col("id").as("k"),
      concat(lit("v"), lpad((col("id") % 97).cast("string"), 4, "0"))
        .as("v"),
      sha2(concat(lit("pad"), col("id").cast("string")), 256).as("pad"))
      .repartition(2)
    val t = GraftTable.create(spark, path, src.schema,
      sortColumns = Seq("v"),
      properties = Map(
        "bloom_columns" -> "k",
        "parquet.block.size" -> "65536",
        // keep bloom candidate sizing tight + deterministic
        "parquet.bloom.filter.expected.ndv#k" -> "40000"))
    t.insert(src)

    val files = t.status.visible.flatMap(s => t.layout.segmentFilePaths(s))
    val groups = files.map(totalRowGroups)
    assert(groups.sum >= 8,
      s"fixture too small to prove group skip: $groups row groups")

    val probe = 31337L
    val statsAlive = files.map(f => survivors(f, probe, bloom = false)).sum
    val bloomAlive = files.map(f => survivors(f, probe, bloom = true)).sum
    // min-max can't prune interleaved keys: every group stays alive
    assert(statsAlive == groups.sum,
      s"stats unexpectedly pruned: $statsAlive of ${groups.sum}")
    // bloom keeps only the group(s) that really hold the key — for a
    // unique key that is exactly one (false positives could admit a
    // stray group; at 1% fpp over <40 groups even 2 would be a fluke,
    // so assert the strong form and the invariant >= 1)
    assert(bloomAlive >= 1 && bloomAlive <= 2,
      s"bloom kept $bloomAlive of ${groups.sum} row groups")
    assert(bloomAlive < statsAlive, "bloom pruned nothing beyond stats")

    // the engine answer with bloom pruning active stays exact
    val got = t.read.filter(col("k") === probe).select("v").collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("v" + "%04d".format(probe % 97)))
    // and a probe for an absent key prunes EVERYTHING
    val absent = files.map(f => survivors(f, 7777777L, bloom = true)).sum
    assert(absent == 0, s"absent-key probe kept $absent row groups")
    GraftTable.drop(spark, path)
  }
}
