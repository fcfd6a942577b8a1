package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Compaction must shrink per-directory file counts without touching a
  * row (row parity is the q45 oracle's job; counts are pinned here). */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  private def parquetFiles(dir: java.io.File): Int =
    dir.listFiles().count(f => f.getName.endsWith(".parquet"))

  test("compaction collapses fragmented partition dirs to bounded file counts") {
    val compacted = new java.io.File(Compaction.ensureCompacted(spark, sf))
    val frag = new java.io.File(compacted.getPath.replace("graft_compact", "graft_frag"))
    val fragDirs = frag.listFiles().filter(_.getName.startsWith("event_type="))
    val compDirs = compacted.listFiles().filter(_.getName.startsWith("event_type="))
    assert(fragDirs.nonEmpty && compDirs.length == fragDirs.length)
    val fragFiles = fragDirs.map(parquetFiles).sum
    val compFiles = compDirs.map(parquetFiles).sum
    // 32-way fragmentation per dir → one bin-packed file per dir here
    // (every type fits under maxRecordsPerFile at harness scale)
    assert(fragFiles >= 5 * 16, s"fixture not fragmented: $fragFiles files")
    assert(compFiles == compDirs.length,
      s"expected 1 file per partition dir, got $compFiles in ${compDirs.length} dirs")
    // layout-only rewrite: same rows
    val a = spark.read.parquet(frag.getPath).count()
    val b = spark.read.parquet(compacted.getPath).count()
    assert(a == b)
  }

  test("maxRecordsPerFile splits an oversized partition into bounded files") {
    val compacted = new java.io.File(Compaction.ensureCompacted(spark, sf))
    val frag = compacted.getPath.replace("graft_compact", "graft_frag")
    // register under Scratch (not a string-replace path) so the split
    // output gets the same per-application shutdown-hook cleanup
    val out = graft.Scratch.dir(spark, "graft_split", compacted.getName)
    Compaction.compact(spark, frag, out, "event_type", 100L)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_type="))
    dirs.foreach { dir =>
      val rows = spark.read.parquet(dir.getPath).count()
      val expected = math.ceil(rows / 100.0).toInt
      assert(parquetFiles(dir) == expected,
        s"${dir.getName}: $rows rows in ${parquetFiles(dir)} files, want $expected")
    }
  }
}
