package graft

import java.nio.file.Files

import graft.tables.GraftTable
import org.apache.spark.sql.functions._

/** String min/max data skipping in UTF-8 byte order: non-ASCII values
  * now carry stats (they were dropped under the old ASCII-only guard)
  * and compare code-point-faithfully on the pruning side.
  */
class Utf8StatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_utf8_").resolve("t").toString

  test("utf8Cmp orders supplementary characters byte-faithfully") {
    // U+1F600 (😀, a surrogate pair in UTF-16) must rank ABOVE
    // U+FFFD — Java String order says the opposite
    val smiley = new String(Character.toChars(0x1F600))
    val fffd = "�"
    assert(smiley.compareTo(fffd) < 0) // the Java trap
    assert(GraftTable.utf8Cmp(smiley, fffd) > 0) // the parquet order
    assert(GraftTable.utf8Cmp("abc", "abd") < 0)
    assert(GraftTable.utf8Cmp("ab", "abc") < 0)
    assert(GraftTable.utf8Cmp("déjà", "déjà") === 0)
  }

  test("non-ASCII string stats prune files through the scan") {
    // 3 clustered files over a Cyrillic key; an equality filter on one
    // value must scan fewer files than the full table
    val df = (1 to 90).map(i => (i.toLong, s"город_${i % 3}"))
      .toDF("id", "k")
    val path = tmp()
    val t = GraftTable.create(spark, path, df)
    t.clusterBy(3, "k")
    val rel = spark.read.format("graft-table").load(path)
    def scannedFiles(q: org.apache.spark.sql.DataFrame): Int =
      q.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(Nil, f.dataFilters)
            .map(_.files.length).sum
      }.sum
    val all = scannedFiles(rel)
    val one = scannedFiles(rel.where($"k" === "город_1"))
    assert(rel.where($"k" === "город_1").count() === 30)
    assert(one < all, s"expected non-ASCII stats pruning: $one < $all")
  }

  test("range filters on non-ASCII stats stay correct") {
    val df = Seq((1L, "альфа"), (2L, "бета"), (3L, "гамма"))
      .toDF("id", "k")
    val path = tmp()
    GraftTable.create(spark, path, df)
    val rel = spark.read.format("graft-table").load(path)
    assert(rel.where($"k" >= "бета").count() === 2)
    assert(rel.where($"k" < "бета").count() === 1)
    assert(rel.where($"k" === "нет").count() === 0)
  }
}
