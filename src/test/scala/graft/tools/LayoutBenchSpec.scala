package graft.tools

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout writer must emit EXACTLY one fully-sorted file
  * per bucket. The failure mode it guards: `bucketBy` alone shards
  * each input partition into up-to-`buckets` files, so a many-split
  * input (sf100: ~300 splits) produces thousands of ~MB files —
  * footer overhead, lost compression, split-planning pressure.
  */
class LayoutBenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeOneFilePerBucket emits one sorted file per bucket") {
    import spark.implicits._
    val buckets = 8
    // many input partitions, keys scattered so every input partition
    // holds every bucket (the worst case for the naive writer)
    val df = spark.range(0, 8000, 1, 16)
      .selectExpr("id % 1000 as k", "id as v")
    val base = java.nio.file.Files.createTempDirectory("graft_layoutb")
    val loc = base.resolve("t").toString
    try {
      LayoutBench.writeOneFilePerBucket(df, "k", loc, "layoutb_t", buckets)

      val files = new java.io.File(loc).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == buckets,
        s"expected $buckets files, got ${files.length}: " +
          files.map(_.getName).mkString(", "))

      // every file is internally sorted on the bucket column
      for (f <- files) {
        val ks = spark.read.parquet(f.getPath).select("k")
          .as[Long].collect()
        assert(ks.sameElements(ks.sorted), s"${f.getName} not sorted on k")
      }

      // nothing lost or duplicated, and the catalog table carries the
      // bucket spec (what register()/AggChoice.bucketedOn rely on)
      assert(spark.read.parquet(loc).count() == 8000)
      val ddl = spark.sql("SHOW CREATE TABLE layoutb_t")
        .first().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains(s"$buckets BUCKETS"),
        s"bucket spec missing from catalog DDL:\n$ddl")
    } finally spark.sql("DROP TABLE IF EXISTS layoutb_t")
  }
}
