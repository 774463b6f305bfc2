package graft

import graft.sources.{Connection, CsvDirConnection, ParquetDirConnection}
import org.scalatest.funsuite.AnyFunSuite

/** Connector abstraction: same trait surface across backends. */
class ConnectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val parquetConn: Connection =
    new ParquetDirConnection(spark, TestSpark.sf0001, Seq("region", "nation"))

  test("parquet backend: list, metadata, counts, query") {
    assert(parquetConn.listTables() == Seq("region", "nation"))
    assert(parquetConn.countRows("region") == 5)
    val meta = parquetConn.tableMetadata("nation").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("n_name") == "string")
    val all = parquetConn.schemaMetadata().collect()
    assert(all.map(_.getString(0)).distinct.sorted.toSeq == Seq("nation", "region"))
    val q = parquetConn.runQuery(
      "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name")
    assert(q.collect().map(_.getLong(1)).sum == 25)
  }

  test("csv backend serves the same surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    try {
      parquetConn.table("region").coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(s"$dir/region.csv")
      val csvConn = new CsvDirConnection(spark, dir, Seq("region"))
      assert(csvConn.countRows("region") == 5)
      assert(csvConn.runQuery("SELECT count(*) AS n FROM region").collect()(0).getLong(0) == 5)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
