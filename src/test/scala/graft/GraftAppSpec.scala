package graft

import graft.app.GraftApp
import org.scalatest.funsuite.AnyFunSuite

/** CLI dispatch: each tool runs end-to-end and --out writes parquet. */
class GraftAppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runToParquet(args: String*): Long = {
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, args.toSeq ++ Seq("--out", out))
    spark.read.parquet(out).count()
  }

  test("rowcount over the catalog with exclusion") {
    val n = runToParquet("rowcount", "--dir", TestSpark.sf0001,
      "--exclude", "e%,p%")
    // region nation customer supplier orders lineitem documents = 7
    // (events, part, parquetizer-less tables excluded by pattern)
    assert(n == 7)
  }

  test("nullcheck, keyfinder, colcompare, completeness run end-to-end") {
    assert(runToParquet("nullcheck", "--dir", TestSpark.sf0001,
      "--table", "customer") > 0)
    assert(runToParquet("keyfinder", "--dir", TestSpark.sf0001,
      "--table", "orders", "--candidates", "o_orderkey,o_custkey") > 0)
    assert(runToParquet("colcompare", "--dir", TestSpark.sf0001,
      "--source", "customer", "--target", "customer") > 0)
    assert(runToParquet("completeness", "--dir", TestSpark.sf0001,
      "--table", "documents") > 0)
  }

  test("sessionize and dedup tools run end-to-end") {
    assert(runToParquet("sessionize", "--dir", TestSpark.sf0001,
      "--gap-minutes", "240") > 0)
    // word-salad docs at 0.6 produce at least some near-dup groups
    assert(runToParquet("dedup", "--dir", TestSpark.sf0001,
      "--table", "documents", "--threshold", "0.6") > 0)
  }

  test("unknown tool and missing flags fail loudly") {
    intercept[RuntimeException](GraftApp.run(spark, Seq("nosuch")))
    intercept[RuntimeException](GraftApp.run(spark, Seq("nullcheck")))
  }

  test("misaligned flag pairs are rejected, not silently shifted") {
    // valueless flag shifts everything: must error, not run with defaults
    intercept[RuntimeException](GraftApp.run(spark,
      Seq("keyfinder", "--dir", TestSpark.sf0001, "--table", "orders",
        "--force", "--max-size", "2")))
    intercept[RuntimeException](GraftApp.run(spark,
      Seq("rowcount", "stray", "--dir", TestSpark.sf0001)))
  }
}
