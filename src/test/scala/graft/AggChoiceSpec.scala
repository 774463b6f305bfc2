package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AggChoice

/** Layout-aware aggregation choice (VERDICT r9 #2): each input layout
  * must get its measured-best shuffle placement — repartition-first on
  * unclustered data (zero map-side combining there), the natural
  * combine plan on key-clustered data, and NO added exchange on a
  * bucketed catalog table — with identical result rows in every case.
  */
class AggChoiceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  // 4 rows per key, like lineitem-per-order
  private def synth = {
    import spark.implicits._
    (0 until 20000).map(i => (i / 4, i)).toDF("k", "v")
  }

  private def writeLayouts(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_aggc")
    val flat = base.resolve("flat").toString
    val clustered = base.resolve("clustered").toString
    // unclustered: hash order scatters each key's 4 rows apart
    synth.orderBy(xxhash64(col("v"))).coalesce(2).write.parquet(flat)
    // clustered: key-sorted within files, runs of 4
    synth.orderBy("k").coalesce(2).write.parquet(clustered)
    (flat, clustered)
  }

  test("run-length probe separates the layouts; each gets its measured-best plan") {
    val (flat, clustered) = writeLayouts()
    val f = spark.read.parquet(flat)
    val c = spark.read.parquet(clustered)
    val rlFlat = AggChoice.avgRunLength(f, "k")
    val rlClustered = AggChoice.avgRunLength(c, "k")
    assert(rlFlat < 1.5, s"flat layout probed clustered: $rlFlat")
    assert(rlClustered > 3.0, s"clustered layout probed flat: $rlClustered")

    def agg(df: DataFrame) =
      AggChoice.preAgg(df, "k").groupBy("k").agg(sum("v").as("s"))
    // unclustered → explicit repartition exchange below the aggregate
    assert(plan(agg(f)).contains("REPARTITION_BY_COL"),
      s"flat layout did not pick repartition-first:\n${plan(agg(f))}")
    // clustered → natural combine plan: the only exchange is the
    // planner's own requirement, no user repartition round-trip
    val pc = plan(agg(c))
    assert(!pc.contains("REPARTITION_BY_COL"),
      s"clustered layout wrongly repartitioned:\n$pc")
    assert(pc.contains("ENSURE_REQUIREMENTS"), s"missing combine exchange:\n$pc")
    // identical results on both layouts
    val rf = agg(f).orderBy("k").collect()
    val rc = agg(c).orderBy("k").collect()
    assert(rf.sameElements(rc))
  }

  test("bucketed catalog table: preAgg is a no-op and the aggregate needs no exchange") {
    graft.sources.PartitionedWrite.writeBucketed(
      synth, "aggc_bucketed", "k", nBuckets = 4)
    try {
      val b = spark.table("aggc_bucketed")
      assert(AggChoice.bucketedOn(b, "k"))
      assert(!AggChoice.bucketedOn(b, "v"))
      val agged = AggChoice.preAgg(b, "k").groupBy("k").agg(sum("v").as("s"))
      val p = plan(agged)
      val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))
      assert(exchanges == 0,
        s"aggregate on the bucket key still shuffles:\n$p")
      assert(agged.count() == 5000)
    } finally spark.sql("DROP TABLE IF EXISTS aggc_bucketed")
  }

  test("value-skewed input picks map-side combine even when unclustered") {
    import spark.implicits._
    // hottest key owns 5% of rows, scattered (run length ~1): the
    // zipf-sf100 q18 shape, where repartition-first built a
    // one-reducer straggler (2.8x the uniform time, ROUND10_NOTES §7)
    val n = 100000
    val skewed = (0 until n)
      .map(i => (if (i % 20 == 0) 7L else (i % 40000).toLong, i))
      .toDF("k", "v")
    val base = java.nio.file.Files.createTempDirectory("graft_aggs")
    val p = base.resolve("skewed").toString
    skewed.orderBy(xxhash64(col("v"))).coalesce(2).write.parquet(p)
    val df = spark.read.parquet(p)
    val (runLength, topShare) = AggChoice.probe(df, "k")
    assert(runLength < 1.5, s"fixture unexpectedly clustered: $runLength")
    assert(topShare > 0.04 && topShare < 0.07, s"top share off: $topShare")
    val plan = AggChoice.preAgg(df, "k").groupBy("k").count()
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("REPARTITION_BY_COL"),
      s"skewed input wrongly repartitioned (one-reducer hot key):\n$plan")
  }

  test("degenerate probes fall back to repartition-first") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Int, Int)].toDF("k", "v")
    assert(AggChoice.avgRunLength(empty, "k") == 1.0)
    // null keys: probe must not NPE, and all-equal nulls read as one run
    val nulls = (0 until 100).map(_ => (Option.empty[String], 1))
      .toDF("k", "v").repartition(1)
    assert(AggChoice.avgRunLength(nulls, "k") > 50.0)
  }
}
