package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: print the formatted physical plan and the timed row
  * count for named [[graft.SparkEntry]] queries against a tables dir —
  * the `.explain("formatted")` feedback loop as a one-liner.
  *
  * {{{ runMain graft.tools.Explain /root/testdata/sf0.1 q3_topk q5_starjoin }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query ...]")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // keep the ANN report queries' lazy lineage so explain() shows the
    // real computation instead of the released-checkpoint LocalRelation
    // (the executed work is identical; see RecallReport.CpTracker)
    spark.conf.set("graft.ann.releaseCheckpoints", "false")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, args.head)
      println(s"==== $name ====")
      df.explain("formatted")
      // Catalyst sizeInBytes estimates per logical node — these drive
      // the STATIC broadcast/SHJ choices (AQE only re-decides at stage
      // boundaries), so an underpriced unbounded leg shows up here
      // before it becomes an 8 GiB broadcast failure at scale
      println(s"---- $name optimized-plan sizeInBytes estimates ----")
      def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
               d: Int): Unit = {
        println("  " * d + p.nodeName + "  sizeInBytes=" + p.stats.sizeInBytes)
        p.children.foreach(walk(_, d + 1))
      }
      walk(df.queryExecution.optimizedPlan, 0)
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // the FINAL adaptive plan — only after execution do AQE's
      // runtime decisions (skew splits, coalesced readers, join
      // demotions) appear, and `.count()` runs its OWN query
      // execution, so this one must be driven to completion itself
      // (cheap RDD count: no result rows cross to the driver)
      df.queryExecution.executedPlan.execute().count()
      println(s"---- $name final adaptive plan ----")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
