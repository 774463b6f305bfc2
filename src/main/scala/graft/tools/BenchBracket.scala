package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of the two bench harness actions (verdict-r14 #3):
  * the r13 harness timed `df.count()` (a stacked Aggregate that lets
  * Catalyst prune every projection the count doesn't need); the r14
  * harness times [[Materialize.materializeCount]] (the query's own
  * optimized plan via toRdd). Cross-round comparisons between the two
  * read as phantom "regressions" — this tool measures BOTH actions on
  * the SAME session/same files so the harness effect is separated from
  * any real plan change, and prints the optimized plan under each
  * action so the pruning difference is visible, not inferred.
  *
  * Why `.count()` CAN prune even a groupBy aggregate (the verdict's
  * open question on `check_stats` / `nullcheck_approx`): under a
  * stacked count, the outer Aggregate references no columns of the
  * inner query, and Catalyst's ColumnPruning rewrites the inner
  * Aggregate to keep only its GROUPING expressions — every aggregate
  * FUNCTION (approx percentiles, stddev, HLL sketches) is deleted from
  * the measured plan, because the group count doesn't depend on them.
  * An "aggregate-only" query is therefore exactly as prunable as a
  * projection-heavy one.
  *
  * {{{ runMain graft.tools.BenchBracket /root/testdata/sf0.1 check_stats nullcheck_approx }}}
  */
object BenchBracket {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchBracket <sfDir> <query> [query ...]")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sfDir = args.head
    args.tail.foreach { name =>
      def mk() = graft.SparkEntry.queries(name)(spark, sfDir)
      def time(f: () => Unit): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      // interleaved, two passes each, min — same steady-state rule as
      // Bench; page cache is shared so neither action gets a cold disk
      val c1 = time(() => mk().count())
      val m1 = time(() => Materialize.materializeCount(mk()))
      val c2 = time(() => mk().count())
      val m2 = time(() => Materialize.materializeCount(mk()))
      println(f"[bracket] $name: count()=${math.min(c1, c2)}%.3f s  " +
        f"materializeCount=${math.min(m1, m2)}%.3f s")
      // the receipts: what each action actually executed
      println(s"[bracket] $name — optimized plan under count():")
      println(mk().groupBy().count().queryExecution.optimizedPlan.treeString.take(4000))
      println(s"[bracket] $name — optimized plan under materializeCount:")
      println(mk().queryExecution.optimizedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
