package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness for the dedup_clusters_minhash path (round 18,
  * verdict-r17 #4): times the two phases — clusterEdges (MinHash →
  * connectivity-equivalent edge list) and Components.components (hybrid
  * union-find / label propagation) — and prints the edge count, so the
  * SmallGraphMaxPairs threshold and the propagation's round count can
  * be tuned against a measurement instead of a guess.
  *
  * {{{ runMain graft.tools.DedupProfile /root/testdata/sf0.1 [threshold] }}}
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupProfile <sfDir> [threshold]")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.7)
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = graft.sources.Tables(spark, args.head, "documents")
    println(s"[dedupprofile] docs=${docs.count()}")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedupprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val edges = timed("clusterEdges build+materialize") {
      val e = graft.operators.dedup.Dedup.MinHashDedup
        .clusterEdges(docs, threshold).localCheckpoint(true)
      println(s"[dedupprofile] edges=${e.count()}")
      e
    }
    val comp = timed("components") {
      graft.operators.dedup.Dedup.Components.components(edges)
        .localCheckpoint(true)
    }
    println(s"[dedupprofile] components rows=${comp.count()}")
    spark.stop()
  }
}
