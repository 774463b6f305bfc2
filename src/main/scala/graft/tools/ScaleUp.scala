package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for benchmark falsification: replicates a
  * test-data directory `factor`× with per-replica key offsets, so row
  * counts grow linearly while every foreign-key relationship stays
  * intact (replica i's orders reference replica i's customers, etc.).
  * Dimension tables (region, nation) are copied once — exactly how a
  * real catalog scales.
  *
  * This exists to answer "does the sub-second sf0.1 fixed overhead
  * amortize at 10× the data, or does the engine scale worse than the
  * single-node baseline?" — a claim that must be measured, not
  * asserted. Usage:
  *
  * {{{ runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10 }}}
  *
  * Key offset is 2³³ per replica: far above any key in the source data,
  * far below Long overflow at any plausible factor.
  */
object ScaleUp {

  val Offset = 1L << 33

  /** Key columns to shift per replica, per table. Text/value columns
    * are left as-is: content distributions don't change with scale.
    */
  val keyCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  val dims = Seq("region", "nation")

  /** One scan, not `factor` scans: explode a replica-id array per row and
    * shift each key by `replica * Offset`. A `unionAll` of `factor`
    * branches re-reads the source per replica and hands Catalyst a plan
    * whose size grows with the factor — fine at 10×, hostile at 1000×.
    * The input is repartitioned first so the explosion parallelizes
    * (small sources arrive as one file = one partition).
    */
  def scaleTable(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    val exploded = df
      .repartition(32)
      .withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
    keys.foldLeft(exploded) { (d, k) =>
      d.withColumn(k, col(k) + col("__rep") * Offset)
    }.drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inDir> <outDir> <factor>")
    val Array(in, out, f) = args
    val factor = f.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // If events.ts is the old TIMESTAMP(NANOS) layout, read it as a
      // raw long and write it back as a raw long; a plain-micros layout
      // round-trips as timestamp[us] untouched. Either way the scaled
      // directory stays readable by Tables' schema-probing load.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dims.foreach { t =>
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      scaleTable(spark.read.parquet(s"$in/$t.parquet"), keys, factor)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"""{"scaled":"$out","factor":$factor}""")
    spark.stop()
  }
}
