package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-layout writer: the storage-side half of the 100 TB design.
  *
  * Writing a corpus hive-partitioned by a low-cardinality column (e.g.
  * `lang`, date) means any query filtering on that column prunes whole
  * directories BEFORE split planning — the scan never opens the files.
  * `sortWithinPartitions` additionally clusters rows so min/max
  * row-group statistics prune within files for range predicates on the
  * sort column.
  *
  * The repartition by the partition column keeps one writer task per
  * partition value (avoids the many-small-files problem of every task
  * writing every partition); for heavily skewed partition values, salt
  * the repartition with [[graft.operators.Salting]]'s pattern.
  */
object PartitionedWrite {

  def write(df: DataFrame, path: String, partitionCol: String,
            sortCols: Seq[String] = Nil): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(col): _*)
      .write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)

  /** Bucketed catalog table: rows are hash-clustered into `nBuckets`
    * files by `bucketCol` AND sorted within each bucket. Two tables
    * bucketed the same way join WITHOUT a shuffle (Catalyst sees the
    * matching output partitioning) — the co-located-join half of the
    * 100 TB design: pay one shuffle at write time, never again for the
    * fact-to-fact joins that dominate at scale. Requires the session
    * catalog (`saveAsTable`) because bucket metadata lives there.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorts = (bucketCol +: sortCols).distinct
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Size-balanced shard write: choose the output file count from the
    * data's MEASURED bytes-per-row so every shard lands near
    * `targetBytes` — the control for both failure modes of naive
    * writes at 100 TB: thousands of kilobyte files (metadata pressure,
    * split overhead) when upstream partitioning was fine-grained, and
    * multi-GB straggler files (one slow task, no read parallelism)
    * when it wasn't.
    *
    * Row size comes from a bounded sample — hash-selected on
    * `sampleCol`, which must be a (near-)UNIQUE column like the
    * table's id: a low-cardinality column makes value-hash selection
    * all-or-nothing per value, so a degenerate outcome (empty sample,
    * or a whole value class far over the target) falls back to a
    * `limit` sample rather than shipping a garbage size. The sample is
    * coalesced to ONE scratch file before measuring — scattered across
    * thousands of inherited partitions, per-file footer overhead and
    * lost compression would inflate the measurement severalfold — and
    * measured as actual encoded parquet bytes, compression included
    * (in-memory row widths miss 3-10× of columnar compression).
    * `repartition(n)` round-robins rows, so shards come out uniform.
    *
    * Cost note: one count pass + one sample pass + the write itself.
    * For a write-once sharding job two extra scans are the price of a
    * true measurement; callers that know their bytes-per-row can
    * `repartition(n)` directly.
    */
  def writeBalanced(df: DataFrame, path: String, sampleCol: String,
                    targetBytes: Long = 256L * 1024 * 1024,
                    sampleRows: Long = 10000L): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    // the 10× safety-margin limit below does Int arithmetic; beyond
    // Int.MaxValue/10 it would overflow negative and fail the job —
    // and a >200M-row SAMPLE is a config error anyway
    require(sampleRows > 0 && sampleRows <= Int.MaxValue / 10,
      s"sampleRows must be in [1, ${Int.MaxValue / 10}], got $sampleRows")
    val spark = df.sparkSession
    val total = df.count()
    if (total == 0) { df.write.mode("overwrite").parquet(path); return }
    val hadoop = new org.apache.hadoop.fs.Path(path)
    val fs = hadoop.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // unique scratch name: a fixed sibling would clobber user data at
    // that path and race concurrent calls sharing it
    val scratch = new org.apache.hadoop.fs.Path(
      path + "_sizing_" + java.util.UUID.randomUUID().toString)
    try {
      val mod = math.max(1L, total / sampleRows)
      val hashSample = df.where(pmod(xxhash64(col(sampleCol)), lit(mod)) === 0)
        .limit(10 * sampleRows.toInt)
      hashSample.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      var sampled = spark.read.parquet(scratch.toString).count()
      if (sampled == 0) {
        // degenerate sampleCol (low cardinality): measure a plain
        // bounded prefix instead — sizing needs representative bytes,
        // not a value-deterministic selection
        df.limit(sampleRows.toInt).coalesce(1)
          .write.mode("overwrite").parquet(scratch.toString)
        sampled = spark.read.parquet(scratch.toString).count()
      }
      val bytes = fs.getContentSummary(scratch).getLength
      val bytesPerRow =
        if (sampled == 0) 64.0 else bytes.toDouble / sampled
      val nFiles = math.max(1L,
        math.round(total * bytesPerRow / targetBytes)).toInt
      df.repartition(nFiles).write.mode("overwrite").parquet(path)
    } finally fs.delete(scratch, true)
  }

  /** Interleave the low 32 bits of two non-negative ints into a
    * 64-bit Morton (Z-order) value — pure bit arithmetic, codegen'd.
    */
  private[sources] def morton(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      // classic bit-spread: insert one zero bit between each of the
      // low 32 bits
      var x = c.cast("long")
      x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
      (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order clustering write: rows are range-partitioned and sorted
    * by the Morton interleave of two columns' normalized positions, so
    * parquet row-group min/max statistics stay NARROW on BOTH columns
    * — a filter on either dimension (or both) skips most files. Plain
    * sorting gives this for the first sort column only; Z-ordering is
    * the standard lakehouse answer when queries filter on two.
    *
    * Normalization is min/max linear scaling into 16-bit grid cells
    * (one tiny agg job to fetch the bounds); monotone per dimension,
    * which is all Morton ordering needs.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int): Unit = {
    require(!df.columns.contains("__z"),
      "writeZOrdered reserves the column name __z")
    val Cells = 65535 // 16-bit grid per dimension
    // NaN-safe bounds (max() would order NaN above every double and
    // poison the scale factor); persist around the two actions so the
    // bounds agg doesn't recompute an expensive upstream twice
    def safe(c: String) = {
      val d = col(c).cast("double")
      when(isnan(d), lit(null).cast("double")).otherwise(d)
    }
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val b = cached.agg(
        min(safe(colA)), max(safe(colA)), min(safe(colB)), max(safe(colB)))
        .collect()(0)
      // empty input or an all-NULL/NaN column: no clustering possible —
      // write the data unclustered rather than crash the pipeline
      if ((0 to 3).exists(b.isNullAt)) {
        cached.write.mode("overwrite").parquet(path)
        return
      }
      def cell(c: String, lo: Double, hi: Double): Column =
        if (hi == lo) lit(0L)
        else coalesce( // NULL/NaN values land in cell 0, clustered together
          round((safe(c) - lo) / (hi - lo) * Cells, 0).cast("long"), lit(0L))
      val z = morton(
        cell(colA, b.getDouble(0), b.getDouble(1)),
        cell(colB, b.getDouble(2), b.getDouble(3)))
      cached.withColumn("__z", z)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    } finally cached.unpersist(blocking = false)
  }
}
