package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
