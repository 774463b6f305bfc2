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
}
