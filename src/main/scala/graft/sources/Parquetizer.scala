package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Identify extensionless parquet files by magic bytes and rename them —
  * the reference's parquetizer tool (dbqt/tools/parquetizer.py:6-19:
  * a file is parquet iff it starts AND ends with the 4-byte `PAR1`
  * magic; parquetizer.py's main loop renames matches to `*.parquet`).
  *
  * Uses the Hadoop FileSystem API so the same code works on local disk,
  * HDFS, or an object store at cluster scale.
  */
object Parquetizer {

  private val Magic = "PAR1".getBytes("US-ASCII")

  /** parquetizer.py:6-19 — head+tail magic-byte sniff. */
  def isParquetFile(fs: FileSystem, path: Path): Boolean = {
    val status = fs.getFileStatus(path)
    if (status.getLen < 8) return false
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      val tail = new Array[Byte](4)
      in.readFully(status.getLen - 4, tail)
      java.util.Arrays.equals(head, Magic) && java.util.Arrays.equals(tail, Magic)
    } finally in.close()
  }

  /** Rename every extensionless parquet file in `dir` to `<name>.parquet`.
    * Returns (renamed, skipped) path strings.
    */
  def renameExtensionless(spark: SparkSession, dir: String): (Seq[String], Seq[String]) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(_.isFile).map(_.getPath).toSeq
    val candidates = files.filterNot(_.getName.contains("."))
    val (parquet, notParquet) = candidates.partition(isParquetFile(fs, _))
    val renamed = parquet.map { p =>
      val dst = new Path(p.getParent, p.getName + ".parquet")
      fs.rename(p, dst)
      dst.toString
    }
    (renamed, notParquet.map(_.toString))
  }
}
