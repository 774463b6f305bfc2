package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-count statistics and source/target reconciliation.
  *
  * Reference semantics: dbqt/tools/dbstats.py:53 `get_row_count_for_table`
  * (one COUNT(*) per table via a thread pool) and dbstats.py:181-214
  * (difference + percentage_difference columns).
  *
  * Spark-first: all tables are counted in ONE job — each count is a
  * partial aggregate (map-side) followed by a 1-row exchange, and the
  * union of counts schedules every table's scan concurrently across the
  * cluster. At 100 TB this reads only parquet footers' row-group
  * metadata when possible (count(*) over parquet is rewritten by
  * Catalyst to a metadata-only scan), so it is near-free.
  */
object RowCount {

  /** (table_name, row_count) for each named table — single-config mode. */
  def counts(spark: SparkSession, tables: Map[String, DataFrame]): DataFrame = {
    val parts = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.groupBy().agg(count(lit(1)).as("row_count"))
        .select(lit(name).as("table_name"), col("row_count"))
    }
    parts.reduce(_ unionAll _).orderBy("table_name")
  }

  /** Metadata-only row counts: sums parquet footer row-group counts
    * without touching data pages — the reference's parquet backend does
    * the same through pyarrow metadata (dbqt/connections.py parquet
    * `count_rows`). At 100 TB the tool reads kilobytes of footers
    * instead of the table; footers are read ON EXECUTORS (one task per
    * file via parallelize), so a million-file lake doesn't serialize
    * through the driver.
    *
    * Prefer this for the rowcount tool on parquet; [[counts]] is the
    * engine-agnostic path (count(*) over any DataFrame source).
    */
  def metaCounts(spark: SparkSession, dir: String,
                 names: Seq[String] = graft.sources.Tables.all): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    // ship the session's hadoop conf to the tasks as plain pairs — a
    // fresh Configuration() there would drop spark.hadoop.* settings
    // (object-store credentials/endpoints) and fail on exactly the
    // deployments this path exists for
    val confPairs = {
      import scala.jdk.CollectionConverters._
      hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    }
    val files: Seq[(String, String)] = names.flatMap { t =>
      val path = new org.apache.hadoop.fs.Path(graft.sources.Tables.path(dir, t))
      val fs = path.getFileSystem(hconf)
      // missing table = loud error, matching what counts() would do
      require(fs.exists(path), s"table path does not exist: $path")
      if (fs.getFileStatus(path).isDirectory) {
        // recursive: partitioned layouts nest files under col=value dirs
        val it = fs.listFiles(path, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet")) buf += ((t, s.getPath.toString))
        }
        buf
      } else Seq((t, path.toString))
    }
    val counted = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 256)))
      .map { case (t, f) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confPairs.foreach { case (k, v) => conf.set(k, v) }
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (t, reader.getRecordCount) finally reader.close()
      }
      .toDF("table_name", "file_rows")
      .groupBy("table_name").agg(sum("file_rows").as("row_count"))
    // a table dir with zero data files is a legal empty table: report 0,
    // don't silently omit the row
    names.toDF("table_name").join(counted, Seq("table_name"), "left")
      .select(col("table_name"),
        coalesce(col("row_count"), lit(0L)).as("row_count"))
      .orderBy("table_name")
  }

  /** Source/target reconciliation: difference and percentage_difference,
    * matching dbstats.py:201-214 (pct = round(100*diff/src, 2); the
    * reference renders it as a '%'-suffixed string — kept numeric here so
    * the value survives exact oracle comparison; presentation is the
    * caller's job).
    */
  def compare(spark: SparkSession, pairs: Seq[(String, DataFrame, DataFrame)]): DataFrame = {
    val parts = pairs.map { case (name, src, tgt) =>
      val s = src.groupBy().agg(count(lit(1)).as("source_row_count"))
      val t = tgt.groupBy().agg(count(lit(1)).as("target_row_count"))
      s.crossJoin(t).select(lit(name).as("pair_name"),
        col("source_row_count"), col("target_row_count"))
    }
    parts.reduce(_ unionAll _)
      .withColumn("difference", col("target_row_count") - col("source_row_count"))
      .withColumn("percentage_difference",
        round(col("difference") * 100.0 / col("source_row_count"), 2))
      .orderBy("pair_name")
  }

  /** Catalog-level reconciliation: same-name tables from two
    * "connections" (table→DataFrame maps) are counted and diffed;
    * one-sided tables get a discovery note and NO count — mirroring
    * dbstats.py's source/target mode ("Only in source, row count
    * skipped", dbstats.py:181-199) where counting skips undiscovered
    * tables. Counting both sides of every common table still runs as
    * one unioned job.
    */
  def compareCatalogs(spark: SparkSession,
                      source: Map[String, DataFrame],
                      target: Map[String, DataFrame]): DataFrame = {
    val all = (source.keySet ++ target.keySet).toSeq.sorted
    val parts = all.map { name =>
      (source.get(name), target.get(name)) match {
        case (Some(s), Some(t)) =>
          s.groupBy().agg(count(lit(1)).as("source_row_count"))
            .crossJoin(t.groupBy().agg(count(lit(1)).as("target_row_count")))
            .select(lit(name).as("table_name"),
              col("source_row_count"), col("target_row_count"),
              (col("target_row_count") - col("source_row_count")).as("difference"),
              lit("BOTH").as("status"))
        case (Some(s), None) =>
          spark.range(1).select(lit(name).as("table_name"),
            lit(null).cast("long").as("source_row_count"),
            lit(null).cast("long").as("target_row_count"),
            lit(null).cast("long").as("difference"),
            lit("ONLY_IN_SOURCE").as("status"))
        case (None, Some(t)) =>
          spark.range(1).select(lit(name).as("table_name"),
            lit(null).cast("long").as("source_row_count"),
            lit(null).cast("long").as("target_row_count"),
            lit(null).cast("long").as("difference"),
            lit("ONLY_IN_TARGET").as("status"))
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }
    parts.reduce(_ unionAll _).orderBy("table_name")
  }
}
