package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector abstraction — the reference's connection ABC
  * (reference: dbqt/connections.py: `count_rows`,
  * `fetch_table_metadata`, `fetch_schema_metadata`, `list_tables`,
  * `run_query` over 9 backends) mapped onto Spark data sources.
  *
  * A backend here is anything Spark can read: a directory of parquet
  * or CSV tables in this container; S3/HDFS paths, JDBC, or catalog
  * tables on a cluster — same trait, different `table()` body. Every
  * method returns DataFrames/plans, so "run a query against the
  * connection" composes with the whole operator library, and
  * per-table parallelism comes from the cluster rather than the
  * reference's driver-side thread pool (dbqt/tools/utils.py:39).
  */
trait Connection {
  def spark: SparkSession

  /** Table names this connection can serve (reference: list_tables). */
  def listTables(): Seq[String]

  /** Lazy plan for one table (reference: retrieve_table). */
  def table(name: String): DataFrame

  /** (column_name, data_type, nullable) — the reference's
    * fetch_table_metadata shape (information_schema equivalent).
    */
  def tableMetadata(name: String): DataFrame =
    spark.createDataFrame(
      table(name).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString, f.nullable)))
      .toDF("column_name", "data_type", "nullable")

  /** Schema metadata for every table (reference: fetch_schema_metadata). */
  def schemaMetadata(): DataFrame =
    listTables().map { t =>
      tableMetadata(t).withColumn("table_name", lit(t))
        .select("table_name", "column_name", "data_type", "nullable")
    }.reduce(_ unionAll _)

  /** reference: count_rows — one metadata-cheap aggregate. */
  def countRows(name: String): Long =
    table(name).groupBy().count().collect()(0).getLong(0)

  /** reference: run_query — registers this connection's tables as temp
    * views, then runs Spark SQL (Catalyst plans it; nothing is pushed
    * to a remote engine).
    */
  def runQuery(sql: String): DataFrame = {
    listTables().foreach(t => table(t).createOrReplaceTempView(t))
    spark.sql(sql)
  }
}

/** Directory of `<name>.parquet` tables. */
final class ParquetDirConnection(val spark: SparkSession, dir: String,
                                 names: Seq[String] = Tables.all) extends Connection {
  override def listTables(): Seq[String] = names
  override def table(name: String): DataFrame = Tables(spark, dir, name)
}

/** Directory of `<name>.csv` tables with header + schema inference. */
final class CsvDirConnection(val spark: SparkSession, dir: String,
                             names: Seq[String]) extends Connection {
  override def listTables(): Seq[String] = names
  override def table(name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/$name.csv")
}
