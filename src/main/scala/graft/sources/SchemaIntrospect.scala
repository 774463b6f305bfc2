package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Schema metadata extraction — the information_schema / parquet-footer
  * surface of the reference's connectors.
  *
  * Reference semantics: dbqt/connections.py `fetch_table_metadata` returns
  * (column, type) rows, and dbqt/tools/colcompare.py:161-243 flattens
  * nested parquet types into `parent__child` paths: struct and
  * list<struct> recurse into their fields, maps and list<primitive> stay
  * leaves with their full type string.
  *
  * Schema introspection is metadata-only: at any scale this reads parquet
  * footers (or the catalog), never data.
  */
object SchemaIntrospect {

  /** Flatten one field type into (col_name, data_type) leaves using the
    * reference's `__` path convention (colcompare.py:161-243).
    */
  def flattenType(name: String, dt: DataType): Seq[(String, String)] = dt match {
    case st: StructType =>
      st.fields.toSeq.flatMap { f =>
        val full = if (name.isEmpty) f.name else s"${name}__${f.name}"
        f.dataType match {
          case _: StructType | _: ArrayType | _: MapType => flattenType(full, f.dataType)
          case leaf => Seq(full -> leaf.simpleString)
        }
      }
    case ArrayType(element: StructType, _) => flattenType(name, element)
    case at: ArrayType => Seq(name -> at.simpleString)
    case mt: MapType => Seq(name -> mt.simpleString)
    case leaf => Seq(name -> leaf.simpleString)
  }

  /** Flattened (col_name, data_type) pairs for a DataFrame's schema. */
  def flatten(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap(f => flattenType(f.name, f.dataType))

  /** DESCRIBE-style DataFrame: (table_name, col_name, data_type, ordinal). */
  def describe(spark: SparkSession, tableName: String, df: DataFrame): DataFrame = {
    val rows = flatten(df.schema).zipWithIndex.map { case ((c, t), i) =>
      Row(tableName, c, t, i + 1)
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("col_name", StringType, nullable = false),
      StructField("data_type", StringType, nullable = false),
      StructField("ordinal", IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Describe every table in a directory — the `fetch_schema_metadata`
    * equivalent over a whole "connection".
    */
  def describeAll(spark: SparkSession, tables: Seq[(String, DataFrame)]): DataFrame =
    tables.map { case (n, df) => describe(spark, n, df) }.reduce(_ unionAll _)
}
