package graft.operators

import graft.sources.SchemaIntrospect
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Schema comparison between a source and target table (or whole table
  * lists) — the reference's colcompare tool.
  *
  * Reference semantics (dbqt/tools/colcompare.py):
  *  - table-list diff → common / source_only / target_only;
  *  - per-table column diff on (upper-cased) names, nested columns
  *    flattened to `parent__child` paths first (colcompare.py:161-243);
  *  - matched names checked for type compatibility via [[TypeCompat]];
  *  - excluded-column sets are honored case-insensitively.
  *
  * Pure metadata work — schemas come from parquet footers / the catalog,
  * so this costs nothing at any data scale.
  */
object ColCompare {

  private val resultSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("source_type", StringType, nullable = true),
    StructField("target_type", StringType, nullable = true),
    StructField("status", StringType, nullable = false)))

  /** Column-level diff of two schemas. Status per column:
    * MATCH | TYPE_MISMATCH | SOURCE_ONLY | TARGET_ONLY.
    */
  def compareColumns(
      spark: SparkSession,
      source: DataFrame,
      target: DataFrame,
      excludedCols: Set[String] = Set.empty,
      mappings: Map[String, Seq[String]] = TypeCompat.DefaultTypeMappings): DataFrame = {
    val excluded = excludedCols.map(_.toUpperCase)
    def cols(df: DataFrame): Seq[(String, String)] =
      SchemaIntrospect.flatten(df.schema)
        .filterNot { case (n, _) => excluded.contains(n.toUpperCase) }
    val src = cols(source)
    val tgt = cols(target)
    val srcByUpper = src.map { case (n, t) => n.toUpperCase -> (n, t) }.toMap
    val tgtByUpper = tgt.map { case (n, t) => n.toUpperCase -> (n, t) }.toMap

    val rows =
      src.map { case (n, t) =>
        tgtByUpper.get(n.toUpperCase) match {
          case Some((_, tt)) =>
            val status = if (TypeCompat.areCompatible(t, tt, mappings)) "MATCH" else "TYPE_MISMATCH"
            Row(n, t, tt, status)
          case None => Row(n, t, null, "SOURCE_ONLY")
        }
      } ++
      tgt.collect { case (n, t) if !srcByUpper.contains(n.toUpperCase) =>
        Row(n, null, t, "TARGET_ONLY")
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.sortBy(_.getString(0)), 1), resultSchema)
  }

  /** Table-list diff: which tables exist only on one side. */
  def compareTableLists(
      spark: SparkSession, source: Seq[String], target: Seq[String]): DataFrame = {
    val s = source.map(_.toUpperCase).toSet
    val t = target.map(_.toUpperCase).toSet
    val rows =
      (s & t).toSeq.sorted.map(n => Row(n, "COMMON")) ++
      (s -- t).toSeq.sorted.map(n => Row(n, "SOURCE_ONLY")) ++
      (t -- s).toSeq.sorted.map(n => Row(n, "TARGET_ONLY"))
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("status", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
