package graft.operators.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Heuristic column classification + automatic check suggestions — the
  * reference README's own "Future Plans" (reference: README.md:352-356
  * lists "AI-Powered column classification" and "Automatic check
  * suggestions" as the unimplemented roadmap; this is the
  * deterministic, oracle-able realization: name/type/value-pattern →
  * semantic class → suggested checks from the implemented framework).
  *
  * Per column, ONE aggregation pass computes total/null/distinct
  * counts, anchored-regex match counts (string columns) and rounded
  * min/max (numeric columns); a generated CASE then assigns the
  * semantic class, first match wins:
  *
  *   1. `all_null`            every value NULL
  *   2. `constant`            exactly one distinct value
  *   3. `identifier_unique`   id-named (the reference keyfinder's
  *                            prioritization rule, keyfinder.py:93-101,
  *                            extended with the `*key` convention),
  *                            no NULLs, distinct == rows
  *   4. `identifier`          id-named otherwise (FK-shaped)
  *   5. `json` / `email` / `date_string`
  *                            ≥ 90% of non-null values match the
  *                            anchored pattern (integer arithmetic, so
  *                            the oracle compares exactly)
  *   6. `categorical`         ≤ 20 distinct values (the reference
  *                            nullcheck's low-distinct idea, widened)
  *   7. `numeric` / `temporal` / `text` / `other` by type
  *
  * and maps the class to checks the [[Checks]] framework implements
  * (uniqueness, referential, format, values, range, stats,
  * completeness). [[suggestedYaml]] turns a report into the
  * reference-shaped checks YAML that [[graft.app.YamlConfig.checks]]
  * parses and [[Suite.gate]] executes — suggestion to running gate
  * with no hand-written config (SuggestChecksSpec round-trips it).
  *
  * Scale: one single-distinct aggregation PER COLUMN, unioned (see
  * [[run]] — measured 2.1× over the Expand-based multi-distinct shape
  * at sf100); the exact distinct on unique id columns is the
  * contracted cost of `identifier_unique` (keyfinder's verification
  * floor). Columns can be restricted via `columns` when profiling
  * very wide tables. Nothing collects beyond the bounded per-column
  * report (and, in [[suggestedYaml]] only, the ≤ 20 allowed values
  * per categorical column).
  */
object SuggestChecks {

  /** Anchored value patterns, written in the RE2 ∩ java.util.regex
    * common subset so Spark `rlike` and DuckDB `regexp_matches` agree.
    */
  val JsonPattern = "^\\{.*\\}$"
  val EmailPattern = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  val DatePattern = "^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T].*)?$"

  /** The reference keyfinder's id-name prioritization (keyfinder.py:
    * 93-101: `id`, `*_id`, `id_*`) + the TPC-H `*key` convention.
    */
  def idNamed(name: String): Boolean = {
    val n = name.toLowerCase
    n == "id" || n.endsWith("_id") || n.startsWith("id_") || n.endsWith("key")
  }

  val MaxCategorical = 20
  private val PctFloor = 90 // pattern classes need >= 90% of non-nulls

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  private def isTemporal(dt: DataType): Boolean = dt match {
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }

  /** Reported type name. Parquet timestamps surface as `TimestampType`
    * or `TimestampNTZType` depending on the file's isAdjustedToUTC flag
    * and session inference — a session-level READ concern, not a
    * property of the column the suggestion engine cares about (every
    * graft session pins timeZone=UTC, and DuckDB reads both layouts as
    * plain TIMESTAMP). Collapse them so the report, and the static
    * oracle literals baked from it, are layout-stable.
    */
  private def typeNameOf(dt: DataType): String = dt match {
    case _: TimestampNTZType => "timestamp"
    case other => other.simpleString
  }

  /** Per-column classification report for one table: ONE single-
    * distinct aggregation per column, unioned — the same UNION-ALL-of-
    * per-column-SELECTs shape as [[oracleSql]], and deliberately NOT
    * one multi-distinct aggregation: several `count(distinct)` in one
    * Aggregate plan through Catalyst's Expand rewrite (input
    * replicated once per distinct aggregate — 600 M events × 7 at
    * sf100, measured 271.7 s for the 4-table gate profile), while a
    * single-distinct aggregate gets the two-level no-Expand plan over
    * a one-column columnar scan, and the per-column branches of the
    * union schedule concurrently (measured 126.9 s, 2.1×; round 17 —
    * the remaining floor is the exact distinct on genuinely-unique id
    * columns, the same contracted cost as keyfinder verification, plus
    * one pass of the three anchored regexes over every string value).
    * Output columns: (table_name, column_name, data_type, total_rows,
    * null_count, distinct_count, min_value, max_value, semantic_class,
    * suggested_checks), ordered by column_name.
    */
  def run(tableName: String, df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val fields = df.schema.fields.toSeq
      .filter(f => columns.isEmpty || columns.contains(f.name))
    require(fields.nonEmpty, s"no columns to profile in $tableName")
    val rows = fields.map { f =>
      val c = col(f.name)
      val pat =
        if (f.dataType == StringType) Seq(
          sum(when(c.rlike(JsonPattern), 1L).otherwise(0L)).as("pj"),
          sum(when(c.rlike(EmailPattern), 1L).otherwise(0L)).as("pe"),
          sum(when(c.rlike(DatePattern), 1L).otherwise(0L)).as("pd"))
        else Seq(lit(null).cast("long").as("pj"), lit(null).cast("long").as("pe"),
          lit(null).cast("long").as("pd"))
      val mm =
        if (isNumeric(f.dataType)) Seq(
          round(min(c).cast("double"), 2).as("mn"),
          round(max(c).cast("double"), 2).as("mx"))
        else Seq(lit(null).cast("double").as("mn"), lit(null).cast("double").as("mx"))
      val aggs = Seq(count(lit(1)).as("total__"), count(c).as("nn"),
        countDistinct(c).as("d")) ++ pat ++ mm
      df.agg(aggs.head, aggs.tail: _*).select(
        lit(f.name).as("column_name"),
        lit(typeNameOf(f.dataType)).as("data_type"),
        lit(idNamed(f.name)).as("id_named"),
        lit(isNumeric(f.dataType)).as("is_numeric"),
        lit(isTemporal(f.dataType)).as("is_temporal"),
        lit(f.dataType == StringType).as("is_string"),
        col("nn"), col("d"), col("pj"), col("pe"), col("pd"),
        col("mn"), col("mx"), col("total__"))
    }.reduce(_ unionAll _)
    // the classification CASE — integer arithmetic only, mirrored
    // textually in oracleSql so DuckDB reproduces it bit-for-bit
    def pctHit(cnt: Column): Column =
      (col("nn") > 0) && (cnt * 100 >= col("nn") * PctFloor)
    val cls =
      when(col("nn") === 0, "all_null")
        .when(col("d") === 1, "constant")
        // Scala precedence: === binds LOOSER than &&, so each equality
        // is parenthesized
        .when(col("id_named") && (col("nn") === col("total__")) &&
          (col("d") === col("total__")), "identifier_unique")
        .when(col("id_named"), "identifier")
        .when(col("is_string") && pctHit(col("pj")), "json")
        .when(col("is_string") && pctHit(col("pe")), "email")
        .when(col("is_string") && pctHit(col("pd")), "date_string")
        .when(col("d") <= MaxCategorical, "categorical")
        .when(col("is_numeric"), "numeric")
        .when(col("is_temporal"), "temporal")
        .when(col("is_string"), "text")
        .otherwise("other")
    val checks =
      when(col("semantic_class") === "all_null", "completeness")
        .when(col("semantic_class") === "constant", "values")
        .when(col("semantic_class") === "identifier_unique", "uniqueness,completeness")
        .when(col("semantic_class") === "identifier", "referential,completeness")
        .when(col("semantic_class").isin("json", "email", "date_string"),
          "format,completeness")
        .when(col("semantic_class") === "categorical", "values,completeness")
        .when(col("semantic_class") === "numeric", "range,stats,completeness")
        .when(col("semantic_class") === "temporal", "range,completeness")
        .when(col("semantic_class") === "text", "completeness,stats")
        .otherwise("completeness")
    rows
      .select(
        lit(tableName).as("table_name"),
        col("column_name"),
        col("data_type"),
        col("total__").as("total_rows"),
        (col("total__") - col("nn")).as("null_count"),
        col("d").as("distinct_count"),
        col("mn").as("min_value"),
        col("mx").as("max_value"),
        cls.as("semantic_class"))
      .withColumn("suggested_checks", checks)
      .orderBy("column_name")
  }

  /** Multi-table report: one aggregation per table, one unioned plan —
    * all tables profile concurrently in a single job, the [[Suite]]
    * move applied to profiling.
    */
  def runAll(tables: Seq[(String, DataFrame)],
             columns: Map[String, Seq[String]] = Map.empty): DataFrame =
    tables.map { case (n, df) => run(n, df, columns.getOrElse(n, Nil)) }
      .reduce(_ unionAll _)
      .orderBy("table_name", "column_name")

  /** DuckDB oracle for [[run]]: the same per-column aggregates (one
    * SELECT per column, UNION ALL) and the same CASE, generated from
    * the column list `(name, sparkSimpleTypeString)` so literals match
    * the Spark side exactly.
    */
  def oracleSql(tableName: String, cols: Seq[(String, String)]): String = {
    val numericTypes = Set("tinyint", "smallint", "int", "bigint",
      "float", "double", "decimal")
    def numeric(t: String) = numericTypes.exists(t.startsWith)
    def temporal(t: String) = t.startsWith("timestamp") || t == "date"
    val parts = cols.map { case (name, t) =>
      val isStr = t == "string"
      val pj = if (isStr)
        s"sum(CASE WHEN regexp_matches($name, '^\\{.*\\}$$') THEN 1 ELSE 0 END)"
      else "NULL"
      val pe = if (isStr)
        s"sum(CASE WHEN regexp_matches($name, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$$') THEN 1 ELSE 0 END)"
      else "NULL"
      val pd = if (isStr)
        s"sum(CASE WHEN regexp_matches($name, '^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T].*)?$$') THEN 1 ELSE 0 END)"
      else "NULL"
      val mn = if (numeric(t)) s"round(CAST(min($name) AS DOUBLE), 2)" else "NULL"
      val mx = if (numeric(t)) s"round(CAST(max($name) AS DOUBLE), 2)" else "NULL"
      s"""SELECT '$name' AS column_name, '$t' AS data_type,
         |  ${idNamed(name)} AS id_named, ${numeric(t)} AS is_numeric,
         |  ${temporal(t)} AS is_temporal, $isStr AS is_string,
         |  count(*) AS total_rows, count($name) AS nn,
         |  count(DISTINCT $name) AS d,
         |  $pj AS pj, $pe AS pe, $pd AS pd,
         |  $mn AS mn, $mx AS mx
         |FROM $tableName""".stripMargin
    }
    s"""SELECT '$tableName' AS table_name, column_name, data_type, total_rows,
       |  total_rows - nn AS null_count, d AS distinct_count,
       |  mn AS min_value, mx AS max_value, semantic_class,
       |  CASE semantic_class
       |    WHEN 'all_null' THEN 'completeness'
       |    WHEN 'constant' THEN 'values'
       |    WHEN 'identifier_unique' THEN 'uniqueness,completeness'
       |    WHEN 'identifier' THEN 'referential,completeness'
       |    WHEN 'json' THEN 'format,completeness'
       |    WHEN 'email' THEN 'format,completeness'
       |    WHEN 'date_string' THEN 'format,completeness'
       |    WHEN 'categorical' THEN 'values,completeness'
       |    WHEN 'numeric' THEN 'range,stats,completeness'
       |    WHEN 'temporal' THEN 'range,completeness'
       |    WHEN 'text' THEN 'completeness,stats'
       |    ELSE 'completeness' END AS suggested_checks
       |FROM (
       |  SELECT *,
       |    CASE
       |      WHEN nn = 0 THEN 'all_null'
       |      WHEN d = 1 THEN 'constant'
       |      WHEN id_named AND nn = total_rows AND d = total_rows THEN 'identifier_unique'
       |      WHEN id_named THEN 'identifier'
       |      WHEN is_string AND nn > 0 AND pj * 100 >= nn * $PctFloor THEN 'json'
       |      WHEN is_string AND nn > 0 AND pe * 100 >= nn * $PctFloor THEN 'email'
       |      WHEN is_string AND nn > 0 AND pd * 100 >= nn * $PctFloor THEN 'date_string'
       |      WHEN d <= $MaxCategorical THEN 'categorical'
       |      WHEN is_numeric THEN 'numeric'
       |      WHEN is_temporal THEN 'temporal'
       |      WHEN is_string THEN 'text'
       |      ELSE 'other' END AS semantic_class
       |  FROM (${parts.mkString("\n", "\nUNION ALL\n", "\n")}) p
       |) c ORDER BY column_name""".stripMargin
  }

  /** Multi-table oracle mirroring [[runAll]]. */
  def oracleSqlAll(tables: Seq[(String, Seq[(String, String)])]): String =
    tables.map { case (t, cols) => s"SELECT * FROM (${oracleSql(t, cols)}) o_$t" }
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) u ORDER BY table_name, column_name")

  /** Generate the reference-shaped checks YAML
    * ([[graft.app.YamlConfig.checks]]'s input) from a suggestions
    * report for ONE table: uniqueness keys from `identifier_unique`
    * columns, format rules from the pattern classes, range rules from
    * the observed numeric min/max, value rules from categorical
    * columns' observed domains (one bounded follow-up query per
    * categorical column, ≤ [[MaxCategorical]] values each),
    * completeness over every profiled column. The round trip —
    * suggest → YAML → [[graft.app.YamlConfig.checks]] →
    * [[Suite.gate]] — is SuggestChecksSpec's subject: every suggested
    * rule must parse and PASS on the table it was derived from.
    */
  def suggestedYaml(tableName: String, df: DataFrame, report: DataFrame): String = {
    val rows = report.where(col("table_name") === tableName)
      .select("column_name", "semantic_class", "min_value", "max_value")
      .collect()
    val sb = new StringBuilder
    sb ++= s"table: $tableName\n"
    sb ++= "completeness_cols:\n"
    rows.foreach(r => sb ++= s"  - ${r.getString(0)}\n")
    val uniq = rows.filter(_.getString(1) == "identifier_unique")
    if (uniq.nonEmpty) {
      sb ++= "uniqueness_keys:\n"
      uniq.foreach(r => sb ++= s"  - ${r.getString(0)}\n")
    }
    val fmt = rows.filter(r => Set("json", "email", "date_string")(r.getString(1)))
    if (fmt.nonEmpty) {
      sb ++= "format_rules:\n"
      fmt.foreach { r =>
        val pat = r.getString(1) match {
          case "json" => JsonPattern
          case "email" => EmailPattern
          case _ => DatePattern
        }
        sb ++= s"  - name: ${r.getString(0)}_format\n"
        sb ++= s"    column: ${r.getString(0)}\n"
        sb ++= s"    regex: '$pat'\n"
      }
    }
    val rng = rows.filter(r => r.getString(1) == "numeric" && !r.isNullAt(2))
    if (rng.nonEmpty) {
      sb ++= "range_rules:\n"
      rng.foreach { r =>
        // the report's min/max are rounded to 2dp, which can land a
        // hair INSIDE the observed extremes — widen by the rounding
        // quantum so the generated rule passes on its own table
        sb ++= s"  - name: ${r.getString(0)}_range\n"
        sb ++= s"    column: ${r.getString(0)}\n"
        sb ++= s"    min: ${r.getDouble(2) - 0.01}\n"
        sb ++= s"    max: ${r.getDouble(3) + 0.01}\n"
      }
    }
    val cat = rows.filter(_.getString(1) == "categorical").map(_.getString(0))
    if (cat.nonEmpty) {
      sb ++= "value_rules:\n"
      cat.foreach { c =>
        // bounded by construction: the column classified categorical,
        // so its domain has <= MaxCategorical values
        val values = df.select(col(c).cast("string")).where(col(c).isNotNull)
          .distinct().limit(MaxCategorical + 1).collect().map(_.getString(0)).sorted
        sb ++= s"  - name: ${c}_values\n"
        sb ++= s"    column: $c\n"
        sb ++= s"    allowed:\n"
        values.foreach(v => sb ++= s"      - '${v.replace("'", "''")}'\n")
      }
    }
    sb.result()
  }
}
