package graft.app

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.operators.TypeCompat
import graft.operators.checks.Checks.{FormatRule, RangeRule}
import graft.operators.checks.Checks.ValueSet.ValueRule
import graft.sources.{Connection, CsvDirConnection, JdbcConnection, ParquetDirConnection, Tables}
import org.apache.spark.sql.SparkSession
import org.yaml.snakeyaml.Yaml

/** YAML config compatibility with the reference's tool configs
  * (reference: dbqt/tools/utils.py:19 `load_config`, the
  * `examples/` yaml.example connection shape, and colcompare's
  * generated config, colcompare.py:100-131). A dbqt user's existing
  * YAML files load here unchanged:
  *
  *  - connection configs: `connection: {type: …, path/database: …}`,
  *    `tables_file: tables.csv`, `excluded_tables: [TMP_%, …]`
  *  - colcompare configs: `type_mappings: {GROUP: [types…]}`,
  *    `excluded_cols: [CREATED_AT, …]`
  *  - checks configs (the reference README's planned-checks surface):
  *    per-table rule lists feeding [[graft.operators.checks.Suite]].
  *
  * Parsed with snakeyaml (on Spark's classpath) — plain maps/lists,
  * no object instantiation, same safety posture as `yaml.safe_load`.
  */
object YamlConfig {

  /** utils.py:19 load_config parity: YAML file → nested Map. */
  def load(path: String): Map[String, Any] = {
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val parsed = new Yaml().load[java.util.Map[String, Any]](text)
    if (parsed == null) Map.empty else parsed.asScala.toMap
  }

  private def strList(v: Any): Seq[String] = v match {
    case l: java.util.List[_] => l.asScala.toSeq.filter(_ != null).map(_.toString)
    case null                 => Nil
    case other                => Seq(other.toString)
  }

  private def mapList(v: Any): Seq[Map[String, Any]] = v match {
    case l: java.util.List[_] =>
      l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => k.toString -> x }.toMap
      }
    case _ => Nil
  }

  private def req(m: Map[String, Any], k: String, where: String): String =
    m.get(k).filter(_ != null).map(_.toString)
      .getOrElse(sys.error(s"$where: missing '$k'"))

  // --------------------------------------------------------------------
  // colcompare config (colcompare.py:100-131 generate_config_file shape)
  // --------------------------------------------------------------------

  final case class ColCompareConfig(
      typeMappings: Map[String, Seq[String]],
      excludedCols: Set[String])

  def colcompare(path: String): ColCompareConfig = {
    val m = load(path)
    val mappings = m.get("type_mappings") match {
      case Some(tm: java.util.Map[_, _]) =>
        tm.asScala.map { case (k, v) => k.toString -> strList(v) }.toMap
      case _ => TypeCompat.DefaultTypeMappings
    }
    ColCompareConfig(mappings,
      m.get("excluded_cols").map(strList).getOrElse(Nil).toSet)
  }

  /** colcompare.py:99-131 generate_config_file parity: write the
    * default type mappings plus commented excluded_cols/excluded_tables
    * examples, in the same YAML block style the reference emits (so a
    * generated file round-trips through [[colcompare]]).
    */
  def writeDefaultColcompare(path: String): Unit = {
    val sb = new StringBuilder
    sb ++= "# Column comparison type mappings configuration.\n"
    sb ++= "# Each key represents a type group, and the list contains equivalent types.\n"
    sb ++= "type_mappings:\n"
    TypeCompat.DefaultTypeMappings.foreach { case (group, types) =>
      sb ++= s"  $group:\n"
      types.foreach(t => sb ++= s"  - $t\n")
    }
    sb ++= "\n# Column names to exclude from comparison (case-insensitive)\n"
    sb ++= "excluded_cols:\n"
    sb ++= "  # - CREATED_AT\n  # - UPDATED_AT\n"
    sb ++= "\n# Table name patterns to exclude (SQL-like % wildcards, case-insensitive)\n"
    sb ++= "# excluded_tables:\n#   - %_FINAL\n#   - TMP_%\n"
    Files.write(Paths.get(path), sb.toString.getBytes("UTF-8"))
  }

  // --------------------------------------------------------------------
  // connection config (reference examples/ yaml.example shape)
  // --------------------------------------------------------------------

  final case class ConnectionConfig(
      connType: String,
      params: Map[String, String],
      tables: Seq[String],
      excludedTables: Seq[String])

  def connection(path: String): ConnectionConfig = {
    val m = load(path)
    val conn = m.get("connection") match {
      case Some(c: java.util.Map[_, _]) =>
        c.asScala.collect {
          case (k, v) if v != null => k.toString -> v.toString
        }.toMap
      case _ => sys.error(s"$path: missing 'connection:' section")
    }
    ConnectionConfig(
      req(conn, "type", path).toLowerCase,
      conn - "type",
      m.get("tables_file").filter(_ != null).map(_.toString)
        .map(readTablesCsv(_)).getOrElse(Nil),
      m.get("excluded_tables").map(strList).getOrElse(Nil))
  }

  /** utils.py:25 read_csv_list parity: first column per row, header row
    * skipped when it matches the expected column name.
    */
  def readTablesCsv(path: String, columnName: String = "table_name"): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq
      // split of a commas-only line yields an EMPTY array (Java drops
      // trailing empties) — headOption, not (0), so such lines skip
      // like blank ones
      .map(_.split(",").headOption.getOrElse("").trim).zipWithIndex
      .filter(_._1.nonEmpty)
      .filterNot { case (v, i) => i == 0 && v.equalsIgnoreCase(columnName) }
      .map(_._1)

  /** Dual-database tables file (reference README.md:214 — "CSV with
    * source_table and target_table columns"): (source, target) name
    * pairs, header skipped when present. Rows with one column map the
    * table to the same name on both sides.
    *
    * STRICT: a row with more than two columns, or with an empty cell
    * in a two-column row (`a,,b`, `,b`), fails loudly with its line
    * number — silently pairing the wrong tables would make every
    * downstream count comparison answer a different question.
    */
  def readTablePairsCsv(path: String): Seq[(String, String)] = {
    // drop blanks FIRST, so a header after a leading blank line is
    // still recognized as the first row; keep 1-based line numbers
    // from the raw file for error messages
    val rows = Files.readAllLines(Paths.get(path)).asScala.toSeq
      .zipWithIndex
      .filter(_._1.trim.nonEmpty)
    val data = rows match {
      case (line, _) +: rest if line.split(",").headOption
        .exists(_.trim.equalsIgnoreCase("source_table")) => rest
      case all => all
    }
    data
      .map { case (line, i) =>
        // -1: keep trailing empty cells so `a,` is caught, not dropped
        val cols = line.split(",", -1).map(_.trim).toSeq
        cols match {
          case Seq(s) if s.nonEmpty      => (s, s)
          case Seq(s, t) if s.nonEmpty && t.nonEmpty => (s, t)
          case _ => sys.error(s"$path:${i + 1}: malformed table-pairs row " +
            s"'$line' (expected 'source_table' or 'source_table,target_table')")
        }
      }
  }

  /** connection.type → backend (reference create_connector fans over 9
    * engines, connections.py; here a parquet/csv dir covers the file
    * backends and one JDBC backend covers every SQL engine — the
    * engine-specific part of a dbqt config becomes the JDBC url).
    */
  def open(spark: SparkSession, cfg: ConnectionConfig): Connection = {
    // duckdb/sqlite configs say `database:` (or `path:`) for the file
    def pathParam = cfg.params.get("path").orElse(cfg.params.get("database"))
      .getOrElse(sys.error(s"connection.type '${cfg.connType}' needs 'path' (or 'database')"))
    cfg.connType match {
      case "parquet" => new ParquetDirConnection(spark, pathParam,
        if (cfg.tables.nonEmpty) cfg.tables else Tables.all)
      case "csv" => new CsvDirConnection(spark, pathParam, cfg.tables)
      case "s3" | "s3parquet" =>
        // reference S3Parquet (connections.py:310-388, bucket + key
        // config) — here the store is read IN PLACE over the s3a://
        // Hadoop connector; executors pull ranges, nothing is
        // downloaded to a driver disk. `path: s3a://bucket/prefix`
        // directly, or the reference's own bucket/key pair.
        val uri = cfg.params.get("path").orElse(
          cfg.params.get("bucket").map { b =>
            val key = cfg.params.getOrElse("key", "")
            s"s3a://$b/$key".stripSuffix("/")
          }).getOrElse(sys.error(
            s"connection.type '${cfg.connType}' needs 'path: s3a://bucket/prefix' (or bucket/key)"))
        new ParquetDirConnection(spark, uri, cfg.tables)
      case _ =>
        val url = cfg.params.getOrElse("url", sys.error(
          s"connection.type '${cfg.connType}' maps to the JDBC backend here — add a 'url:' (jdbc:…)"))
        // `database:` (WITH a schema also present) is a catalog name —
        // Snowflake/Athena-style `db.schema.table` qualification
        // (reference build_qualified_table_name, connections.py:32-35);
        // without a schema it is the file-database path (duckdb/sqlite)
        // and plays no role in qualification.
        val catalog = if (cfg.params.contains("schema")) cfg.params.get("database") else None
        new JdbcConnection(spark, url, cfg.params.get("schema"),
          cfg.params -- Seq("url", "schema", "database"),
          database = catalog)
    }
  }

  /** Table list for a connection config: tables_file if given, else
    * backend discovery; `%`-wildcard exclusions applied either way
    * (README.md:242-250).
    */
  def tablesFor(conn: Connection, cfg: ConnectionConfig): Seq[String] =
    Tables.filterExcluded(
      if (cfg.tables.nonEmpty) cfg.tables else conn.listTables(),
      cfg.excludedTables)

  // --------------------------------------------------------------------
  // checks config (reference README "Planned Checks" surface, one table
  // per file, feeding Suite.gate)
  // --------------------------------------------------------------------

  final case class FkSpec(name: String, fkCol: String, parentTable: String, refCol: String)

  final case class ChecksConfig(
      table: String,
      completenessCols: Seq[String],
      uniquenessKeys: Seq[Seq[String]],
      formatRules: Seq[FormatRule],
      rangeRules: Seq[RangeRule],
      valueRules: Seq[ValueRule],
      fkRules: Seq[FkSpec])

  def checks(path: String): ChecksConfig = {
    val m = load(path)
    ChecksConfig(
      table = req(m, "table", path),
      completenessCols = m.get("completeness_cols").map(strList).getOrElse(Nil),
      uniquenessKeys = m.get("uniqueness_keys") match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(strList)
        case _                          => Nil
      },
      formatRules = mapList(m.getOrElse("format_rules", null)).map(r =>
        FormatRule(req(r, "column", path), req(r, "name", path), req(r, "regex", path))),
      rangeRules = mapList(m.getOrElse("range_rules", null)).map(r =>
        RangeRule(req(r, "column", path), req(r, "name", path),
          req(r, "min", path).toDouble, req(r, "max", path).toDouble)),
      valueRules = mapList(m.getOrElse("value_rules", null)).map(r =>
        ValueRule(req(r, "column", path), req(r, "name", path),
          strList(r.getOrElse("allowed", null)))),
      fkRules = mapList(m.getOrElse("fk_rules", null)).map(r =>
        FkSpec(req(r, "name", path), req(r, "fk", path),
          req(r, "parent", path), req(r, "ref", path))))
  }
}
