package graft

import graft.app.YamlConfig
import graft.operators.{ColCompare, TypeCompat}
import org.scalatest.funsuite.AnyFunSuite

/** Reference-shaped YAML configs load unchanged: colcompare's generated
  * config (type_mappings + excluded_cols), the connection configs from
  * the reference's examples dir, and the checks config.
  */
class YamlConfigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpFile(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempDirectory("yaml_cfg").resolve(name)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("colcompare config: custom type_mappings override compatibility") {
    // the exact shape colcompare.py:100-131 generates
    val path = tmpFile("cc.yaml",
      """# Column comparison type mappings configuration.
        |type_mappings:
        |  INTEGER:
        |  - INT
        |  - BIGINT
        |  WIDE_NUM:
        |  - DOUBLE
        |  - STRING
        |excluded_cols:
        |  - C_MKTSEGMENT
        |""".stripMargin)
    val cfg = YamlConfig.colcompare(path)
    assert(cfg.excludedCols == Set("C_MKTSEGMENT"))
    // custom group makes double~string compatible (default does not)
    assert(TypeCompat.areCompatible("double", "string", cfg.typeMappings))
    assert(!TypeCompat.areCompatible("double", "string"))

    // wired through ColCompare: retyped c_acctbal now MATCHes and the
    // excluded (dropped) column doesn't surface as SOURCE_ONLY
    val src = sources.Tables(spark, TestSpark.sf0001, "customer")
    val tgt = src.withColumn("c_acctbal",
      org.apache.spark.sql.functions.col("c_acctbal").cast("string"))
      .drop("c_mktsegment")
    val diff = ColCompare.compareColumns(spark, src, tgt,
      excludedCols = cfg.excludedCols, mappings = cfg.typeMappings)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(diff("c_acctbal") == "MATCH")
    assert(!diff.contains("c_mktsegment"))
  }

  test("colcompare config without type_mappings keeps the defaults") {
    val cfg = YamlConfig.colcompare(tmpFile("cc2.yaml", "excluded_cols:\n  - X\n"))
    assert(cfg.typeMappings == TypeCompat.DefaultTypeMappings)
  }

  test("connection config: tables_file + excluded_tables, parquet backend") {
    val tablesCsv = tmpFile("tables.csv", "table_name\nregion\nnation\nTMP_x\n")
    val path = tmpFile("conn.yaml",
      s"""connection:
         |  type: parquet
         |  path: ${TestSpark.sf0001}
         |tables_file: $tablesCsv
         |excluded_tables:
         |  - "TMP_%"
         |max_workers: 10
         |""".stripMargin)
    val cfg = YamlConfig.connection(path)
    assert(cfg.connType == "parquet")
    val conn = YamlConfig.open(spark, cfg)
    assert(YamlConfig.tablesFor(conn, cfg) == Seq("region", "nation"))
    assert(conn.countRows("region") == 5)
  }

  test("connection config: duckdb-style 'database:' param maps to JDBC needs url") {
    val path = tmpFile("duck.yaml",
      """connection:
        |  type: DuckDB
        |  database: /tmp/nope.duckdb
        |""".stripMargin)
    val cfg = YamlConfig.connection(path)
    assert(cfg.connType == "duckdb")
    // no duckdb JDBC driver in this engine: the error must say what to add
    val e = intercept[RuntimeException](YamlConfig.open(spark, cfg))
    assert(e.getMessage.contains("url"))
  }

  test("read_csv_list parity: header skipped only when it matches") {
    val withHeader = tmpFile("a.csv", "table_name\nfoo\nbar\n")
    assert(YamlConfig.readTablesCsv(withHeader) == Seq("foo", "bar"))
    val noHeader = tmpFile("b.csv", "foo\nbar\n")
    assert(YamlConfig.readTablesCsv(noHeader) == Seq("foo", "bar"))
    val extraCols = tmpFile("c.csv", "table_name,other\nfoo,1\n")
    assert(YamlConfig.readTablesCsv(extraCols) == Seq("foo"))
  }

  test("table-pairs CSV: strict parse — pairs, same-name rows, loud malformed rows") {
    val ok = tmpFile("pairs_ok.csv",
      "source_table,target_table\nsrc_a,tgt_a\nsame\n")
    assert(YamlConfig.readTablePairsCsv(ok) ==
      Seq(("src_a", "tgt_a"), ("same", "same")))
    // three columns: silently pairing cols(0),cols(1) would compare the
    // wrong tables — must fail with the line number
    val tooMany = tmpFile("pairs_bad.csv", "a,b,c\n")
    val e1 = intercept[RuntimeException](YamlConfig.readTablePairsCsv(tooMany))
    assert(e1.getMessage.contains(":1") && e1.getMessage.contains("malformed"))
    // empty cell hidden by a trailing comma — previously collapsed to a
    // same-name row
    val trailing = tmpFile("pairs_trail.csv", "src_a,\n")
    assert(intercept[RuntimeException](
      YamlConfig.readTablePairsCsv(trailing)).getMessage.contains("malformed"))
    val emptyCell = tmpFile("pairs_empty.csv", "a,,b\n")
    assert(intercept[RuntimeException](
      YamlConfig.readTablePairsCsv(emptyCell)).getMessage.contains("malformed"))
    // header after a LEADING BLANK LINE is still a header, not data
    val blankFirst = tmpFile("pairs_blank.csv",
      "\nsource_table,target_table\nx,y\n")
    assert(YamlConfig.readTablePairsCsv(blankFirst) == Seq(("x", "y")))
  }

  test("generated default config round-trips to the default mappings") {
    val path = java.nio.file.Files.createTempDirectory("yaml_gen")
      .resolve("colcompare_config.yaml").toString
    YamlConfig.writeDefaultColcompare(path)
    val cfg = YamlConfig.colcompare(path)
    assert(cfg.typeMappings == TypeCompat.DefaultTypeMappings)
    assert(cfg.excludedCols.isEmpty) // examples stay commented out
  }

  test("checks config parses every rule family") {
    val cfg = YamlConfig.checks(tmpFile("checks.yaml",
      """table: lineitem
        |completeness_cols: [l_quantity, l_tax]
        |uniqueness_keys:
        |  - [l_orderkey, l_linenumber]
        |  - [l_orderkey]
        |format_rules:
        |  - {name: f1, column: c1, regex: "^[a-z,:]+$"}
        |range_rules:
        |  - {name: r1, column: c2, min: 0, max: 1.5}
        |value_rules:
        |  - {name: v1, column: c3, allowed: [A, N]}
        |fk_rules:
        |  - {name: fk1, fk: l_orderkey, parent: orders, ref: o_orderkey}
        |""".stripMargin))
    assert(cfg.table == "lineitem")
    assert(cfg.completenessCols == Seq("l_quantity", "l_tax"))
    assert(cfg.uniquenessKeys == Seq(Seq("l_orderkey", "l_linenumber"), Seq("l_orderkey")))
    assert(cfg.formatRules.head.regex == "^[a-z,:]+$")
    assert(cfg.rangeRules.head.min == 0.0 && cfg.rangeRules.head.max == 1.5)
    assert(cfg.valueRules.head.allowed == Seq("A", "N"))
    assert(cfg.fkRules.head.parentTable == "orders")
  }
}
