package graft

import graft.operators.{NullCheck, RowCount}
import graft.sources.{Connection, CsvDirConnection, JdbcConnection, ParquetDirConnection}
import org.scalatest.funsuite.AnyFunSuite

/** Connector abstraction: same trait surface across backends. */
class ConnectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val parquetConn: Connection =
    new ParquetDirConnection(spark, TestSpark.sf0001, Seq("region", "nation"))

  test("parquet backend: list, metadata, counts, query") {
    assert(parquetConn.listTables() == Seq("region", "nation"))
    assert(parquetConn.countRows("region") == 5)
    // filtered count (reference count_rows where_clause): the predicate
    // plans through Catalyst and prunes at the scan
    assert(parquetConn.countRows("region", "r_regionkey >= 2") == 3)
    assert(parquetConn.countRows("nation", "n_regionkey = 0") == 5)
    // catalog form: one plan, the shared predicate filters every scan
    assert(parquetConn.rowCounts(Seq("region"), Some("r_regionkey >= 2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("region" -> 3L))
    val meta = parquetConn.tableMetadata("nation").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("n_name") == "string")
    val all = parquetConn.schemaMetadata().collect()
    assert(all.map(_.getString(0)).distinct.sorted.toSeq == Seq("nation", "region"))
    val q = parquetConn.runQuery(
      "SELECT r_name, count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name")
    assert(q.collect().map(_.getLong(1)).sum == 25)
  }

  test("file backends discover tables by listing when no names are given") {
    val discovered = new ParquetDirConnection(spark, TestSpark.sf0001).listTables()
    assert(discovered == graft.sources.Tables.all.sorted)
    val dir = java.nio.file.Files.createTempDirectory("graft_disc").toString
    try {
      parquetConn.table("region").coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(s"$dir/region.csv")
      assert(new CsvDirConnection(spark, dir).listTables() == Seq("region"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("csv backend serves the same surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    try {
      parquetConn.table("region").coalesce(1)
        .write.option("header", "true").mode("overwrite").csv(s"$dir/region.csv")
      val csvConn = new CsvDirConnection(spark, dir, Seq("region"))
      assert(csvConn.countRows("region") == 5)
      assert(csvConn.runQuery("SELECT count(*) AS n FROM region").collect()(0).getLong(0) == 5)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  // Embedded Derby (ships with Spark) as the live-database fixture —
  // the same role the reference's DuckDB/SQLite backends play in its
  // tests. Derby uppercases unquoted identifiers.
  private lazy val jdbcUrl = "jdbc:derby:memory:graftdb;create=true"
  private lazy val jdbcConn: Connection = {
    val c = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE region (r_regionkey INT NOT NULL, r_name VARCHAR(32))")
      st.execute(
        "CREATE TABLE nation (n_nationkey INT NOT NULL, n_name VARCHAR(32), n_regionkey INT)")
      (0 until 5).foreach(i => st.execute(s"INSERT INTO region VALUES ($i, 'R$i')"))
      (0 until 25).foreach(i => st.execute(s"INSERT INTO nation VALUES ($i, 'N$i', ${i % 5})"))
      st.execute("INSERT INTO nation VALUES (25, NULL, 0)")
      st.close()
    } finally c.close()
    new JdbcConnection(spark, jdbcUrl)
  }

  test("jdbc backend (embedded Derby): list, metadata, counts, pushed query") {
    assert(jdbcConn.listTables() == Seq("NATION", "REGION"))
    assert(jdbcConn.countRows("NATION") == 26)
    assert(jdbcConn.countRows("REGION") == 5)
    // filtered count pushed WHERE-and-all into the database (Derby
    // dialect), only the scalar returns. The fixture's extra row
    // (25, NULL, 0) sits in region 0 — 5 TPC-H nations + it = 6.
    assert(jdbcConn.countRows("NATION", "N_REGIONKEY = 0") == 6)
    assert(jdbcConn.countRows("NATION", "N_NAME IS NULL") == 1)
    // catalog form rides the bounded pool with the WHERE pushed into
    // every remote COUNT (the CLI's connection-backed --where path)
    assert(jdbcConn.rowCounts(Seq("NATION", "REGION"), Some("1 = 1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("NATION" -> 26L, "REGION" -> 5L))
    val meta = jdbcConn.tableMetadata("NATION").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("N_NAME") == "string")
    assert(meta("N_NATIONKEY") == "int")
    // runQuery executes IN the database (Derby dialect), only results stream out
    val q = jdbcConn.runQuery(
      "SELECT r_name, COUNT(*) AS n FROM region JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name")
    assert(q.collect().map(_.getAs[Number]("N").longValue()).sum == 26)
  }

  test("jdbc backend: range-partitioned scan splits into disjoint slices") {
    val jc = jdbcConn.asInstanceOf[JdbcConnection]
    val parts = jc.tablePartitioned("NATION", "N_NATIONKEY", 0, 26, 4)
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.count() == 26)
    assert(parts.select("N_NATIONKEY").distinct().count() == 26)
  }

  test("jdbc rowCounts pushes one COUNT(*) per table, no table pull") {
    val rc = jdbcConn.rowCounts(Seq("NATION", "REGION")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rc == Map("NATION" -> 26L, "REGION" -> 5L))
  }

  test("three-part qualified names: db.schema.table, dotted passthrough") {
    // reference build_qualified_table_name: dot-join skipping absent
    // parts — the Athena/Snowflake catalog addressing shape
    val full = new JdbcConnection(spark, jdbcUrl,
      schema = Some("SC"), database = Some("DB"))
    assert(full.qualify("T") == "DB.SC.T")
    assert(full.qualify("x.y") == "x.y") // already qualified: untouched
    val schemaOnly = new JdbcConnection(spark, jdbcUrl, schema = Some("SC"))
    assert(schemaOnly.qualify("T") == "SC.T")
    val bare = new JdbcConnection(spark, jdbcUrl)
    assert(bare.qualify("T") == "T")
  }

  test("yaml JDBC config: database+schema become catalog qualification") {
    val cfg = graft.app.YamlConfig.ConnectionConfig("snowflake",
      Map("url" -> jdbcUrl, "schema" -> "SC", "database" -> "DB"), Nil, Nil)
    val conn = graft.app.YamlConfig.open(spark, cfg).asInstanceOf[JdbcConnection]
    assert(conn.qualify("T") == "DB.SC.T")
    // duckdb-style: `database:` is a file path when no schema is given —
    // it must NOT leak into name qualification
    val duck = graft.app.YamlConfig.ConnectionConfig("duckdb",
      Map("url" -> jdbcUrl, "database" -> "/data/file.db"), Nil, Nil)
    val dconn = graft.app.YamlConfig.open(spark, duck).asInstanceOf[JdbcConnection]
    assert(dconn.qualify("T") == "T")
  }

  test("yaml s3 config maps to an in-place object-store parquet connection") {
    val cfg = graft.app.YamlConfig.ConnectionConfig("s3",
      Map("bucket" -> "my-bucket", "key" -> "lake/tables"), Nil, Nil)
    // opening builds the s3a:// URI eagerly; listing would need a real
    // store, so assert the connection type and that a local-URI config
    // serves tables end-to-end through the same branch
    assert(graft.app.YamlConfig.open(spark, cfg)
      .isInstanceOf[ParquetDirConnection])
    val local = graft.app.YamlConfig.ConnectionConfig("s3parquet",
      Map("path" -> TestSpark.sf0001), Seq("region"), Nil)
    val conn = graft.app.YamlConfig.open(spark, local)
    assert(conn.countRows("region") == 5)
  }

  test("jdbc listTables is cached: backend consulted once per connection") {
    val first = jdbcConn.listTables()
    assert(jdbcConn.listTables() eq first) // same cached instance
  }

  test("createTableFromQuery: replace semantics on parquet and jdbc backends") {
    // parquet dir: CTAS lands as a discoverable table, re-running replaces
    val dir = java.nio.file.Files.createTempDirectory("graft_ctas").toString
    try {
      parquetConn.table("region").write.parquet(s"$dir/region.parquet")
      val conn = new ParquetDirConnection(spark, dir)
      conn.createTableFromQuery("big_regions",
        "SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 2")
      assert(conn.listTables().contains("big_regions"))
      assert(conn.countRows("big_regions") == 3)
      conn.createTableFromQuery("big_regions",
        "SELECT r_regionkey FROM region WHERE r_regionkey >= 4")
      assert(conn.countRows("big_regions") == 1) // replaced, not appended
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    // jdbc: query pushed to the db, result written back as a new table
    val before = jdbcConn.listTables() // populate the catalog cache first
    jdbcConn.createTableFromQuery("REGION_COUNTS",
      "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey")
    val back = jdbcConn.table("REGION_COUNTS").collect()
      .map(r => r.getAs[Number](0).intValue -> r.getAs[Number](1).longValue).toMap
    assert(back.values.sum == 26 && back.size == 5)
    // CTAS invalidates the cached listing: the new table is visible
    // to catalog fan-out on the SAME connection
    assert(!before.contains("REGION_COUNTS"))
    assert(jdbcConn.listTables().contains("REGION_COUNTS"))
  }

  test("jdbc identifier quoting: lowercase CTAS name roundtrips on a fold-to-upper engine") {
    // Spark's JDBC writer QUOTES identifiers on CREATE (case
    // preserved), so this table is stored as lowercase 'region_counts2'
    // on Derby — unquoted SQL would fold to REGION_COUNTS2 and miss
    // (the exact migration papercut per-dialect qualify() closes)
    jdbcConn.createTableFromQuery("region_counts2",
      "SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey")
    assert(jdbcConn.countRows("region_counts2") == 5)
    assert(jdbcConn.countRows("region_counts2", "n > 0") == 5)
    assert(jdbcConn.table("region_counts2").count() == 5)
    assert(jdbcConn.listTables().contains("region_counts2"))
    assert(jdbcConn.tableMetadata("region_counts2").count() == 2)
    // native-case names still go out unquoted — byte-identical SQL to
    // the pre-quoting connector against unquoted-created tables
    assert(jdbcConn.countRows("NATION") == 26)
  }

  test("quotePart: the engines' identifier rules, by their reported parameters") {
    import graft.sources.JdbcConnection.quotePart
    // Derby / PostgreSQL-with-uppercase-storage shape: " quote, fold-to-upper
    assert(quotePart("NATION", "\"", true, false) == "NATION")
    assert(quotePart("nation", "\"", true, false) == "\"nation\"")
    assert(quotePart("Mixed_Case", "\"", true, false) == "\"Mixed_Case\"")
    // PostgreSQL shape: " quote, fold-to-lower — lowercase passes bare
    assert(quotePart("nation", "\"", false, true) == "nation")
    assert(quotePart("NATION", "\"", false, true) == "\"NATION\"")
    // MySQL shape: backtick quote, mixed-case storage (no folding)
    assert(quotePart("Nation", "`", false, false) == "Nation")
    assert(quotePart("order-items", "`", false, false) == "`order-items`")
    // non-plain identifiers always quote, embedded quotes doubled
    assert(quotePart("odd name", "\"", true, false) == "\"odd name\"")
    assert(quotePart("x\"y", "\"", true, false) == "\"x\"\"y\"")
    assert(quotePart("3col", "`", false, false) == "`3col`")
    // leading underscore keeps the historical unquoted fold behavior
    assert(quotePart("_TMP", "\"", true, false) == "_TMP")
  }

  test("operators run end-to-end through the jdbc backend") {
    // fixture tables only — earlier tests may have CTAS'd extra tables
    val tables = Seq("NATION", "REGION").map(t => t -> jdbcConn.table(t)).toMap
    val rc = RowCount.counts(spark, tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rc == Map("NATION" -> 26L, "REGION" -> 5L))
    val nc = NullCheck.profile("NATION", jdbcConn.table("NATION")).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(nc("N_NAME") == (25L, 1L))      // 25 distinct, 1 null
    assert(nc("N_REGIONKEY") == (5L, 0L))  // low-distinct FK
  }
}
