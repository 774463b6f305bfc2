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

  /** reference: count_rows(where_clause=…) (connections.py:92) — a
    * filtered count for partition-bounded reconciliation. `where` is a
    * SQL predicate in the backend's dialect, evaluated as close to the
    * data as the backend allows: here Catalyst plans it, so a predicate
    * over parquet partition/stats columns prunes at the scan.
    */
  def countRows(name: String, where: String): Long =
    table(name).where(where).groupBy().count().collect()(0).getLong(0)

  /** (table_name, row_count) for many tables, as one plan whose scans
    * run concurrently. Backends where counting can be pushed to the
    * engine (JDBC) override this — pulling whole tables through Spark
    * just to count them defeats the reference's execution model.
    */
  def rowCounts(names: Seq[String]): org.apache.spark.sql.DataFrame =
    rowCounts(names, None)

  /** [[rowCounts]] with an optional shared predicate (the catalog form
    * of `count_rows(where_clause=…)`): one plan, every scan filtered —
    * Catalyst pushes the predicate into each scan. The predicate must
    * resolve on every named table; catalogs with heterogeneous schemas
    * scope the name list first (the CLI's dir-backed path does this
    * automatically).
    */
  def rowCounts(names: Seq[String],
                where: Option[String]): org.apache.spark.sql.DataFrame =
    graft.operators.RowCount.counts(spark,
      names.map(n => n -> where.fold(table(n))(w => table(n).where(w))).toMap)

  /** reference: run_query — registers this connection's tables as temp
    * views, then runs Spark SQL (Catalyst plans it; nothing is pushed
    * to a remote engine).
    */
  def runQuery(sql: String): DataFrame = {
    listTables().foreach(t => table(t).createOrReplaceTempView(t))
    spark.sql(sql)
  }

  /** reference generate_table_from_query (connections.py:145-150,
    * `DROP TABLE IF EXISTS` + `CREATE TABLE AS`): materialize a query
    * as a table in this backend, replacing any existing table of that
    * name. Executed Spark-side: the query plans through [[runQuery]]
    * and the result streams into the backend's writer — the same
    * replace semantics on every backend, without depending on each
    * engine's CTAS dialect (Derby, for one, has no populating
    * `CREATE TABLE AS`).
    */
  def createTableFromQuery(name: String, sql: String): Unit
}

/** Directory of `<name>.parquet` tables. Without an explicit name list,
  * tables are DISCOVERED by listing the directory (reference:
  * list_tables) — never assumed.
  *
  * `dir` is any Hadoop-filesystem URI — `/local/path`, `s3a://bucket/
  * prefix`, `hdfs://nn/path`, `abfs://…` — which subsumes the
  * reference's S3Parquet connector (connections.py:310-388): where the
  * reference downloads the object to local disk and reads the copy,
  * Spark plans splits directly against the store and 1000 executors
  * read ranges concurrently; nothing lands on a driver disk.
  */
final class ParquetDirConnection(val spark: SparkSession, dir: String,
                                 names: Seq[String] = Nil) extends Connection {
  override def listTables(): Seq[String] =
    if (names.nonEmpty) names else Tables.discover(spark, dir, "parquet")
  override def table(name: String): DataFrame = Tables(spark, dir, name)
  /** Distributed parquet write — every executor writes its partitions;
    * `overwrite` gives the reference's drop-and-replace semantics.
    */
  override def createTableFromQuery(name: String, sql: String): Unit =
    runQuery(sql).write.mode("overwrite").parquet(s"$dir/$name.parquet")
}

/** Directory of `<name>.csv` tables with header + schema inference.
  * Same discovery rule as the parquet backend.
  */
final class CsvDirConnection(val spark: SparkSession, dir: String,
                             names: Seq[String] = Nil) extends Connection {
  override def listTables(): Seq[String] =
    if (names.nonEmpty) names else Tables.discover(spark, dir, "csv")
  override def table(name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/$name.csv")
  override def createTableFromQuery(name: String, sql: String): Unit =
    runQuery(sql).write.mode("overwrite").option("header", "true")
      .csv(s"$dir/$name.csv")
}

/** Live-database backend over Spark's public `jdbc` data source.
  *
  * The reference is, at its core, a multi-backend SQL pusher: its
  * connector ABC (dbqt/connections.py:38-127 — `connect`/`run_query`/
  * `fetch_table_metadata`/`fetch_schema_metadata`/`list_tables`/
  * `count_rows`) fans the same tools across 9 SQL engines. One
  * `JdbcConnection` covers any JDBC-speaking engine the same way —
  * the engine-specific part is just the URL + driver jar (Derby, which
  * ships with Spark, is the embedded test fixture).
  *
  * Faithful to the reference's execution model where it matters:
  * `runQuery` and `countRows` PUSH the SQL to the database (the
  * reference's run_query / `SELECT COUNT(*)`, connections.py:96-107)
  * instead of pulling rows through Spark first, and `listTables` uses
  * the portable `java.sql.DatabaseMetaData` API — the driver-side
  * equivalent of the reference's information_schema queries
  * (connections.py:128-146), tiny result sets only.
  *
  * Scale: `table()` is a DataSource read Catalyst pushes filters and
  * projections into; for big tables [[tablePartitioned]] splits the
  * scan into `numPartitions` range predicates so 1000 executors pull
  * disjoint slices concurrently instead of one task draining the whole
  * table through a single cursor.
  */
final class JdbcConnection(val spark: SparkSession, url: String,
                           schema: Option[String] = None,
                           props: Map[String, String] = Map.empty,
                           database: Option[String] = None) extends Connection {

  private def withJdbc[A](f: java.sql.Connection => A): A = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val c = java.sql.DriverManager.getConnection(url, p)
    try f(c) finally c.close()
  }

  /** reference list_tables (connections.py:139-146): all tables in the
    * schema, ordered by name. CACHED after the first call: every tool
    * that fans over the catalog (rowcount, dbstats-compare,
    * schemaMetadata) calls listTables repeatedly, and re-running the
    * metadata query per call hammers the backend for an answer that
    * cannot change mid-run — except through THIS connection's own
    * writes, so [[createTableFromQuery]] invalidates it.
    */
  override def listTables(): Seq[String] = {
    val cached = cachedTables
    if (cached != null) cached
    else {
      val listed = withJdbc { c =>
        val rs = c.getMetaData.getTables(database.orNull, schema.orNull, "%",
          Array("TABLE"))
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) buf += rs.getString("TABLE_NAME")
        buf.sorted.toSeq
      }
      cachedTables = listed
      listed
    }
  }
  @volatile private var cachedTables: Seq[String] = null

  /** The engine's identifier rules, read once from the driver itself
    * (quote string, unquoted-identifier case folding) — the portable
    * way to be correct on Derby/PostgreSQL (`"`, fold-to-upper/lower)
    * and MySQL (`` ` ``) alike, instead of per-dialect SQL variants.
    */
  private lazy val identInfo: (String, Boolean, Boolean) = withJdbc { c =>
    val md = c.getMetaData
    (Option(md.getIdentifierQuoteString).map(_.trim).filter(_.nonEmpty)
       .getOrElse("\""),
     md.storesUpperCaseIdentifiers, md.storesLowerCaseIdentifiers)
  }

  /** reference build_qualified_table_name (connections.py:32-35):
    * dot-join of (database, schema, table), skipping absent parts —
    * Athena/Snowflake-style catalogs address `db.schema.table`. A name
    * that already contains a dot is passed through untouched.
    *
    * Each part is quoted per [[JdbcConnection.quotePart]] when the
    * engine's unquoted case folding would lose it: Spark's JDBC writer
    * QUOTES identifiers on CREATE (case preserved), so a table CTAS'd
    * as `region_counts` on a fold-to-upper engine (Derby) is only
    * reachable quoted — unquoted SQL folds to `REGION_COUNTS` and
    * misses. Names already in the engine's native case stay unquoted,
    * byte-identical to the SQL this connector always sent.
    */
  private[graft] def qualify(name: String): String =
    if (name.contains(".")) name
    else {
      val (q, upper, lower) = identInfo
      (database.toSeq ++ schema.toSeq :+ name)
        .map(JdbcConnection.quotePart(_, q, upper, lower)).mkString(".")
    }

  private def reader = {
    val base = spark.read.format("jdbc").option("url", url)
    props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
  }

  override def table(name: String): DataFrame =
    reader.option("dbtable", qualify(name)).load()

  /** Range-partitioned scan — the 100 TB path for JDBC pulls. Each of
    * the `numPartitions` tasks reads `partitionCol` ∈ one range slice.
    */
  def tablePartitioned(name: String, partitionCol: String,
                       lower: Long, upper: Long, numPartitions: Int): DataFrame =
    reader.option("dbtable", qualify(name))
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** reference run_query (connections.py:60-65): the SQL executes IN
    * the database (Spark wraps it as a subquery and streams the result)
    * — dialect and semantics are the remote engine's, as in dbqt.
    */
  override def runQuery(sql: String): DataFrame =
    reader.option("query", sql).load()

  /** The query executes in-database (pushed, [[runQuery]]); the result
    * streams through Spark's dialect-aware JDBC writer, whose
    * `overwrite` drops and recreates the target — replace semantics on
    * any JDBC engine without per-dialect `CREATE TABLE AS` SQL.
    * Row-trip cost note: for an engine whose CTAS you trust, pushing
    * `CREATE TABLE $name AS $sql` through a raw statement avoids the
    * round-trip; this portable default is correct everywhere first.
    */
  override def createTableFromQuery(name: String, sql: String): Unit = {
    val w = runQuery(sql).write.format("jdbc")
      .option("url", url).option("dbtable", qualify(name))
    props.foldLeft(w) { case (x, (k, v)) => x.option(k, v) }
      .mode("overwrite").save()
    cachedTables = null // the catalog just changed through this connection
  }

  /** reference count_rows (connections.py:96-107): one pushed
    * `SELECT COUNT(*)`; only the scalar crosses the wire. (JDBC COUNT
    * may surface as INT or BIGINT depending on engine — normalized.)
    */
  override def countRows(name: String): Long =
    runQuery(s"SELECT COUNT(*) AS n FROM ${qualify(name)}")
      .collect()(0).get(0).asInstanceOf[Number].longValue()

  /** Filtered count, WHERE pushed into the database with the COUNT —
    * the predicate runs in the remote engine's dialect and only the
    * scalar crosses the wire (reference count_rows' where_clause,
    * connections.py:92-107).
    */
  override def countRows(name: String, where: String): Long =
    runQuery(s"SELECT COUNT(*) AS n FROM ${qualify(name)} WHERE $where")
      .collect()(0).get(0).asInstanceOf[Number].longValue()

  /** Counting N tables pushes N scalar COUNT(*) queries concurrently
    * (the reference's thread-pooled dbstats, utils.py:39) — never a
    * full-table pull through Spark just to count. The pool is BOUNDED
    * at [[JdbcConnection.MaxConcurrentCounts]] (the default `.par`
    * pool is sized to the machine's cores — 32 simultaneous
    * connections is a self-inflicted DoS on a production backend).
    */
  override def rowCounts(names: Seq[String],
                         where: Option[String]): DataFrame = {
    import scala.collection.parallel.CollectionConverters._
    val pool = new java.util.concurrent.ForkJoinPool(
      math.max(1, math.min(JdbcConnection.MaxConcurrentCounts, names.size)))
    try {
      val par = names.par
      par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
      val counts = par.map(n =>
        (n, where.fold(countRows(n))(w => countRows(n, w)))).seq.sortBy(_._1)
      spark.createDataFrame(counts).toDF("table_name", "row_count")
    } finally pool.shutdown()
  }
}

object JdbcConnection {
  /** Concurrent pushed COUNT(*) queries per rowCounts call — matches
    * the reference's fixed-size ConnectionPool posture (utils.py:39)
    * rather than scaling with local cores.
    */
  val MaxConcurrentCounts = 8

  /** Dialect-aware identifier quoting, parameterized on what the
    * engine reported about itself: `q` is its quote string
    * (`"` Derby/PostgreSQL, `` ` `` MySQL), `storesUpper`/`storesLower`
    * its unquoted case folding. A plain identifier already in the
    * engine's native case passes through unquoted (identical SQL to
    * the pre-quoting connector, and matches tables created unquoted);
    * anything else — case the fold would destroy, or characters
    * outside `[A-Za-z0-9_]` — is quoted with embedded quotes doubled.
    * Pure function so each dialect's behavior is testable without the
    * engine (ConnectionSpec covers the MySQL- and PostgreSQL-shaped
    * parameters directly, and Derby live).
    */
  private[graft] def quotePart(part: String, q: String,
                               storesUpper: Boolean,
                               storesLower: Boolean): String = {
    val plain = part.nonEmpty && !part.head.isDigit &&
      part.forall(ch => ch.isLetterOrDigit && ch < 128 || ch == '_')
    val caseSafe =
      if (storesUpper) part == part.toUpperCase
      else if (storesLower) part == part.toLowerCase
      else true
    if (plain && caseSafe) part
    else q + part.replace(q, q + q) + q
  }
}
