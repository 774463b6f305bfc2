package graft

import graft.app.GraftApp
import org.scalatest.funsuite.AnyFunSuite

/** CLI dispatch: each tool runs end-to-end and --out writes parquet. */
class GraftAppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runToParquet(args: String*): Long = {
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, args.toSeq ++ Seq("--out", out))
    spark.read.parquet(out).count()
  }

  test("rowcount over the catalog with exclusion") {
    val n = runToParquet("rowcount", "--dir", TestSpark.sf0001,
      "--exclude", "e%,p%")
    // region nation customer supplier orders lineitem documents = 7
    // (events, part, parquetizer-less tables excluded by pattern)
    assert(n == 7)
  }

  test("reference tool aliases resolve before dispatch (dbqt TOOL_ALIASES)") {
    // dbstats → rowcount: same flags, same output shape
    val n = runToParquet("dbstats", "--dir", TestSpark.sf0001,
      "--exclude", "e%,p%")
    assert(n == 7)
    // findkey → keyfinder; compare → colcompare (dispatch must not
    // reject the alias name — a wrong-flag error would say it reached
    // the tool)
    val e = intercept[RuntimeException](GraftApp.run(spark,
      Seq("findkey", "--dir", TestSpark.sf0001)))
    assert(e.getMessage.contains("--table required"))
    val e2 = intercept[RuntimeException](GraftApp.run(spark,
      Seq("compare", "--dir", TestSpark.sf0001)))
    assert(!e2.getMessage.contains("unknown tool"))
  }

  test("rowcount --where returns predicate-filtered counts per table") {
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    // discovered catalog + a predicate only ONE table can resolve: the
    // run counts that table and skips the rest (the reference's
    // where_clause counts are per-table calls), instead of aborting on
    // the first unresolvable column
    GraftApp.run(spark, Seq("rowcount", "--dir", TestSpark.sf0001,
      "--where", "n_nationkey < 7", "--out", out))
    val got = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.sources.Tables(spark, TestSpark.sf0001, "nation")
      .where("n_nationkey < 7").count()
    assert(got == Map("nation" -> want))
    assert(want > 0 && want < graft.sources.Tables(
      spark, TestSpark.sf0001, "nation").count())
    // a predicate NO table resolves fails loudly, not silently empty
    val e = intercept[IllegalArgumentException](GraftApp.run(spark,
      Seq("rowcount", "--dir", TestSpark.sf0001,
        "--where", "no_such_column = 1", "--out", out + "2")))
    assert(e.getMessage.contains("resolves on none"))
  }

  test("nullcheck, keyfinder, colcompare, completeness run end-to-end") {
    assert(runToParquet("nullcheck", "--dir", TestSpark.sf0001,
      "--table", "customer") > 0)
    assert(runToParquet("keyfinder", "--dir", TestSpark.sf0001,
      "--table", "orders", "--candidates", "o_orderkey,o_custkey") > 0)
    assert(runToParquet("colcompare", "--dir", TestSpark.sf0001,
      "--source", "customer", "--target", "customer") > 0)
    assert(runToParquet("completeness", "--dir", TestSpark.sf0001,
      "--table", "documents") > 0)
  }

  test("sessionize and dedup tools run end-to-end") {
    assert(runToParquet("sessionize", "--dir", TestSpark.sf0001,
      "--gap-minutes", "240") > 0)
    // word-salad docs at 0.6 produce at least some near-dup groups
    assert(runToParquet("dedup", "--dir", TestSpark.sf0001,
      "--table", "documents", "--threshold", "0.6") > 0)
  }

  private def tmpFile(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_cfg").resolve(name)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("dedup-audit: empty on a healthy corpus, reports buckets under a forced cap") {
    // word-salad docs: no band bucket exceeds the default 1024-distinct
    // cap, so a healthy corpus audits CLEAN (zero rows)
    assert(runToParquet("dedup-audit", "--dir", TestSpark.sf0001,
      "--table", "documents") == 0)
    // --max-bucket 0 makes every populated bucket over-cap — the audit
    // must surface them (same corpus, so the plumbing is proven live)
    assert(runToParquet("dedup-audit", "--dir", TestSpark.sf0001,
      "--table", "documents", "--max-bucket", "0") > 0)
  }

  test("--dir table list comes from directory discovery, not a fixture list") {
    // a dir containing ONLY two tables (one under a non-fixture name)
    // must rowcount exactly those two
    val dir = java.nio.file.Files.createTempDirectory("graft_disc").toString
    graft.sources.Tables(spark, TestSpark.sf0001, "region")
      .write.parquet(s"$dir/region.parquet")
    graft.sources.Tables(spark, TestSpark.sf0001, "nation")
      .write.parquet(s"$dir/my_custom_table.parquet")
    assert(runToParquet("rowcount", "--dir", dir) == 2)
    // an empty dir fails loudly instead of silently counting nothing
    val empty = java.nio.file.Files.createTempDirectory("graft_disc_e").toString
    val e = intercept[RuntimeException](
      GraftApp.run(spark, Seq("rowcount", "--dir", empty)))
    assert(e.getMessage.contains("no *.parquet tables"))
  }

  test("dedup-incremental and pack tools run end-to-end") {
    // batch == corpus → every doc's content is in the corpus
    val n = runToParquet("dedup-incremental", "--dir", TestSpark.sf0001,
      "--table", "documents")
    assert(n == 500)
    // --near switches to minhash near-dup membership, same row contract
    assert(runToParquet("dedup-incremental", "--dir", TestSpark.sf0001,
      "--table", "documents", "--near", "0.7") == 500)
    // pack over a derived token column: documents lacks n_tokens, so
    // point --tokens-col at the integral n_chars (valid budget units)
    assert(runToParquet("pack", "--dir", TestSpark.sf0001,
      "--table", "documents", "--tokens-col", "n_chars",
      "--capacity", "4096") == 500)
  }

  test("mixture tool selects token-budgeted per-source docs") {
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, Seq("mixture", "--dir", TestSpark.sf0001,
      "--table", "documents", "--tokens-col", "n_chars",
      "--budgets", "src0:5000,src1:3000", "--out", out))
    val res = spark.read.parquet(out)
    assert(res.count() > 0)
    assert(res.select("source").distinct().collect()
      .map(_.getString(0)).toSet == Set("src0", "src1"))
  }

  test("decontaminate tool flags docs containing a probe-file string") {
    // plant a probe that certainly occurs: a slice of doc 0's own text
    val doc0 = graft.sources.Tables(spark, TestSpark.sf0001, "documents")
      .where("doc_id = 0").select("text").collect()(0).getString(0)
    val probeFile = tmpFile("probes.txt", doc0.trim.take(30) + "\n")
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, Seq("decontaminate", "--dir", TestSpark.sf0001,
      "--table", "documents", "--probes-file", probeFile, "--out", out))
    val res = spark.read.parquet(out)
    assert(res.where("doc_id = 0 AND contaminated").count() == 1)
  }

  test("dbstats-compare reconciles two catalogs") {
    assert(runToParquet("dbstats-compare",
      "--source-dir", TestSpark.sf0001, "--target-dir", TestSpark.sf0001,
      "--tables", "region,nation,customer") == 3)
  }

  test("dbstats-compare maps differently-named tables via a pairs CSV") {
    val pairs = tmpFile("pairs.csv", "source_table,target_table\nregion,nation\norders,orders\n")
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, Seq("dbstats-compare",
      "--source-dir", TestSpark.sf0001, "--target-dir", TestSpark.sf0001,
      "--tables-file", pairs, "--out", out))
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("region_vs_nation", "orders_vs_orders"))
    assert(rows("region_vs_nation")._1 == 5)  // region rows
    assert(rows("region_vs_nation")._2 == 25) // nation rows
    assert(rows("orders_vs_orders")._1 == rows("orders_vs_orders")._2)
  }

  test("dynamic-query substitutes template per CSV row") {
    val csv = tmpFile("vals.csv", "var_from_csv\nAFRICA\nASIA\n")
    assert(runToParquet("dynamic-query", "--dir", TestSpark.sf0001,
      "--query", "SELECT '{var_from_csv}' AS r, count(*) AS n FROM region WHERE r_name = '{var_from_csv}'",
      "--csv", csv) == 2)
  }

  test("uniqueness, stats, referential, skew tools run end-to-end") {
    assert(runToParquet("uniqueness", "--dir", TestSpark.sf0001,
      "--table", "orders", "--keys", "o_orderkey") == 1)
    assert(runToParquet("stats", "--dir", TestSpark.sf0001,
      "--table", "lineitem", "--columns", "l_quantity,l_tax") == 2)
    assert(runToParquet("referential", "--dir", TestSpark.sf0001,
      "--table", "lineitem", "--fk", "l_orderkey",
      "--parent", "orders", "--ref", "o_orderkey") == 1)
    assert(runToParquet("skew", "--dir", TestSpark.sf0001,
      "--table", "events", "--column", "user_id", "--k", "5") == 5)
    // same catalog on both sides: 2 columns × 5 metrics, all OK
    assert(runToParquet("stats-compare",
      "--source-dir", TestSpark.sf0001, "--target-dir", TestSpark.sf0001,
      "--table", "lineitem", "--columns", "l_quantity,l_tax") == 10)
  }

  test("format/range/values/suite tools load a checks YAML") {
    val yaml = tmpFile("checks.yaml",
      """table: lineitem
        |completeness_cols: [l_quantity]
        |uniqueness_keys:
        |  - [l_orderkey, l_linenumber]
        |format_rules:
        |  - {name: status_of, column: l_linestatus, regex: "^[OF]$"}
        |range_rules:
        |  - {name: qty_1_50, column: l_quantity, min: 1, max: 50}
        |value_rules:
        |  - {name: rf_anr, column: l_returnflag, allowed: [A, N, R]}
        |fk_rules:
        |  - {name: li_orders, fk: l_orderkey, parent: orders, ref: o_orderkey}
        |""".stripMargin)
    assert(runToParquet("format", "--dir", TestSpark.sf0001, "--checks", yaml) == 1)
    assert(runToParquet("range", "--dir", TestSpark.sf0001, "--checks", yaml) == 1)
    assert(runToParquet("values", "--dir", TestSpark.sf0001, "--checks", yaml) == 1)
    // suite = completeness(1) + uniqueness(1) + format(1) + range(1) +
    // values(1) + referential(1)
    assert(runToParquet("suite", "--dir", TestSpark.sf0001, "--checks", yaml) == 6)
  }

  test("split tool assigns every row to a named split") {
    val out = java.nio.file.Files.createTempDirectory("graft_app").toString + "/res"
    GraftApp.run(spark, Seq("split", "--dir", TestSpark.sf0001,
      "--table", "documents", "--id", "doc_id",
      "--weights", "train:0.9,test:0.1", "--out", out))
    val res = spark.read.parquet(out)
    assert(res.count() == 500)
    assert(res.select("split").distinct().collect().map(_.getString(0)).toSet
      == Set("train", "test"))
    // string id columns are rejected up front (ANSI cast would throw
    // mid-job otherwise)
    val e = intercept[IllegalArgumentException](GraftApp.run(spark,
      Seq("split", "--dir", TestSpark.sf0001, "--table", "documents",
        "--id", "lang")))
    assert(e.getMessage.contains("integral"))
  }

  test("asof and range-join tools run end-to-end") {
    assert(runToParquet("asof", "--dir", TestSpark.sf0001,
      "--table", "events", "--key", "user_id", "--ts", "ts",
      "--left-where", "event_type='click'", "--right-where", "event_type='error'",
      "--payload", "ts,value") > 0)
    assert(runToParquet("range-join", "--dir", TestSpark.sf0001,
      "--gap-minutes", "240") > 0)
  }

  test("perplexity, url-dedup, and bpe tools run end-to-end") {
    assert(runToParquet("perplexity", "--dir", TestSpark.sf0001,
      "--table", "documents") > 0)
    assert(runToParquet("perplexity", "--dir", TestSpark.sf0001,
      "--table", "documents", "--exact", "true") > 0)
    // documents carry no url column — exercise the tool through an
    // existing string column (any column works; normalization is total)
    assert(runToParquet("url-dedup", "--dir", TestSpark.sf0001,
      "--table", "documents", "--url-col", "source") > 0)
    assert(runToParquet("bpe", "--dir", TestSpark.sf0001,
      "--table", "documents", "--merges", "20") > 0)
  }

  test("vectorize tool emits the embeddings-table schema") {
    assert(runToParquet("vectorize", "--dir", TestSpark.sf0001,
      "--table", "documents", "--dim", "32") > 400)
  }

  test("ann-advisor tool reports one row per coarse cell") {
    val n = runToParquet("ann-advisor", "--dir", TestSpark.sf0001,
      "--table", "embeddings", "--cells", "8", "--k", "5")
    assert(n > 0 && n <= 8, s"$n cells")
  }

  test("ann-advisor advice arms survive the --format csv write path (verdict-r15 #6)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // engineer all three advice arms into one embeddings table:
    // 2100 exact duplicates (k=1 ⇒ ceil(2100/1) > 1024 → use_ivf_or_dedup),
    // 600 duplicates of a second vector (→ raise_refine_to_600, the
    // string-typed concat arm), and spread vectors (→ ivfpq_fine)
    val ballA = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
    val ballB = Array.tabulate(64)(i => math.cos(i * 1.3).toFloat)
    val dupA = spark.range(2100).toDF("vec_id")
      .withColumn("embedding", array(ballA.map(x => lit(x)): _*).cast("array<float>"))
    val dupB = spark.range(2100, 2700).toDF("vec_id")
      .withColumn("embedding", array(ballB.map(x => lit(x)): _*).cast("array<float>"))
    val spread = graft.tools.ScaleUp.gaussEmbeddings(
      spark.range(2700, 3700).toDF("vec_id"), dim = 64, nClusters = 300)
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_adv").toString
    dupA.unionAll(dupB).unionAll(spread)
      .write.parquet(s"$dir/embeddings.parquet")

    val out = java.nio.file.Files.createTempDirectory("graft_adv_out")
      .resolve("csv").toString
    GraftApp.run(spark, Seq("ann-advisor", "--dir", dir, "--table", "embeddings",
      "--k", "1", "--out", out, "--format", "csv", "--single-file", "true"))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.columns.contains("advice"))
    val advice = back.select("advice").collect().map(_.getString(0)).toSeq
    assert(advice.contains("use_ivf_or_dedup"), s"missing give-up arm: $advice")
    assert(advice.contains("ivfpq_fine"), s"missing fine arm: $advice")
    val raises = advice.filter(_.startsWith("raise_refine_to_"))
    assert(raises.nonEmpty, s"missing concat arm: $advice")
    // the concat survives as a parseable value, not a mangled cast
    raises.foreach { a =>
      val n = a.stripPrefix("raise_refine_to_").toLong
      assert(n >= 1 && n <= 1024, s"unparseable refine target: $a")
    }
    // numeric columns read back as numbers (CSV is stringly — the
    // report must not have written scientific notation or nulls)
    back.collect().foreach { r =>
      assert(r.getAs[String]("n_vectors").matches("\\d+"), r.toString)
      assert(r.getAs[String]("max_code_mass").matches("\\d+"), r.toString)
    }
  }

  test("chunk and html-extract tools run end-to-end") {
    // docs are 10-99 tokens → window 16 guarantees multi-chunk output
    assert(runToParquet("chunk", "--dir", TestSpark.sf0001,
      "--table", "documents", "--window", "16", "--stride", "12") > 50)
    // documents carry no html column — text works (extraction is total
    // on tag-free input: it just applies the line rule)
    assert(runToParquet("html-extract", "--dir", TestSpark.sf0001,
      "--table", "documents", "--html-col", "text") > 0)
  }

  test("generate-config writes a loadable default colcompare YAML") {
    val path = java.nio.file.Files.createTempDirectory("graft_gen")
      .resolve("cc.yaml").toString
    assert(runToParquet("generate-config", "--path", path) == 1)
    assert(graft.app.YamlConfig.colcompare(path).typeMappings ==
      graft.operators.TypeCompat.DefaultTypeMappings)
  }

  test("rowcount accepts a reference-shaped connection YAML") {
    val tablesCsv = tmpFile("tables.csv", "table_name\nregion\nnation\ntmp_scratch\n")
    val yaml = tmpFile("conn.yaml",
      s"""connection:
         |  type: parquet
         |  path: ${TestSpark.sf0001}
         |tables_file: $tablesCsv
         |excluded_tables:
         |  - "TMP_%"
         |""".stripMargin)
    assert(runToParquet("rowcount", "--config", yaml) == 2)
  }

  test("output modes: partitioned default, --single-file, --format csv") {
    val base = java.nio.file.Files.createTempDirectory("graft_out")
    def parts(p: java.nio.file.Path, glob: String) = {
      val s = java.nio.file.Files.newDirectoryStream(p, glob)
      try { import scala.jdk.CollectionConverters._; s.asScala.size }
      finally s.close()
    }
    // default write must NOT funnel through one task (AQE would
    // coalesce this tiny fixture to 1 partition and make the check
    // vacuous, so pin it off for the assertion)
    val multi = base.resolve("multi")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try GraftApp.run(spark, Seq("sessionize", "--dir", TestSpark.sf0001,
      "--gap-minutes", "240", "--out", multi.toString))
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert(parts(multi, "part-*.parquet") > 1, "default write should stay partitioned")
    val single = base.resolve("single")
    GraftApp.run(spark, Seq("sessionize", "--dir", TestSpark.sf0001,
      "--gap-minutes", "240", "--out", single.toString, "--single-file", "true"))
    assert(parts(single, "part-*.parquet") == 1)
    // CSV report readback (reference tools write CSV reports)
    val csvOut = base.resolve("csv")
    GraftApp.run(spark, Seq("rowcount", "--dir", TestSpark.sf0001,
      "--out", csvOut.toString, "--format", "csv", "--single-file", "true"))
    val back = spark.read.option("header", "true").csv(csvOut.toString)
    assert(back.columns.toSeq == Seq("table_name", "row_count"))
    assert(back.count() == 10)
  }

  test("--format html writes a self-contained report containing the result rows") {
    val out = java.nio.file.Files.createTempDirectory("graft_html").toString
    GraftApp.run(spark, Seq("rowcount", "--dir", TestSpark.sf0001,
      "--tables", "region,nation", "--out", out, "--format", "html"))
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/report.html")), "UTF-8")
    assert(html.contains("<title>graft rowcount</title>"))
    // the data rows are embedded: both table names and the real counts
    assert(html.contains("region") && html.contains("nation"))
    val regionRows = graft.sources.Tables(spark, TestSpark.sf0001, "region").count()
    assert(html.contains(s""""row_count":$regionRows"""))
    // numeric column gets a number sorter; string column an input filter
    assert(html.contains(""""field":"row_count","sorter":"number""""))
    assert(html.contains(""""sorter":"string","headerFilter":"input""""))
  }

  test("html report escapes hostile values and nulls NaN") {
    import spark.implicits._
    val df = Seq(("</script><b>x", Double.NaN), ("ok", 1.5))
      .toDF("name", "score")
    val p = java.nio.file.Files.createTempDirectory("graft_html2")
      .resolve("r.html").toString
    new graft.app.HtmlReport("t").addTab("tab", df).save(p)
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")
    assert(!html.contains("</script><b>"), "raw </script> must not appear in data")
    assert(html.contains(""""score":null"""))
    assert(html.contains(""""score":1.5"""))
  }

  test("unknown tool and missing flags fail loudly") {
    intercept[RuntimeException](GraftApp.run(spark, Seq("nosuch")))
    intercept[RuntimeException](GraftApp.run(spark, Seq("nullcheck")))
    // dbstats-compare must NOT fall back to --dir for a missing side —
    // that would silently compare a catalog to itself
    intercept[RuntimeException](GraftApp.run(spark, Seq("dbstats-compare",
      "--dir", TestSpark.sf0001, "--source-dir", TestSpark.sf0001)))
  }

  test("suggest-checks profiles, writes YAML, and the suggested config gates green via suite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_suggest")
    val yaml = s"$tmp/customer_checks.yaml"
    val out = s"$tmp/report"
    // profile one table and emit its suggested checks config
    GraftApp.run(spark, Seq("suggest-checks", "--dir", TestSpark.sf0001,
      "--table", "customer", "--yaml", yaml, "--out", out))
    val report = spark.read.parquet(out)
    val classes = report.collect()
      .map(r => r.getString(1) -> r.getString(8)).toMap
    assert(classes("c_custkey") == "identifier_unique")
    assert(classes("c_mktsegment") == "categorical")
    // the suggestion-to-gate round trip THROUGH THE CLI: the written
    // YAML must run under the suite tool with zero FAIL rows
    val gateOut = s"$tmp/gate"
    GraftApp.run(spark, Seq("suite", "--dir", TestSpark.sf0001,
      "--checks", yaml, "--out", gateOut))
    val gate = spark.read.parquet(gateOut).collect()
    assert(gate.nonEmpty)
    val failures = gate.filter(r => r.getString(3) == "FAIL")
    assert(failures.isEmpty, s"suggested rules must pass: ${failures.mkString(", ")}")
    // multi-table discovery mode stays bounded to the flag-named set
    val multiOut = s"$tmp/multi"
    GraftApp.run(spark, Seq("suggest-checks", "--dir", TestSpark.sf0001,
      "--tables", "region,nation", "--out", multiOut))
    val tables = spark.read.parquet(multiOut)
      .select("table_name").distinct().collect().map(_.getString(0)).toSet
    assert(tables == Set("region", "nation"))
  }

  test("misaligned flag pairs are rejected, not silently shifted") {
    // valueless flag shifts everything: must error, not run with defaults
    intercept[RuntimeException](GraftApp.run(spark,
      Seq("keyfinder", "--dir", TestSpark.sf0001, "--table", "orders",
        "--force", "--max-size", "2")))
    intercept[RuntimeException](GraftApp.run(spark,
      Seq("rowcount", "stray", "--dir", TestSpark.sf0001)))
  }
}
