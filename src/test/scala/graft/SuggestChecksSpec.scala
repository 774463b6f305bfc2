package graft

import graft.operators.checks.{SuggestChecks, Suite}
import graft.app.YamlConfig
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column classification + automatic check suggestions (SURVEY §2, the
  * reference README's Future Plans, README.md:352-356; round 17,
  * verdict-r16 #6). Pins: every semantic class reachable on a
  * constructed fixture; the classification priority order; the real
  * gate tables' classes; and the full round trip suggestion → YAML →
  * YamlConfig.checks → Suite.gate with every suggested rule PASSING on
  * the table it was derived from.
  */
class SuggestChecksSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def fixture = {
    val s = spark
    import s.implicits._
    (0 until 100).map { i =>
      (i.toLong,                                   // row_id -> identifier_unique
        i % 7,                                     // group_id -> identifier (fk-shaped)
        s"user$i@example.com",                     // email
        s"""{"v": $i}""",                          // json
        f"2024-0${i % 9 + 1}-1${i % 9}",           // date_string
        Seq("red", "green", "blue")(i % 3),        // categorical
        i * 1.5 - 3.0,                             // numeric
        s"free text value number $i with words",   // text
        Option.empty[String],                      // all_null
        "fixed")                                   // constant
    }.toDF("row_id", "group_id", "email_col", "payload", "day", "color",
      "score", "note", "missing", "tag")
  }

  test("every semantic class is reachable and mapped to implemented checks") {
    val rep = SuggestChecks.run("fixture", fixture)
      .collect().map(r => r.getString(1) ->
        (r.getString(8), r.getString(9))).toMap
    val classes = rep.view.mapValues(_._1).toMap
    assert(classes == Map(
      "row_id" -> "identifier_unique",
      "group_id" -> "identifier",
      "email_col" -> "email",
      "payload" -> "json",
      "day" -> "date_string",
      "color" -> "categorical",
      "score" -> "numeric",
      "note" -> "text",
      "missing" -> "all_null",
      "tag" -> "constant"), s"got $classes")
    // each class maps to checks the framework implements
    val known = Set("completeness", "uniqueness", "referential", "format",
      "values", "range", "stats")
    for ((c, (_, sug)) <- rep; s <- sug.split(","))
      assert(known(s), s"$c suggests unimplemented check '$s'")
    assert(rep("row_id")._2.contains("uniqueness"))
    assert(rep("group_id")._2.contains("referential"))
    assert(rep("email_col")._2.startsWith("format"))
    assert(rep("score")._2.contains("range"))
  }

  test("priority order: id-naming beats patterns; constant beats identifier; 90% floor is enforced") {
    val s = spark
    import s.implicits._
    // an id-NAMED column full of emails stays an identifier (name rule
    // first); a constant id column is constant; a column with 80%
    // emails misses the 90% floor and falls through to text
    val df = (0 until 100).map { i =>
      (s"u$i@example.com",
        "only@value.com",
        if (i < 80) s"x$i@example.com" else s"not an email $i")
    }.toDF("email_id", "const_id", "mostly_email")
    val rep = SuggestChecks.run("t", df)
      .collect().map(r => r.getString(1) -> r.getString(8)).toMap
    assert(rep("email_id") == "identifier_unique", s"got $rep")
    assert(rep("const_id") == "constant")
    assert(rep("mostly_email") == "text")
    // at exactly 90% the pattern class fires (>= floor, not >)
    val df2 = (0 until 100).map { i =>
      (if (i < 90) s"x$i@example.com" else s"nope $i") -> i
    }.toDF("edge_email", "n")
    val rep2 = SuggestChecks.run("t2", df2)
      .collect().map(r => r.getString(1) -> r.getString(8)).toMap
    assert(rep2("edge_email") == "email", s"got $rep2")
  }

  test("gate tables classify as documented (the SparkEntry suggest_checks surface)") {
    import graft.sources.Tables
    val d = TestSpark.sf0001
    val rep = SuggestChecks.runAll(
      Seq("customer", "events", "orders").map(t => t -> Tables(spark, d, t)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getString(8)))
      .toMap
    assert(rep(("customer", "c_custkey"))._2 == "identifier_unique")
    assert(rep(("customer", "c_nationkey"))._2 == "identifier") // *key + non-unique = FK-shaped
    assert(rep(("customer", "c_mktsegment"))._2 == "categorical")
    assert(rep(("customer", "c_acctbal"))._2 == "numeric")
    assert(rep(("events", "props"))._2 == "json")
    assert(rep(("events", "ts"))._2 == "temporal")
    assert(rep(("events", "event_type"))._2 == "categorical")
    assert(rep(("events", "user_id"))._2 == "identifier")
    // orders.o_orderdate reads as TimestampNTZType from the driver's
    // parquet (no Tables shim, unlike events.ts) — the report must
    // still classify it temporal AND name the canonical 'timestamp'
    // type, or the static SuggestTables oracle literals desync (the
    // round-17 gate failure this pins)
    assert(rep(("orders", "o_orderdate")) == ("timestamp", "temporal"))
    assert(rep(("orders", "o_orderstatus"))._2 == "categorical")
  }

  test("round trip: suggestions → YAML → YamlConfig.checks → Suite.gate, every suggested rule passes") {
    val df = fixture.localCheckpoint(true)
    val rep = SuggestChecks.run("fixture", df)
    val yaml = SuggestChecks.suggestedYaml("fixture", df, rep)
    info(yaml.linesIterator.take(12).mkString("\n"))
    val path = java.nio.file.Files.createTempFile("suggested", ".yaml")
    java.nio.file.Files.write(path, yaml.getBytes("UTF-8"))
    val cfg = YamlConfig.checks(path.toString)
    assert(cfg.table == "fixture")
    assert(cfg.completenessCols.size == df.columns.length)
    assert(cfg.uniquenessKeys == Seq(Seq("row_id")))
    assert(cfg.formatRules.map(_.column).toSet == Set("email_col", "payload", "day"))
    assert(cfg.rangeRules.map(_.column) == Seq("score"))
    // categorical domains collected bounded: color (3) and the
    // fk-shaped group_id is NOT a value rule (identifier class)
    assert(cfg.valueRules.map(_.column).toSet == Set("color"))
    assert(cfg.valueRules.head.allowed.toSet == Set("red", "green", "blue"))
    val gate = Suite.gate(Suite.TableChecks("fixture", df,
        completenessCols = cfg.completenessCols,
        uniquenessKeys = cfg.uniquenessKeys,
        formatRules = cfg.formatRules,
        rangeRules = cfg.rangeRules,
        valueRules = cfg.valueRules))
      .collect()
    // every generated rule must PASS on the table it was derived from
    // (completeness rows report status COMPLETE/ALL_NULL/PARTIAL; the
    // all-null fixture column legitimately reports ALL_NULL)
    val failures = gate.filter(r => r.getString(3) == "FAIL")
    assert(failures.isEmpty,
      s"suggested rules must pass: ${failures.map(_.toString).mkString(", ")}")
  }

  test("oracle SQL agrees with the Spark report on a DuckDB-shaped fixture (structure only)") {
    // the full numeric agreement is the driver gate's job; here pin
    // that the generated SQL references exactly the profiled columns
    // and mirrors the CASE arms (a drifted class name would desync the
    // hash compare loudly, but catch it before the gate)
    val sql = SuggestChecks.oracleSql("customer",
      Seq("c_custkey" -> "bigint", "c_name" -> "string"))
    for (cls <- Seq("all_null", "constant", "identifier_unique", "identifier",
      "json", "email", "date_string", "categorical", "numeric", "temporal",
      "text"))
      assert(sql.contains(s"'$cls'"), s"oracle misses class $cls")
    assert(sql.contains("count(DISTINCT c_custkey)"))
    assert(sql.contains("regexp_matches(c_name"))
    assert(!sql.contains("regexp_matches(c_custkey"), "no regex on numerics")
  }
}
