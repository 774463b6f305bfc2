package graft.app

import graft.operators._
import graft.operators.checks.Checks
import graft.operators.dedup.Dedup
import graft.sources.{ParquetCombine, Parquetizer, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI dispatch — the reference's `dbqt <tool>` surface (reference:
  * dbqt/app.py) re-expressed over parquet table directories.
  *
  * A "connection" is a directory of parquet tables (`--dir`); YAML
  * configs are replaced by flags (documented divergence, SURVEY §5 —
  * zero-dependency parsing). Results go to `--out` as parquet, or to
  * the console.
  *
  * {{{
  * graft.app.GraftApp rowcount   --dir /data/sf1 [--exclude tmp_%]
  * graft.app.GraftApp nullcheck  --dir /data/sf1 --table customer
  * graft.app.GraftApp keyfinder  --dir /data/sf1 --table orders \
  *     --candidates o_orderkey,o_custkey [--max-size 3]
  * graft.app.GraftApp colcompare --dir /data/sf1 --source a --target b
  * graft.app.GraftApp combine    --files a.parquet,b.parquet --out c
  * graft.app.GraftApp parquetizer --path /data/dropzone
  * graft.app.GraftApp completeness --dir /data/sf1 --table documents
  * graft.app.GraftApp dedup      --dir /data/sf1 --table documents \
  *     [--threshold 0.8]
  * graft.app.GraftApp sessionize --dir /data/sf1 [--gap-minutes 120]
  * }}}
  */
object GraftApp {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  /** Flag parsing: `tool --k v --k2 v2 ...` → (tool, Map(k → v)).
    * STRICT: every flag must start with `--` and carry a value
    * (booleans are `--force true`) — a misaligned pair fails loudly
    * instead of silently shifting every following flag into the wrong
    * slot.
    */
  private[app] def parse(args: Seq[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, usage)
    val flags = args.tail.grouped(2).map {
      case Seq(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.stripPrefix("--") -> v
      case bad => sys.error(s"malformed flag pair '${bad.mkString(" ")}' " +
        s"(flags are '--name value'; booleans are '--force true')\n$usage")
    }.toMap
    (args.head, flags)
  }

  private val usage =
    "usage: GraftApp <rowcount|nullcheck|keyfinder|colcompare|combine|" +
      "parquetizer|completeness|dedup|sessionize> --dir <tables-dir> [flags]"

  def run(spark: SparkSession, args: Seq[String]): Unit = {
    val (tool, f) = parse(args)
    def dir = f.getOrElse("dir", sys.error("--dir required"))
    def tableName = f.getOrElse("table", sys.error("--table required"))
    def table = Tables(spark, dir, tableName)

    val result: DataFrame = tool match {
      case "rowcount" =>
        val names = Tables.filterExcluded(
          f.get("tables").map(_.split(",").toSeq).getOrElse(Tables.all),
          f.get("exclude").map(_.split(",").toSeq).getOrElse(Nil))
        RowCount.counts(spark, Tables.load(spark, dir, names))
      case "nullcheck" =>
        NullCheck.profile(tableName, table)
      case "keyfinder" =>
        val t = table
        val cands = f.get("candidates").map(_.split(",").toSeq)
          .getOrElse(KeyFinder.selectCandidates(t.columns.toSeq,
            f.get("include-only").map(_.split(",").toSeq).getOrElse(Nil),
            f.get("exclude").map(_.split(",").toSeq).getOrElse(Nil),
            f.getOrElse("max-columns", "20").toInt))
        val maxSize = f.getOrElse("max-size", "3").toInt
        KeyFinder.requireSearchable(cands.size, maxSize, f.get("force").contains("true"))
        KeyFinder.findMinimalKeys(spark, t, cands, maxSize)
      case "colcompare" =>
        ColCompare.compareColumns(spark,
          Tables(spark, dir, f.getOrElse("source", sys.error("--source required"))),
          Tables(spark, dir, f.getOrElse("target", sys.error("--target required"))))
      case "combine" =>
        val out = ParquetCombine.combine(spark,
          f.getOrElse("files", sys.error("--files required")).split(",").toSeq)
        out.df
      case "parquetizer" =>
        val (renamed, skipped) = Parquetizer.renameExtensionless(spark,
          f.getOrElse("path", sys.error("--path required")))
        import spark.implicits._
        (renamed.map(("RENAMED", _)) ++ skipped.map(("SKIPPED", _)))
          .toDF("action", "file")
      case "completeness" =>
        Checks.Completeness.run(tableName, table)
      case "dedup" =>
        Dedup.Components.dedupGroups(table,
          f.getOrElse("threshold", "0.8").toDouble)
      case "sessionize" =>
        Sessionize.sessions(Tables(spark, dir, "events"),
          f.getOrElse("gap-minutes", "120").toInt)
      case other => sys.error(s"unknown tool '$other'\n$usage")
    }

    f.get("out") match {
      case Some(out) => result.coalesce(1).write.mode("overwrite").parquet(out)
      case None => result.show(100, truncate = false)
    }
  }
}
