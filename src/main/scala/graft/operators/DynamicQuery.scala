package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Templated query fan-out — the reference's dynamic_query tool
  * (dbqt/tools/dynamic_query.py: a SQL template with `{var}` placeholders
  * is instantiated once per CSV row and executed sequentially).
  *
  * Spark-first: each instantiation is a LOGICAL PLAN, and all of them are
  * unioned into one job — Catalyst shares scans where possible and the
  * cluster runs every instantiation concurrently instead of one at a
  * time. Parameter sets are driver-side values (the reference reads them
  * from a CSV), so they are assumed small; the DATA the queries touch is
  * not.
  */
object DynamicQuery {

  /** `{var}` → value substitution, matching the reference's str.format-
    * style templates.
    */
  def substitute(template: String, params: Map[String, String]): String =
    params.foldLeft(template) { case (acc, (k, v)) => acc.replace(s"{$k}", v) }

  /** Instantiate the template per parameter row and union all plans into
    * one DataFrame. Requires the referenced tables to be registered as
    * temp views (e.g. via Tables.registerViews).
    */
  def run(spark: SparkSession, template: String, paramRows: Seq[Map[String, String]]): DataFrame =
    paramRows
      .map(p => spark.sql(substitute(template, p)))
      .reduce(_ unionAll _)
}
