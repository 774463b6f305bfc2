package graft.operators

/** Cross-dialect type-compatibility groups — the reference's colcompare
  * type mapping (dbqt/tools/colcompare.py:29-39 `DEFAULT_TYPE_MAPPINGS`,
  * colcompare.py:134-153 `are_types_compatible`).
  *
  * Rules, in order: strip parenthesised precision (`VARCHAR(20)` →
  * `VARCHAR`); exact match; both TIMESTAMP*-prefixed; both members of the
  * same mapping group. Mappings are customizable — pass your own
  * group map the way the reference accepts a YAML override.
  */
object TypeCompat {

  /** colcompare.py:29 — each group lists mutually-compatible type names. */
  val DefaultTypeMappings: Map[String, Seq[String]] = Map(
    "INTEGER" -> Seq("INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "NUMBER"),
    "VARCHAR" -> Seq("VARCHAR", "TEXT", "CHAR", "STRING", "NVARCHAR", "VARCHAR2", "ENUM"),
    "DECIMAL" -> Seq("DECIMAL", "NUMERIC", "NUMBER"),
    "FLOAT" -> Seq("FLOAT", "REAL", "DOUBLE", "DOUBLE PRECISION"),
    "TIMESTAMP" -> Seq("TIMESTAMP", "DATETIME", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"),
    "DATE" -> Seq("DATE", "TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"),
    "DATETIME" -> Seq("TIMESTAMP", "TIMESTAMP_NTZ", "TIMESTAMP_LTZ"),
    "BOOLEAN" -> Seq("BOOLEAN", "BOOL", "BIT"),
    "ENUM" -> Seq("TEXT"))

  /** colcompare.py:134-153, including the paren-stripping and the
    * TIMESTAMP*-prefix rule.
    */
  def areCompatible(
      type1: String,
      type2: String,
      mappings: Map[String, Seq[String]] = DefaultTypeMappings): Boolean = {
    val t1 = type1.toUpperCase.split('(')(0).trim
    val t2 = type2.toUpperCase.split('(')(0).trim
    if (t1 == t2) true
    else if (t1.startsWith("TIMESTAMP") && t2.startsWith("TIMESTAMP")) true
    else mappings.values.exists(g => g.contains(t1) && g.contains(t2))
  }
}
