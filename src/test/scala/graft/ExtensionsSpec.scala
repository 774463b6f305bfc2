package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native expressions resolve from SQL text. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_similarity is callable from SQL via the session extension") {
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS same_dir,
        |  cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS orthogonal
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("cosine_similarity rejects wrong argument types at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0), array('a'))").collect()
    }
    assert(e.getMessage.contains("array<float>") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
