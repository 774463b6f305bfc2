package graft.tools

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exploded scaler must keep the original unionAll-per-replica
  * semantics: `factor`× the rows, every key shifted by `replica *
  * Offset`, FK columns shifted in lockstep, non-key columns untouched.
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scaleTable multiplies rows and offsets keys per replica") {
    import spark.implicits._
    val src = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 10L, "c"))
      .toDF("pk", "fk", "payload")

    val out = ScaleUp.scaleTable(src, Seq("pk", "fk"), 4).cache()

    assert(out.count() === 12)
    // replica key ranges are disjoint → all 12 pks distinct
    assert(out.select("pk").distinct().count() === 12)

    val reps = out
      .where(col("payload") === "a")
      .select("pk", "fk")
      .as[(Long, Long)]
      .collect()
      .sortBy(_._1)
    assert(reps.length === 4)
    reps.zipWithIndex.foreach { case ((pk, fk), rep) =>
      assert(pk === 1L + rep * ScaleUp.Offset)
      assert(fk === 10L + rep * ScaleUp.Offset) // FK shifted in lockstep
    }
  }
}
