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

  test("skewFk: deterministic zipf redirect with ~1/rank hot mass, FKs stay valid") {
    import spark.implicits._
    val n = 200000
    val hot = (1L to 8L).toSeq
    val src = (0 until n).map(i => (i.toLong, 1000L + i % 500)).toDF("pk", "fk")

    val a = ScaleUp.skewFk(src, "pk", "fk", hot, skewFrac = 0.3)
    val b = ScaleUp.skewFk(src, "pk", "fk", hot, skewFrac = 0.3)
    // value-hash decisions → identical output on re-run
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    val counts = a.groupBy("fk").count()
      .as[(Long, Long)].collect().toMap
    // redirected mass ≈ skewFrac (±2% at 200k rows)
    val hotMass = hot.map(counts.getOrElse(_, 0L)).sum.toDouble / n
    assert(hotMass > 0.27 && hotMass < 0.33, s"hot mass $hotMass")
    // zipf shape: rank 1 carries the largest share and at least 3× rank 8;
    // monotone non-increasing within sampling noise (ratio to next >= 0.8)
    val byRank = hot.map(counts.getOrElse(_, 0L))
    assert(byRank.head.toDouble / byRank.last > 3.0, s"not heavy-tailed: $byRank")
    byRank.sliding(2).foreach { case Seq(hi, lo) =>
      assert(lo.toDouble / hi < 1.2, s"rank mass not ~decreasing: $byRank")
    }
    // non-redirected rows keep their original fk; every fk is either
    // original or a hot key (referential integrity by construction)
    val fks = a.select("fk").distinct().as[Long].collect().toSet
    assert(fks.forall(k => (k >= 1000L && k < 1500L) || hot.contains(k)))
  }
}
