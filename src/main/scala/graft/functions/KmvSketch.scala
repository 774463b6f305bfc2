package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * [[Aggregator]] — the custom-AGGREGATE extension point (a scalar
  * Expression covers per-row functions; this covers per-group state
  * with map-side partial aggregation and mergeable buffers).
  *
  * Sketch: keep the k smallest 64-bit hashes seen; the distinct-count
  * estimate is (k−1) / normalized(kth-min). Buffers merge by keeping
  * the k smallest of the union, so partial aggregation and shuffle
  * behave exactly like any builtin agg. Standard error ≈ 1/√(k−2)
  * (~4.6% at k=512). Unlike approx_count_distinct's HLL, two KMV
  * sketches also estimate INTERSECTION sizes (Beyer et al.,
  * SIGMOD'07), which is what cross-table join-cardinality estimation
  * at 100 TB needs.
  */
object KmvSketch {

  val DefaultK = 512

  /** Sorted array of the k smallest hashes (ascending). */
  final case class Sketch(k: Int, mins: Array[Long]) {
    /** Hash normalized to (0,1]: position of h in the unsigned 2^64 space. */
    private def unit(h: Long): Double = (h.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)
    def estimate: Double =
      if (mins.length < k) mins.length.toDouble // exact below k distinct
      else (k - 1) / unit(mins.last)
    /** Jaccard estimate from the k smallest of the UNION of both mins. */
    def jaccardEstimate(other: Sketch): Double = {
      val union = (mins ++ other.mins).distinct.sorted.take(k)
      val a = mins.toSet; val b = other.mins.toSet
      union.count(h => a(h) && b(h)).toDouble / union.length
    }
  }

  final class KmvAggregator(k: Int) extends Aggregator[java.lang.Long, Array[Long], Sketch] {
    override def zero: Array[Long] = Array.empty
    // NULL inputs are skipped — COUNT(DISTINCT)/approx_count_distinct
    // semantics (sketch() null-gates before hashing so nulls arrive
    // here as null, not as xxhash64's constant seed hash).
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) buf else insert(buf, h.longValue())
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(insert)
    override def finish(buf: Array[Long]): Sketch = Sketch(k, buf)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]

    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val idx = java.util.Arrays.binarySearch(buf, h)
      if (idx >= 0) buf // already present (distinct hashes only)
      else {
        val ins = -idx - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins >= k) buf // larger than current kth min
        else {
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        }
      }
    }
  }

  /** Sketch of xxhash64-hashed values of a column, usable in any agg:
    * df.groupBy(...).agg(KmvSketch.sketch(col("x"))). NULLs are ignored
    * (as in COUNT(DISTINCT)): xxhash64(NULL) would otherwise hash to
    * the constant seed and count as one phantom distinct value.
    */
  def sketch(c: Column, k: Int = DefaultK): Column = {
    import org.apache.spark.sql.functions.{when, xxhash64}
    udaf(new KmvAggregator(k), Encoders.LONG)
      .apply(when(c.isNotNull, xxhash64(c)))
  }
}
