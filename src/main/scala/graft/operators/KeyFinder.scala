package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.parallel.CollectionConverters._

/** Minimal composite-key discovery — the reference's keyfinder tool.
  *
  * Reference semantics (dbqt/tools/keyfinder.py):
  *  - a column combination is a valid key iff its columns contain zero
  *    NULLs AND count(distinct combo) == count(*) (keyfinder.py:30-76);
  *  - combinations are searched size-ascending and the search STOPS at
  *    the first size that yields keys, so every reported key is minimal
  *    (keyfinder.py:178-181);
  *  - ID-looking columns (`id`, `*_id`, `id_*`, `*_id_*`) are prioritized
  *    in the candidate ordering (keyfinder.py:93-108).
  *
  * Spark-first: the reference issues 2 sequential SQL queries per
  * combination. Here each combination is ONE aggregation job — a
  * hash aggregate with map-side partial combine whose scan is pruned to
  * exactly the combination's columns — and all combinations of a size are
  * submitted CONCURRENTLY to the scheduler, so the cluster overlaps their
  * scans. A fused single-scan variant (multi-distinct aggregate) was
  * measured 10× slower at sf0.1 because Catalyst plans n distinct groups
  * as an Expand (row count × n) followed by a giant shuffle; per-combo
  * jobs shuffle only each combo's partial-agg output instead.
  *
  * Also measured and REJECTED (round 6, 60 M rows, 4 candidates,
  * maxKeySize 4): a single-scan `approx_count_distinct(struct(...))`
  * prefilter to skip exact jobs for combos far from unique. It has no
  * Expand problem, but it was ~20% SLOWER end-to-end (isolated min
  * 48.5 → 58.5 s): the concurrent exact jobs already overlap their
  * scans over the cached projection, so the fused HLL pass only adds a
  * serialized CPU-heavy multi-struct-hash scan whose savings don't
  * cover its cost at realistic combo counts.
  *
  * Re-measured at 600 M rows (round 9), rejection CONFIRMED with a
  * sharper reason: the sketch cannot prune near-keys. On the scaled
  * data every size-2+ combo is ≥99.9% unique (exact 599.94 M of
  * 600 M), while HLL at rsd 0.01 estimated 592–604 M — the 1% sketch
  * error is 100× larger than the non-uniqueness it would need to
  * resolve, so every combo stays inside any sound verification margin
  * and the exact jobs run anyway (the ~169 s of HLL passes would be
  * pure overhead on the ~723 s exact lattice). An HLL prefilter only
  * pays off when candidate combos are far from unique, which is
  * exactly when the profiler-style [[candidateReport]] is the right
  * tool instead.
  *
  * What DOES work (round 12, [[isKeyByHash]]): [[findMinimalKeys]] only
  * needs a key/non-key VERDICT, never the distinct count — and
  * `countDistinct(xxhash64(combo))` is a one-sided PROOF, not a sketch:
  * if the 64-bit hashes are all distinct the tuples must be, so
  * `hashDistinct == total` certifies a key exactly; a deficit larger
  * than [[HashDeficitBand]] certifies duplicates (collisions can only
  * LOWER the hash count, and >40 of them has probability < 10⁻³¹ at
  * 10¹⁰ rows); only the tiny ambiguous band re-runs the exact
  * tuple-distinct job. Measured at sf100 (BENCH_SF100.md round-12
  * section): local wall is flat — the value is the halved shuffle
  * WIRE bytes at cluster scale, and the exactness framing (witness,
  * not sketch) that the HLL path above lacks. [[candidateReport]]
  * keeps the exact count: its contract IS the number.
  */
object KeyFinder {

  /** keyfinder.py:93-101 — does the column name look like an ID? */
  def isIdColumn(name: String): Boolean = {
    val n = name.toLowerCase
    n == "id" || n.startsWith("id_") || n.endsWith("_id") || n.contains("_id_")
  }

  /** ID-like columns first, preserving relative order (keyfinder.py:104-108). */
  def prioritizeIdColumns(cols: Seq[String]): Seq[String] = {
    val (ids, rest) = cols.partition(isIdColumn)
    ids ++ rest
  }

  /** Candidate selection (keyfinder.py:217-233): optional include-only
    * filter, then exclusions, then cap at the first `maxColumns`.
    */
  def selectCandidates(allColumns: Seq[String], includeOnly: Seq[String] = Nil,
                       exclude: Seq[String] = Nil, maxColumns: Int = 20): Seq[String] = {
    val included =
      if (includeOnly.nonEmpty) allColumns.filter(includeOnly.contains) else allColumns
    included.filterNot(exclude.contains).take(maxColumns)
  }

  /** Σ C(n,k) for k=1..maxKeySize (keyfinder.py:111-123). BigInt
    * internally — the Long numerator product overflows around n=26,
    * which would let [[requireSearchable]]'s guard fail OPEN on exactly
    * the searches it exists to refuse — saturated to Long.MaxValue.
    */
  def totalCombinations(nColumns: Int, maxKeySize: Int): Long = {
    val total = (1 to math.min(maxKeySize, nColumns)).map { k =>
      (0 until k).map(i => BigInt(nColumns - i)).product /
        (1 to k).map(BigInt(_)).product
    }.sum
    if (total > Long.MaxValue) Long.MaxValue else total.toLong
  }

  /** The reference refuses searches over 50k combinations unless forced
    * (keyfinder.py:247-253) — same guard, as an exception the caller can
    * opt out of with force=true.
    */
  def requireSearchable(nColumns: Int, maxKeySize: Int, force: Boolean = false): Unit = {
    val total = totalCombinations(nColumns, maxKeySize)
    require(force || total <= 50000,
      s"$total combinations is very high; reduce candidates/max-size or pass force=true")
  }

  /** Stats for one combination. `nDistinct` counts distinct tuples with
    * all members non-null (SQL COUNT DISTINCT semantics) — identical to
    * the reference's GROUP-BY count whenever the combo has zero NULLs,
    * which is the only case where a combo can be a key.
    */
  final case class ComboStats(
      keyColumns: Seq[String], nDistinct: Long, nNulls: Long, totalRows: Long) {
    def isKey: Boolean = nNulls == 0 && nDistinct == totalRows
  }

  /** One aggregation job: scan pruned to `cb`'s columns, map-side partial
    * aggregate, tiny shuffle.
    */
  def comboStats(df: DataFrame, cb: Seq[String]): ComboStats = {
    val row = df
      .select(cb.map(col): _*)
      .agg(
        countDistinct(cb.head, cb.tail: _*).as("n_distinct"),
        sum(when(cb.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L)).as("n_nulls"),
        count(lit(1)).as("total_rows"))
      .collect()(0)
    ComboStats(cb,
      row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      row.getLong(2))
  }

  private def statsForSize(
      df: DataFrame, candidates: Seq[String], size: Int): Seq[ComboStats] =
    prioritizeIdColumns(candidates).combinations(size).toSeq
      .par.map(cb => comboStats(df, cb)).seq

  /** Run `f` against the candidate-column projection persisted in
    * memory: every combo job then aggregates from the cached columnar
    * batches instead of re-decoding parquet once per combination.
    * (At 100 TB the same pattern holds with MEMORY_AND_DISK /
    * executor-local spill; the projection is narrow — only the
    * candidate columns — so it is far smaller than the table.)
    */
  private def withCachedProjection[T](df: DataFrame, candidates: Seq[String])(
      f: DataFrame => T): T = {
    val proj = df.select(candidates.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(proj)
    finally proj.unpersist(blocking = false)
  }

  private val reportSchema = StructType(Seq(
    StructField("key_columns", StringType, nullable = false),
    StructField("key_size", IntegerType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("total_rows", LongType, nullable = false),
    StructField("is_key", BooleanType, nullable = false)))

  /** Full stats for every combination of `size` candidate columns, all
    * jobs submitted concurrently. Output: (key_columns, key_size,
    * n_distinct, n_nulls, total_rows, is_key), sorted by key_columns.
    */
  def candidateReport(spark: SparkSession, df: DataFrame, candidates: Seq[String], size: Int): DataFrame = {
    val rows = withCachedProjection(df, candidates) { proj =>
      statsForSize(proj, candidates, size)
    }.map(s => Row(s.keyColumns.mkString(","), size, s.nDistinct, s.nNulls, s.totalRows, s.isKey))
      .sortBy(_.getString(0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), reportSchema)
  }

  /** Ambiguity band for the hash-witness path in [[findMinimalKeys]].
    * `countDistinct(xxhash64(combo)) == count(*)` PROVES a key outright
    * (distinct hashes ⟹ distinct tuples — no probability involved); a
    * deficit can mean duplicates OR hash collisions, so only deficits
    * within this band fall back to the exact tuple-distinct job.
    * Expected collisions follow Poisson with λ = n²/2⁶⁵ (λ ≈ 0.01 at
    * 600 M rows, λ ≈ 2.7 at 10¹⁰ rows); P(collisions > 40) < 10⁻³¹
    * even at the 100 TB row count, so a deficit beyond the band is a
    * duplicate-tuple certificate to beyond-hardware-error confidence.
    */
  val HashDeficitBand = 40L

  /** Decision-only uniqueness test for one combo: an 8-byte hash
    * aggregate replaces the natural tuple-distinct aggregate, and only
    * an ambiguous deficit re-runs the exact job.
    *
    * What this buys and what it doesn't (round-12 isolated A/B at
    * sf100, 600 M rows, 10-combo lattice — BENCH_SF100.md): local
    * wall time is UNCHANGED (631 s tuple-distinct → 621 s hash — the
    * lattice is aggregate-CPU-bound, and the per-entry set cost of an
    * 8-byte long vs a two-long UnsafeRow is not the bottleneck). The
    * shuffle WIRE bytes halve (8-byte hashes vs multi-column tuples;
    * more for string members), which is the term that matters on a
    * real cluster's network — the same reasoning as q5's prefilter.
    * Also measured and REJECTED: routing the hash aggregate through
    * [[AggChoice.preAgg]] (repartition-first for the near-unique
    * combos, the q18/q21 zero-combine cure) came out 12% SLOWER
    * (704 s) — for a keyless countDistinct the map-side set build is
    * pipelined against the scan and the extra full-row exchange costs
    * more than the duplicated set build saves; q18's win does not
    * transfer to this shape. NOT used by
    * [[candidateReport]]/[[comboStats]], whose contract is the exact
    * distinct COUNT, not a key verdict.
    */
  private def isKeyByHash(proj: DataFrame, cb: Seq[String], total: Long): Boolean = {
    val hashed = proj.select(xxhash64(cb.map(col): _*).as("h"))
      .agg(countDistinct(col("h"))).collect()(0).getLong(0)
    if (hashed == total) true // distinct hashes certify distinct tuples
    else if (total - hashed > HashDeficitBand) false // real duplicates
    else // collisions possible: exact tuple-distinct decides
      proj.select(cb.map(col): _*)
        .agg(countDistinct(cb.head, cb.tail: _*))
        .collect()(0).getLong(0) == total
  }

  /** HLL prefilter margin (round-14, verdict-r13 #5): a combo whose
    * approx-distinct estimate falls below `PrefilterThreshold × total`
    * is pruned as a provable non-key without its exact job. At
    * [[PrefilterRsd]] = 0.02 the threshold sits 10 standard deviations
    * under a true key's expected estimate (a key's distinct count IS
    * total), so a wrongly-pruned key needs a 10σ HLL deviation —
    * beyond-hardware-error territory, same confidence class as
    * [[HashDeficitBand]]'s collision argument. Everything at-or-above
    * the threshold — including every true key and every near-key —
    * still gets the exact hash-witness job, so answers are unchanged;
    * the prefilter only deletes exact jobs for combos that are
    * overwhelmingly duplicate-heavy. The win is structural: ALL combos
    * of a size share ONE scan (HLL partials merge map-side, no
    * shuffle), where the exact path runs one full countDistinct job
    * per combo. Toggle: SPARK_GRAFT_KEYFINDER_PREFILTER=off (the
    * sf100 A/B lever; adopted after measuring — see BENCH_SF100.md).
    */
  val PrefilterRsd = 0.02
  val PrefilterThreshold = 0.8

  private def prefilterEnabled: Boolean =
    !sys.env.get("SPARK_GRAFT_KEYFINDER_PREFILTER").contains("off")

  /** ONE-pass approx-distinct for every combo of a size: returns the
    * combos whose estimate clears [[PrefilterThreshold]] — the only
    * ones whose exact uniqueness jobs still run.
    */
  private def plausibleByHll(proj: DataFrame, combos: Seq[Seq[String]],
                             total: Long): Seq[Seq[String]] = {
    if (combos.isEmpty) return combos
    val aggs = combos.zipWithIndex.map { case (cb, i) =>
      approx_count_distinct(xxhash64(cb.map(col): _*), PrefilterRsd).as(s"a_$i")
    }
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    val cut = (total * PrefilterThreshold).toLong
    combos.zipWithIndex.collect {
      case (cb, i) if row.getLong(i) >= cut => cb
    }
  }

  /** Round-15 A/B lever (verdict-r14 #6): fold ALL of a size's
    * surviving exact hash-witness jobs into ONE multi-countDistinct
    * aggregate. Catalyst plans n distinct groups as an Expand (n× the
    * rows) feeding one shuffle — the shape round 6 measured 10× slower
    * over TUPLES — but here every distinct argument is an 8-byte
    * xxhash64, so the expanded row is (gid, long) and the map-side
    * partial distinct dedups each group before the shuffle. One shared
    * scan replaces n scans of the cached projection. Verdict semantics
    * are identical: same hash counts, same [[HashDeficitBand]], same
    * exact fallback per ambiguous combo.
    * Toggle: SPARK_GRAFT_KEYFINDER_FUSED=on. Measured at sf100 and
    * REJECTED as the default (BENCH_SF100.md round 15): 599.6 s
    * per-combo vs 900.2 s fused — RewriteDistinctAggregates expands
    * 600 M rows × groups before the partial aggregate, and the
    * concurrent per-combo jobs already overlap their scans of the
    * cached projection, so the fused plan serializes ~3× the aggregate
    * work. The round-6 Expand verdict holds at the hash shape too.
    */
  private def fusedEnabled: Boolean =
    sys.env.get("SPARK_GRAFT_KEYFINDER_FUSED").contains("on")

  private[graft] def keysByHashFused(proj: DataFrame, combos: Seq[Seq[String]],
                                     total: Long): Seq[Seq[String]] = {
    if (combos.isEmpty) return Nil
    val aggs = combos.zipWithIndex.map { case (cb, i) =>
      countDistinct(xxhash64(cb.map(col): _*)).as(s"d_$i")
    }
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    combos.zipWithIndex.filter { case (cb, i) =>
      val hashed = row.getLong(i)
      if (hashed == total) true
      else if (total - hashed > HashDeficitBand) false
      else // collisions possible: exact tuple-distinct decides
        proj.select(cb.map(col): _*)
          .agg(countDistinct(cb.head, cb.tail: _*))
          .collect()(0).getLong(0) == total
    }.map(_._1)
  }

  /** Size-ascending minimal-key search with the reference's early stop:
    * the first size that yields any key wins and larger sizes are never
    * evaluated, so results are exactly the minimal keys.
    */
  def findMinimalKeys(
      spark: SparkSession,
      df: DataFrame,
      candidates: Seq[String],
      maxKeySize: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("key_columns", StringType, nullable = false),
      StructField("key_size", IntegerType, nullable = false)))
    val upper = math.min(maxKeySize, candidates.size)
    val ordered = prioritizeIdColumns(candidates)
    val found = withCachedProjection(df, candidates) { proj =>
      // ONE prefilter job: total rows + per-column null counts. A combo
      // containing any null-bearing column can never be a key
      // (keyfinder.py:30-76 checks nulls before distinct for the same
      // reason), so those combos skip their countDistinct job entirely.
      val pre = proj.agg(
        count(lit(1)).as("total"),
        candidates.map(c => sum(col(c).isNull.cast("long")).as(s"n_$c")): _*
      ).collect()(0)
      val total = pre.getLong(0)
      val nullCols = candidates.zipWithIndex
        .collect { case (c, i) if pre.getLong(i + 1) > 0 => c }.toSet
      (1 to upper).iterator.map { size =>
        val combos = ordered.combinations(size)
          .filter(_.forall(!nullCols.contains(_))).toSeq
        // one shared HLL pass deletes the exact jobs of overwhelmingly
        // duplicate-heavy combos; keys/near-keys always pass through
        val survivors =
          if (prefilterEnabled) plausibleByHll(proj, combos, total)
          else combos
        val keyCombos =
          if (fusedEnabled) keysByHashFused(proj, survivors, total)
          else survivors.par.filter(cb => isKeyByHash(proj, cb, total)).seq
        val keys = keyCombos.map(_.mkString(",")).sorted
        (size, keys)
      }.collectFirst { case (size, keys) if keys.nonEmpty => (size, keys) }
    }
    found match {
      case Some((size, keys)) =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(keys.map(k => Row(k, size)), 1), schema)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
  }

  /** Oracle-SQL generator mirroring [[candidateReport]] at size 1. */
  def size1OracleSql(tableName: String, candidates: Seq[String]): String = {
    val parts = prioritizeIdColumns(candidates).map { c =>
      s"""SELECT '$c' AS key_columns, 1 AS key_size,
         |  count(DISTINCT $c) AS n_distinct,
         |  count(*) - count($c) AS n_nulls,
         |  count(*) AS total_rows
         |FROM $tableName""".stripMargin
    }
    s"""SELECT key_columns, key_size, n_distinct, n_nulls, total_rows,
       |  (n_nulls = 0 AND n_distinct = total_rows) AS is_key
       |FROM (${parts.mkString("\n", "\nUNION ALL\n", "\n")}) t
       |ORDER BY key_columns""".stripMargin
  }

  /** Oracle-SQL generator mirroring [[findMinimalKeys]]: evaluates every
    * combination up to `maxKeySize` and keeps keys of the smallest size
    * that has any — the reference's early-stop rule expressed in SQL.
    */
  def minimalKeysOracleSql(
      tableName: String, candidates: Seq[String], maxKeySize: Int): String = {
    val ordered = prioritizeIdColumns(candidates)
    val stats = (1 to math.min(maxKeySize, candidates.size)).flatMap { size =>
      ordered.combinations(size).map { cb =>
        val key = cb.mkString(",")
        val notNull = cb.map(c => s"$c IS NOT NULL").mkString(" AND ")
        val anyNull = cb.map(c => s"$c IS NULL").mkString(" OR ")
        s"""SELECT '$key' AS key_columns, $size AS key_size,
           |  (SELECT count(*) FROM (SELECT DISTINCT ${cb.mkString(", ")}
           |     FROM $tableName WHERE $notNull) d) AS n_distinct,
           |  (SELECT count(*) FROM $tableName WHERE $anyNull) AS n_nulls,
           |  (SELECT count(*) FROM $tableName) AS total_rows""".stripMargin
      }
    }
    s"""WITH stats AS (${stats.mkString("\n", "\nUNION ALL\n", "\n")}),
       |keys AS (
       |  SELECT key_columns, key_size FROM stats
       |  WHERE n_nulls = 0 AND n_distinct = total_rows)
       |SELECT key_columns, key_size FROM keys
       |WHERE key_size = (SELECT min(key_size) FROM keys)
       |ORDER BY key_columns""".stripMargin
  }
}
