package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.similarity.Similarity
import graft.tools.ScaleUp

/** The round-14 probative-recall harness (verdict-r13 #2): on a
  * clustered anisotropic Gaussian distribution with NO exact
  * duplication (ScaleUp's `gauss` mode), approximate recall genuinely
  * degrades at low knob settings and the sweep exposes the recall/cost
  * curve. The old zipf distribution's 1000x exact-tie masses made
  * recall 1.0 achievable by construction — under-probative by design.
  */
class AnnSweepSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  // 2000 vectors over 256 anisotropic clusters (~8 members each, UNDER
  // k=10): true top-10 must cross cluster boundaries, so a low-probe
  // index genuinely misses — the probative regime (ScaleUp default)
  private lazy val corpus = {
    val ids = spark.range(2000).toDF("vec_id")
    ScaleUp.gaussEmbeddings(ids, dim = 64, nClusters = 256)
      .localCheckpoint(true)
  }
  private lazy val queries = corpus.where(col("vec_id") < 20)

  test("gauss embeddings are deterministic and duplication-free") {
    val again = ScaleUp.gaussEmbeddings(
      spark.range(2000).toDF("vec_id"), dim = 64, nClusters = 256)
    val a = corpus.orderBy("vec_id").collect().map(_.getSeq[Float](2))
    val b = again.orderBy("vec_id").collect().map(_.getSeq[Float](2))
    assert(a.zip(b).forall { case (x, y) => x == y }, "rerun must agree")
    // no two vectors identical (the property the zipf mode lacks)
    assert(a.map(_.toList).distinct.length == a.length)
    // clusters are real: same-cluster vectors are much closer than
    // cross-cluster ones on average
    val rows = corpus.collect().map(r =>
      (r.getInt(1), r.getSeq[Float](2).toArray))
    def dist(u: Array[Float], v: Array[Float]): Double =
      math.sqrt(u.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
    val byCluster = rows.groupBy(_._1)
    val within = byCluster.values.filter(_.length >= 2).take(20)
      .map(g => dist(g(0)._2, g(1)._2)).sum / 20
    val cross = rows.take(40).sliding(2).collect {
      case Array((c1, v1), (c2, v2)) if c1 != c2 => dist(v1, v2)
    }.toSeq
    assert(within < cross.sum / cross.length / 2,
      s"within-cluster $within should be far under cross-cluster ${cross.sum / cross.length}")
  }

  test("recall sweep: monotone in the knob, degraded at the low end, strong at the high end") {
    val rows = Similarity.RecallReport.sweep(corpus, queries, k = 10, dim = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(6))
      .toMap
    def curve(m: String, p: String, vs: Seq[Int]) = vs.map(v => rows((m, p, v)))

    val ivf = curve("ivf", "nProbe", Seq(1, 2, 4, 8))
    val lsh = curve("lsh", "tables", Seq(1, 2, 4, 8))
    val pq = curve("pq", "ksub", Seq(4, 8, 16))
    val pqRefine = curve("pq", "refine", Seq(16, 64, 256))
    info(s"ivf=$ivf lsh=$lsh pq=$pq pqRefine=$pqRefine")

    // candidate-superset methods are monotone non-decreasing: a vector
    // displaced from the approx top-k by a better-scoring candidate is
    // only displaced by another ground-truth member
    assert(ivf == ivf.sorted, s"ivf curve not monotone: $ivf")
    assert(lsh == lsh.sorted, s"lsh curve not monotone: $lsh")

    // the distribution is probative: the low-knob end genuinely
    // degrades (the zipf corpus pinned 1.0 everywhere)
    assert(ivf.head < 0.95, s"ivf nProbe=1 recall ${ivf.head} — distribution too easy")
    assert(lsh.head < 0.95, s"lsh tables=1 recall ${lsh.head}")

    // and the knobs genuinely buy recall back (floors measured on this
    // seeded corpus with margin; a regression that flattens the curve
    // or collapses the index shows up here)
    assert(ivf.last >= 0.7, s"ivf nProbe=8 recall ${ivf.last}")
    assert(pq.last >= 0.6, s"pq ksub=16 recall ${pq.last}")
    assert(ivf.last > ivf.head, "more probes must buy recall on this corpus")

    // refine is PQ's tie-mass knob (candidate-superset ⇒ monotone):
    // the curve must be non-decreasing and reach at least the ksub
    // curve's ceiling on this corpus
    assert(pqRefine == pqRefine.sorted, s"pq refine curve not monotone: $pqRefine")
    assert(pqRefine.last >= pq.last,
      s"refine=256 (${pqRefine.last}) should not trail ksub=16 (${pq.last})")

    // IVF-PQ (round-14): nProbe is a candidate-superset knob ⇒
    // monotone; refine/ksub grids mirror plain PQ's so the sf100-gauss
    // exhibit compares the quantizers directly (the residual-coding
    // win itself is pinned by the isolated test below, where the probe
    // effect is held fixed)
    val ivfpqRefine = curve("ivfpq", "refine", Seq(16, 64, 256))
    val ivfpqKsub = curve("ivfpq", "ksub", Seq(16, 64, 256))
    val ivfpqProbe = curve("ivfpq", "nProbe", Seq(1, 2, 4, 8))
    info(s"ivfpqRefine=$ivfpqRefine ivfpqKsub=$ivfpqKsub ivfpqProbe=$ivfpqProbe")
    assert(ivfpqProbe == ivfpqProbe.sorted,
      s"ivfpq nProbe curve not monotone: $ivfpqProbe")
    assert(ivfpqRefine == ivfpqRefine.sorted,
      s"ivfpq refine curve not monotone: $ivfpqRefine")
    assert(ivfpqRefine.head >= 0.7, s"ivfpq refine=16 recall ${ivfpqRefine.head}")
  }

  test("residual coding beats absolute-position coding at equal candidate budget") {
    // isolate the CODING difference from the probe effect: probe ALL
    // cells (nProbe = nCells), shrink the candidate budget to refine=1
    // so ADC ranking quality is what decides recall. Plain PQ codes
    // absolute positions (a tight cluster collapses to few codes —
    // ADC ties starve the re-rank); IVF-PQ codes residuals, which stay
    // spread inside each cell. On this corpus (k=10 spans clusters)
    // the difference must show at the tight budget.
    val truth = Similarity.CosineTopK.run(corpus, queries, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id").collect()
        .count(r => truth((r.getLong(0), r.getLong(1)))).toDouble / truth.size
    val pq1 = recall(Similarity.PqAnn.topK(corpus, queries, 10, refine = 1))
    val ivfpq1 = recall(Similarity.IvfPqAnn.topK(corpus, queries, 10,
      nCells = 32, nProbe = 32, refine = 1))
    info(s"refine=1 all-cells: pq=$pq1 ivfpq=$ivfpq1")
    assert(ivfpq1 > pq1,
      s"residual ADC ($ivfpq1) must out-rank absolute-position ADC ($pq1) at refine=1")
  }

  // ---- the gate's gauss fixture (verdict-r14 #8) ----

  test("deriveClustered: deterministic, genuinely clustered, and the gate row carries floors") {
    import graft.sources.Tables
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    val g = Similarity.deriveClustered(emb).localCheckpoint(true)
    // deterministic: rerun agrees row-for-row
    val again = Similarity.deriveClustered(emb)
    assert(g.orderBy("vec_id").collect().toSeq ==
      again.orderBy("vec_id").collect().toSeq)
    // clustered: same-center members are closer than cross-center
    val rows = g.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def cos(u: Array[Float], v: Array[Float]): Double = {
      var d = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
      while (i < u.length) { d += u(i) * v(i); nu += u(i) * u(i); nv += v(i) * v(i); i += 1 }
      d / math.sqrt(nu * nv)
    }
    val byCenter = rows.groupBy(_._1 % 40)
    val within = byCenter.values.filter(_.length >= 2).take(20)
      .map(gr => cos(gr(0)._2, gr(1)._2)).sum / 20
    val cross = cos(rows(0)._2, rows(1)._2) // centers 0 and 1
    assert(within > 0.9, s"in-cluster cosine $within must be high")
    assert(within > cross + 0.1, s"in-cluster $within vs cross $cross")
    // the gate row: recall floors the driver can trend (same call as
    // SparkEntry's ann_recall_gauss). Floors are measured steady-state
    // MINUS a stated 0.05 margin (verdict-r15 #3 — the old 0.8/0.5
    // floors were slack enough to hide a severe regression): at this
    // fixture (500 vectors, 5 queries, 40 centers) every method reads
    // 1.00 — the pipeline is seeded and the derivation deterministic,
    // so anything below 0.95 is a real ranking change, not noise.
    val nc = Similarity.DefaultClusterCenters
    val rep = Similarity.RecallReport.run(g,
      g.where(col("vec_id") >= nc && col("vec_id") < nc + 5), 10, dim = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    info(s"gauss recall: $rep")
    assert(rep.keySet == Set("ivf", "ivfpq", "lsh", "pq"))
    for ((m, floor) <- Seq("lsh" -> 0.95, "ivf" -> 0.95, "pq" -> 0.95, "ivfpq" -> 0.95))
      assert(rep(m) >= floor, s"$m recall ${rep(m)} under tightened floor $floor " +
        "(measured steady-state 1.00 − 0.05 margin)")
  }

  test("gauss recall floors at the bench scale (sf0.1, 2000 vectors): measured − 0.05") {
    import graft.sources.Tables
    // the more probative leg: at 2000 vectors the PQ family's measured
    // steady-state is 0.86 (tie-regime, documented in the IvfPqAnn
    // scaladoc), ivf/lsh 1.00 — floors pinned at measured − 0.05 so a
    // ≥0.05 regression trips here even when the 500-vector fixture
    // stays saturated
    val nc = Similarity.DefaultClusterCenters
    val g = Similarity.deriveClustered(
      Tables(spark, "/root/testdata/sf0.1", "embeddings")).localCheckpoint(true)
    val rep = Similarity.RecallReport.run(g,
      g.where(col("vec_id") >= nc && col("vec_id") < nc + 5), 10, dim = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    info(s"gauss recall sf0.1: $rep")
    for ((m, floor) <- Seq("lsh" -> 0.95, "ivf" -> 0.95, "pq" -> 0.81, "ivfpq" -> 0.81))
      assert(rep(m) >= floor, s"$m recall ${rep(m)} under floor $floor " +
        "(measured steady-state − 0.05 margin)")
  }

  test("deriveClustered: an id space with missing center ids fails loudly, never shrinks silently (advice-r15)") {
    val s = spark
    import s.implicits._
    // ids 100.. : no ids below nCenters, so every residue group would
    // lose its center row through the inner join — the old behavior was
    // an EMPTY derived corpus and a quietly meaningless gate row
    val shifted = (100L until 300L).map(i =>
      (i, Array.tabulate(64)(j => (i + j).toFloat % 7))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.deriveClustered(shifted).count())
    assert(e.getMessage.contains("cluster centers"))
    // partial coverage (some center ids missing) fails the same way
    val gappy = ((0L until 20L) ++ (100L until 200L)).map(i =>
      (i, Array.tabulate(64)(j => (i + j).toFloat % 7))).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](
      Similarity.deriveClustered(gappy).count())
    assert(e2.getMessage.contains("cluster centers"))
  }

  test("AnnAdvisor: flags sub-resolution duplicate balls, passes discriminating cells") {
    // 2000 copies of ONE vector (a sub-resolution near-dup ball) plus
    // 1000 spread gauss vectors: the ball's cell must be flagged, the
    // spread cells must read ivfpq_fine
    val ball = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
    val dup = spark.range(2000).toDF("vec_id")
      .withColumn("embedding",
        array(ball.map(x => lit(x)): _*).cast("array<float>"))
    val spread = ScaleUp.gaussEmbeddings(
      spark.range(2000, 3000).toDF("vec_id"), dim = 64, nClusters = 200)
      .select(col("vec_id"), col("embedding"))
    val report = Similarity.AnnAdvisor.run(dup.unionAll(spread), k = 1)
      .collect()
    val byAdvice = report.groupBy(_.getString(5))
    info(s"advisor: ${report.length} cells, advice mix ${byAdvice.view.mapValues(_.length).toMap}")
    // the ball: one cell holds >= 2000 vectors under one code
    val flagged = report.filter(r => r.getLong(4) >= 2000)
    assert(flagged.nonEmpty, "the duplicate ball must dominate one cell")
    assert(flagged.forall(_.getString(5) == "use_ivf_or_dedup"),
      s"ball advice: ${flagged.map(_.getString(5)).toSeq}")
    // spread cells discriminate
    assert(report.count(_.getString(5) == "ivfpq_fine") >= 5,
      "spread cells must read ivfpq_fine")
  }

  test("advisor-driven per-cell refine recovers tie-starved recall (the control loop, verdict-r15 #4)") {
    val s = spark
    import s.implicits._
    // the measured sf100-gauss failure regime, reproduced small: many
    // tight clusters forced into FEW coarse cells (nCells=2), so the
    // shared residual codebooks spend their resolution separating
    // clusters and every cluster collapses to one code — a ~150-member
    // ADC tie block per cluster. A fixed refine·k=40 pool truncates the
    // tie block by vec_id, so the exact re-rank sees a near-random 40
    // of 150 and recall starves; the advisor's raise_refine_to_N names
    // the pool that covers the block.
    val rng = new scala.util.Random(77L)
    val corpus = (0 until 20).flatMap { c =>
      val center = Array.fill(64)(rng.nextGaussian())
      (0 until 150).map { m =>
        (c * 150L + m, center.map(x => (x + 0.002 * rng.nextGaussian()).toFloat))
      }
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val queries = corpus.where(col("vec_id") % 150 === 7 && col("vec_id") < 750)
    val truth = Similarity.CosineTopK.run(corpus, queries, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id").collect()
        .count(r => truth((r.getLong(0), r.getLong(1)))).toDouble / truth.size

    val report = Similarity.AnnAdvisor.run(corpus, k = 10, nCells = 2)
    val overrides = Similarity.AnnAdvisor.refineOverrides(report)
    info(s"overrides: $overrides")
    assert(overrides.nonEmpty, "the tie regime must produce raise_refine_to_N advice")
    assert(overrides.values.forall(n => n >= 10 && n <= 40),
      s"N must cover a ~150..~400-member tie block at k=10: $overrides")

    val base = recall(Similarity.IvfPqAnn.topK(corpus, queries, 10, nCells = 2))
    val advised = recall(Similarity.IvfPqAnn.topK(corpus, queries, 10,
      nCells = 2, cellRefine = overrides))
    info(s"recall base=$base advised=$advised")
    assert(advised >= base + 0.25,
      s"advised pool must materially lift tie-starved recall: $base -> $advised")
    assert(advised >= 0.9, s"covered tie block must recover recall: $advised")

    // deployment shape: the same loop against a persisted index —
    // advise on STORED codes (no retrain), feed the overrides back
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_ctl").toString
    graft.operators.similarity.IvfPqIndex.build(corpus, dir, nCells = 2)
    val storedOverrides = Similarity.AnnAdvisor.refineOverrides(
      graft.operators.similarity.IvfPqIndex.advise(spark, dir, k = 10))
    assert(storedOverrides == overrides,
      "stored-code advice must equal in-memory advice (seeded training)")
    val persisted = recall(graft.operators.similarity.IvfPqIndex.topK(
      dir, corpus, queries, 10, cellRefine = storedOverrides))
    assert(persisted == advised, s"persisted advised recall $persisted != $advised")
  }

  test("ann_advised_recall gate row: advised ≥ default + margin on the tie-starved fixture (verdict-r16 #5)") {
    val s = spark
    import s.implicits._
    // the same tie-starved regime as the control-loop test above: 20
    // tight clusters in 2 coarse cells, fixed refine·k truncates each
    // ~150-member ADC tie block
    val rng = new scala.util.Random(77L)
    val corpus = (0 until 20).flatMap { c =>
      val center = Array.fill(64)(rng.nextGaussian())
      (0 until 150).map { m =>
        (c * 150L + m, center.map(x => (x + 0.002 * rng.nextGaussian()).toFloat))
      }
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val queries = corpus.where(col("vec_id") % 150 === 7 && col("vec_id") < 750)
    val rep = Similarity.AnnAdvisor.advisedRecall(corpus, queries, 10, nCells = 2)
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getLong(4), r.getDouble(5))).toMap
    info(s"advisedRecall: $rep")
    assert(rep.keySet == Set("advised", "default"))
    val (nOverrides, _, advised) = rep("advised")
    val default = rep("default")._3
    assert(nOverrides > 0, "the tie regime must produce overrides")
    // the advised pool is a candidate superset of the default pool, so
    // recall is monotone; on this fixture the lift is material
    // (measured default ~0.3, advised ~1.0 — floors with margin)
    assert(advised >= default, s"advised $advised under default $default")
    assert(advised >= default + 0.25,
      s"advised pool must materially lift tie-starved recall: $default -> $advised")
    assert(advised >= 0.9, s"covered tie block must recover recall: $advised")
    // the gate fixture leg (sf0.001-derived gauss, the exact SparkEntry
    // call): saturated regime — both variants at ceiling, advised never
    // below default
    import graft.sources.Tables
    val nc = Similarity.DefaultClusterCenters
    val g = Similarity.deriveClustered(Tables(spark, TestSpark.sf0001, "embeddings"))
    val gate = Similarity.AnnAdvisor.advisedRecall(g,
      g.where(col("vec_id") >= nc && col("vec_id") < nc + 5), 10)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    info(s"gate fixture advisedRecall: $gate")
    assert(gate("advised") >= gate("default"),
      s"advised ${gate("advised")} under default ${gate("default")}")
    assert(gate("advised") >= 0.95,
      s"gate fixture advised recall ${gate("advised")} (measured 1.00 − 0.05 margin)")
  }

  test("AnnAdvisor: middle arm names the refine target that covers the tie block") {
    // same duplicate ball, but at k=10 the pool only needs
    // ceil(2000/10) = 200 candidates — the advice must be the concrete
    // refine number, not the give-up arm
    val ball = Array.tabulate(64)(i => math.cos(i * 0.3).toFloat)
    val dup = spark.range(2000).toDF("vec_id")
      .withColumn("embedding",
        array(ball.map(x => lit(x)): _*).cast("array<float>"))
    val spread = ScaleUp.gaussEmbeddings(
      spark.range(2000, 3000).toDF("vec_id"), dim = 64, nClusters = 200)
      .select(col("vec_id"), col("embedding"))
    val report = Similarity.AnnAdvisor.run(dup.unionAll(spread), k = 10)
      .collect()
    val flagged = report.filter(r => r.getLong(4) >= 2000)
    assert(flagged.nonEmpty, "the duplicate ball must dominate one cell")
    flagged.foreach { r =>
      val expected = s"raise_refine_to_${(r.getLong(4) + 9) / 10}"
      assert(r.getString(5) == expected,
        s"cell ${r.getInt(0)}: ${r.getString(5)} != $expected")
    }
  }
}
