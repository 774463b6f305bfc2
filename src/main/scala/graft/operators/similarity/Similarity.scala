package graft.operators.similarity

import graft.operators.dedup.Dedup.EmbeddingDedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2 #30-31).
  *
  * [[CosineTopK]] is the exact baseline: score every (query, corpus)
  * pair, keep top-k per query. The rank<=k filter compiles to Spark's
  * WindowGroupLimit (3.5+), which keeps only each input partition's
  * local top-k per query BEFORE the shuffle — the shuffle carries
  * O(partitions × queries × k) rows, not O(queries × corpus).
  *
  * [[LshAnn]] is the scale path: random-hyperplane LSH (Charikar '02).
  * Corpus and queries are bucketed by sign-bit signatures under L
  * independent tables; only same-bucket pairs are scored. Shuffle is
  * keyed on (table, bucket) — O(rows × L), never O(rows²). Candidates
  * are verified with exact cosine, so buckets affect recall only,
  * never precision of the returned scores.
  */
object Similarity {

  /** Exact brute-force top-k by cosine. Queries broadcast (small side). */
  object CosineTopK {
    def run(corpus: DataFrame, queries: DataFrame, k: Int,
            vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
        .withColumn("cos_raw", EmbeddingDedup.cosine(col("qv"), col("cv")))
      rankTopK(scored, k)
    }

    /** rank over (cos desc, vec_id) — unique tie-break, and the filter
      * becomes a WindowGroupLimit partial limit per input partition.
      */
    private[similarity] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
      val w = Window.partitionBy("query_id").orderBy(col("cos_raw").desc, col("vec_id"))
      scored.withColumn("rank", rank().over(w).cast("int"))
        .where(col("rank") <= k)
        .select(col("query_id"), col("vec_id"),
          round(col("cos_raw"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    }

    def oracleSql(table: String, k: Int, nQueries: Int): String =
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM $table WHERE vec_id < $nQueries),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM $table),
         |scored AS (
         |  SELECT query_id, vec_id, list_cosine_similarity(qv, cv) AS cos_raw
         |  FROM q JOIN c ON query_id <> vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos_raw,
         |    CAST(rank() OVER (PARTITION BY query_id
         |      ORDER BY cos_raw DESC, vec_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, round(cos_raw, 4) AS cosine, rank
         |FROM ranked WHERE rank <= $k
         |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into
    * `nCells` k-means cells (MLlib KMeans on L2-normalized vectors ≈
    * spherical k-means, fixed seed), then answer each query by probing
    * only its `nProbe` nearest cells and exact-cosine-ranking the
    * candidates inside them.
    *
    * Scale shape: training touches a bounded sample; assignment is one
    * map-side pass; the query-side shuffle is keyed on cell id —
    * O(corpus) once + O(queries × nProbe × cellSize) scoring, never
    * O(queries × corpus). The centroid table (nCells × dim) is tiny
    * and broadcast. Recall is governed by nProbe — the standard IVF
    * trade-off — and returned scores are always exact.
    */
  object IvfAnn {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val Seed = 42L
    val MaxTrainRows = 100000L

    def topK(corpus: DataFrame, queries: DataFrame, k: Int,
             nCells: Int = 32, nProbe: Int = 4,
             vecCol: String = "embedding", idCol: String = "vec_id",
             maxTrain: Long = MaxTrainRows): DataFrame = {
      val spark = corpus.sparkSession
      val norm = {
        val v = col(vecCol)
        val n2 = sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x))
        transform(v, x => (x.cast("double") / n2))
      }
      val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_v"),
        array_to_vector(norm).as("features"))
      // coarse quantization doesn't need converged centroids — 8 Lloyd
      // iterations on a bounded sample give the same recall at a
      // fraction of the training cost (and keep training O(sample), not
      // O(corpus), at scale)
      // random init (not k-means||): the parallel init alone costs more
      // passes than the 8 Lloyd iterations, and coarse-quantization
      // recall is insensitive to init quality
      // training sample selected by VALUE (hash of the id), never by
      // partition layout: limit()/sample() change contents when file
      // splits shift, which would silently change trained centroids —
      // and thus recall — between cluster runs over the same data
      val n = c.count()
      val train =
        if (n <= maxTrain) c
        else c.where(pmod(xxhash64(col("corpus_id")),
          lit((n + maxTrain - 1) / maxTrain)) === 0)
      val model = new KMeans().setK(nCells).setSeed(Seed).setFeaturesCol("features")
        .setInitMode("random").setMaxIter(8)
        .fit(train)
      val assigned = model.transform(c).withColumnRenamed("prediction", "cell")
        .select("corpus_id", "corpus_v", "cell")

      // centroid table: tiny, broadcast into the query-side scoring
      val centroids = spark.createDataFrame(
        model.clusterCenters.zipWithIndex.map { case (ctr, i) =>
          (i, ctr.toArray.map(_.toFloat))
        }.toSeq).toDF("cell", "centroid")
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
      val probed = q.crossJoin(broadcast(centroids))
        .withColumn("cdist", EmbeddingDedup.cosine(col("query_v"), col("centroid")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("cdist").desc, col("cell"))
      val cells = probed.withColumn("r", rank().over(w)).where(col("r") <= nProbe)
        .select("query_id", "query_v", "cell")

      // every corpus vector lives in exactly one cell, so (query, vec)
      // candidates are already unique — no dedup shuffle needed
      val scored = cells.join(assigned, Seq("cell"))
        .where(col("query_id") =!= col("corpus_id"))
        .withColumn("cos_raw", EmbeddingDedup.cosine(col("query_v"), col("corpus_v")))
        .withColumnRenamed("corpus_id", "vec_id")
      CosineTopK.rankTopK(scored, k)
    }
  }

  /** Random-hyperplane LSH ANN. Hyperplanes are derived from a fixed
    * seed, so plans are deterministic and resumable.
    */
  object LshAnn {
    val DefaultBits = 8
    val DefaultTables = 8
    val Seed = 42L

    /** tables × bits hyperplanes, each a `dim`-long unit-free gaussian. */
    def hyperplanes(dim: Int, bits: Int = DefaultBits,
                    tables: Int = DefaultTables, seed: Long = Seed): Seq[Seq[Array[Double]]] = {
      val rng = new scala.util.Random(seed)
      Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rng.nextGaussian())))
    }

    /** Per-table bucket ids: the integer formed by the sign bits of the
      * vector's projections onto that table's hyperplanes. Typed
      * mapPartitions kernel — tables×bits×dim multiply-adds per row
      * must be a JIT'd loop, not interpreted Catalyst lambdas (the
      * higher-order-function formulation measured ~10× slower at sf0.1).
      */
    private[graft] def withBuckets(df: DataFrame, side: String,
                            planes: Seq[Seq[Array[Double]]],
                            vecCol: String, idCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val planeArr = planes.map(_.toArray).toArray
      df.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
        .mapPartitions { it =>
          it.map { case (id, v) =>
            val buckets = new Array[Long](planeArr.length)
            var t = 0
            while (t < planeArr.length) {
              var b = 0L
              var j = 0
              while (j < planeArr(t).length) {
                val pl = planeArr(t)(j)
                var dot = 0.0
                var d = 0
                while (d < pl.length && d < v.length) { dot += v(d) * pl(d); d += 1 }
                if (dot > 0) b |= 1L << j
                j += 1
              }
              buckets(t) = b
              t += 1
            }
            (id, v, buckets)
          }
        }.toDF(s"${side}_id", s"${side}_v", "buckets")
        .select(col(s"${side}_id"), col(s"${side}_v"),
          posexplode(col("buckets")).as(Seq("tbl", s"${side}_bucket")))
    }

    /** ANN top-k: same-bucket candidates under any of the L tables,
      * verified with exact cosine, ranked per query.
      */
    def topK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
             bits: Int = DefaultBits, tables: Int = DefaultTables,
             vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
      val planes = hyperplanes(dim, bits, tables)
      def bucketed(df: DataFrame, side: String) =
        withBuckets(df, side, planes, vecCol, idCol)
      val c = bucketed(corpus, "corpus")
      val q = bucketed(queries, "query")
      val cands = q.join(c,
          q("tbl") === c("tbl") && q("query_bucket") === c("corpus_bucket") &&
            col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("query_v"), col("corpus_id"), col("corpus_v"))
        .dropDuplicates("query_id", "corpus_id")
      val scored = cands
        .withColumn("cos_raw", EmbeddingDedup.cosine(col("query_v"), col("corpus_v")))
        .withColumnRenamed("corpus_id", "vec_id")
      CosineTopK.rankTopK(scored, k)
    }
  }
}
