package graft.operators.dedup

import graft.operators.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (SURVEY §2
  * #25-29): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  * cosine.
  *
  * Scale architecture: near-dup detection is candidate generation
  * (LSH banding — shuffle keyed on (band, band_hash), bucket-local
  * pair expansion only) followed by exact verification on the
  * candidate pairs (a join back to the shingle sets by doc id). The
  * quadratic all-pairs path ([[NgramJaccard.allPairs]]) exists as the
  * correctness oracle and for small blocked domains; the LSH path is
  * the 100 TB route — its shuffle volume is O(docs × bands), never
  * O(docs²).
  */
object Dedup {

  /** Distinct character n-grams of the normalized text. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = TextOps.Fingerprint.normalized(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(0))),
      i => substring(t, i.cast("int"), lit(n))))
  }

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ---------------------------------------------------------------- #25
  /** Exact dedup: group by content fingerprint, keep the minimum doc id.
    * One hash-shuffle on the 128-bit fingerprint; group count and keeper
    * come out of the same aggregation.
    */
  object ExactDedup {
    def run(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
      df.select(col(idCol), md5(TextOps.Fingerprint.normalized(col(textCol))).as("fingerprint"))
        .groupBy("fingerprint")
        .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_doc_id"))
        .withColumn("n_duplicates", col("n_docs") - 1)
        .orderBy("keep_doc_id")

    def oracleSql(table: String): String =
      s"""SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
         |  count(*) AS n_docs, min(doc_id) AS keep_doc_id,
         |  count(*) - 1 AS n_duplicates
         |FROM $table GROUP BY 1 ORDER BY keep_doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- #28
  /** Exact n-gram Jaccard pair similarity. [[allPairs]] is O(n²) — the
    * verification oracle and the small-domain path; production candidate
    * generation is [[MinHashDedup.candidatePairs]].
    */
  object NgramJaccard {
    val N = 3

    def grams(df: DataFrame, textCol: String, idCol: String): DataFrame =
      df.select(col(idCol).as("gid"), charNgrams(col(textCol), N).as("grams"))

    def allPairs(df: DataFrame, threshold: Double,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
      val g = grams(df, textCol, idCol)
      val a = g.select(col("gid").as("doc_id_1"), col("grams").as("g1"))
      val b = g.select(col("gid").as("doc_id_2"), col("grams").as("g2"))
      a.join(b, col("doc_id_1") < col("doc_id_2"))
        .withColumn("jaccard_raw", jaccard(col("g1"), col("g2")))
        // filter on the unrounded value; round only for reporting
        .where(col("jaccard_raw") >= threshold)
        .select(col("doc_id_1"), col("doc_id_2"),
          round(col("jaccard_raw"), 4).as("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    }

    def oracleSql(table: String, threshold: Double): String =
      s"""WITH g AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - ${N - 1}, 0) + 1),
         |    i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i, $N))) AS grams
         |  FROM $table)
         |SELECT doc_id_1, doc_id_2, round(jaccard_raw, 4) AS jaccard FROM (
         |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |    CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS jaccard_raw
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id) t
         |WHERE jaccard_raw >= $threshold
         |ORDER BY doc_id_1, doc_id_2""".stripMargin
  }

  // ---------------------------------------------------------------- #26
  /** MinHash + LSH near-dup detection (Broder '97 / MMDS ch.3).
    *
    * numHashes=128 seeded xxhash64 functions; 16 bands × 8 rows. A pair
    * with Jaccard 0.9 is caught by ≥1 band with p ≈ 1-(1-0.9⁸)¹⁶ ≈
    * 0.9999. Candidates are verified with exact Jaccard, so bands only
    * affect recall, never precision.
    */
  object MinHashDedup {
    val NumHashes = 128
    val Bands = 16
    val Rows = NumHashes / Bands

    /** doc_id ("gid"), grams, and the 128-long minhash signature. */
    def signatures(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
      val g = NgramJaccard.grams(df, textCol, idCol)
      // base-hash once per shingle, then 128 cheap long re-hashes
      val baseHashes = transform(col("grams"), s => xxhash64(s))
      val sig = array((0 until NumHashes).map { i =>
        array_min(transform(col("h"), h => xxhash64(lit(i), h)))
      }: _*)
      g.withColumn("h", baseHashes).withColumn("sig", sig).drop("h")
    }

    /** Candidate pairs from LSH banding: explode each signature into
      * (band, band_hash) keys, shuffle on the key, pair within buckets.
      */
    def candidatePairs(sigDf: DataFrame): DataFrame = {
      val banded = sigDf.select(
        col("gid"),
        posexplode(array((0 until Bands).map { b =>
          xxhash64(slice(col("sig"), b * Rows + 1, Rows))
        }: _*)).as(Seq("band", "band_hash")))
      val l = banded.select(col("band"), col("band_hash"), col("gid").as("doc_id_1"))
      val r = banded.select(col("band"), col("band_hash"), col("gid").as("doc_id_2"))
      l.join(r, Seq("band", "band_hash"))
        .where(col("doc_id_1") < col("doc_id_2"))
        .select("doc_id_1", "doc_id_2")
        .distinct()
    }

    /** Full pipeline: LSH candidates, then exact-Jaccard verification
      * (join back to gram sets) — identical output schema to
      * [[NgramJaccard.allPairs]] but with O(docs × bands) shuffle.
      */
    def nearDuplicates(df: DataFrame, threshold: Double,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
      val g = NgramJaccard.grams(df, textCol, idCol)
      val cands = candidatePairs(signatures(df, textCol, idCol))
      cands
        .join(g.select(col("gid").as("doc_id_1"), col("grams").as("g1")), Seq("doc_id_1"))
        .join(g.select(col("gid").as("doc_id_2"), col("grams").as("g2")), Seq("doc_id_2"))
        .withColumn("jaccard_raw", jaccard(col("g1"), col("g2")))
        .where(col("jaccard_raw") >= threshold)
        .select(col("doc_id_1"), col("doc_id_2"),
          round(col("jaccard_raw"), 4).as("jaccard"))
        .orderBy("doc_id_1", "doc_id_2")
    }
  }

  // ---------------------------------------------------------------- #27
  /** SimHash (Charikar '02 / Manku et al. WWW'07): 64-bit signature from
    * token hashes; near-dups are pairs within Hamming distance
    * `maxHamming`, blocked on four 16-bit chunks (any pair within
    * distance ≤3 shares at least one intact chunk by pigeonhole when
    * distance < 4 bits spread over 4 chunks... a pair differing in ≤3
    * bits always has ≥1 identical chunk).
    */
  object SimHash {
    val ChunkBits = 16
    val Chunks = 4

    /** doc_id ("gid") + 64-bit simhash built from whitespace tokens. */
    def signatures(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
      df.select(col(idCol).as("gid"),
          expr(s"split(trim(lower($textCol)), '\\\\s+')").as("toks"))
        .withColumn("th", expr("transform(toks, t -> xxhash64(t))"))
        .withColumn("simhash", expr(
          """aggregate(sequence(0, 63), 0L, (acc, j) ->
            |  acc | IF(aggregate(th, 0L, (s, h) ->
            |        s + IF((shiftright(h, j) & 1) = 1, 1L, -1L)) > 0,
            |      shiftleft(1L, j), 0L))""".stripMargin))
        .drop("toks", "th")

    /** Near-dup pairs with Hamming distance ≤ maxHamming (default 3). */
    def hammingPairs(df: DataFrame, maxHamming: Int = 3,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
      val sigs = signatures(df, textCol, idCol)
      val chunked = sigs.select(
        col("gid"), col("simhash"),
        posexplode(array((0 until Chunks).map { c =>
          expr(s"shiftright(simhash, ${c * ChunkBits}) & 65535")
        }: _*)).as(Seq("chunk", "chunk_val")))
      val l = chunked.select(col("chunk"), col("chunk_val"),
        col("gid").as("doc_id_1"), col("simhash").as("s1"))
      val r = chunked.select(col("chunk"), col("chunk_val"),
        col("gid").as("doc_id_2"), col("simhash").as("s2"))
      l.join(r, Seq("chunk", "chunk_val"))
        .where(col("doc_id_1") < col("doc_id_2"))
        .select(col("doc_id_1"), col("doc_id_2"),
          expr("bit_count(s1 ^ s2)").as("hamming"))
        .distinct()
        .where(col("hamming") <= maxHamming)
        .orderBy("doc_id_1", "doc_id_2")
    }
  }

  // ---------------------------------------------------------------- #29
  /** Embedding cosine near-dup: exact pair cosine over `Array[Float]`
    * embeddings. All arithmetic in double, sequential fold order, so
    * results are deterministic. [[allPairs]] is the small-domain /
    * verification path; the scale path buckets by random-hyperplane LSH
    * first (graft.operators.similarity.LshAnn) and verifies only
    * in-bucket pairs.
    */
  object EmbeddingDedup {
    def cosine(a: Column, b: Column): Column = {
      def dbl(v: Column) = transform(v, x => x.cast("double"))
      val da = dbl(a); val db = dbl(b)
      val dot = aggregate(zip_with(da, db, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(da, lit(0.0), (acc, x) => acc + x * x))
      val nb = sqrt(aggregate(db, lit(0.0), (acc, x) => acc + x * x))
      dot / (na * nb)
    }

    def allPairs(df: DataFrame, threshold: Double,
                 vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
      val a = df.select(col(idCol).as("vec_id_1"), col(vecCol).as("e1"))
      val b = df.select(col(idCol).as("vec_id_2"), col(vecCol).as("e2"))
      a.join(b, col("vec_id_1") < col("vec_id_2"))
        .withColumn("cos_raw", cosine(col("e1"), col("e2")))
        .where(col("cos_raw") >= threshold)
        .select(col("vec_id_1"), col("vec_id_2"), round(col("cos_raw"), 4).as("cosine"))
        .orderBy("vec_id_1", "vec_id_2")
    }
  }
}
