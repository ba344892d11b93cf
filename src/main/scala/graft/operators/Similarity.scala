package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exact baseline and a random-hyperplane
  * LSH-bucketed variant as the 100 TB path.
  *
  * Vector math is row-local `zip_with`/`aggregate` over doubles (folded
  * left-to-right inside the row ⇒ deterministic IEEE results), kept inside
  * whole-stage codegen — no UDFs.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: the `queries` side (small, e.g. a
    * probe batch) is broadcast against the corpus; ranking partitions by
    * query so parallelism = number of queries × AQE splits. Emits
    * `(query_id, rank, vec_id)` — ranks only, floats stay internal, so
    * results are engine-comparable.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = corpus
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        cosine(col("qvec"), col(vecCol)).as("sim"))
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
  }

  /** Deterministic random hyperplanes: `planes × dim` doubles seeded by a
    * splitmix64-style hash — reproducible across sessions, no RNG state.
    */
  private[operators] def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      var z = seed + 0x9e3779b97f4a7c15L * (p.toLong * dim + d + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      // map to [-1, 1): sign-symmetric, fine for hyperplane directions
      (z.toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-bit bucket of a vector under `planes` random hyperplanes: bit p =
    * 1 iff `v · h_p > 0`. Row-local; the hyperplane matrix rides along as a
    * literal (broadcast by the plan, tiny: planes × dim doubles).
    */
  def lshBucket(vec: Column, planes: Int, dim: Int, seed: Long = 42L): Column = {
    val hp = hyperplanes(planes, dim, seed)
    val planeLits = array(hp.map(row => array(row.map(lit(_)): _*)): _*)
    aggregate(
      zip_with(planeLits, sequence(lit(0), lit(planes - 1)),
        (h, p) => when(dot(vec, h) > 0, pow(lit(2.0), p).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** ANN top-k via hyperplane LSH with multi-probe across `tables`
    * independent hash tables: vectors and queries are bucketed row-locally,
    * candidates come from per-(table, bucket) joins — each bucket holds
    * ~corpus/2^planes vectors, so the join is narrow and shuffle-bounded —
    * then exact cosine ranks the union of candidates. Recall grows with
    * `tables`; cost stays O(candidates) instead of O(corpus) per query.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, vid: String, vcol: String): DataFrame =
      df.select(col(vid), col(vcol),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col(vcol), planes, dim, seed = 42L + t)): _*))
          .as(Seq("table_idx", "bucket")))
    val c = bucketed(corpus.select(col(idCol), col(vecCol)), idCol, vecCol).as("c")
    val q = bucketed(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
      "query_id", "qvec").as("q")
    val candidates = c.join(broadcast(q),
        col("c.table_idx") === col("q.table_idx") &&
          col("c.bucket") === col("q.bucket") &&
          col(s"c.$idCol") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col(s"c.$idCol").as(idCol),
        col("q.qvec").as("qvec"), col(s"c.$vecCol").as(vecCol))
      .dropDuplicates("query_id", idCol)
    candidates
      .select(col("query_id"), col(idCol),
        cosine(col("qvec"), col(vecCol)).as("sim"))
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("sim"))
  }

  /** Exact all-pairs cosine near-dups: the O(n²) baseline the LSH variant
    * approximates. Only viable when one side fits broadcast / the pair
    * count is bounded; at 100 TB use [[cosineNearDupPairs]].
    */
  def bruteForceNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), col(vecCol)).as("a")
      .join(df.select(col(idCol), col(vecCol)).as("b"),
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("sim"))
      .filter(col("sim") >= threshold)
      .select("v1", "v2")

  /** Embedding-cosine near-dup pairs (the fifth dedup flavor): all pairs
    * with cosine ≥ threshold. Exact O(n²/buckets) via LSH candidate
    * buckets plus exact verification; pairs missed by all tables are the
    * (tunable) recall tradeoff.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double = 0.95,
      planes: Int = 8, tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val banded = df.select(
      col(idCol), col(vecCol),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col(vecCol), planes, dim, seed = 42L + t)): _*))
        .as(Seq("table_idx", "bucket")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"),
        col(s"a.$vecCol").as("e1"), col(s"b.$vecCol").as("e2"))
      .dropDuplicates("v1", "v2")
      .withColumn("sim", cosine(col("e1"), col("e2")))
      .filter(col("sim") >= threshold)
      .select("v1", "v2", "sim")
  }
}
