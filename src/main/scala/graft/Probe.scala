package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scratch probe: raw recall numbers behind the self-check gates (local
  * floor-tuning aid; not part of the driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    def recall(exact: org.apache.spark.sql.DataFrame,
        approx: org.apache.spark.sql.DataFrame, keys: Seq[String]): String = {
      val e = exact.select(keys.map(col): _*).collect().toSet
      val a = approx.select(keys.map(col): _*).collect().toSet
      val r = if (e.isEmpty) 1.0 else e.count(a.contains).toDouble / e.size
      f"recall=$r%.3f n_exact=${e.size} n_approx=${a.size}"
    }
    println("minhash: " + recall(
      Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8),
      Dedup.minHashLshPairs(docs, n = 3, numHashes = 64, bands = 16, minJaccard = 0.5),
      Seq("d1", "d2")))
    val half = docs.agg(max(col("doc_id"))).head.getLong(0) / 2
    println("inc_neardup: " + recall(
      Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8)
        .filter(col("d2") > half),
      Dedup.incrementalNearDupPairs(docs.filter(col("doc_id") > half),
        Dedup.minHashBandIndex(docs.filter(col("doc_id") <= half),
          n = 3, numHashes = 64, bands = 16),
        n = 3, numHashes = 64, bands = 16, minJaccard = 0.5),
      Seq("d1", "d2")))
    println("simhash@0.95: " + recall(
      Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.95),
      Dedup.simHashPairs(docs, maxDist = 3), Seq("d1", "d2")))
    println("winnow@0.8: " + recall(
      Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.8),
      Dedup.winnowPairs(docs, n = 3, window = 4, minShared = 2),
      Seq("d1", "d2")))
    val q = emb.filter(col("vec_id") < 5)
    println("topk_lsh: " + recall(
      Similarity.bruteForceTopK(emb, q, 10),
      Similarity.lshTopK(emb, q, 10, planes = 4, tables = 12),
      Seq("query_id", "vec_id")))
    println("topk_ivf: " + recall(
      Similarity.bruteForceTopK(emb, q, 10),
      Similarity.ivfTopK(emb, q, 10, nlist = 16, nprobe = 6),
      Seq("query_id", "vec_id")))
    println("topk_ivfpq: " + recall(
      Similarity.bruteForceTopK(emb, q, 10),
      Similarity.ivfPQTopK(emb, q, 10, nlist = 16, nprobe = 6, rerank = 4),
      Seq("query_id", "vec_id")))
    // in-engine hashed text embeddings through the same IVF path — the
    // sim_ann_text_embed gate's raw recall (floor 0.6)
    val embT = graft.operators.TextOps.hashEmbedUnit(docs)
      .withColumnRenamed("doc_id", "vec_id").cache()
    val qT = embT.filter(col("vec_id") < 5)
    println("topk_text_embed: " + recall(
      Similarity.bruteForceTopK(embT, qT, 10),
      Similarity.ivfTopK(embT, qT, 10, nlist = 16, nprobe = 6),
      Seq("query_id", "vec_id")))
    println("neardup_lsh: " + recall(
      Similarity.bruteForceNearDupPairs(emb, 0.45),
      Similarity.cosineNearDupPairs(emb, 0.45, planes = 5, tables = 12),
      Seq("v1", "v2")))
    println("neardup_ivfpq: " + recall(
      Similarity.bruteForceNearDupPairs(emb, 0.45),
      Similarity.ivfPQNearDupPairs(emb, 0.45, nlist = 16, nprobe = 3,
        slack = 0.05),
      Seq("v1", "v2")))
    println("neardup_ivf: " + recall(
      Similarity.bruteForceNearDupPairs(emb, 0.45),
      Similarity.ivfNearDupPairs(emb, 0.45, nlist = 16, nprobe = 3),
      Seq("v1", "v2")))
    val semKept = Similarity.semanticDedup(emb, 0.45, nlist = 16, nprobe = 3)
    println("semantic_dedup drops: " + recall(
      Similarity.bruteForceNearDupPairs(emb, 0.45)
        .select(col("v2").as("vec_id")).distinct(),
      emb.select("vec_id").join(semKept.select("vec_id"), Seq("vec_id"), "left_anti"),
      Seq("vec_id")))
    spark.stop()
  }
}
