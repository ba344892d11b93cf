package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch: time/recall sweep for the IVF near-dup gate parameters. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val brute = Similarity.bruteForceNearDupPairs(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((nlist, nprobe) <- Seq((8, 3), (16, 2), (16, 3), (32, 2), (32, 3))) {
      val t0 = System.nanoTime()
      val pairs = Similarity.ivfNearDupPairs(emb, 0.45,
          nlist = nlist, nprobe = nprobe)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.count(pairs.contains).toDouble / brute.size
      println(f"nlist=$nlist nprobe=$nprobe time=$sec%.2f recall=$recall%.3f n=${pairs.size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
