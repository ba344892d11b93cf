package graft

import org.apache.spark.sql.functions._

/** TEMPORARY stage probe for pipeline_corpus_build_mm — times each stage
  * of corpusBuildMmSelected at the given fixture. Not part of the bench
  * contract; deleted after the measurement session.
  */
object ScratchMm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    graft.CacheScope.withCaches {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val m = t("max_id") { (docs.agg(max(col("doc_id"))).head.getLong(0) / 3 + 1) * 3 }
      val dups = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + m).as("doc_id"), col("text"))
      val base = graft.CacheScope.persist(
        docs.select(col("doc_id"), col("text")).unionByName(dups))
      t("base_persist") { noop(base) }
      val textWinners = t("text_winners") {
        val w = graft.operators.Dedup.exact(base).select(col("keep_id").as("doc_id"))
        noop(w); w
      }
      val mixedImages = graft.operators.Multimodal.attachPpmImages(base)
        .select(col("doc_id"), col("kind"),
          when((col("doc_id") / 3) % 2 === 0, col("payload"))
            .otherwise(graft.functions.vec.ppmToPng(col("payload"))).as("payload"))
      val mixedAudio = graft.operators.Multimodal.attachWavAudio(base)
        .select(col("doc_id"), col("kind"),
          when((col("doc_id") / 3) % 2 === 0, col("payload"))
            .otherwise(graft.functions.vec.wavToAiff(col("payload"))).as("payload"))
      val media = graft.CacheScope.persist(
        graft.operators.Multimodal.normalizeImages(mixedImages)
          .unionByName(graft.operators.Multimodal.normalizeAudio(mixedAudio))
          .unionByName(graft.operators.Multimodal.attachY4mVideo(base)))
      t("media_persist") { noop(media) }
      val imgPairs = t("image_pairs") {
        val p = graft.operators.Multimodal.dHashImageNearDupPairs(media,
          maxHamming = 6, maxBucketSize = Some(1024)).select("d1", "d2")
        noop(p); p
      }
      val audPairs = t("audio_pairs") {
        val p = graft.operators.Multimodal.audioNearDupPairs(media,
          maxHamming = 6, maxBucketSize = Some(1024)).select("d1", "d2")
        noop(p); p
      }
      val vidPairs = t("video_pairs") {
        val p = graft.operators.Multimodal.videoNearDupPairs(media,
          minSharedFrames = 1, maxBucketSize = Some(1024)).select("d1", "d2")
        noop(p); p
      }
      val pairs = imgPairs.unionByName(audPairs).unionByName(vidPairs)
      val mediaReps = t("cluster_resolution") {
        val r = graft.operators.Dedup.keepRepresentatives(
          media.select(col("doc_id")), pairs)
        noop(r); r
      }
      val quality = t("lang_quality") {
        val q = graft.operators.TextOps.langQuality(base)
          .filter(col("quality") >= 0.5).select(col("doc_id"), col("pred_lang"))
        noop(q); q
      }
      val tokens = t("token_stats") {
        val q = graft.operators.TextOps.tokenStats(base)
          .select(col("doc_id"), col("n_ws_tokens").as("n_tokens"))
        noop(q); q
      }
      val semFlagged = t("semantic_decon") {
        val c = docs.filter(col("doc_id") % 97 =!= 0)
        val e = docs.filter(col("doc_id") % 97 === 0)
        val f = graft.operators.TextOps.semanticDecontaminateIvfFlag(c, e,
          corpusKey = Some("scratch:cbmm")).select(col("doc_id").as("orig_id"))
        noop(f); f
      }
      val evalImages = graft.operators.Multimodal.attachPpmImages(
        docs.filter(col("doc_id") % 97 === 0))
      val imgFlagged = t("image_decon") {
        val f = graft.operators.Multimodal.dHashDecontaminateFlag(
          media, evalImages, maxHamming = 6, bands = 4, bandBits = 16,
          headerLen = 13)
        noop(f); f
      }
      val origId =
        when(col("doc_id") >= m, col("doc_id") - m).otherwise(col("doc_id"))
      val selected = t("final_join") {
        val sel = media.select(col("doc_id"), col("kind"))
          .withColumn("orig_id", origId)
          .filter(col("orig_id") % 97 =!= 0)
          .join(broadcast(semFlagged), Seq("orig_id"), "left_anti")
          .drop("orig_id")
          .join(broadcast(imgFlagged), Seq("doc_id"), "left_anti")
          .join(textWinners, Seq("doc_id"), "left_semi")
          .join(mediaReps.select("doc_id"), Seq("doc_id"), "left_semi")
          .join(quality, Seq("doc_id"))
          .join(tokens, Seq("doc_id"))
        noop(sel); sel
      }
      t("selected_persist") {
        noop(graft.CacheScope.persist(selected,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      }
      ()
    }
    s.stop()
  }
}
