package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-18 wave (VERDICT r17): knn_hybrid's lexical side drops the
  * posting-list equi-join for plan-literal scoring (#4) — pinned
  * output-identical to the join formulation it replaced; the standing
  * index caches gain size accounting + budgeted LRU corpus eviction
  * (#5) — pinned to actually release and rebuild.
  */
class Round18Spec extends SparkSuite {

  test("knn_hybrid lexical: plan-literal scoring ≡ posting-join formulation") {
    import TextOps.words
    val docs = Tables.t(spark, sfDir, "documents")
    val nD = docs.count().toDouble
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(words(lower(col("text"))))).as("term"))
    val idfTbl = tok.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .withColumn("idf_q",
        round(log((lit(nD) - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0) * 1e9).cast("long"))
      .select(col("term"), col("idf_q"))

    val newTop = SimilarityOps.hybridLexTop(docs, tok, idfTbl)
      .select(col("qid"), col("vec_id"), col("lex_rank").cast("long"))

    // the r17 posting-join formulation, replayed verbatim
    val qtok = tok.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("term"))
    val lex = tok.join(broadcast(qtok), Seq("term"))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(idfTbl), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idf_q")).as("lexs"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("lexs").desc, col("doc_id"))
    val oldTop = lex.withColumn("r", row_number().over(w))
      .filter(col("r") <= 50)
      .select(col("qid"), col("doc_id").as("vec_id"),
        col("r").cast("long").as("lex_rank"))

    assert(newTop.count() > 0, "lexical ranking must produce rows")
    assert(newTop.exceptAll(oldTop).isEmpty &&
      oldTop.exceptAll(newTop).isEmpty,
      "join-free lexical top-k must equal the posting-join formulation")
  }

  test("IndexCache: size accounting + budgeted LRU corpus eviction") {
    val s = spark
    IndexCache.evictCorpus(s, "cacheA")
    IndexCache.evictCorpus(s, "cacheB")
    s.conf.unset(IndexCache.BudgetConf)
    try {
      var buildsA = 0
      def buildA() = { buildsA += 1; s.range(50000).toDF("n").persist() }
      val a = IndexCache.getOrBuild(s, "cacheA", "art")(buildA())
      a.count() // materialize the cached buffers
      IndexCache.getOrBuild(s, "cacheA", "art")(buildA()) // re-touch probes size
      assert(buildsA == 1, "second touch must hit the cache")
      val sized = IndexCache.stats(s).find(_.corpus == "cacheA").get
      assert(sized.bytes > 0,
        s"materialized artifact must report cached bytes, got $sized")
      assert(IndexCache.sizeBytes(s) >= sized.bytes)

      // 1-byte budget: building corpus B must evict LRU corpus A
      // (never B itself — the touched corpus is exempt)
      s.conf.set(IndexCache.BudgetConf, "1")
      val b = IndexCache.getOrBuild(s, "cacheB", "art")(
        s.range(1000).toDF("n").persist())
      assert(!IndexCache.stats(s).exists(_.corpus == "cacheA"),
        "over-budget session must evict the LRU corpus group")
      assert(IndexCache.stats(s).exists(_.corpus == "cacheB"),
        "the just-touched corpus must survive its own eviction pass")
      assert(a.storageLevel == StorageLevel.NONE,
        "eviction must unpersist the released artifact")
      assert(b.storageLevel != StorageLevel.NONE,
        "the surviving artifact must stay persisted")

      // correctness-neutral: a re-touch after eviction rebuilds
      val a2 = IndexCache.getOrBuild(s, "cacheA", "art")(buildA())
      assert(buildsA == 2, "evicted artifact must rebuild on re-touch")
      assert(a2.count() == 50000)
    } finally {
      s.conf.unset(IndexCache.BudgetConf)
      IndexCache.evictCorpus(s, "cacheA")
      IndexCache.evictCorpus(s, "cacheB")
    }
  }
}
