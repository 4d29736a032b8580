package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Named query entries for the training-data-pipeline operators
  * (dedup, similarity search, text analysis, multimodal) over the
  * `documents` and `embeddings` tables. LSH/hash-based operators have no
  * SQL-expressible oracle (driver records rows-only checks); the
  * text-statistics queries are oracle-checked exactly.
  */
object PipelineQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication ----
    "dedup_exact" -> ((s, d) => {
      Dedup.exact(t(s, d, "documents")).orderBy("text_hash")
    }),
    "dedup_minhash" -> ((s, d) => {
      Dedup.minhashPairs(t(s, d, "documents")).orderBy("id_a", "id_b")
    }),
    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashPairs(t(s, d, "documents")).orderBy("id_a", "id_b")
    }),
    "dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(t(s, d, "documents")).orderBy("id_a", "id_b")
    }),
    "dedup_embedding" -> ((s, d) => {
      // corpus embeddings are near-orthogonal (max pairwise cosine ≈0.49),
      // so the demo threshold is 0.4; production near-dup would use ≥0.95
      Similarity.embeddingNearDupPairs(t(s, d, "embeddings"), threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // ---- similarity search ----
    "ann_brute_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity
        .bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
        .orderBy("query_id", "rank")
    }),
    "ann_srp_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity
        .srpBucketedTopK(emb, emb.filter(col("vec_id") < 10), k = 10)
        .orderBy("query_id", "rank")
    }),
    "ann_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity
        .ivfTopK(emb, emb.filter(col("vec_id") < 10),
          centroids = emb.filter(col("vec_id") % 100 === 7), k = 10, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // ---- text analysis ----
    "text_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select(
        col("doc_id"),
        TextAnalysis.wordCount(col("text")).as("n_words"),
        TextAnalysis.tokenEstimate(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    }),
    "text_quality" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),
    "text_langid" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),
    "text_fingerprint" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // ---- multimodal (stubbed decode, real plumbing) ----
    "multimodal_meta" -> ((s, d) => {
      Multimodal.mediaProfile(s, t(s, d, "documents"))
    })
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_words,
        |  CAST(LEN(regexp_extract_all(text, '[A-Za-z]+'))
        |     + LEN(regexp_extract_all(text, '[0-9]+'))
        |     + LEN(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH stats AS (
        |  SELECT doc_id,
        |    CAST(LENGTH(text) AS DOUBLE) AS n_chars,
        |    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS DOUBLE) AS n_words,
        |    CAST(LEN(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) AS n_punct
        |  FROM documents)
        |SELECT doc_id,
        |  LEAST(n_words / 50.0, 1.0) * 0.5
        |  + (CASE WHEN (n_chars - (n_words - 1)) / n_words BETWEEN 3.0 AND 10.0
        |          THEN 1.0 ELSE 0.5 END) * 0.3
        |  + (CASE WHEN n_punct / n_words <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2
        |  AS quality
        |FROM stats ORDER BY doc_id""".stripMargin
  )
}
