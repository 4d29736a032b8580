package graft.tools

import org.apache.spark.sql.functions._

/** Synthesize a larger documents/embeddings corpus from an existing SF
  * dir by union-multiplying with re-salted ids (VERDICT r9 #4: the
  * scale-sweep evidence must extend above sf0.1, where every "yes —
  * scales" claim was extrapolation). Usage:
  *
  *   MakeScaledData <srcSfDir> <dstDir> <multiplier>
  *
  * Salting is PER TOKEN, not per document: copy k of a document rewrites
  * every whitespace token `t` to `t~k`, so the copy keeps its original's
  * length, token count, and in-document shingle structure while sharing
  * ZERO shingles/terms with any other copy. The first cut of this tool
  * appended one whole-document salt token instead — measured consequence
  * (recorded in BASELINE "Scale sweep above sf0.1"): every copy stayed a
  * TRUE near-duplicate of its original (jaccard ≈ 1), so the correct
  * answer of every near-dup kernel grew quadratically in the multiplier
  * and dedup_ngram_jaccard hit 181 s at 3x — an output-size artifact of
  * the corpus, not a kernel defect. Token salting makes the true
  * near-dup answer scale LINEARLY (each copy stratum reproduces the
  * original corpus's internal near-dup pairs and nothing else), which is
  * what a 10x-bigger real crawl looks like: more documents, more
  * vocabulary, near-dup density roughly constant. Whitespace runs
  * collapse to single spaces in salted copies (every kernel here
  * tokenizes on \s+, so this is invisible to them); copy 0 is the
  * untouched original.
  *
  * Embeddings: copy k applies one deterministic SIGNED PERMUTATION per
  * stratum — element i becomes ±(element (i + 7k) mod dim) with
  * md5-derived signs. A signed permutation is an orthogonal transform,
  * so within-stratum cosine geometry is preserved EXACTLY (a first cut
  * used a constant additive shift, which does NOT preserve cosine —
  * cos(u+d, v+d) ≠ cos(u,v) — and quietly perturbed the near-threshold
  * pairs the sweep was supposed to replicate), while cross-stratum
  * pairs land at near-random cosine, far below semanticDedup's 0.95 —
  * the same linear-true-answer argument as token salting.
  */
object MakeScaledData {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, multS) = args.take(3)
    val mult = multS.toInt
    require(mult >= 1, s"multiplier must be >= 1, got $mult")
    val spark = ToolSession.local()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until mult).map { k =>
      val text =
        if (k == 0) col("text")
        else array_join(
          transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit(s"~$k"))), " ")
      docs.select(
        (col("doc_id") + lit(k * nDocs)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        (if (k == 0) col("n_chars") else length(text).cast("long"))
          .as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until mult).map { k =>
      emb.select(
        (col("vec_id") + lit(k * nVec)).as("vec_id"),
        (if (k == 0) col("embedding")
         else transform(col("embedding"), (_, i) =>
           when(pmod(xxhash64(i, lit(k)), lit(2)) === 0, lit(1.0f))
             .otherwise(lit(-1.0f)) *
             element_at(col("embedding"),
               (pmod(i + lit(7 * k), size(col("embedding"))) + 1)
                 .cast("int"))))
          .cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"wrote ${nDocs * mult} documents, ${nVec * mult} embeddings -> $dst")
    spark.stop()
  }
}
