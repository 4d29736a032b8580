package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}

/** Throwaway volume diagnostic for the ngramJaccardPairs scale sweep:
  * reproduces the production kernel's stage frames (hashed grams,
  * asymmetric rarest-first prefixes, positional filter) and prints the
  * row count of each stage at a given corpus dir — the scaling story in
  * counts, independent of machine load. Usage: NgramDiag <dir> [dir...]
  */
object NgramDiag {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 16)
    val threshold = 0.6
    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val grams = Corpus.spread(docs).select(
        col("doc_id").as("id"), Dedup.charShingles(col("text"), 5).as("grams"))
      val exploded = grams
        .select(col("id"), explode(col("grams")).as("gram"))
        .withColumn("h", xxhash64(col("gram")))
      val freq = exploded.groupBy("h").agg(count(lit(1)).as("df"))
      val docsig = exploded
        .join(freq, "h")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sorted"))
        .select(col("id"),
          array_distinct(transform(col("sorted"), s => s.getField("h")))
            .as("hgrams"))
        .select(col("id"), col("hgrams"), size(col("hgrams")).as("sz"))
        .persist()
      val nDocs = docsig.count()
      val gramInstances = exploded.count()
      val distinctGrams = freq.count()
      val indexLen =
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
      val prefixes = docsig.select(
        col("id"), col("sz"),
        posexplode(slice(col("hgrams"), lit(1), indexLen)).as(Seq("pos", "gram")))
        .persist()
      val prefixRows = prefixes.count()
      def probeBound(side: String) =
        col(s"$side.pos") <
          (col(s"$side.sz") -
            ceil(lit(2 * threshold / (1 + threshold)) * col(s"$side.sz")) + 1)
      val overlapBound =
        ceil(lit(threshold / (1 + threshold)) * (col("l.sz") + col("r.sz")))
      val joined = prefixes.alias("l")
        .join(prefixes.alias("r"),
          col("l.gram") === col("r.gram") &&
            probeBound("l") &&
            (col("l.sz") < col("r.sz") ||
              (col("l.sz") === col("r.sz") && col("l.id") < col("r.id"))) &&
            col("r.sz") * threshold <= col("l.sz") &&
            lit(1) + least(
              col("l.sz") - col("l.pos") - 1,
              col("r.sz") - col("r.pos") - 1) >= overlapBound)
      val rawMatches = joined.count()
      val candPairs = joined
        .select(least(col("l.id"), col("r.id")).as("id_a"),
          greatest(col("l.id"), col("r.id")).as("id_b"))
        .distinct().count()
      println(s"""{"dir":"$dir","docs":$nDocs,"gramInstances":$gramInstances,""" +
        s""""distinctGrams":$distinctGrams,"prefixRows":$prefixRows,""" +
        s""""rawMatches":$rawMatches,"candPairs":$candPairs}""")
      docsig.unpersist(); prefixes.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
