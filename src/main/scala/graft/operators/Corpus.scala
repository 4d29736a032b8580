package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parallelism repair for heavy per-row pipeline stages.
  *
  * The pipeline operators (shingling, hashing, vector scoring) do real
  * CPU work per row BEFORE their first shuffle, so their parallelism is
  * capped by the scan's partition count. A single-file / single-row-group
  * parquet input (the driver's testdata — and any small-file corpus)
  * yields ONE scan partition, serializing the whole stage on one core.
  *
  * [[spread]] repartitions round-robin ONLY when the scan yields fewer
  * partitions than the session's shuffle parallelism — at cluster scale
  * (many splits) it is a no-op and no shuffle is added; on unsplittable
  * inputs it trades one cheap shuffle of the raw rows for full-width
  * parallelism of everything downstream.
  */
object Corpus {

  def spread(df: DataFrame): DataFrame = {
    // streaming frames have no static partition count (and micro-batches
    // arrive pre-split); pass them through untouched
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sessionState.conf.numShufflePartitions
      // queryExecution.toRdd is the plan's own lazy val — one physical
      // planning pass per Dataset, no extra row-deserializing RDD layered
      // on top (df.rdd would build and discard one per call)
      if (df.queryExecution.toRdd.getNumPartitions < target)
        df.repartition(target)
      else df
    }
  }

  /** Deterministic stratified sample: exactly `n` rows per stratum (or
    * all of a smaller stratum), selected by ranking each stratum on a
    * cryptographic hash of the id — a uniform, reproducible draw with
    * none of rand()'s seed-vs-partitioning coupling, and re-runnable to
    * the same rows on any cluster layout. The md5-prefix ranking is the
    * same SQL-portable construction `corpus_mix_sample` uses, so the
    * draw is externally oracle-checkable.
    *
    * Scale shape: one hash + one per-stratum top-n. The row_number
    * window is exactly the shape [[graft.plans.WindowTopKRule]] rewrites
    * into a bounded-heap partial aggregate, so at scale each map task
    * forwards at most n rows per stratum — no stratum-wide sort.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val hk: Column =
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
    df.withColumn("_hk", hk)
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(strataCol)
          .orderBy(col("_hk"), col(idCol))).cast("int"))
      .filter(col("sample_rank") <= n)
      .drop("_hk")
  }
}
