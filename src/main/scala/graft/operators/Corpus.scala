package graft.operators

import org.apache.spark.sql.DataFrame

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
}
