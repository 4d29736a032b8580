package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew mitigation for shuffle joins (SURVEY.md §4 / the 100 TB brief:
  * "salting for skew, AQE for runtime re-plan").
  *
  * Spark's first line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), which
  * re-plans oversized sort-merge partitions at runtime. Salting is the
  * explicit fallback for the cases AQE cannot fix — a hash join whose
  * single hot key exceeds one task's memory, or a key so hot that
  * splitting its partition still leaves one straggler: the skewed side
  * spreads each key over `buckets` sub-partitions via a deterministic
  * salt, the other side replicates each row `buckets` times, and the
  * join key becomes (key, salt) — hot keys now occupy `buckets` tasks.
  * Inner joins only (outer semantics would need null-salt alignment);
  * replication multiplies the build side, so size `buckets` to the skew
  * factor, not higher.
  */
object Skew {

  /** Equi-join with the LEFT side salted and the RIGHT side replicated.
    * `keys` pairs (leftCol, rightCol); `saltBy` must be a deterministic
    * expression over left columns (the salt value never affects the
    * result set, only the partition spread).
    *
    * `joinType`: "inner" or "left". LEFT OUTER is sound under this
    * scheme because every left row lives in exactly ONE (key, salt)
    * bucket and that bucket holds ALL right rows of its key — matches
    * are complete and an unmatched left row null-extends exactly once.
    * Right/full outer are refused: the replicated right side would emit
    * one unmatched row PER BUCKET.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      buckets: Int = 8,
      saltBy: Column,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner|left, got $joinType (right/full outer " +
        "would duplicate unmatched right rows once per bucket)")
    // withColumn would silently REPLACE a pre-existing _salt column and
    // change the join result; refuse instead of corrupting
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "input already has a _salt column - rename it before salting")
    // a NULL saltBy value would make the salt equality never match and
    // silently drop (inner) or null-extend (left) rows that DO have key
    // matches — park null-salted rows in bucket 0 instead, where the
    // replicated right side still joins them correctly
    val l = left
      .withColumn("_salt",
        coalesce(pmod(saltBy, lit(buckets)).cast("int"), lit(0)))
      .alias("_sl")
    val r = right
      .withColumn("_salt",
        explode(array((0 until buckets).map(lit): _*)))
      .alias("_sr")
    val cond = (keys.map { case (lk, rk) => col(s"_sl.$lk") === col(s"_sr.$rk") } :+
      (col("_sl._salt") === col("_sr._salt"))).reduce(_ && _)
    l.join(r, cond, joinType).drop("_salt")
  }

  /** Two-phase salted AGGREGATION for hot grouping keys. Spark's hash
    * aggregate already does map-side partial aggregation, which handles
    * most skew — but a non-algebraic aggregate (exact distinct, large
    * collect) concentrates a hot key's whole state in one reduce task.
    * Salting splits phase 1 over (key, salt): each sub-aggregate is
    * bounded, and phase 2 re-aggregates `buckets` rows per key. The
    * aggregate must be decomposable into (partial, merge) — here
    * count/sum (merge = sum) and distinct-count via phase-1 distinct
    * sets kept bucket-local.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      saltBy: Column,
      buckets: Int = 8)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(!df.columns.contains("_salt"),
      "input already has a _salt column - rename it before salting")
    // null salts are harmless here (their rows form one extra sub-group
    // that phase 2 re-merges) but bucket-0 them for symmetry with
    // saltedJoin and a bounded group count
    df.withColumn("_salt",
        coalesce(pmod(saltBy, lit(buckets)).cast("int"), lit(0)))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // fact-fact join (neither side broadcastable at scale) through the
    // salted path; result must equal the plain join, which the oracle is
    "q_join_salted" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val ord = t(s, d, "orders")
      Skew.saltedJoin(
          li, ord, Seq("l_orderkey" -> "o_orderkey"), buckets = 8,
          saltBy = xxhash64(col("l_linenumber")))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
        .orderBy("o_orderpriority")
    }),
    // LEFT OUTER through the salted path: the right side is filtered so
    // most left rows are unmatched, exercising the null-extend-once
    // contract; the oracle is the plain left join it must equal
    "q_join_salted_left" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      Skew.saltedJoin(
          li, urgent, Seq("l_orderkey" -> "o_orderkey"), buckets = 8,
          saltBy = xxhash64(col("l_linenumber")), joinType = "left")
        .groupBy(
          coalesce(col("o_orderpriority"), lit("UNMATCHED")).as("bucket"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
        .orderBy("bucket")
    }),
    // hot-key aggregation through the salted two-phase path; the oracle
    // is the plain GROUP BY it must equal
    "q_agg_salted" -> ((s, d) => {
      Skew.saltedAgg(
          t(s, d, "lineitem"), "l_returnflag",
          saltBy = xxhash64(col("l_orderkey")), buckets = 8)(
          partial = Seq(
            count(lit(1)).as("pn"),
            sum(dec(col("l_extendedprice"))).as("pp")),
          merge = Seq(
            sum(col("pn")).as("n_rows"),
            sum(col("pp")).cast("double").as("total_price")))
        .orderBy("l_returnflag")
    })
  )

  private def dec(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, 4))

  val oracles: Map[String, String] = Map(
    "q_join_salted" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_salted_left" ->
      """SELECT COALESCE(o_orderpriority, 'UNMATCHED') AS bucket,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |FROM lineitem LEFT JOIN (
        |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |  ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_agg_salted" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
