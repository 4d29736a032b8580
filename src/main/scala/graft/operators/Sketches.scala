package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Mergeable cardinality sketches (HyperLogLog) as a persisted,
  * incrementally-maintained index family — the pre-aggregated-stats
  * story of a large pipeline: per-group distinct counts ("unique
  * tokens per source", "unique users per day") answered from a tiny
  * register table, never by rescanning the corpus.
  *
  * Spark-first shape — three deliberate choices:
  *
  *   - '''Sparse register ROWS, not dense arrays.''' A register is
  *     `(group…, j, r)` with `r = max(rho)`; building is ONE
  *     hash-aggregate (`groupBy(group, j).max(rho)`), merging two
  *     sketches is the SAME aggregate over their union, and both stay
  *     inside whole-stage codegen. Dense `array<tinyint>` registers
  *     would need a custom merge UDAF; the relational spelling gets
  *     map-side partial aggregation for free.
  *   - '''Append-only maintenance.''' Register max-merge is
  *     associative, commutative, and idempotent, so an ingest batch
  *     appends its own register rows — O(batch) commits, zero reads,
  *     no read-modify-write race — and the serve path folds
  *     `max(r)` per `(group, j)` over whatever generations exist.
  *     [[foldHllIndex]] is the standing repair: collapse history to
  *     one row per register and bin-pack ([[IndexMaintenance]] — the
  *     same compact/expire pair as every other index family).
  *   - '''Replayable arithmetic.''' The hash is the repo's md5-60-bit
  *     pattern (`('0x' || substring(md5(v),1,15))::BIGINT` in any SQL
  *     engine); `rho` derives from `bin()` string length (exact, no
  *     floating log); the estimator's harmonic sum is computed as an
  *     EXACT integer (`Σ 2^(51-r)` scaled by `2^51`, < 2^61) so the
  *     one floating division — and therefore the served estimate — is
  *     bit-identical across engines. The DuckDB oracle replays
  *     estimates, not just error bounds.
  *
  * 100 TB design: register cardinality is `groups × 1024` REGARDLESS
  * of corpus size — the whole index for a million groups is ~10^9
  * tiny rows, and a single group's estimate reads ≤ 1024 of them.
  * Standard error at m=1024 is 1.04/√1024 ≈ 3.2%; the small-range
  * linear-counting correction keeps near-exactness below ~2.5·m
  * distincts. (The 60-bit hash space makes the classic large-range
  * collision correction irrelevant at any realistic cardinality.)
  */
object Sketches {

  /** 2^BucketBits registers; 60-bit hash → 50 payload bits → rho ∈ [1, 51]. */
  val BucketBits = 10
  val Registers: Int = 1 << BucketBits
  val RhoMax = 51

  /** HLL bias constant for m = 1024. Association order matters for
    * cross-engine bit-equality: the oracle must spell exactly
    * `0.7213/(1 + 1.079/1024.0) * 1024 * 1024 * (1 << 51)` with
    * DOUBLE arithmetic (DuckDB defaults 0.7213 to DECIMAL — cast it).
    */
  private[graft] val AlphaM2Scaled: Double =
    0.7213 / (1 + 1.079 / 1024.0) * 1024 * 1024 * (1L << RhoMax).toDouble

  /** Sparse HLL registers: one row per non-empty register,
    * `(groupCols…, j, r)`. The md5-60-bit hash splits into j (low 10
    * bits) and a 50-bit payload w; rho = leading zeros of w + 1,
    * derived from the length of w's minimal binary string — exact in
    * both engines, no floating log near power-of-two boundaries. */
  def hllRegisters(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val h = conv(substring(md5(value.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.select(groupCols.map(col) :+ h.as("h"): _*)
      .select(groupCols.map(col)
        :+ col("h").bitwiseAND(lit((Registers - 1).toLong)).cast("int").as("j")
        :+ shiftright(col("h"), BucketBits).as("w"): _*)
      .withColumn("rho",
        when(col("w") === 0L, lit(RhoMax))
          .otherwise(lit(RhoMax) - length(bin(col("w")))))
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("rho")).cast("int").as("r"))
  }

  /** Per-group estimate from sparse registers (tolerates duplicate
    * generations per register — max-collapses first, so it serves the
    * append-only table directly). Output: `(groupCols…, n_est)`,
    * rounded to 4 decimals (ln differs from C's libm only in the last
    * ULP; everything else is exact-integer in, one IEEE division out).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    registers
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("r")).as("r"))
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n_filled"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - r)")).as("s_filled"))
      // harmonic denominator as an EXACT integer: empty registers
      // contribute 2^0 = 1, i.e. 2^51 at this scaling; total < 2^61
      .withColumn("total",
        (lit(Registers.toLong) - col("n_filled")) * lit(1L << RhoMax)
          + col("s_filled"))
      .withColumn("zeros", lit(Registers.toLong) - col("n_filled"))
      .withColumn("raw", lit(AlphaM2Scaled) / col("total"))
      .withColumn("n_est",
        when(col("zeros") > 0 && col("raw") <= lit(2.5 * Registers),
          round(lit(Registers.toDouble)
            * log(lit(Registers.toDouble) / col("zeros")), 4))
          .otherwise(round(col("raw"), 4)))
      .select(gcols :+ col("n_est"): _*)
  }

  /** End-to-end convenience: per-group distinct estimate of `value`. */
  def hllCounts(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value), groupCols)

  // ---------- persisted family ----------

  /** Build the persisted sketch: the registers snapshot table (rows
    * stamped generation 0) plus a params row recording the group
    * columns (the serve path and TVF need nothing else — estimates are
    * a pure function of registers). Group columns must not collide
    * with the family's own `gen`/`j`/`r` names. */
  def buildHllIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      groupCols: Seq[String],
      value: Column): Long = {
    import spark.implicits._
    require(groupCols.forall(c => !Seq("gen", "j", "r", "h", "w").contains(c)),
      s"group columns collide with sketch columns: $groupCols")
    Snapshots.commit(spark,
      Seq((groupCols.mkString(","), BucketBits))
        .toDF("group_cols", "bucket_bits"),
      s"$indexDir/params")
    Snapshots.commit(spark,
      hllRegisters(df, groupCols, value).withColumn("gen", lit(0L)),
      s"$indexDir/registers",
      statsColumns = "gen" +: groupCols :+ "j")
  }

  /** O(batch) incremental maintenance: APPEND the batch's own register
    * rows under a fresh generation stamp — the scoped merge's keys are
    * disjoint from every committed file's `gen` envelope, so the whole
    * base rides by reference (zero reads, zero rewrites, no
    * read-modify-write race). Max is associative, commutative, and
    * idempotent, so the serve-side collapse makes generation
    * boundaries invisible: batch split and arrival order cannot change
    * an estimate. The caller derives `value` exactly as at build (the
    * same same-derivation contract as the other families' adds).
    *
    * The generation stamp derives from the MERGE ATTEMPT's own base
    * version ([[Snapshots.mergeDerived]]), not a read before the merge:
    * two racing adds that pre-read the same tip would both stamp the
    * same gen, and the loser's retry would replace the winner's
    * colliding `(gen, group, j)` rows — a silent register loss. With
    * the base-derived stamp every committed add owns a distinct gen
    * (SketchesSpec races two adds to pin it).
    */
  def addToHllIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      value: Column): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    Snapshots.mergeDerived(spark, s"$indexDir/registers",
      key = "gen" +: groupCols :+ "j",
      statsColumns = "gen" +: groupCols :+ "j",
      scoped = true) { base =>
      hllRegisters(df, groupCols, value).withColumn("gen", lit(base))
    }
  }

  /** Collapse the appended generations to ONE row per register (full
    * rewrite with the max aggregate, back to generation 0) — the fold
    * half of the standing repair; follow with
    * [[IndexMaintenance.compactIndex]]/expire like any other family.
    * Serving is invariant (the serve path collapses anyway); this
    * bounds the table back to ≤ groups × 1024 rows.
    */
  def foldHllIndex(spark: SparkSession, indexDir: String): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/registers"
    val collapsed = Snapshots.read(spark, dir)
      .groupBy((groupCols :+ "j").map(col): _*)
      .agg(max(col("r")).cast("int").as("r"))
      .withColumn("gen", lit(0L))
    Snapshots.commit(spark, collapsed, dir,
      statsColumns = "gen" +: groupCols :+ "j")
  }

  /** Serve per-group estimates from the persisted registers — never
    * touches the source corpus. `asOf` pins the registers table
    * version (single mutating table, so a plain snapshot pin is
    * coherent — unlike the HNSW pair). */
  def hllServe(
      spark: SparkSession,
      indexDir: String,
      asOf: Option[Long] = None): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/registers"
    val regs = asOf match {
      case Some(v) => Snapshots.readVersion(spark, dir, v)
      case None => Snapshots.read(spark, dir)
    }
    hllEstimate(regs, groupCols)
  }

  // ---------- quantile histogram sketch ----------
  //
  // The QUANTILE third of the sketch category: per-group quantile
  // estimates ("p99 document length per source", "p50 latency per
  // route") from a log-bucketed histogram — the HDR-histogram design,
  // spelled relationally. A non-negative value lands in bucket
  //   v < 16           → b = v                      (exact)
  //   v ≥ 16, e=⌊log2⌋ → b = (e−4)·16 + 16 + slot,  slot = (v−2^e)·16 ÷ 2^e
  // i.e. 16 mantissa slots per octave → relative bucket width ≤ 1/16
  // (6.25 %), exact below 16. Buckets merge by SUM, so the count-min
  // family's append-only lifecycle carries over verbatim (generation-
  // stamped O(batch) adds, serve-side sum-collapse, fold + bin-pack,
  // as-of pins) — and like count-min, sums are NOT idempotent: each
  // batch exactly once. Everything is integer arithmetic (log2 via
  // bin()-string length, the same trick as the HLL rho), so the DuckDB
  // oracle replays estimates EXACTLY, and the quantile LAW
  // (est ≤ true q-th value < est + bucket width) gates alongside.
  //
  // 100 TB design: the table is groups × (16 + 16·octaves) rows —
  // ~1000 rows per group for the full long range — REGARDLESS of
  // corpus size; building is one codegen'd hash-aggregate with
  // map-side partials; a quantile read touches one group's bucket rows.

  /** Slots per octave; relative error ≤ 1/QhSlots above QhSlots. */
  val QhSlots = 16

  /** Log-bucket id of a non-negative long value (see family doc). The
    * slot is `(v >> (e−4)) − 16` — a pure shift, identical to
    * `(v − 2^e)·16 ÷ 2^e` but with NO multiplication, so it cannot
    * overflow for any positive long (the multiply spelling wrapped
    * negative past v ≈ 2^59 under non-ANSI Long arithmetic while the
    * oracle's checked BIGINT multiply raised — self-review catch). */
  /** The bucket law over an arbitrary column spelling — ONE arithmetic
    * definition shared with the view layer's maintained quantile
    * columns ([[graft.sources.Views]]), so a drift between two
    * spellings can't silently break an oracle replay. */
  private[graft] def qhBucketSql(v: String): String =
    s"CASE WHEN $v < 16 THEN $v ELSE CAST((length(bin($v)) - 5) * 16 + 16 " +
      s"+ shiftright($v, length(bin($v)) - 5) - 16 AS BIGINT) END"

  private def qhBucket: String = qhBucketSql("v")

  /** Representative (lower bound) of bucket `b` — the served estimate:
    * exact below 16, else 2^e + slot·2^(e−4). */
  private[graft] def qhRep(b: String): String =
    s"CASE WHEN $b < 16 THEN $b ELSE " +
      s"shiftleft(CAST(1 AS BIGINT), CAST(($b - 16) div 16 AS INT) + 4) " +
      s"+ (($b - 16) % 16) " +
      s"* shiftleft(CAST(1 AS BIGINT), CAST(($b - 16) div 16 AS INT)) END"

  /** Sparse histogram rows `(groupCols…, b, cnt)` — one hash-aggregate,
    * codegen'd, map-side partials free. Values must be ≥ 0 (enforced:
    * a negative value fails the scan loudly rather than folding into a
    * wrong bucket). */
  def qhBuckets(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.select(groupCols.map(col)
        :+ value.cast("long").as("v"): _*)
      .withColumn("v", when(col("v") >= 0, col("v")).otherwise(
        raise_error(concat(lit("quantile sketch value must be >= 0, got "),
          col("v").cast("string")))))
      .withColumn("b", expr(qhBucket))
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Per-group quantile estimates from histogram rows (tolerates
    * duplicate generations — sum-collapses first). For each q the
    * target rank is `ceil(q·n)` and the estimate is the representative
    * of the first bucket whose cumulative count reaches it. Output:
    * `(groupCols…, q, n_est)`. */
  def qhEstimate(
      buckets: DataFrame, groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val gcols = groupCols.map(col)
    val collapsed = buckets
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val tot = collapsed.groupBy(gcols: _*).agg(sum(col("cnt")).as("n"))
    val cum = collapsed.withColumn("c",
      sum(col("cnt")).over(
        Window.partitionBy(gcols: _*).orderBy(col("b"))))
    val spark = buckets.sparkSession
    import spark.implicits._
    // the quantile list is a bounded broadcast frame (same pattern as
    // the repo's label-frame crossJoins)
    val qdf = qs.toDF("q")
    tot.crossJoin(broadcast(qdf))
      .withColumn("t", ceil(col("q") * col("n")).cast("long"))
      .join(cum, groupCols)
      .filter(col("c") >= col("t"))
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(min(col("b")).as("b"))
      .withColumn("n_est", expr(qhRep("b")))
      .select(gcols :+ col("q") :+ col("n_est"): _*)
  }

  /** End-to-end convenience: per-group quantile estimates of `value`. */
  def qhQuantiles(
      df: DataFrame, groupCols: Seq[String], value: Column,
      qs: Seq[Double]): DataFrame =
    qhEstimate(qhBuckets(df, groupCols, value), groupCols, qs)

  /** Build the persisted quantile sketch — the same params + gen-0
    * layout as the other two families. */
  def buildQhIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      groupCols: Seq[String],
      value: Column): Long = {
    import spark.implicits._
    require(groupCols.forall(c =>
      !Seq("gen", "b", "cnt", "v", "q", "c", "t", "n").contains(c)),
      s"group columns collide with sketch columns: $groupCols")
    Snapshots.commit(spark,
      Seq((groupCols.mkString(","), QhSlots)).toDF("group_cols", "slots"),
      s"$indexDir/params")
    Snapshots.commit(spark,
      qhBuckets(df, groupCols, value).withColumn("gen", lit(0L)),
      s"$indexDir/buckets",
      statsColumns = "gen" +: groupCols :+ "b")
  }

  /** O(batch) add under a base-derived generation stamp — the same
    * CAS contract as [[addToCmIndex]] (sums are not idempotent; each
    * batch exactly once). */
  def addToQhIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      value: Column): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    Snapshots.mergeDerived(spark, s"$indexDir/buckets",
      key = "gen" +: groupCols :+ "b",
      statsColumns = "gen" +: groupCols :+ "b",
      scoped = true) { base =>
      qhBuckets(df, groupCols, value).withColumn("gen", lit(base))
    }
  }

  /** Sum-collapse the generations back to one row per bucket. */
  def foldQhIndex(spark: SparkSession, indexDir: String): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/buckets"
    val collapsed = Snapshots.read(spark, dir)
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("gen", lit(0L))
    Snapshots.commit(spark, collapsed, dir,
      statsColumns = "gen" +: groupCols :+ "b")
  }

  /** CDF POSITION of each probe value against a group's histogram —
    * the inverse of the quantile read: `n_le` = Σ cnt over buckets
    * `b ≤ bucket(v)` (values sharing v's bucket count as ≤ — the
    * histogram's resolution, consistent with the bucket law), `pct =
    * n_le / n_total`. All integers plus one IEEE division, so the
    * oracle replays positions exactly. This is the per-arrival "where
    * does this length/quality sit in the standing corpus" primitive —
    * the C4-style length filter answered from O(16·octaves) bucket
    * rows per group, zero corpus rescans. With `carryCols` one row
    * rides per probe row (the [[cmEstimates]] contract) PROVIDED the
    * carry columns identify probe rows: rows identical on
    * `(groupCols, carryCols, v)` collapse to ONE output row — the
    * probe frame is de-duplicated on those columns before the bucket
    * join, because the downstream `sum(cnt)` is not duplicate-
    * idempotent and would otherwise silently double `n_le`/`pct`.
    * Callers needing per-duplicate rows carry a unique id. Output:
    * `(groupCols…, carryCols…, v, n_le, n_total, pct)`; a group with
    * no histogram reads n_total = 0 and pct = 0.0. */
  def qhCdfProbe(
      buckets: DataFrame,
      groupCols: Seq[String],
      probes: DataFrame,
      value: Column,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(carryCols.forall(c =>
      !(Seq("gen", "b", "cnt", "v", "q", "c", "t", "n",
        "n_le", "n_le0", "n_total", "pct", "_pb", "_pbn") ++ groupCols)
        .contains(c)),
      s"carry columns collide with sketch/probe columns: $carryCols")
    val keyCols = groupCols ++ carryCols
    val gcols = keyCols.map(col)
    val collapsed = buckets
      .groupBy((groupCols :+ "b").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val tot = collapsed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("n_total"))
    val keyed = probes
      .select(gcols :+ value.cast("long").as("v"): _*)
      .withColumn("v", when(col("v") >= 0, col("v")).otherwise(
        raise_error(concat(lit("quantile sketch value must be >= 0, got "),
          col("v").cast("string")))))
      .withColumn("_pb", expr(qhBucket))
    // the carry contract is one output row PER PROBE ROW — which only
    // holds when the carry columns IDENTIFY probe rows. A caller whose
    // rows legitimately repeat on (groupCols, carryCols, v) would have
    // them silently collapse below; fail loudly instead (the cure is a
    // unique id per probe row, which every current caller carries)
    val guarded =
      if (carryCols.isEmpty) keyed
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy((keyCols :+ "v").map(col): _*)
        keyed.withColumn("_pbn", count(lit(1)).over(w))
          .withColumn("v",
            when(col("_pbn") > 1, raise_error(lit(
              "qhCdfProbe carry columns must identify probe rows: " +
                "duplicate rows on (groupCols, carryCols, value) would " +
                "collapse to one output row — carry a unique id per " +
                "probe row")).cast("long"))
              .otherwise(col("v")))
          .drop("_pbn")
      }
    // ALWAYS de-duplicate on the full output key: the bucket join
    // fans each probe row out to its group's bucket rows and the
    // groupBy below sums cnt once per (probe row × bucket row) pair,
    // so a duplicated probe row would double every count it touches
    val pv = guarded.distinct()
    pv.join(collapsed, groupCols.toSeq, "left")
      .groupBy((keyCols :+ "v" :+ "_pb").map(col): _*)
      .agg(sum(when(col("b") <= col("_pb"), col("cnt")).otherwise(0L))
        .as("n_le0"))
      .join(tot, groupCols.toSeq, "left")
      .select(gcols :+ col("v")
        :+ coalesce(col("n_le0"), lit(0L)).as("n_le")
        :+ coalesce(col("n_total"), lit(0L)).as("n_total"): _*)
      .withColumn("pct",
        when(col("n_total") > 0, col("n_le") / col("n_total"))
          .otherwise(lit(0.0)))
  }

  /** Serve CDF positions for a probe batch from the persisted buckets
    * — never touches the source corpus. */
  def qhCdfServe(
      spark: SparkSession,
      indexDir: String,
      probes: DataFrame,
      value: Column,
      asOf: Option[Long] = None,
      carryCols: Seq[String] = Nil): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/buckets"
    val buckets = asOf match {
      case Some(v) => Snapshots.readVersion(spark, dir, v)
      case None => Snapshots.read(spark, dir)
    }
    qhCdfProbe(buckets, groupCols, probes, value, carryCols)
  }

  /** Serve per-group quantile estimates from the persisted buckets —
    * never touches the source corpus. */
  def qhServe(
      spark: SparkSession,
      indexDir: String,
      qs: Seq[Double],
      asOf: Option[Long] = None): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/buckets"
    val buckets = asOf match {
      case Some(v) => Snapshots.readVersion(spark, dir, v)
      case None => Snapshots.read(spark, dir)
    }
    qhEstimate(buckets, groupCols, qs)
  }

  /** Pairwise INTERSECTION-cardinality estimates between groups' value
    * sets, served from the persisted registers alone — the
    * cross-source-overlap primitive ("how many tokens do src3 and
    * src7 share") a curation pipeline wants without any corpus
    * rescan. Inclusion-exclusion over the sketch algebra: the union
    * sketch of two groups is the register-wise max of their rows (the
    * merge law), so `|A∩B| ≈ est(A) + est(B) − est(A∪B)` — every term
    * the same replayable estimator, so the DuckDB oracle hash-compares
    * the OVERLAPS themselves. Error grows with |A|+|B|+|A∪B| (the
    * standard difference-of-estimates caveat; SketchesSpec pins
    * accuracy on known overlaps). Output: `(ga, gb, n_a, n_b,
    * n_union, n_int)` for every unordered group pair — `pairs²` tiny
    * rows; requires a single group column. */
  def hllIntersectServe(
      spark: SparkSession,
      indexDir: String,
      asOf: Option[Long] = None): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    require(groupCols.size == 1,
      s"pairwise overlap needs a single group column, got $groupCols")
    val g = groupCols.head
    val dir = s"$indexDir/registers"
    val regs = asOf match {
      case Some(v) => Snapshots.readVersion(spark, dir, v)
      case None => Snapshots.read(spark, dir)
    }
    val singles = hllEstimate(regs, groupCols)
    val collapsed = regs.groupBy(col(g), col("j"))
      .agg(max(col("r")).cast("int").as("r"))
    val pairs = singles.select(col(g).as("ga"), col("n_est").as("n_a"))
      .crossJoin(broadcast(
        singles.select(col(g).as("gb"), col("n_est").as("n_b"))))
      .filter(col("ga") < col("gb"))
    val unionRegs = collapsed
      .join(broadcast(pairs.select("ga", "gb")),
        col(g) === col("ga") || col(g) === col("gb"))
      .groupBy("ga", "gb", "j").agg(max(col("r")).cast("int").as("r"))
    val unions = hllEstimate(unionRegs, Seq("ga", "gb"))
      .withColumnRenamed("n_est", "n_union")
    pairs.join(unions, Seq("ga", "gb"))
      .withColumn("n_int",
        round(col("n_a") + col("n_b") - col("n_union"), 4))
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"),
        col("n_union"), col("n_int"))
  }

  private def readGroupCols(
      spark: SparkSession, indexDir: String): Seq[String] =
    Snapshots.read(spark, s"$indexDir/params")
      .collect().head.getAs[String]("group_cols").split(",").toSeq

  /** (groupCols, candK) in ONE params read — the add/serve hot paths
    * must not collect the same one-row table twice. candK is 0 for
    * indexes built before the heavy-hitter column existed. */
  private def readCmParams(
      spark: SparkSession, indexDir: String): (Seq[String], Int) = {
    val row = Snapshots.read(spark, s"$indexDir/params").collect().head
    val candK =
      if (row.schema.fieldNames.contains("cand_k")) row.getAs[Int]("cand_k")
      else 0
    (row.getAs[String]("group_cols").split(",").toSeq, candK)
  }

  /** The CM index's version MANIFEST (the [[graft.operators.Hnsw]]
    * pattern): counters and candidates mutate in dependent pairs
    * (build/add/fold), and compaction can advance the two tables
    * UNEVENLY (per-table bin-pack) — so a coherent as-of pin needs one
    * handle naming BOTH table versions, exactly like a real format's
    * snapshot log above its data files. Every mutating op appends
    * `(index_version, counters_v, candidates_v)` via CAS
    * ([[Snapshots.commitIfVersion]], re-derived per lost race) and
    * returns the new index version; [[cmTopK]]/[[cmServe]] resolve
    * `asOf` through it. candidates_v = 0 records "no candidate table"
    * (candK = 0 indexes). O(mutations) tiny — the read is the same
    * driver-bounded budget as the params row.
    *
    * The stamped pair is PASSED IN by the mutating op — the exact
    * versions its own table commits returned — never re-read from the
    * tips inside the stamp: under concurrent mutators a tip re-read
    * lets both losers stamp the later op's pair, so the first op's
    * returned index_version would name the second op's state and the
    * overtaken table version would be unnameable by any pin. With the
    * op's own versions, every stamp names exactly the state that op
    * produced (stamps may commit out of arrival order under a race —
    * each still names a real, coherent pair).
    */
  private def stampCmVersion(spark: SparkSession, indexDir: String,
      cv: Long, dv: Long): Long = {
    import spark.implicits._
    val dir = s"$indexDir/versions"
    var attempt = 0
    while (attempt < 10) {
      val base = Snapshots.version(spark, dir)
      val cur =
        if (base >= 1)
          Snapshots.readVersion(spark, dir, base)
            .select("index_version", "counters_v", "candidates_v")
            .as[(Long, Long, Long)].collect().toSeq
        else if (cv > 1)
          // FIRST stamp on an index with pre-manifest history (an
          // upgrade): under the legacy contract every op moved both
          // tables in lockstep, so the historical pairs are exactly
          // (i, i) — seed them so raw pins taken before the upgrade
          // keep their original meaning instead of silently resolving
          // through post-upgrade stamp numbering
          (1L until cv).map(i => (i, i, if (dv > 0) i else 0L))
        else Nil
      val next = if (cur.isEmpty) 1L else cur.map(_._1).max + 1
      val df = (cur :+ ((next, cv, math.max(dv, 0L))))
        .toDF("index_version", "counters_v", "candidates_v")
      if (Snapshots.commitIfVersion(spark, df, dir, base).nonEmpty)
        return next
      attempt += 1
    }
    throw new IllegalStateException(
      s"version stamp on $indexDir lost 10 optimistic races; giving up")
  }

  /** Resolve an as-of pin to the coherent (counters_v, candidates_v)
    * pair it named. Indexes created before the version manifest have
    * no `versions` table — there the legacy lockstep numbering (every
    * op moved both tables once, compaction excluded) makes the raw
    * pair `(v, v)` the correct reading. */
  private def resolveCmPin(
      spark: SparkSession, indexDir: String, v: Long): (Long, Long) = {
    val dir = s"$indexDir/versions"
    if (Snapshots.version(spark, dir) < 1) (v, v)
    else {
      val hit = Snapshots.read(spark, dir)
        .filter(col("index_version") === v)
        .select("counters_v", "candidates_v").collect()
      require(hit.nonEmpty, s"$indexDir has no stamped index version $v")
      (hit.head.getLong(0), hit.head.getLong(1))
    }
  }

  /** Serve per-group heavy hitters FROM THE INDEX ALONE: the persisted
    * candidate rows (each batch's exact top-candK, a superset of any
    * global heavy hitter that was heavy in some batch) are point-
    * queried against the counters for their global frequency estimate,
    * then re-ranked — top `k` per group by (estimate desc, value asc).
    * Zero corpus rescans; the count-min law (estimate ≥ truth) makes
    * the ranking conservative, never missing. Output: `(groupCols…,
    * v, n_est, rank)`. */
  def cmTopK(
      spark: SparkSession,
      indexDir: String,
      k: Int,
      asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (groupCols, candK) = readCmParams(spark, indexDir)
    require(candK > 0,
      s"$indexDir maintains no heavy-hitter candidates " +
        "(build with candK > 0)")
    // `asOf` is an INDEX version resolved through the version
    // manifest to the coherent (counters_v, candidates_v) pair that
    // stamp recorded — a counters-only pin would rank candidates that
    // did not exist at the pinned time against the old counters
    // (phantom zero-estimate rows; self-review catch), and raw
    // equal-number pairing breaks when compaction advances the two
    // tables unevenly (SketchesSpec compacts between pins to pin
    // exactly that). Pre-manifest indexes fall back to the legacy
    // lockstep reading inside [[resolveCmPin]].
    val pin = asOf.map(resolveCmPin(spark, indexDir, _))
    val cands = (pin match {
      case Some((_, dv)) =>
        Snapshots.readVersion(spark, s"$indexDir/candidates", dv)
      case None => Snapshots.read(spark, s"$indexDir/candidates")
    }).select((groupCols :+ "v").map(col): _*).distinct()
    val counters = pin match {
      case Some((cv, _)) =>
        Snapshots.readVersion(spark, s"$indexDir/counters", cv)
      case None => Snapshots.read(spark, s"$indexDir/counters")
    }
    cmEstimates(counters, cands, groupCols, col("v"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("n_est").desc, col("v"))).cast("long"))
      .filter(col("rank") <= k)
  }

  // ---------- count-min frequency sketch ----------
  //
  // The frequency companion to the HLL family: per-group occurrence
  // counts of a value ("how often does this token appear in src0")
  // from a counters table of groups × 4 × 1024 cells. Counters merge
  // by SUM — associative and commutative like the HLL max, so the
  // SAME append-only lifecycle applies (generation-stamped O(batch)
  // adds, serve-side collapse, fold + bin-pack repair) — but NOT
  // idempotent: re-adding a batch double-counts, the standard
  // at-least-once caveat of additive sketches (the streaming entries'
  // exactly-once batch contract is what makes appends safe).
  // Arithmetic is all-integer, so the DuckDB oracle replays estimates
  // EXACTLY, and the count-min law (estimate ≥ true count, always)
  // gates alongside.

  /** 4 rows × 1024 columns; the four column indexes are the four
    * 10-bit projections of the one md5-60 hash — one hash per value,
    * replayable as `(h >> (10*i)) & 1023`. */
  val CmRows = 4
  val CmWidth = 1024

  /** The count-min hash: md5-60 as one long, four 10-bit projections
    * below. EVERY spelling of the cell law derives from this pair of
    * helpers — a drift between two spellings would silently break
    * the DuckDB oracle's replay and the view layer's cell maps. */
  private def cmHash(value: Column): Column =
    conv(substring(md5(value.cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** The 4 `(i, j)` cell structs a hashed value projects to. */
  private def cmCellStructs(h: Column): Column =
    array((0 until CmRows).map { i =>
      struct(lit(i).as("i"),
        shiftright(h, 10 * i)
          .bitwiseAND(lit((CmWidth - 1).toLong)).cast("int").as("j"))
    }: _*)

  /** The 4 FLATTENED cell keys (`i·1024 + j`) a value hashes to —
    * [[cmCellStructs]] flattened, exposed so the view layer's
    * `cm_<c>` cell maps share the ONE arithmetic definition with
    * [[cmCounters]] and [[cmEstimates]]. */
  private[graft] def cmCellKeys(value: Column): Column =
    transform(cmCellStructs(cmHash(value)),
      c => c.getField("i").cast("long") * lit(CmWidth.toLong) +
        c.getField("j").cast("long"))

  /** Sparse count-min counters: one row per non-empty cell,
    * `(groupCols…, i, j, cnt)`. */
  def cmCounters(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val h = cmHash(value)
    val cells = cmCellStructs(col("h"))
    df.select(groupCols.map(col) :+ h.as("h"): _*)
      .select(groupCols.map(col) :+ explode(cells).as("c"): _*)
      .select(groupCols.map(col) :+ col("c.i") :+ col("c.j"): _*)
      .groupBy((groupCols :+ "i" :+ "j").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a counters table for every probe value: the estimate
    * is `min` over the 4 cells the value hashes to (absent cell = 0).
    * Tolerates duplicate generations (sum-collapses first). Output:
    * `(groupCols…, carryCols…, v, n_est)` — for the DISTINCT probe
    * values when `carryCols` is empty (the point-query spelling), or
    * one row PER PROBE ROW when carry columns (a doc id, a batch tag)
    * ride along: the estimate is a pure function of (group, v), so
    * carrying identity costs nothing and saves the caller a join-back
    * (and a second scan of the probe source). */
  def cmEstimates(
      counters: DataFrame,
      probes: DataFrame,
      groupCols: Seq[String],
      value: Column,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(carryCols.forall(c =>
      !(Seq("gen", "i", "j", "cnt", "h", "c", "v") ++ groupCols)
        .contains(c)),
      s"carry columns collide with sketch/group columns: $carryCols")
    val keyCols = groupCols ++ carryCols
    val gcols = keyCols.map(col)
    val collapsed = counters
      .groupBy((groupCols :+ "i" :+ "j").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val h = cmHash(value)
    val cells = cmCellStructs(col("h"))
    val keyed = probes
      .select(gcols :+ value.cast("string").as("v") :+ h.as("h"): _*)
    val deduped = if (carryCols.isEmpty) keyed.distinct() else keyed
    deduped
      .select(gcols :+ col("v") :+ explode(cells).as("c"): _*)
      .select(gcols :+ col("v") :+ col("c.i") :+ col("c.j"): _*)
      .join(collapsed, groupCols :+ "i" :+ "j", "left")
      .groupBy((keyCols :+ "v").map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** A batch's per-group top-`candK` values by EXACT batch count —
    * the heavy-hitter candidate set maintained beside the counters.
    * Deterministic: rank ties break on the value itself, so the
    * candidate table is a pure function of the batch (and the SQL
    * oracle replays it verbatim). */
  private def cmCandidates(
      df: DataFrame, groupCols: Seq[String], value: Column,
      candK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(groupCols.map(col) :+ value.cast("string").as("v"): _*)
      .groupBy((groupCols :+ "v").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("cnt").desc, col("v"))))
      .filter(col("rk") <= candK)
      .select(groupCols.map(col) :+ col("v"): _*)
  }

  /** Build the persisted frequency sketch — same layout contract as
    * [[buildHllIndex]] (params + generation-0 counters). `candK > 0`
    * additionally maintains a HEAVY-HITTER candidate table: each
    * batch's per-group top-candK values by exact batch count land
    * beside the counters, so [[cmTopK]] can serve "most duplicated
    * values per group" from the index alone — the standard count-min
    * companion (a value can only be a global heavy hitter if it is
    * heavy in some batch; candidates are a superset per batch, and the
    * counter estimate re-ranks them globally). */
  def buildCmIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      groupCols: Seq[String],
      value: Column,
      candK: Int = 0): Long = {
    import spark.implicits._
    require(groupCols.forall(c =>
      !Seq("gen", "i", "j", "cnt", "h", "c", "v").contains(c)),
      s"group columns collide with sketch columns: $groupCols")
    Snapshots.commit(spark,
      Seq((groupCols.mkString(","), CmRows, CmWidth, candK))
        .toDF("group_cols", "cm_rows", "cm_width", "cand_k"),
      s"$indexDir/params")
    val dv =
      if (candK <= 0) 0L
      else Snapshots.commit(spark,
        cmCandidates(df, groupCols, value, candK)
          .withColumn("gen", lit(0L)),
        s"$indexDir/candidates",
        statsColumns = "gen" +: groupCols :+ "v")
    val cv = Snapshots.commit(spark,
      cmCounters(df, groupCols, value).withColumn("gen", lit(0L)),
      s"$indexDir/counters",
      statsColumns = "gen" +: groupCols :+ "i" :+ "j")
    stampCmVersion(spark, indexDir, cv, dv)
  }

  /** O(batch) add: the batch's own counters under a fresh generation —
    * keys disjoint from every committed file's `gen` envelope, so the
    * base rides by reference. Each batch must arrive exactly once (sum
    * is not idempotent). The gen stamp derives from the merge
    * attempt's base version — see [[addToHllIndex]]; for counters a
    * same-gen collision would be a silent COUNT loss, so the CAS
    * derivation matters even more here. */
  def addToCmIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      value: Column): Long = {
    val (groupCols, candK) = readCmParams(spark, indexDir)
    val dv =
      if (candK <= 0) 0L
      else Snapshots.mergeDerived(spark, s"$indexDir/candidates",
        key = "gen" +: groupCols :+ "v",
        statsColumns = "gen" +: groupCols :+ "v",
        scoped = true) { base =>
        cmCandidates(df, groupCols, value, candK)
          .withColumn("gen", lit(base))
      }
    val cv = Snapshots.mergeDerived(spark, s"$indexDir/counters",
      key = "gen" +: groupCols :+ "i" :+ "j",
      statsColumns = "gen" +: groupCols :+ "i" :+ "j",
      scoped = true) { base =>
      cmCounters(df, groupCols, value).withColumn("gen", lit(base))
    }
    stampCmVersion(spark, indexDir, cv, dv)
  }

  /** Sum-collapse the generations back to one row per cell (and the
    * candidate table, when maintained, to one row per value). */
  def foldCmIndex(spark: SparkSession, indexDir: String): Long = {
    val (groupCols, candK) = readCmParams(spark, indexDir)
    val dv =
      if (candK <= 0) 0L
      else {
        val cdir = s"$indexDir/candidates"
        Snapshots.commit(spark,
          Snapshots.read(spark, cdir)
            .select((groupCols :+ "v").map(col): _*).distinct()
            .withColumn("gen", lit(0L)),
          cdir, statsColumns = "gen" +: groupCols :+ "v")
      }
    val dir = s"$indexDir/counters"
    val collapsed = Snapshots.read(spark, dir)
      .groupBy((groupCols :+ "i" :+ "j").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("gen", lit(0L))
    val cv = Snapshots.commit(spark, collapsed, dir,
      statsColumns = "gen" +: groupCols :+ "i" :+ "j")
    stampCmVersion(spark, indexDir, cv, dv)
  }

  /** Serve frequency estimates for a probe batch from the persisted
    * counters — never touches the source corpus. */
  def cmServe(
      spark: SparkSession,
      indexDir: String,
      probes: DataFrame,
      value: Column,
      asOf: Option[Long] = None,
      carryCols: Seq[String] = Nil): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/counters"
    // asOf is an index version, resolved through the version manifest
    // (legacy lockstep fallback inside resolveCmPin)
    val counters = asOf match {
      case Some(v) =>
        Snapshots.readVersion(spark, dir, resolveCmPin(spark, indexDir, v)._1)
      case None => Snapshots.read(spark, dir)
    }
    cmEstimates(counters, probes, groupCols, value, carryCols)
  }

  // ---------- bloom membership sketch ----------
  //
  // The MEMBERSHIP third of the sketch category: "does group g's corpus
  // contain value v at all?" — the decontamination pre-filter of a
  // training pipeline ("which shards contain this benchmark string"),
  // answered from a bit-table of groups × ≤8192 word rows, never by
  // rescanning the corpus. One-sided by the bloom contract: a present
  // value ALWAYS probes 1 (no false negatives — the law the oracle
  // pins); an absent value probes 1 with probability ≈ (1−e^(−kn/m))^k.
  //
  // Spark-first shape, same three choices as the siblings:
  //   - sparse WORD rows `(group…, word, bits)` — 32 filter bits per
  //     row, built by ONE codegen'd hash-aggregate (`bit_or`), merged
  //     by the same aggregate. 32-bit words keep every shift ≤ 31, so
  //     the arithmetic replays in any engine (a 1<<63 overflows
  //     DuckDB's BIGINT shift).
  //   - append-only maintenance: OR is associative, commutative, AND
  //     idempotent (like the HLL max, unlike the count-min sum), so
  //     ingest appends generation rows with zero reads and any batch
  //     split/replay serves identically.
  //   - replayable arithmetic: the k=4 probe positions are
  //     Kirsch-Mitzenmacher double hashing off the one md5-60 hash —
  //     `pos_i = (h1 + i·h2) mod m` with h1 = low 30 bits and
  //     h2 = next 30 bits forced odd — all-integer, so the DuckDB
  //     oracle replays the full probe surface INCLUDING false
  //     positives, bit-for-bit.
  //
  // 100 TB design: the filter is m = 2^18 bits per group REGARDLESS of
  // corpus size (fp rate degrades gracefully as n grows past m/8 —
  // re-shard groups or raise m at build time when it matters); a probe
  // batch costs one broadcast-sized join against the word table.

  /** m: filter bits per group. */
  val BloomBits: Long = 1L << 18

  /** Probe positions per value (Kirsch-Mitzenmacher double hashing). */
  val BloomK = 4

  private val bloomReserved =
    Seq("gen", "word", "bits", "h", "h1", "h2", "i", "pos", "v")

  /** The one md5-60 hash, split for double hashing. Values hash AS
    * STRINGS (`value.cast("string")`) so the probe side — which only
    * has the string `v` — re-derives positions identically. */
  private def bloomPositions(df: DataFrame, keep: Seq[Column],
      value: Column): DataFrame = {
    val h = conv(substring(md5(value.cast("string").cast("binary")), 1, 15),
      16, 10).cast("long")
    df.select(keep :+ h.as("h"): _*)
      .select(keep
        :+ col("h").bitwiseAND(lit((1L << 30) - 1)).as("h1")
        :+ shiftright(col("h"), 30).bitwiseAND(lit((1L << 30) - 1))
          .bitwiseOR(lit(1L)).as("h2"): _*)
      .select(keep :+ col("h1") :+ col("h2")
        :+ explode(array((0 until BloomK).map(i => lit(i.toLong)): _*))
          .as("i"): _*)
      // h1 + 3·h2 < 2^32: no overflow anywhere near the long range
      .withColumn("pos", (col("h1") + col("i") * col("h2")) % lit(BloomBits))
  }

  /** Sparse filter words: one row per non-empty 32-bit word,
    * `(groupCols…, word, bits)`. A NULL value contributes no
    * membership (SQL's aggregates-ignore-NULL discipline) — the probe
    * side answers NULL probes with hit = 0 for the same reason, so
    * the one-sided law holds across the pair. */
  def bloomWords(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    bloomPositions(df.filter(value.isNotNull), groupCols.map(col), value)
      .select(groupCols.map(col)
        :+ shiftright(col("pos"), 5).cast("int").as("word")
        :+ col("pos"): _*)
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), " +
        "CAST(pos & 31 AS INT)))").as("bits"))

  /** Cross-group membership probe: every distinct probe value is
    * checked against EVERY group's filter (the decontamination shape —
    * "which shards contain this string"). Output: `(groupCols…,
    * carryCols…, v, hit)` with hit ∈ {0,1}; tolerates duplicate
    * generations (OR-collapses first). With `carryCols` (a doc id, a
    * batch tag) one row rides per PROBE ROW — hit is a pure function
    * of v, so carrying identity costs nothing and saves the caller a
    * join-back (the [[cmEstimates]] contract). The group × probe cross
    * product is the probe batch's own size contract (same small-side
    * rule as the ANN query batch). */
  def bloomProbe(
      words: DataFrame,
      groupCols: Seq[String],
      probes: DataFrame,
      value: Column,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(carryCols.forall(c =>
      !(bloomReserved ++ groupCols).contains(c)),
      s"carry columns collide with sketch/group columns: $carryCols")
    require(groupCols.forall(c => !c.startsWith("_w_")),
      s"group columns collide with the probe's word-side aliases: $groupCols")
    val collapsed = words
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))
    val groups = words.select(groupCols.map(col): _*).distinct()
    val keyed = probes
      .select(carryCols.map(col) :+ value.cast("string").as("v"): _*)
    val pv = if (carryCols.isEmpty) keyed.distinct() else keyed
    val keep = (carryCols :+ "v").map(col)
    val pbits = bloomPositions(pv, keep, col("v"))
      .select(keep
        :+ shiftright(col("pos"), 5).cast("int").as("word")
        :+ expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 31 AS INT))")
          .as("mask"): _*)
    // NULL-SAFE group join: a NULL group-key value is a legitimate
    // group in the word table (groupBy treats NULL as a key), so a
    // plain equi-join would orphan that group's own words and read a
    // PRESENT value as hit = 0 — a false negative that breaks the
    // one-sided law. `<=>` on the group columns; `word` needs no such
    // care (positions of a non-null v are never null, and NULL probe
    // values fall through to the coalesce below).
    val wKeyed = collapsed.select(
      groupCols.map(c => col(c).as(s"_w_$c"))
        :+ col("word").as("_w_word") :+ col("bits"): _*)
    groups.crossJoin(broadcast(pbits))
      .join(wKeyed,
        (groupCols.map(c => col(c) <=> col(s"_w_$c"))
          :+ (col("word") === col("_w_word"))).reduce(_ && _), "left")
      .withColumn("bit_set",
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0L)
          .cast("long"))
      .groupBy((groupCols ++ carryCols :+ "v").map(col): _*)
      // NULL probe values were never inserted at build (bloomWords
      // filters them), so "definitely absent" — hit 0, not NULL
      .agg(coalesce(min(col("bit_set")), lit(0L)).as("hit"))
  }

  /** Build the persisted membership sketch — same layout contract as
    * the sibling families (params + generation-0 words). */
  def buildBloomIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      groupCols: Seq[String],
      value: Column): Long = {
    import spark.implicits._
    require(groupCols.forall(c => !bloomReserved.contains(c)),
      s"group columns collide with sketch columns: $groupCols")
    Snapshots.commit(spark,
      Seq((groupCols.mkString(","), BloomBits, BloomK))
        .toDF("group_cols", "bloom_bits", "bloom_k"),
      s"$indexDir/params")
    Snapshots.commit(spark,
      bloomWords(df, groupCols, value).withColumn("gen", lit(0L)),
      s"$indexDir/words",
      statsColumns = "gen" +: groupCols :+ "word")
  }

  /** O(batch) add: the batch's own words under a fresh generation —
    * zero reads, base files ride by reference; OR is idempotent, so
    * (unlike count-min) even a replayed batch cannot corrupt the
    * filter. Gen stamps derive from the merge attempt's base (the CAS
    * contract of [[addToHllIndex]]). */
  def addToBloomIndex(
      spark: SparkSession,
      df: DataFrame,
      indexDir: String,
      value: Column): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    Snapshots.mergeDerived(spark, s"$indexDir/words",
      key = "gen" +: groupCols :+ "word",
      statsColumns = "gen" +: groupCols :+ "word",
      scoped = true) { base =>
      bloomWords(df, groupCols, value).withColumn("gen", lit(base))
    }
  }

  /** OR-collapse the generations back to one row per word. */
  def foldBloomIndex(spark: SparkSession, indexDir: String): Long = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/words"
    val collapsed = Snapshots.read(spark, dir)
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(expr("bit_or(bits)").as("bits"))
      .withColumn("gen", lit(0L))
    Snapshots.commit(spark, collapsed, dir,
      statsColumns = "gen" +: groupCols :+ "word")
  }

  /** Serve membership for a probe batch from the persisted words —
    * never touches the source corpus. */
  def bloomServe(
      spark: SparkSession,
      indexDir: String,
      probes: DataFrame,
      value: Column,
      asOf: Option[Long] = None,
      carryCols: Seq[String] = Nil): DataFrame = {
    val groupCols = readGroupCols(spark, indexDir)
    val dir = s"$indexDir/words"
    val words = asOf match {
      case Some(v) => Snapshots.readVersion(spark, dir, v)
      case None => Snapshots.read(spark, dir)
    }
    bloomProbe(words, groupCols, probes, value, carryCols)
  }
}
