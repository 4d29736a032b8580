package graft.operators

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  // NOT cached: a cached full-table documents scan would satisfy other
  // suites' scans through the shared session's CacheManager and break
  // their column-pruning plan assertions (PlanSpec's pruned ReadSchema)
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val toks = docs.select(col("source"),
    explode(Dedup.tokens(col("text"))).as("tok"))

  private def ests(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Double]("n_est"))).toMap

  private def regRows(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "j", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet

  test("registers are deterministic and rho is in range") {
    val a = regRows(Sketches.hllRegisters(toks, Seq("source"), col("tok")))
    val b = regRows(Sketches.hllRegisters(toks, Seq("source"), col("tok")))
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.forall { case (_, j, r) =>
      j >= 0 && j < Sketches.Registers && r >= 1 && r <= Sketches.RhoMax })
  }

  test("estimates track exact distinct counts within HLL error") {
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ests(Sketches.hllCounts(toks, Seq("source"), col("tok")))
    assert(est.keySet == exact.keySet)
    est.foreach { case (src, e) =>
      val n = exact(src).toDouble
      val rel = math.abs(e - n) / n
      info(f"$src: exact=${n.toLong} est=$e%.1f rel=$rel%.4f")
      // m=1024 → σ ≈ 3.2 %; linear counting keeps small groups tighter
      assert(rel <= 0.15, s"$src: est $e vs exact $n")
    }
  }

  test("sketch merge law: halves max-merged equal the whole") {
    val whole = Sketches.hllRegisters(toks, Seq("source"), col("tok"))
    val parts = Sketches
      .hllRegisters(toks.filter(crc32(col("tok")) % 2 === 0),
        Seq("source"), col("tok"))
      .unionByName(Sketches.hllRegisters(
        toks.filter(crc32(col("tok")) % 2 =!= 0),
        Seq("source"), col("tok")))
      .groupBy("source", "j").agg(max(col("r")).cast("int").as("r"))
    assert(regRows(parts) == regRows(whole))
    // and therefore identical estimates, bit-for-bit
    assert(ests(Sketches.hllEstimate(parts, Seq("source"))) ==
      ests(Sketches.hllEstimate(whole, Seq("source"))))
  }

  test("persisted family: append-only adds equal a one-shot build, fold collapses") {
    val one = java.nio.file.Files.createTempDirectory("graft-hll-one").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-hll-inc").toString
    Sketches.buildHllIndex(spark, toks, one, Seq("source"), col("tok"))
    Sketches.buildHllIndex(spark, toks.filter(col("tok") < "m"), inc,
      Seq("source"), col("tok"))
    Sketches.addToHllIndex(spark, toks.filter(col("tok") >= "m"), inc,
      col("tok"))
    val want = ests(Sketches.hllServe(spark, one))
    assert(ests(Sketches.hllServe(spark, inc)) == want)
    // the add appended (no rewrite): every build file still referenced
    val built = Snapshots.readVersion(spark, s"$inc/registers", 1L)
      .inputFiles.toSet
    assert(built.subsetOf(
      Snapshots.read(spark, s"$inc/registers").inputFiles.toSet))
    // fold: one row per register, serve invariant
    val preRows = Snapshots.read(spark, s"$inc/registers").count()
    Sketches.foldHllIndex(spark, inc)
    val folded = Snapshots.read(spark, s"$inc/registers")
    assert(folded.count() <= preRows)
    assert(folded.groupBy("source", "j").count()
      .filter(col("count") > 1).count() == 0)
    assert(ests(Sketches.hllServe(spark, inc)) == want)
    // a shrunken-looking register can never survive a later generation:
    // idempotent re-add of already-counted data changes nothing
    Sketches.addToHllIndex(spark, toks.filter(col("tok") < "m"), inc,
      col("tok"))
    assert(ests(Sketches.hllServe(spark, inc)) == want)
  }

  test("count-min law: estimates never undercount, and mostly exact at this load") {
    val counters = Sketches.cmCounters(toks, Seq("source"), col("tok"))
    val exact = toks.groupBy("source", "tok")
      .agg(count(lit(1)).as("n_exact"))
      .withColumnRenamed("tok", "v")
    val got = Sketches.cmEstimates(counters, toks, Seq("source"), col("tok"))
      .join(exact, Seq("source", "v"))
      .select(col("n_exact"), col("n_est")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    // the hard law: a count-min estimate is NEVER below the true count
    assert(got.forall { case (ex, est) => est >= ex })
    // at this load (hundreds of distinct tokens in 4x1024 cells) the
    // min over 4 rows is almost always collision-free
    val exactFrac = got.count { case (ex, est) => est == ex }.toDouble / got.length
    info(f"count-min exact fraction = $exactFrac%.4f over ${got.length} probes")
    assert(exactFrac >= 0.95)
    // unseen values estimate to zero (all four cells empty or the min is)
    val unseen = Sketches.cmEstimates(counters,
      spark.range(1).select(lit("src0").as("source"),
        lit("zzz-never-a-token-zzz").as("tok")),
      Seq("source"), col("tok")).collect()
    assert(unseen.length == 1)
  }

  test("count-min merge law: halves summed equal the whole") {
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "i", "j", "cnt").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
    val whole = Sketches.cmCounters(toks, Seq("source"), col("tok"))
    val parts = Sketches.cmCounters(toks.filter(crc32(col("tok")) % 2 === 0),
        Seq("source"), col("tok"))
      .unionByName(Sketches.cmCounters(
        toks.filter(crc32(col("tok")) % 2 =!= 0), Seq("source"), col("tok")))
      .groupBy("source", "i", "j").agg(sum(col("cnt")).as("cnt"))
    assert(cells(parts) == cells(whole))
  }

  test("count-min persisted family: disjoint adds equal a one-shot build; fold + as-of") {
    val one = java.nio.file.Files.createTempDirectory("graft-cm-one").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-cm-inc").toString
    val probes = toks.limit(200)
    def served(dir: String, asOf: Option[Long] = None) =
      Sketches.cmServe(spark, dir, probes, col("tok"), asOf).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    Sketches.buildCmIndex(spark, toks, one, Seq("source"), col("tok"))
    val head = toks.filter(col("tok") < "m")
    val v1 = Sketches.buildCmIndex(spark, head, inc, Seq("source"), col("tok"))
    Sketches.addToCmIndex(spark, toks.filter(col("tok") >= "m"), inc,
      col("tok"))
    val want = served(one)
    assert(served(inc) == want)
    // as-of pins the pre-add counters: estimates equal a head-only sketch
    assert(served(inc, asOf = Some(v1)) ==
      Sketches.cmEstimates(
        Sketches.cmCounters(head, Seq("source"), col("tok")),
        probes, Seq("source"), col("tok")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
    // fold collapses to one row per cell, serve invariant
    Sketches.foldCmIndex(spark, inc)
    assert(Snapshots.read(spark, s"$inc/counters")
      .groupBy("source", "i", "j").count()
      .filter(col("count") > 1).count() == 0)
    assert(served(inc) == want)
  }

  test("racing adds land distinct generations — no lost registers or counts") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the lost-update shape the gen CAS closes: two adds that pre-read
    // the same tip would stamp the SAME gen, and the loser's scoped
    // merge would replace the winner's colliding (gen, group, j) rows —
    // register loss for HLL, silent COUNT loss for count-min. The
    // base-derived stamp (mergeDerived) gives every committed add its
    // own gen, so the raced index must equal the one-shot build exactly.
    val thirds = Seq(
      toks.filter(crc32(col("tok")) % 3 === 0),
      toks.filter(crc32(col("tok")) % 3 === 1),
      toks.filter(crc32(col("tok")) % 3 === 2))
    val hllDir = java.nio.file.Files.createTempDirectory("graft-hll-race").toString
    Sketches.buildHllIndex(spark, thirds(0), hllDir, Seq("source"), col("tok"))
    Await.result(Future.sequence(Seq(
      Future(Sketches.addToHllIndex(spark, thirds(1), hllDir, col("tok"))),
      Future(Sketches.addToHllIndex(spark, thirds(2), hllDir, col("tok"))))),
      10.minutes)
    assert(Snapshots.read(spark, s"$hllDir/registers")
      .select("gen").distinct().count() == 3)
    assert(ests(Sketches.hllServe(spark, hllDir)) ==
      ests(Sketches.hllCounts(toks, Seq("source"), col("tok"))))
    val cmDir = java.nio.file.Files.createTempDirectory("graft-cm-race").toString
    Sketches.buildCmIndex(spark, thirds(0), cmDir, Seq("source"), col("tok"))
    Await.result(Future.sequence(Seq(
      Future(Sketches.addToCmIndex(spark, thirds(1), cmDir, col("tok"))),
      Future(Sketches.addToCmIndex(spark, thirds(2), cmDir, col("tok"))))),
      10.minutes)
    assert(Snapshots.read(spark, s"$cmDir/counters")
      .select("gen").distinct().count() == 3)
    val probes = toks.limit(200)
    def got(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got(Sketches.cmServe(spark, cmDir, probes, col("tok"))) ==
      got(Sketches.cmEstimates(
        Sketches.cmCounters(toks, Seq("source"), col("tok")),
        probes, Seq("source"), col("tok"))))
    // the stamp pairs each op's OWN committed versions, never a tip
    // re-read: under this race the manifest must name counters 1, 2, 3
    // exactly once each — a re-read would let the eclipsed add's stamp
    // name the later add's state, leaving its own version unnameable
    val stamps = Snapshots.read(spark, s"$cmDir/versions")
      .select("counters_v").collect().map(_.getLong(0)).toSeq.sorted
    assert(stamps == Seq(1L, 2L, 3L), s"stamped counters pairs: $stamps")
  }

  test("count-min heavy hitters: candidates persist per batch, serve ranks by estimate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-hh").toString
    // skewed synthetic batches with a known global top: "alpha" is the
    // heaviest overall but arrives split across batches; "gamma" is
    // heavy only in batch 2
    import spark.implicits._
    val b1 = (Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 10).map(i => s"rare$i")).map(("s", _)).toDF("source", "v")
    val b2 = (Seq.fill(25)("alpha") ++ Seq.fill(40)("gamma") ++
      (11 to 20).map(i => s"rare$i")).map(("s", _)).toDF("source", "v")
    Sketches.buildCmIndex(spark, b1, dir, Seq("source"), col("v"),
      candK = 4)
    Sketches.addToCmIndex(spark, b2, dir, col("v"))
    val top = Sketches.cmTopK(spark, dir, k = 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("v"),
        r.getAs[Long]("n_est")))
      .sortBy(_._1)
    // global truth: alpha 55, gamma 40, beta 20 — candidates catch all
    // three (each was a batch top-4) and the estimate-ranking is exact
    // at this load (no 4-way cell collisions among ~23 values)
    assert(top.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, "alpha"), (2L, "gamma"), (3L, "beta")), top.toSeq)
    assert(top.map(_._3).toSeq == Seq(55L, 40L, 20L))
    // serving never rescans any corpus: a fold collapses candidate
    // generations and the ranking is invariant
    Sketches.foldCmIndex(spark, dir)
    assert(Sketches.cmTopK(spark, dir, k = 3).collect()
      .map(r => r.getAs[String]("v")).sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))
  }

  test("cmTopK/cmServe as-of pins stay coherent across compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-cpt").toString
    val b1 = (Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 10).map(i => s"rare$i")).map(("s", _)).toDF("source", "v")
    val b2 = (Seq.fill(25)("alpha") ++ Seq.fill(40)("gamma") ++
      (11 to 20).map(i => s"rare$i")).map(("s", _)).toDF("source", "v")
    def topAt(asOf: Option[Long]) =
      Sketches.cmTopK(spark, dir, k = 3, asOf).collect()
        .map(r => (r.getAs[Long]("rank"), r.getAs[String]("v"),
          r.getAs[Long]("n_est"))).toSet
    def freqAt(asOf: Option[Long]) =
      Sketches.cmServe(spark, dir,
        Seq(("s", "alpha"), ("s", "gamma")).toDF("source", "v"),
        col("v"), asOf).collect()
        .map(r => (r.getAs[String]("v"), r.getAs[Long]("n_est"))).toSet
    val p1 = Sketches.buildCmIndex(spark, b1, dir, Seq("source"),
      col("v"), candK = 4)
    val p2 = Sketches.addToCmIndex(spark, b2, dir, col("v"))
    val want1 = topAt(Some(p1)); val want2 = topAt(Some(p2))
    val wantTip = topAt(None); val wantFreq1 = freqAt(Some(p1))
    assert(want1 != want2, "the two pins must differ for this to test anything")
    // compaction bin-packs counters and candidates INDEPENDENTLY —
    // the two tables' raw version numbers advance unevenly, the exact
    // case raw equal-number pairing got wrong; the version manifest
    // must keep every pre-compaction pin serving its original pair,
    // and the post-compaction stamp must serve the repacked tip
    val out = IndexMaintenance.compactIndex(spark, dir,
      minFileBytes = 64L * 1024 * 1024)
    assert(topAt(Some(p1)) == want1, "pin p1 drifted across compaction")
    assert(topAt(Some(p2)) == want2, "pin p2 drifted across compaction")
    assert(topAt(None) == wantTip, "tip serve drifted across compaction")
    assert(freqAt(Some(p1)) == wantFreq1)
    // the restamp landed: a fresh index version pairs the compacted
    // tips and serves identically to the tip
    val latest = Snapshots.read(spark, s"$dir/versions")
      .agg(max("index_version")).head().getLong(0)
    assert(latest > p2, s"expected a post-compaction stamp, got $latest")
    assert(topAt(Some(latest)) == wantTip)
    assert(out.contains("versions"))
  }

  test("pairwise overlap by inclusion-exclusion tracks known intersections") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 (overlap 500), C = 2000..2999 (disjoint)
    val vals = ((0 until 1000).map(i => ("A", s"t$i")) ++
      (500 until 1500).map(i => ("B", s"t$i")) ++
      (2000 until 3000).map(i => ("C", s"t$i"))).toDF("source", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-int").toString
    Sketches.buildHllIndex(spark, vals, dir, Seq("source"), col("v"))
    val got = Sketches.hllIntersectServe(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("n_int"), r.getAs[Double]("n_union"))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val (abInt, abUnion) = got(("A", "B"))
    info(f"A∩B est=$abInt%.1f (exact 500), A∪B est=$abUnion%.1f (exact 1500)")
    // error of a difference of three m=1024 estimates scales with the
    // union (~3.2% each): |est − 500| ≤ 0.1 · 1500
    assert(math.abs(abInt - 500.0) <= 150.0, s"A∩B: $abInt")
    // disjoint pairs estimate near zero on the same scale
    val (acInt, _) = got(("A", "C"))
    assert(math.abs(acInt) <= 150.0, s"A∩C: $acInt")
    assert(abInt > acInt + 200.0, "overlap signal must separate the pairs")
  }

  test("quantile histogram: bucket law, exact small values, quantile bounds") {
    import spark.implicits._
    // every value 0..2000 plus large outliers UP TO Long.MaxValue:
    // rep(bucket(v)) ≤ v and v sits inside the bucket's width (≤ v/16
    // above 16; exact below). The extreme values pin the shift-based
    // slot arithmetic — a multiply spelling overflowed past ~2^59
    val vs = ((0L to 2000L) ++ Seq(1L << 20, (1L << 40) + 12345L,
      (1L << 62) + (1L << 59), Long.MaxValue))
      .map(("g", _)).toDF("g", "x")
    val rows = Sketches.qhBuckets(vs, Seq("g"), col("x"))
      .withColumn("rep", expr(
        "CASE WHEN b < 16 THEN b ELSE " +
          "shiftleft(CAST(1 AS BIGINT), CAST((b - 16) div 16 AS INT) + 4)" +
          " + ((b - 16) % 16) " +
          "* shiftleft(CAST(1 AS BIGINT), CAST((b - 16) div 16 AS INT)) END"))
      .collect()
    assert(rows.nonEmpty)
    // below 16 each value is its own bucket (cnt rows at b = v)
    assert(rows.filter(_.getAs[Long]("b") < 16)
      .forall(r => r.getAs[Long]("rep") == r.getAs[Long]("b")))
    // p100 of the frame = Long.MaxValue's bucket representative: the
    // law holds at the very top of the long range (no overflow)
    val bigEst = Sketches.qhQuantiles(vs, Seq("g"), col("x"), Seq(1.0))
      .collect().head.getAs[Long]("n_est")
    assert(bigEst > 0 && bigEst <= Long.MaxValue &&
      Long.MaxValue - bigEst <= Long.MaxValue / 16 + 1, s"p100 rep $bigEst")
    // exact per-group quantiles: estimate ≤ true ≤ estimate + width
    val data = (1 to 500).map(i => ("a", (i * i).toLong)) ++
      (1 to 300).map(i => ("b", i.toLong))
    val df = data.toDF("src", "x")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Sketches.qhQuantiles(df, Seq("src"), col("x"), qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    for ((src, xs) <- data.groupBy(_._1); q <- qs) {
      val sorted = xs.map(_._2).sorted
      val t = math.ceil(q * sorted.length).toLong.toInt
      val exact = sorted(t - 1)
      val e = est((src, q))
      val width = if (e < 16) 1L else math.max(1L, e / 16)
      assert(e <= exact && exact < e + width + e / 16 + 1,
        s"$src q=$q est=$e exact=$exact")
      // relative error bound: 1/16 above 16, exact below
      if (exact >= 16)
        assert((exact - e).toDouble / exact <= 1.0 / 16 + 1e-9)
      else assert(e == exact)
    }
    // negative values fail loudly
    intercept[Exception] {
      Sketches.qhBuckets(Seq(("g", -1L)).toDF("g", "x"),
        Seq("g"), col("x")).collect()
    }
  }

  test("quantile histogram persisted family: adds equal one-shot, fold, as-of") {
    import spark.implicits._
    val lens = docs.select(col("source"),
      length(col("text")).cast("long").as("len"))
    val qs = Seq(0.5, 0.9, 0.99)
    def served(dir: String, asOf: Option[Long] = None) =
      Sketches.qhServe(spark, dir, qs, asOf).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val one = java.nio.file.Files.createTempDirectory("graft-qh-one").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-qh-inc").toString
    Sketches.buildQhIndex(spark, lens, one, Seq("source"), col("len"))
    val head = lens.filter(col("len") % 2 === 0)
    val v1 = Sketches.buildQhIndex(spark, head, inc, Seq("source"),
      col("len"))
    Sketches.addToQhIndex(spark, lens.filter(col("len") % 2 =!= 0), inc,
      col("len"))
    val want = served(one)
    assert(served(inc) == want)
    // as-of pins the head-only histogram
    assert(served(inc, asOf = Some(v1)) ==
      Sketches.qhQuantiles(head, Seq("source"), col("len"), qs).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet)
    // fold collapses generations; serving invariant
    Sketches.foldQhIndex(spark, inc)
    assert(Snapshots.read(spark, s"$inc/buckets")
      .groupBy("source", "b").count().filter(col("count") > 1).count() == 0)
    assert(served(inc) == want)
  }

  test("qhCdfProbe: carry columns must identify probe rows — dups raise") {
    import spark.implicits._
    val buckets = Sketches.qhBuckets(
      (1L to 100L).map(("g", _)).toDF("g", "x"), Seq("g"), col("x"))
    def probe(rows: (String, String, Long)*) =
      Sketches.qhCdfProbe(buckets, Seq("g"),
        rows.toSeq.toDF("g", "id", "x"), col("x"),
        carryCols = Seq("id")).collect()
    val single = probe(("g", "d1", 50L))
    assert(single.length == 1)
    assert(single.head.getAs[Long]("n_total") == 100L)
    assert(single.head.getAs[Double]("pct") > 0.3 &&
      single.head.getAs[Double]("pct") < 0.7)
    // two probe rows with DISTINCT carry ids and the same value are
    // two output rows (the one-row-per-probe-row contract)
    val two = probe(("g", "d1", 50L), ("g", "d2", 50L))
    assert(two.length == 2)
    assert(two.map(_.getAs[Long]("n_le")).distinct.length == 1)
    // identical (group, carry, value) rows are a CONTRACT BREACH: the
    // bucket-join sum is not duplicate-idempotent, and pre-r16 such
    // rows silently collapsed to one output row (losing a probe). Now
    // they fail loudly, pointing at the unique-id cure.
    val e = intercept[Exception](probe(("g", "d1", 50L), ("g", "d1", 50L)))
    assert(e.getMessage.contains("unique id"),
      s"expected the carry-uniqueness raise, got: ${e.getMessage}")
    // the no-carry spelling keeps its distinct-values semantics
    val plain = Sketches.qhCdfProbe(buckets, Seq("g"),
      Seq(("g", 50L), ("g", 50L)).toDF("g", "x"), col("x")).collect()
    assert(plain.length == 1)
  }

  test("as-of pins the registers snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-ao").toString
    val head = toks.filter(col("tok") < "m")
    val v1 = Sketches.buildHllIndex(spark, head, dir, Seq("source"),
      col("tok"))
    Sketches.addToHllIndex(spark, toks.filter(col("tok") >= "m"), dir,
      col("tok"))
    assert(ests(Sketches.hllServe(spark, dir, asOf = Some(v1))) ==
      ests(Sketches.hllCounts(head, Seq("source"), col("tok"))))
    assert(ests(Sketches.hllServe(spark, dir)) ==
      ests(Sketches.hllCounts(toks, Seq("source"), col("tok"))))
  }

  private def bloomHits(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[String]("v"), r.getAs[Long]("hit"))).toSet

  test("bloom law: present values never probe 0; absent mostly 0") {
    val words = Sketches.bloomWords(toks, Seq("source"), col("tok"))
    val hits = Sketches.bloomProbe(words, Seq("source"),
      toks.select("tok"), col("tok"))
    val present = toks.select(col("source"), col("tok").as("v")).distinct()
    // the one-sided contract: every (group, present value) reads 1
    assert(hits.join(present, Seq("source", "v"), "left_semi")
      .filter(col("hit") === 0).count() == 0)
    // cross-group probes that are ABSENT from a group read 0 almost
    // always at this load (n ≈ thousands of tokens vs m = 2^18 bits:
    // fp well under 1%; bound loosely at 5%)
    val absent = hits.join(present, Seq("source", "v"), "left_anti")
    val fp = absent.agg(avg(col("hit"))).head().getDouble(0)
    info(f"false-positive rate on absent probes: $fp%.5f")
    assert(fp <= 0.05, s"false-positive rate $fp")
  }

  test("bloom persisted family: adds equal one-shot, fold collapses, OR idempotent") {
    val one = java.nio.file.Files.createTempDirectory("graft-bl-one").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-bl-inc").toString
    val probes = toks.select("tok").limit(300)
    Sketches.buildBloomIndex(spark, toks, one, Seq("source"), col("tok"))
    Sketches.buildBloomIndex(spark, toks.filter(col("tok") < "m"), inc,
      Seq("source"), col("tok"))
    Sketches.addToBloomIndex(spark, toks.filter(col("tok") >= "m"), inc,
      col("tok"))
    val want = bloomHits(Sketches.bloomServe(spark, one, probes, col("tok")))
    assert(bloomHits(Sketches.bloomServe(spark, inc, probes, col("tok")))
      == want)
    // fold: one row per word, serve invariant
    Sketches.foldBloomIndex(spark, inc)
    val folded = Snapshots.read(spark, s"$inc/words")
    assert(folded.groupBy("source", "word").count()
      .filter(col("count") > 1).count() == 0)
    assert(bloomHits(Sketches.bloomServe(spark, inc, probes, col("tok")))
      == want)
    // OR is idempotent: re-adding already-ingested data changes nothing
    Sketches.addToBloomIndex(spark, toks.filter(col("tok") < "m"), inc,
      col("tok"))
    assert(bloomHits(Sketches.bloomServe(spark, inc, probes, col("tok")))
      == want)
  }

  test("bloom law holds under NULL group keys and NULL probe values") {
    import spark.implicits._
    // a NULL group key is a legitimate group: its own present values
    // must still probe 1 (the null-safe join), and NULL values are
    // never members — build ignores them, probes answer 0, never NULL
    val df = Seq(
      (Some("g1"), Some("apple")), (Some("g1"), Some("pear")),
      (None: Option[String], Some("kiwi")),
      (None: Option[String], Some("plum")),
      (Some("g1"), None: Option[String])).toDF("source", "tok")
    val words = Sketches.bloomWords(df, Seq("source"), col("tok"))
    val probes = Seq(Some("kiwi"), Some("apple"),
      None: Option[String]).toDF("tok")
    val hits = Sketches.bloomProbe(words, Seq("source"), probes, col("tok"))
      .collect()
      .map(r => (Option(r.getAs[String]("source")),
        Option(r.getAs[String]("v")), r.getAs[Long]("hit"))).toSet
    // every (group, probe) pair answered, hit never NULL
    assert(hits.size == 6, s"expected 2 groups x 3 probes, got $hits")
    // the NULL group's own member probes 1 there (no false negative)
    assert(hits.contains((None, Some("kiwi"), 1L)))
    assert(hits.contains((Some("g1"), Some("apple"), 1L)))
    // NULL probe values read definitely-absent in every group
    assert(hits.filter(_._2.isEmpty).forall(_._3 == 0L))
  }

  test("racing bloom adds land distinct generations — no lost words") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val thirds = Seq(
      toks.filter(crc32(col("tok")) % 3 === 0),
      toks.filter(crc32(col("tok")) % 3 === 1),
      toks.filter(crc32(col("tok")) % 3 === 2))
    val dir = java.nio.file.Files.createTempDirectory("graft-bl-race").toString
    Sketches.buildBloomIndex(spark, thirds(0), dir, Seq("source"), col("tok"))
    Await.result(Future.sequence(Seq(
      Future(Sketches.addToBloomIndex(spark, thirds(1), dir, col("tok"))),
      Future(Sketches.addToBloomIndex(spark, thirds(2), dir, col("tok"))))),
      10.minutes)
    assert(Snapshots.read(spark, s"$dir/words")
      .select("gen").distinct().count() == 3)
    val probes = toks.select("tok").limit(300)
    val whole = Sketches.bloomWords(toks, Seq("source"), col("tok"))
    assert(bloomHits(Sketches.bloomServe(spark, dir, probes, col("tok"))) ==
      bloomHits(Sketches.bloomProbe(whole, Seq("source"), probes,
        col("tok"))))
  }
}
