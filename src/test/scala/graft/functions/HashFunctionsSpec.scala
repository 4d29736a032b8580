package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("codegen'd simhash64 is bit-identical to the HOF formulation") {
    // the HOF version is the independently-derived spec; the corpus gives
    // 500 real multi-language documents
    val mismatches = docs
      .select(
        HashFunctions.simhash64(Dedup.tokens(col("text"))).as("fast"),
        HashFunctions.simhash64Builtin(Dedup.tokens(col("text"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("simhash64 of near-duplicates is close in hamming distance") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs away tonight",
      "the quick brown fox jumps over the lazy dog and runs away today",
      "completely unrelated text about catalyst expression code generation"
    ).toDF("text")
      .select(HashFunctions.simhash64(Dedup.tokens(col("text"))).as("h"))
    val Array(a, b, c) = df.collect().map(_.getLong(0))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(a, b) < hamming(a, c))
    assert(hamming(a, b) <= 8)
  }

  test("simhash64 is registered for SQL and matches the DSL") {
    HashFunctions.register(spark)
    val viaSql = spark
      .sql("SELECT simhash64(array('a', 'b', 'c')) AS h")
      .head().getLong(0)
    val viaDsl = spark.range(1)
      .select(HashFunctions.simhash64(typedlit(Seq("a", "b", "c"))).as("h"))
      .head().getLong(0)
    assert(viaSql == viaDsl)
  }

  test("simhash64 rejects non-array<string> input at analysis time") {
    val err = intercept[Exception] {
      spark.range(3).select(HashFunctions.simhash64(col("id"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("cosine_sim rejects non-float arrays at analysis time") {
    val err = intercept[Exception] {
      spark.range(3)
        .select(typedlit(Seq(1.0, 2.0)).as("v"))
        .select(VectorFunctions.cosineSim(col("v"), col("v")))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("float"))
  }

  test("codegen'd char_ngrams equals the HOF formulation on real docs") {
    // unordered-set equality per doc (first-occurrence order is also
    // preserved, but only the set matters to every consumer)
    val mismatches = docs
      .select(
        array_sort(Dedup.charShingles(col("text"), 5)).as("fast"),
        array_sort(Dedup.charShinglesBuiltin(col("text"), 5)).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("char_ngrams edge cases: short text, empty text, unicode") {
    val rows = Seq(
      (1L, "ab"),       // shorter than n -> whole text
      (2L, ""),         // empty -> [""]
      (3L, "这是一个中文句子") // unicode code points
    ).toDF("id", "t")
      .select(col("id"), Dedup.charShingles(col("t"), 5).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("ab"))
    assert(rows(2L) == Seq(""))
    assert(rows(3L).head == "这是一个中")
    assert(rows(3L).length == 4)
  }

  test("codegen'd word_ngrams equals the HOF formulation on real docs") {
    for (n <- Seq(2, 3, 8)) {
      val mismatches = docs
        .select(
          array_sort(Dedup.wordShingles(col("text"), n)).as("fast"),
          array_sort(Dedup.wordShinglesBuiltin(col("text"), n)).as("slow"))
        .filter(col("fast") =!= col("slow"))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }

  test("word_ngrams edge cases: short text, empty, mixed whitespace/case") {
    val rows = Seq(
      (1L, "one two"),            // shorter than n -> whole token join
      (2L, ""),                   // empty -> [""]
      (3L, "  A\tb  C  d "),      // trim + \s+ split + lowercase
      (4L, "x y x y x")           // repeats dedup to distinct grams
    ).toDF("id", "t")
      .select(col("id"), Dedup.wordShingles(col("t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("one two"))
    assert(rows(2L) == Seq(""))
    assert(rows(3L) == Seq("a b c", "b c d"))
    assert(rows(4L) == Seq("x y x", "y x y"))
  }

  test("word_ngrams_all keeps every occurrence in order; empty below n") {
    import graft.functions.TextShingles
    val rows = Seq(
      (1L, "x y x y x"),   // all 4 bigram occurrences, duplicates kept
      (2L, "solo"),        // shorter than n -> EMPTY (no whole-text rule)
      (3L, "  A\tb  C  ")  // trim + \s+ split + lowercase
    ).toDF("id", "t")
      .select(col("id"), TextShingles.wordNgramsAll(col("t"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("x y", "y x", "x y", "y x"))
    assert(rows(2L) == Seq())
    assert(rows(3L) == Seq("a b", "b c"))

    // occurrence list distinct-ed == the distinct shingle kernel (for
    // texts at or above n words, where the fallback rules differ)
    val mismatches = docs.filter(size(split(trim(col("text")), "\\s+")) >= 2)
      .select(
        array_sort(array_distinct(
          TextShingles.wordNgramsAll(col("text"), 2))).as("all_d"),
        array_sort(Dedup.wordShingles(col("text"), 2)).as("dist"))
      .filter(col("all_d") =!= col("dist"))
      .count()
    assert(mismatches == 0)
  }

  test("simhash_from_hashes matches an independent HOF sign-vote on real docs") {
    // HOF spec over the SAME md5-derived hashes: 60 interpreted passes
    def shr(v: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("shiftright", v, b.cast("int"))
    def shl(v: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("shiftleft", v, b.cast("int"))
    val hs = transform(Dedup.tokens(col("text")),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val slow = aggregate(
      transform(sequence(lit(0), lit(59)), b => {
        val vote = aggregate(hs, lit(0L),
          (acc, h) => acc + when(shr(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(vote > 0, shl(lit(1L), b)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    val mismatches = docs
      .select(Dedup.simhashMd5(col("text")).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("md5-derived token hash equals the external hex formulation") {
    // Spark conv(substring(md5,1,15),16,10) must equal the value DuckDB
    // computes as ('0x' || substring(md5,1,15))::BIGINT — pin one known
    // vector: md5('hello') = 5d41402abc4b2a76..., 0x5d41402abc4b2a7
    val v = spark.range(1)
      .select(conv(substring(md5(lit("hello")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .head().getLong(0)
    assert(v == 419982666956583591L)
  }

  test("codegen'd minhash_signature is bit-identical to the HOF formulation") {
    val mismatches = docs
      .select(
        HashFunctions.minhashSignature(
          Dedup.wordShingles(col("text"), 3), 64).as("fast"),
        HashFunctions.minhashSignatureBuiltin(
          Dedup.wordShingles(col("text"), 3), 64).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("minhash_signature agrees with Dedup.minhashSignature on base hashes") {
    // the Dedup formulation takes pre-hashed shingles; same family
    val mismatches = docs
      .select(Dedup.wordShingles(col("text"), 3).as("sh"))
      .select(
        HashFunctions.minhashSignature(col("sh"), 16).as("fast"),
        Dedup.minhashSignature(
          transform(col("sh"), s => xxhash64(s)), 16).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("minhash_signature rejects non-array<string> at analysis time") {
    val err = intercept[Exception] {
      spark.range(3)
        .select(HashFunctions.minhashSignature(col("id"), 8)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("null and empty token arrays") {
    val rows = Seq(
      (1L, Some(Seq("x"))),
      (2L, Some(Seq.empty[String])),
      (3L, None)
    ).toDF("id", "toks")
      .select(col("id"), HashFunctions.simhash64(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L) == Some(0L)) // no votes -> all bits zero
    assert(rows(3L).isEmpty)     // null in -> null out
    assert(rows(1L).nonEmpty)
  }
}
