package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashing-trick multinomial Naive Bayes ([[TextAnalysis.nbModel]] /
  * [[TextAnalysis.nbClassify]]): a separable corpus must classify
  * correctly, unlabeled documents must score against a frozen model,
  * and degenerate inputs (empty priors, token-free label) must behave
  * by contract.
  */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two cleanly separable classes with disjoint vocabularies
  private lazy val train = Seq(
    (0L, "apple banana cherry fruit", "food"),
    (1L, "banana fruit apple apple", "food"),
    (2L, "cherry apple banana", "food"),
    (3L, "gear piston engine torque", "cars"),
    (4L, "engine torque gear gear", "cars"),
    (5L, "piston engine gear", "cars")
  ).toDF("doc_id", "text", "lang")

  private lazy val model = TextAnalysis.nbModel(train, buckets = 64)
  private lazy val priors = train.groupBy(col("lang").as("label"))
    .agg(count(lit(1)).as("n_docs"))

  test("separable corpus self-classifies perfectly") {
    val got = TextAnalysis.nbClassify(train, model, priors, buckets = 64)
      .join(train.select(col("doc_id"), col("lang")), "doc_id")
      .collect()
    assert(got.length == 6)
    got.foreach(r =>
      assert(r.getAs[String]("label") == r.getAs[String]("lang"),
        s"doc ${r.getAs[Long]("doc_id")}"))
  }

  test("unlabeled documents score against the frozen model") {
    val unlabeled = Seq(
      (10L, "apple cherry snack"),        // food vocabulary + unseen token
      (11L, "torque piston rally")        // cars vocabulary + unseen token
    ).toDF("doc_id", "text")
    val got = TextAnalysis.nbClassify(unlabeled, model, priors, buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("label"))
      .toMap
    assert(got == Map(10L -> "food", 11L -> "cars"))
  }

  test("model counts every hashed token occurrence exactly once") {
    // 6 docs × tokens: food 4+4+3, cars 4+4+3 = 22 total occurrences
    val total = model.agg(sum("cnt")).head().getDouble(0)
    assert(total == 22.0)
    // per-label totals preserved through the hashing
    val byLabel = model.groupBy("label").agg(sum("cnt").as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLabel == Map("food" -> 11.0, "cars" -> 11.0))
  }

  test("empty priors refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.nbClassify(train, model, priors.filter(lit(false)),
        buckets = 64)
    }
    assert(e.getMessage.contains("empty priors"))
  }

  test("a label with no training tokens scores at the smoothing floor, ties break by label") {
    // priors know a third label the token model never saw: every bucket
    // scores 1/buckets under it, and it still competes via its prior
    val withGhost = priors.unionByName(
      Seq(("ghost", 6L)).toDF("label", "n_docs"))
    val got = TextAnalysis.nbClassify(train, model, withGhost, buckets = 64)
      .collect()
    assert(got.length == 6)
    // separable vocab still wins over the smoothing-floor ghost
    got.foreach(r => assert(r.getAs[String]("label") != "ghost"))
  }
}
