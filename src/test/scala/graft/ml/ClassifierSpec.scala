package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q34 smoke (SURVEY §5 item 5): the classifier must beat chance by a
  * wide margin on the fixture labels.
  */
class ClassifierSpec extends SparkSpec {

  test("classifier reaches the accuracy floor on sf0.001 embeddings") {
    val pred = Classifier.trainPredict(spark, sf001)
    val acc = pred
      .agg(avg(when(col("label") === col("prediction"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    info(s"train accuracy = $acc")
    // The fixture labels carry ~40% learnable signal (a nearest-centroid
    // classifier reaches 0.37, multinomial LR 0.41), so the floor is 3×
    // chance, not an absolute bar.
    assert(acc > 0.3, s"accuracy $acc below floor (chance = 0.1)")
  }

  test("q34 confusion counts cover all true labels and sum to corpus size") {
    val rows = Classifier.queries("q34_digit_classifier")(spark, sf001).collect()
    assert(rows.map(_.getLong(2)).sum == 500L)
    assert(rows.map(_.getInt(0)).distinct.length == 10)
  }
}
