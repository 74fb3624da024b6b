package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VectorMeanAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-label centroids match the exploded groupBy computation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("label", "embedding")
      .as[(Int, Array[Float])]
    val agg = new VectorMeanAggregator(64).toColumn
    val got = emb.groupByKey(_._1).mapValues(_._2).agg(agg).collect().toMap

    val expected = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("label", "posexplode(embedding) as (dim, x)")
      .groupBy("label", "dim")
      .agg(org.apache.spark.sql.functions.avg("x").as("m"))
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("m"))
      }

    assert(got.keySet == expected.keySet)
    for (l <- got.keySet) {
      val g = got(l)
      val e = expected(l)
      assert(g.length == 64)
      g.zip(e).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("empty input yields the zero vector, not a crash") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Int, Array[Float])]
    val agg = new VectorMeanAggregator(4).toColumn
    val out = empty.groupByKey(_._1).mapValues(_._2).agg(agg).collect()
    assert(out.isEmpty)
  }
}
