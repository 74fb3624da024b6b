package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation equals the direct groupBy (exact types)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val direct = li
      .groupBy(col("l_returnflag").as("key"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 6))).as("sum_value"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet

    val salted = Salting.saltedSum(
      li, col("l_returnflag"), col("l_orderkey"),
      col("l_quantity").cast(DecimalType(18, 6)), buckets = 16)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet

    assert(salted == direct)
  }

  test("salt spreads a single hot key across buckets") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_returnflag") === "N") // one hot key
    val partials = li
      .select(Salting.saltCol(col("l_orderkey"), 16).as("salt"))
      .groupBy("salt").count().collect()
    assert(partials.length > 8, s"salt collapsed to ${partials.length} buckets")
  }
}
