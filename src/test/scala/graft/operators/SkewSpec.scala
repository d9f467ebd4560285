package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: identical result to plain join on skewed data, better spread") {
    // 10k rows, 90% on one hot key
    val left = spark.range(10000)
      .select(when($"id" < 9000, lit(7L)).otherwise($"id").as("k"), $"id".as("payload"))
    val right = Seq((7L, "hot"), (9500L, "cold"), (12L, "unmatched-left-absent"))
      .toDF("k", "tag")

    val plain = left.join(right, Seq("k"))
      .select($"k", $"payload", $"tag").as[(Long, Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .select($"k", $"payload", $"tag").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain && plain.size == 9001)

    // the hot key's probe rows now spread across multiple shuffle partitions
    val spread = Skew.saltedJoin(left.repartition(8), right, "k", salt = 8)
      .filter($"k" === 7L)
      .groupBy(spark_partition_id().as("p")).count()
      .count()
    assert(spread > 1, s"hot key still landed in $spread partition(s)")
  }
}
