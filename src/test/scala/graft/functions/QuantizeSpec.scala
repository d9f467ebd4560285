package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round-trip error is bounded by scale/2 per element") {
    val stats = Tables.embeddings(spark, sf).limit(100)
      .select(QuantizeExprs.quantizeStats($"embedding").as("st"))
      .select($"st".getItem(0).as("scale"), $"st".getItem(1).as("maxerr"),
        $"st".getItem(2).as("mse"))
      .as[(Double, Double, Double)].collect()
    assert(stats.nonEmpty)
    stats.foreach { case (scale, maxerr, mse) =>
      assert(scale > 0)
      // half-up rounding puts every value within half a quantization step
      assert(maxerr <= scale / 2 + 1e-12, s"maxerr $maxerr > scale/2 ${scale / 2}")
      assert(mse <= maxerr * maxerr + 1e-18)
    }
  }

  test("quantized payload is int8 in [-127, 127], max magnitude hits 127") {
    val qs = Tables.embeddings(spark, sf).limit(50)
      .select(QuantizeExprs.int8Quantize($"embedding").as("q"))
      .as[Seq[Byte]].collect()
    assert(qs.nonEmpty)
    qs.foreach { q =>
      assert(q.forall(b => b >= -127 && b <= 127))
      // the max-|v| element quantizes to exactly ±127 by construction
      assert(q.exists(b => math.abs(b.toInt) == 127), s"no full-scale element in $q")
    }
  }

  test("zero vectors quantize to zeros with zero error") {
    val df = Seq(Tuple1(Array.fill(8)(0.0f))).toDF("embedding")
    val st = df.select(QuantizeExprs.quantizeStats($"embedding")).as[Seq[Double]].head()
    assert(st == Seq(0.0, 0.0, 0.0))
    val q = df.select(QuantizeExprs.int8Quantize($"embedding")).as[Seq[Byte]].head()
    assert(q.forall(_ == 0))
  }

  test("dequantized cosine stays close to exact cosine (similarity survives int8)") {
    val emb = Tables.embeddings(spark, sf).limit(40).cache()
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("ea"),
      QuantizeExprs.int8Quantize($"embedding").as("qa"),
      QuantizeExprs.quantizeStats($"embedding").getItem(0).as("sa"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("eb"),
      QuantizeExprs.int8Quantize($"embedding").as("qb"),
      QuantizeExprs.quantizeStats($"embedding").getItem(0).as("sb"))
    val deq: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      (q, s) => transform(q, x => x.cast("double") * s)
    val rows = a.crossJoin(b).filter($"ia" < $"ib")
      .select(
        VectorFunctions.cosine($"ea", $"eb").as("exact"),
        VectorFunctions.cosine(deq($"qa", $"sa"), deq($"qb", $"sb")).as("approx"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, ap) =>
      assert(math.abs(e - ap) < 0.02, s"cosine drift: exact $e vs int8 $ap")
    }
  }
}
