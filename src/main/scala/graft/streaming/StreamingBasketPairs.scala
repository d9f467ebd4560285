package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming WINDOWED basket-pair mining — the event-time dual of
  * [[graft.operators.Graph.windowedBasketPairs]]: per day window, the
  * frequent same-basket item pairs, emitted once the watermark closes
  * the day. The association-drift monitor of a live ingest pipeline
  * ("which items started co-occurring today"), and — unlike the
  * stateful-processor operators — built ENTIRELY from declarative
  * chained stateful operators: two event-time window aggregations back
  * to back (Spark's multiple-stateful-operator support), no custom
  * state.
  *
  * Shape: `collect_set` per (window, basket) — set semantics dedup
  * items, so no separate streaming dropDuplicates state — then a size
  * cap, the same array-HOF pair fan-out as the batch operator (no
  * join), and a second windowed count aggregate keyed on the pair.
  * Both aggregates emit in APPEND mode when the watermark passes the
  * window end, so results are final on emission and stream ≡ batch per
  * closed day (spec'd).
  *
  * State: one item set per (window, basket) within the watermark, one
  * count per (window, pair) — both expire with their window.
  */
object StreamingBasketPairs {

  case class BEv(user_id: Long, item: Long, ts: Timestamp)

  def detect(spark: SparkSession, events: Dataset[BEv],
      minSupport: Int = 2, maxBasketSize: Int = 20,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    require(minSupport >= 1 && maxBasketSize >= 2,
      s"bad params: minSupport=$minSupport maxBasketSize=$maxBasketSize")
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .filter(size(col("items")).between(2, maxBasketSize))
      .select(col("w"),
        explode(flatten(transform(col("items"), (x, i) =>
          transform(slice(col("items"), i + lit(2), size(col("items"))),
            y => struct(x.as("it_a"), y.as("it_b")))))).as("p"))
      .groupBy(col("w"), col("p.it_a").as("it_a"), col("p.it_b").as("it_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(
        (unix_micros(col("w.start")) / lit(86400000000L)).cast("long")
          .as("epoch_day"),
        col("it_a"), col("it_b"), col("support"))
  }
}
