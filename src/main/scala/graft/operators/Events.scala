package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Public event-analytics operators over any event frame — the
  * warehouse/attribution shapes the registry's `e_*` queries exercise
  * against their DuckDB oracles. All arithmetic is integer (epoch
  * seconds, ppm credit), so results are partitioning-independent. */
object Events {

  /** SCD2 dimension-history build from event-sourced snapshots: per
    * (key, day) take the LAST observed `attr` (ordered-argmax with a
    * unique `tiebreak`), then collapse consecutive equal values into
    * validity intervals with a version sequence.
    *
    * Scale shape: ONE hash exchange on `key` alone up front —
    * HashPartitioning(key) satisfies the clustered distribution of
    * the (key, day) snapshot agg, the version windows, AND the
    * (key, version) interval agg, so no later stage re-shuffles
    * (pinned by PlanAuditSpec for the registered query).
    *
    * Returns (key, version, attr, valid_from_day, valid_to_day,
    * n_days), day as integer epoch-day. */
  def scd2(df: DataFrame, key: String, tsSec: Column, attr: String,
           tiebreak: String): DataFrame = {
    val k = col(key)
    val snap = df
      .select(k, (tsSec / 86400L).cast(LongType).as("day_i"),
        tsSec.as("es"), col(tiebreak).as("tb"), col(attr).as("attr0"))
      .repartition(k)
      .groupBy(k, col("day_i"))
      .agg(max(struct(col("es"), col("tb"), col("attr0"))).as("last"))
      .select(k, col("day_i"), col("last.attr0").as("attr"))
    val wOrd = Window.partitionBy(k).orderBy(col("day_i"))
    snap
      .withColumn("prev", lag(col("attr"), 1).over(wOrd))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("attr"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wOrd))
      .groupBy(k, col("version"))
      .agg(min(col("attr")).as("attr"),
           min(col("day_i")).as("valid_from_day"),
           max(col("day_i")).as("valid_to_day"),
           count(lit(1)).as("n_days"))
      .select(k, col("version"), col("attr"),
        col("valid_from_day"), col("valid_to_day"), col("n_days"))
  }

  /** Linear multi-touch attribution: each conversion splits 1e6 ppm of
    * credit equally across the same key's touch events inside the
    * trailing `windowSec`; credit is summed per channel. Integer ppm
    * (floor div) — no float in the result.
    *
    * Scale shape: the conversion×touch join is keyed on `key`
    * (co-partitioned; fan-out bounded by per-key activity inside the
    * window), and the per-conversion touch count is a window over
    * (key, convId) that RIDES the join's partitioning — no second
    * exchange (pinned by PlanAuditSpec for the registered query).
    *
    * Returns (channel, n_credited, credit_ppm_total). */
  def attributionLinear(df: DataFrame, key: String, tsSec: Column,
                        isConversion: Column, convId: String,
                        isTouch: Column, channel: Column,
                        windowSec: Long): DataFrame = {
    val k = col(key)
    val withEs = df.withColumn("es", tsSec)
    val conv = withEs.filter(isConversion)
      .select(k, col(convId).as("p_id"), col("es").as("p_es"))
    val touch = withEs.filter(isTouch)
      .select(k, channel.as("channel"), col("es").as("t_es"))
    conv.join(touch, Seq(key))
      .filter(col("t_es") <= col("p_es") &&
        col("t_es") > col("p_es") - windowSec)
      .withColumn("n_touch",
        count(lit(1)).over(Window.partitionBy(k, col("p_id"))))
      .withColumn("credit_ppm", expr("1000000 div n_touch"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credited"),
           sum(col("credit_ppm")).as("credit_ppm_total"))
  }
}
