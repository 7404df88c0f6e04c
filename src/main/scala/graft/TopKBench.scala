package graft

import graft.functions.TopKAgg
import graft.sources.Sources
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Head-to-head for the two top-k-per-group plans at SPARK_GRAFT_SF_DIR:
  * the TopKMin bounded-heap aggregate (Θ(groups·k) shuffle) vs
  * row_number window filter (Θ(input) shuffle + per-group sort), over
  * the high-cardinality user_id key. Prints one JSON line; min of two
  * runs per form (Bench's contention armor). */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Engine.withScratch(
      org.apache.spark.sql.SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    TopKAgg.register(spark)

    val e = Sources.table(spark, sfDir, "events")
      .withColumn("cents", round($"value" * 100).cast(LongType))
      .select($"user_id", $"cents", $"event_id")
    e.count() // warmup: session + parquet footers

    def heap(k: Int) = e.groupBy($"user_id")
      .agg(expr(s"topk_min(struct(cents, event_id), $k)").as("tk"))
      .select($"user_id", explode($"tk").as("t"))
    def window(k: Int) = {
      val w = Window.partitionBy($"user_id").orderBy($"cents", $"event_id")
      e.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
    }

    def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val samples = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = df.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (samples.map(_._1).min, samples.head._2)
    }

    // shuffle-record counts are the 100 TB-relevant comparison (wall
    // clock at sf0.1 local is dominated by fixed costs): execute with
    // AQE off so the static plan's ShuffleExchange metrics are live,
    // then sum shuffleRecordsWritten across the plan.
    def shuffleRecords(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.toRdd.count()
      qe.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum
    }

    val out = Seq(5, 50).flatMap { k =>
      val (hs, hr) = time(heap(k))
      val (ws, wr) = time(window(k))
      assert(hr == wr, s"row mismatch at k=$k: heap=$hr window=$wr")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val hRec = shuffleRecords(heap(k))
      val wRec = shuffleRecords(window(k))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      Seq(s""""heap_k$k":${"%.2f".format(hs)}""",
        s""""window_k$k":${"%.2f".format(ws)}""",
        s""""heap_k${k}_shuffle_rows":$hRec""",
        s""""window_k${k}_shuffle_rows":$wRec""")
    }
    println(s"""{"bench":"topk","sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}
