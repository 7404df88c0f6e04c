package graft

import graft.streaming.StreamingModels
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery — the half of exactly-once the gated
  * drains don't exercise (they run each job once): a stateful
  * streaming aggregation stopped mid-source and RESTARTED from the
  * same checkpoint must (1) recover its aggregation state (the
  * pre-stop partial sums keep accumulating, not reset), (2) not
  * reprocess the files the first run committed, and (3) leave
  * untouched keys intact through the lake sink's mergeKeys upsert. */
class StreamingRestartSpec extends SparkSuite {
  import spark.implicits._

  test("stateful agg + lake sink recover across a restart") {
    val src = java.nio.file.Files.createTempDirectory("graft_rs_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rs_out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_rs_cp").toString

    // file 1: two keys on day 1
    Seq(("a", "2025-01-01", 1L), ("b", "2025-01-01", 2L))
      .toDF("k", "service_day_local", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def start() = {
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .groupBy($"service_day_local", $"k")
        .agg(sum($"v").as("v"))
      StreamingModels.sinkByServiceDay(agg, out, cp,
        mergeKeys = Seq("service_day_local", "k")).start()
    }

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val r1 = spark.read.parquet(out)
      .select($"k", $"v").as[(String, Long)].collect().toMap
    assert(r1 === Map("a" -> 1L, "b" -> 2L))

    // file 2 lands while the query is DOWN: more mass for key a on
    // day 1 (state must resume from 1, not restart at 0) and a new
    // key c on day 2
    Seq(("a", "2025-01-01", 10L), ("c", "2025-01-02", 5L))
      .toDF("k", "service_day_local", "v")
      .coalesce(1).write.mode("append").parquet(src)

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val r2 = spark.read.parquet(out)
      .select($"k", $"v").as[(String, Long)].collect().toMap
    // a = 11 proves BOTH recovery directions: state recovered (not
    // 10, which a fresh-state run would emit) and file 1 not
    // reprocessed (not 12, which a re-read would emit); b = 2 proves
    // the mergeKeys upsert kept the untouched key
    assert(r2 === Map("a" -> 11L, "b" -> 2L, "c" -> 5L),
      s"restart recovery broken: $r2")
  }
}
