package graft

import graft.functions.BqCompat._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test (SURVEY §5): argMinBy/argMaxBy against a brute-force
  * in-memory reference over random data with nulls and ties — the
  * subtle tie/null semantics of the fact_trips rollup (A5).
  * Raw ScalaCheck Gen with fixed seeds (scalatestplus bridge is not in
  * the offline cache). */
class ArgMinPropertySpec extends SparkSuite {
  import spark.implicits._

  private val rowGen = for {
    v <- Gen.choose(0, 9)
    k1 <- Gen.option(Gen.choose(0L, 5L))
    k2 <- Gen.choose(0L, 5L)
  } yield (s"v$v-$k1-$k2", k1, k2)

  private val rowsGen = Gen.nonEmptyListOf(rowGen).map(_.take(30))

  /** brute force over (null-last flag, k1 (nulls equal), k2, v). */
  private def bruteMin(rows: List[(String, Option[Long], Long)]): String =
    rows.minBy { case (v, k1, k2) =>
      (if (k1.isEmpty) 1 else 0, k1.getOrElse(Long.MinValue), k2, v)
    }._1

  private def bruteMax(rows: List[(String, Option[Long], Long)]): String =
    rows.maxBy { case (v, k1, k2) =>
      (if (k1.isEmpty) 0 else 1, k1.getOrElse(Long.MinValue), k2, v)
    }._1

  test("argMinBy/argMaxBy match the brute-force reference (nulls + ties)") {
    (1 to 25).foreach { i =>
      val rows = rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      // value appended as final key so ties resolve identically in the
      // brute force and the engine (BigQuery leaves ties free).
      val df = rows.toDF("v", "k1", "k2")
      val got = df.agg(
        argMinBy($"v", $"k1", $"k2", $"v").as("mn"),
        argMaxBy($"v", $"k1", $"k2", $"v").as("mx")).collect().head
      assert(got.getString(0) === bruteMin(rows), s"min mismatch seed=$i $rows")
      assert(got.getString(1) === bruteMax(rows), s"max mismatch seed=$i $rows")
    }
  }
}
