package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Format-agnostic source reads: json and csv round-trips must produce
  * the same rows as the Parquet-defined contract. */
class SourceFormatsSpec extends SparkSuite {
  import spark.implicits._

  test("json and csv round-trip the nation table") {
    val nation = Sources.table(spark, sf(), "nation")
    val base = Files.createTempDirectory("graft_fmt").toString
    nation.write.mode("overwrite").json(s"$base/nation_json")
    nation.write.mode("overwrite").option("header", "true")
      .csv(s"$base/nation_csv")

    val viaJson = Sources.tableAs(spark, s"$base/nation_json", "json",
      Some(nation.schema))
    val viaCsv = Sources.tableAs(spark, s"$base/nation_csv", "csv",
      Some(nation.schema))

    val expect = nation.orderBy($"n_nationkey").collect().map(_.toSeq).toSeq
    assert(viaJson.orderBy($"n_nationkey").collect().map(_.toSeq).toSeq === expect)
    assert(viaCsv.orderBy($"n_nationkey").collect().map(_.toSeq).toSeq === expect)
  }

  test("writeAs round-trips every format through tableAs, partitioned") {
    val docs = Sources.table(spark, sf(), "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val base = Files.createTempDirectory("graft_sink").toString
    val expect = docs.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    Seq("json", "csv", "orc", "parquet").foreach { fmt =>
      Sources.writeAs(docs, s"$base/$fmt", fmt, partitionBy = Seq("lang"))
      val back = Sources.tableAs(spark, s"$base/$fmt", fmt,
          Some(docs.schema))
        // partition column comes back last; restore contract order
        .select($"doc_id", $"lang", $"n_chars")
      assert(back.orderBy($"doc_id").collect().map(_.toSeq).toSeq === expect,
        s"$fmt round-trip diverged")
    }
  }

  test("orc round-trips the region table") {
    val region = Sources.table(spark, sf(), "region")
    val base = Files.createTempDirectory("graft_orc").toString
    region.write.mode("overwrite").orc(s"$base/region_orc")
    val viaOrc = Sources.tableAs(spark, s"$base/region_orc", "orc")
    assert(viaOrc.orderBy($"r_regionkey").collect().map(_.toSeq).toSeq ===
      region.orderBy($"r_regionkey").collect().map(_.toSeq).toSeq)
  }
}
