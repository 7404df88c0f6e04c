package graft

/** Registry integrity: Scala Map literals and Map `++` both silently
  * keep the LAST binding for a duplicated key, so a new query that
  * accidentally reuses an existing name REPLACES the old one while
  * every count stays plausible (the round-13 e_did near-miss — a DiD
  * draft shadowed the registered query INSIDE one Map literal, which
  * no runtime check can see). Scan the SOURCE for registration sites
  * instead: every `"key" -> Q(` across src/main must be globally
  * unique. SparkEntry additionally fails construction on duplicates
  * ACROSS registries. */
class QueryRegistrySpec extends SparkSuite {

  test("every \"key\" -> Q( registration is globally unique in source") {
    import scala.jdk.CollectionConverters._
    val rx = """"([a-z0-9_]+)"\s*->\s*Q\(""".r
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val sites = files.flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      rx.findAllMatchIn(txt).map(m => (m.group(1), f.toString))
    }
    val dups = sites.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, "duplicate query registrations: " +
      dups.map { case (k, fs) =>
        s"$k in ${fs.map(_._2).distinct.mkString(", ")}" }.mkString("; "))
  }

  test("SparkEntry resolves with no cross-registry duplicates") {
    // triggers the lazy construction require; also pins the inventory
    // is non-trivial and every oracle key has a query
    assert(SparkEntry.queries.size >= 294)
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }
}
