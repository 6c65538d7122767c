package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraphStore

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("jsonl corpus: distributed write → schema-explicit read roundtrips exactly") {
    import graft.sources.CorpusIO
    val out = Files.createTempDirectory("graft-jsonl").resolve("docs").toString
    val docs = Tables.documents(spark, sf)
    CorpusIO.writeJsonl(docs, out)
    val back = CorpusIO.readJsonl(spark, out)
    assert(back.schema == CorpusIO.documentSchema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("jsonl corpus: FAILFAST read refuses a corrupt line; permissive read quarantines it") {
    import graft.sources.CorpusIO
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.write(dir.resolve("part-0.json"),
      ("""{"doc_id":1,"text":"ok","lang":"en","source":"a","n_chars":2}""" +
        "\nnot json at all\n").getBytes("UTF-8"))
    intercept[org.apache.spark.SparkException] {
      CorpusIO.readJsonl(spark, dir.toString).count()
    }
    // Spark disallows querying ONLY the corrupt-record column straight
    // off the raw file — materialise the parse first (its own guidance)
    val triaged = CorpusIO.readJsonl(spark, dir.toString, permissive = true).cache()
    try {
      assert(triaged.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(triaged.filter(col("_corrupt_record").isNull).count() == 1)
    } finally triaged.unpersist()
  }

  test("csv reader: latin-1 + empty-string null semantics") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("users.csv")
    // latin-1 bytes incl. 0xE9 (é)
    Files.write(f, "id,location,age\n1,Montréal,30\n2,,\n".getBytes("ISO-8859-1"))
    val df = GraphStore.readCsv(spark, f.toString)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "Montréal")
    assert(rows(1).getString(1) == "")   // missing → empty string, not null
  }

  test("partitioned user nodes prune to one community directory") {
    val out = java.nio.file.Files.createTempDirectory("graft-prune").toString
    GraphStore.saveGraph(spark, sf, out)
    val one = spark.read.parquet(s"$out/nodes_user")
      .filter(org.apache.spark.sql.functions.col("community") === 1)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*community[^\\]]*\\].*"),
      s"no partition pruning in:\n$scan")
    assert(one.count() > 0)
  }

  test("graph store round-trips nodes and edges through parquet") {
    val out = Files.createTempDirectory("graft-store").toString
    val stats = GraphStore.saveGraph(spark, sf, out).head()
    val nUsers = stats.getLong(0)
    val nBooks = stats.getLong(1)
    val nEdges = stats.getLong(2)
    assert(nUsers > 0 && nBooks > 0 && nEdges >= nUsers)
    // reopened edge table matches the in-memory edge table exactly
    val reread = spark.read.parquet(s"$out/edges_rated")
    val orig = graph.RatingsGraph.ratings(spark, sf)
    assert(reread.count() == orig.count())
    assert(reread.exceptAll(orig).isEmpty && orig.exceptAll(reread).isEmpty)
  }

  test("orc corpus: roundtrips exactly and pushes filters + pruning to the reader") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/docs"
    sources.CorpusIO.writeOrc(docs, path)
    val reread = sources.CorpusIO.readOrc(spark, path)
    assert(reread.schema == docs.schema)
    assert(reread.exceptAll(docs).isEmpty && docs.exceptAll(reread).isEmpty)
    val plan = reread.filter(col("lang") === "en").select(col("doc_id"), col("lang"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      s"ORC scan lost the pushed filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"ORC scan reads more than the projected columns:\n$plan")
  }
}
