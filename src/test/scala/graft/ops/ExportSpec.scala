package graft.ops

import java.nio.file.Files

import graft.spark.SparkSpec

class ExportSpec extends SparkSpec {

  test("shard assignment is deterministic, total, and balanced") {
    val a1 = Export.shardAssign(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Export.shardAssign(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2, "assignment not deterministic")
    assert(a1.values.forall(s => s >= 0 && s < Export.DefaultShards))
    // balance: 500 docs over 64 shards ≈ 7.8/shard; no shard should hold
    // more than ~4× the mean under a uniform hash
    val sizes = a1.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.max <= 32, s"skewed shard: ${sizes.toMap}")
  }

  test("growing the corpus never migrates an existing doc's shard") {
    // stability under growth is the property that makes exports
    // incremental: assign over a PREFIX, then over the full table —
    // prefix docs must keep their shards
    val s = spark
    import s.implicits._
    val full = spark.read.parquet(s"$sf001/documents.parquet")
    val dir = Files.createTempDirectory("graft-export-prefix").toString
    full.filter($"doc_id" < 100).write.parquet(s"$dir/documents.parquet")
    val prefix = Export.shardAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Export.shardAssign(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    prefix.foreach { case (id, sh) =>
      assert(whole(id) == sh, s"doc $id migrated $sh -> ${whole(id)}")
    }
  }

  test("sharded export: read-back equals source, partitioned by the assignment") {
    val out = Files.createTempDirectory("graft-export").toString + "/shards"
    val src = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    Export.shardedExport(src, out, numShards = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    // every row landed in its deterministic shard directory
    val assign = Export.shardAssign(spark, sf001, numShards = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    back.select("doc_id", "shard").collect().foreach { r =>
      assert(assign(r.getLong(0)) == r.getInt(1))
    }
    // bounded files per shard: the pre-write clustering means each shard
    // directory holds a small constant number of part files
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8)
    assert(dirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) <= 2),
      "unclustered write: many part files per shard")
  }
}
