package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.operators.SourceQueries
import graft.sources.{KvDataWriter, KvSource}

/** Round-12 batch-19: DSv2 staged-commit write path (KvSource) and
  * the media metadata-strip audit.
  */
class Widening12pSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dsv2 write roundtrip: every row survives, nothing extra appears") {
    val expect = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = SourceQueries.dsv2WriteRoundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = expect.groupBy(_._2).map { case (s, os) =>
      (s, os.length.toLong, os.map(_._1).sum)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want, "roundtrip rollup matches source of truth")
    Caches.clearAll()
  }

  test("commit protocol: the read path sees ONLY manifest-listed files") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-kvsink-spec").toString
    spark.range(10).selectExpr("id AS key", "CAST(id % 3 AS STRING) AS val")
      .write.format(classOf[KvSource].getName)
      .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()
    def readAll() = spark.read.format(classOf[KvSource].getName)
      .option("path", dir).load()
    assert(readAll().count() == 10)
    // plant a stray committed-LOOKING file that no manifest lists
    // (the residue of a task whose job never committed) and a temp
    // (a task mid-write) — both must stay invisible
    Files.write(Paths.get(dir, "part-99-99.dat"), "999,ghost\n".getBytes("UTF-8"))
    Files.write(Paths.get(dir, ".part-98-98.dat.tmp"), "998,half".getBytes("UTF-8"))
    assert(readAll().count() == 10, "stray files invisible to the manifest-gated scan")
    assert(readAll().filter(col("val") === "ghost").count() == 0)
    // a SECOND append must MERGE into the manifest, never retract the
    // first job's files (append-as-truncate was a real bug here)
    spark.range(10, 15).selectExpr("id AS key", "CAST(id % 3 AS STRING) AS val")
      .write.format(classOf[KvSource].getName)
      .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()
    assert(readAll().count() == 15, "second append adds rows, keeps the first job's")
    assert(readAll().agg(sum(col("key"))).head().getLong(0) == (0L until 15L).sum)
  }

  test("commit protocol: task abort leaves nothing visible; commit publishes atomically") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-kvsink-abort").toString
    val aborted = new KvDataWriter(dir, 0, 0L)
    aborted.write(org.apache.spark.sql.catalyst.InternalRow(
      1L, org.apache.spark.unsafe.types.UTF8String.fromString("doomed")))
    aborted.abort()
    assert(new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".dat")),
      "aborted task publishes no .dat")
    val committed = new KvDataWriter(dir, 1, 1L)
    committed.write(org.apache.spark.sql.catalyst.InternalRow(
      2L, org.apache.spark.unsafe.types.UTF8String.fromString("kept")))
    val msg = committed.commit()
    assert(new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".dat")) == 1, "commit renames exactly one file")
    assert(new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".tmp")),
      "no temp survives a commit")
    // job abort removes even task-committed files — a retry starts clean
    new graft.sources.KvBatchWrite(dir).abort(Array(msg))
    assert(new java.io.File(dir).listFiles().forall(!_.getName.endsWith(".dat")),
      "job abort retracts task-committed files")
  }

  test("metadata strip: byte accounting re-derives and the release gate reads zero") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val tagged = ds.filter(_._1 % 3 == 0)
      val metaBytes = tagged.map { case (id, _, _) =>
        s"EXIF:gps=${id % 180};cam=X;".getBytes("UTF-8").length.toLong
      }.sum
      src -> (ds.length.toLong, tagged.length.toLong, metaBytes)
    }
    val got = Multimodal.metadataStrip(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (n, nt, mb) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == ((n, nt)), s"${r.getString(0)} counts")
      assert(r.getLong(3) == (nt * 10000L) / n)
      assert(r.getLong(6) == mb,
        s"${r.getString(0)} bytes removed == injected header bytes exactly")
      assert(r.getLong(4) - r.getLong(5) == mb, "before - after == meta")
      assert(r.getLong(7) == 0L, "release gate: no residual markers")
    }
    Caches.clearAll()
  }
}
