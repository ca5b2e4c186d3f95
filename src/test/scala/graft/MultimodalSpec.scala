package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Staging-dir lifecycle for the binaryFile ingest: content
  * fingerprinting (restage when the source table changes), the
  * one-staging-per-source retention rule (stale siblings deleted, so
  * a long-lived host never accumulates old stagings), and owner-only
  * permissions on the world-writable-tmpdir scaffolding. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private val tmp = Paths.get(System.getProperty("java.io.tmpdir"))

  /** The staging dirs binaryIngest owns for source path `dir`. */
  private def stagingsFor(dir: String): Seq[java.io.File] = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"graft-binfiles-$tag-"))
      .toSeq
  }

  /** A private copy of the sf documents table whose mtime/content the
    * test may change (testdata itself is read-only). */
  private def copyCorpus(): java.nio.file.Path = {
    val d = Files.createTempDirectory("graft-mmspec")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      d.resolve("documents.parquet"), StandardCopyOption.COPY_ATTRIBUTES)
    d
  }

  test("restage on source change; stale sibling stagings are deleted") {
    val dir = copyCorpus().toString
    val n1 = Multimodal.binaryIngest(spark, dir).count()
    val first = stagingsFor(dir)
    assert(first.size == 1, s"expected one staging dir, got $first")
    assert(n1 > 0)
    // same source, second run: memoized — same dir, no new staging
    Multimodal.binaryIngest(spark, dir).count()
    assert(stagingsFor(dir).map(_.getName) == first.map(_.getName))
    // rewrite the source in place (fresh mtime ⇒ new fingerprint):
    // the next ingest must stage into a NEW dir and delete the stale
    // sibling — the retention rule that bounds tmp usage to one live
    // staging per source path
    val doc = Paths.get(dir, "documents.parquet")
    val bytes = Files.readAllBytes(doc)
    Thread.sleep(1100) // mtime granularity can be 1 s on some filesystems
    Files.write(doc, bytes)
    val n2 = Multimodal.binaryIngest(spark, dir).count()
    val second = stagingsFor(dir)
    assert(n2 == n1)
    assert(second.size == 1, s"stale staging not reaped: $second")
    assert(second.map(_.getName) != first.map(_.getName),
      "fingerprint did not change on source rewrite")
  }

  test("staging dir is owner-only") {
    val dir = copyCorpus().toString
    Multimodal.binaryIngest(spark, dir).count()
    val staged = stagingsFor(dir).head
    import scala.jdk.CollectionConverters._
    val perms = Files.getPosixFilePermissions(staged.toPath).asScala.toSet
    import java.nio.file.attribute.PosixFilePermission._
    assert(Set(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE).subsetOf(perms))
    assert(perms.intersect(Set(GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
      OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)).isEmpty,
      s"staging dir $staged is not owner-only: $perms")
  }

  test("mm curation funnel narrows monotonically and covers the corpus") {
    val rows = Multimodal.mmCuration(spark, SparkTestSession.sf).collect()
    assert(rows.length == 3, "one row per modality")
    rows.foreach { r =>
      val (tot, can, cur) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cur <= can && can <= tot,
        s"${r.getString(0)}: funnel must narrow ($tot -> $can -> $cur)")
      assert((cur == 0) == (r.getLong(4) == 0), "curated bytes iff curated docs")
    }
    val corpus = Tables.documents(spark, SparkTestSession.sf).count()
    assert(rows.map(_.getLong(1)).sum == corpus, "stage 1 must cover the corpus")
  }

  test("decode codec lifecycle: exactly one construction per partition, one decode per row") {
    // The production form of featureExtract swaps FakeCodec for a real
    // native decoder handle — unserializable and costly, so the ONLY
    // correct lifecycle is construction inside each partition task.
    // This drives the same featureExtractWith seam with a counting
    // codec (itself holding an unserializable MessageDigest handle, so
    // closure-capture regressions fail at submission) and pins the
    // contract: inits == input partitions, decodes == input rows.
    CodecProbe.reset()
    val src = Multimodal.binaryView(spark, SparkTestSession.sf)
    val nParts = src.rdd.getNumPartitions
    val nRows = src.count()
    val out = Multimodal.featureExtractWith(
      spark, SparkTestSession.sf, () => new CountingCodec).collect()
    assert(out.length == nRows.toInt)
    assert(CodecProbe.inits.get() == nParts,
      s"codec must construct once per partition: ${CodecProbe.inits.get()} inits, $nParts partitions")
    assert(CodecProbe.decodes.get() == nRows,
      s"codec must decode once per row: ${CodecProbe.decodes.get()} decodes, $nRows rows")
    // the probe rides the same schema; features must match the default
    // path bit-for-bit so a real-codec swap can't silently change shape
    val dflt = Multimodal.featureExtract(spark, SparkTestSession.sf).collect()
    assert(out.sortBy(_.getLong(0)).map(_.toString).toSeq ==
      dflt.map(_.toString).toSeq,
      "counting codec must reproduce the default codec's features")
  }
}

/** Task-side counters for the codec-lifecycle spec — static, so the
  * local-mode executor threads and the assertion read the same cells. */
object CodecProbe {
  val inits = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { inits.set(0); decodes.set(0) }
}

/** Mirrors FakeCodec's features exactly, plus lifecycle counting; the
  * MessageDigest field keeps it unserializable like a real handle. */
final class CountingCodec extends Multimodal.PayloadCodec {
  CodecProbe.inits.incrementAndGet()
  private val md = java.security.MessageDigest.getInstance("MD5")
  def decode(id: Long, payload: Array[Byte]): (Long, Long, Long, Long, Long) = {
    CodecProbe.decodes.incrementAndGet()
    val hex = f"${md.digest(payload)(0)}%02x"
    val headCp =
      if (payload.isEmpty) 0L
      else new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        .codePointAt(0).toLong
    (id, payload.length.toLong,
      128L + hex.charAt(0).toLong, 128L + hex.charAt(1).toLong, headCp)
  }
}
