package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import sources.TarIngest

/** USTAR container round trip: hand-rolled writer ↔ parser parity, long
  * names, padding edges, gzip path, staged-fixture losslessness. */
class TarIngestSpec extends SparkSpec {

  private def roundTrip(entries: Seq[(String, Array[Byte])]): Vector[(String, Array[Byte])] = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (n, b) => TarIngest.writeTarEntry(bos, n, b) }
    bos.write(new Array[Byte](1024))
    TarIngest.parseTar(new ByteArrayInputStream(bos.toByteArray))
  }

  test("writer/parser round trip: names, bytes, block-boundary sizes") {
    val cases = Seq(
      "empty.txt" -> Array.empty[Byte],
      "one.json" -> """{"k":1}""".getBytes(UTF_8),
      "exactly512.bin" -> Array.fill[Byte](512)(7),
      "x511.bin" -> Array.fill[Byte](511)(3),
      "x513.bin" -> Array.fill[Byte](513)(4),
      ("n" * 99) -> "long-name".getBytes(UTF_8))
    val got = roundTrip(cases)
    assert(got.map(_._1) == cases.map(_._1).toVector)
    got.zip(cases).foreach { case ((_, g), (_, e)) =>
      assert(java.util.Arrays.equals(g, e))
    }
  }

  test("header checksum validates against an independent recompute") {
    val bos = new ByteArrayOutputStream()
    TarIngest.writeTarEntry(bos, "a.txt", "hello".getBytes(UTF_8))
    val hdr = bos.toByteArray.take(512)
    val stored = Integer.parseInt(
      new String(hdr, 148, 6, java.nio.charset.StandardCharsets.US_ASCII), 8)
    val sum = hdr.zipWithIndex.map { case (b, i) =>
      if (i >= 148 && i < 156) ' '.toInt else b & 0xff
    }.sum
    assert(stored == sum)
  }

  test("staged tar.gz fixture: every document surfaces once, shard routing by doc_id % 4") {
    val staged = TarIngest.stageTars(spark, sf)
    val entries = TarIngest.read(spark, staged)
    assert(entries.count() == Tables.documents(spark, sf).count())
    val bad = entries.selectExpr(
      "CAST(regexp_extract(archive, 'archive_(\\\\d+)\\\\.tar\\\\.gz', 1) AS BIGINT) AS shard",
      "CAST(regexp_extract(entry, 'doc_(\\\\d+)\\\\.json', 1) AS BIGINT) AS doc_id")
      .filter("doc_id % 4 <> shard").count()
    assert(bad == 0L)
  }
}
