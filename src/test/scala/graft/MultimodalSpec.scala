package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("vad: segments are maximal speech runs; accounting conserved") {
    val rows = operators.Multimodal.mmAudioVad(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Long]("n_frames"); val ns = r.getAs[Long]("n_speech")
      val nseg = r.getAs[Long]("n_segments")
      val starts = r.getAs[String]("seg_starts")
      assert(ns <= nf)
      assert(r.getAs[Long]("speech_bp") == ns * 10000 / nf)
      // segment count matches the csv, zero segments ⟺ zero speech frames
      if (ns == 0) assert(nseg == 0 && starts.isEmpty)
      else {
        assert(nseg >= 1 && starts.split(",").length == nseg)
        // maximal runs: #segments can't exceed #speech frames, and starts
        // are strictly increasing (zero-padded so string order = numeric)
        assert(nseg <= ns)
        val s = starts.split(",").map(_.toInt)
        assert(s.zip(s.tail).forall { case (a, b) => a < b })
      }
      // mean-threshold VAD can't mark every frame: a frame strictly above
      // the mean implies another strictly below
      assert(ns < nf || nf == 1)
    }
    // at least some docs actually have detected speech segments
    assert(rows.count(_.getAs[Long]("n_segments") > 0) > rows.length / 2)
  }

  test("audio fingerprint: landmarks hand-recompute from frame energies") {
    val rows = operators.Multimodal.mmAudioFingerprint(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    rows.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val nf = text.length / 32
      assert(r.getAs[Long]("n_frames") == nf && nf > 2)
      val energy = (0 until nf).map { f =>
        (0 until 32).map { j =>
          val v = text.charAt(f * 32 + j).toLong - 128L; v * v
        }.sum
      }
      val peaks = (1 until nf - 1)
        .filter(f => energy(f) > energy(f - 1) && energy(f) >= energy(f + 1))
      val landmarks = peaks.zipWithIndex.flatMap { case (f, i) =>
        Seq(1, 2).flatMap { k =>
          peaks.lift(i + k).filter(_ - f <= 16).map { ft =>
            ((energy(f) % 997) * 997 + (energy(ft) % 997)) * 64 + (ft - f)
          }
        }
      }
      assert(r.getAs[Long]("n_landmarks") == landmarks.length.toLong,
        s"landmarks of doc ${r.getAs[Long]("doc_id")}")
      if (landmarks.nonEmpty) {
        assert(r.getAs[Long]("n_distinct_fp") == landmarks.distinct.length.toLong)
        assert(r.getAs[Long]("fp_min") == landmarks.min)
        assert(r.getAs[Long]("fp_max") == landmarks.max)
        assert(r.getAs[Long]("fp_checksum") == landmarks.sum % 1000000007L)
      }
    }
  }

  test("phash: identical images collide; 1-char noise moves few bits, new image many") {
    import SparkSpec.spark.implicits._
    def hamming(a: String, b: String): Int =
      a.zip(b).map { case (x, y) =>
        Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
      }.sum
    val base = "the quick brown fox jumps over the lazy dog " * 6
    val fixtures = Seq(
      (0L, base),                                  // original
      (1L, base),                                  // exact duplicate
      (2L, base.updated(20, 'X')),                 // one-pixel noise
      (3L, "zzz completely different content qqq " * 7)) // different image
    val h = operators.Multimodal
      .phashOn(SparkSpec.spark, fixtures.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("phash")).toMap
    assert(h.values.forall(_.length == 16))
    assert(h(0L) == h(1L), "identical images must collide")
    val noise = hamming(h(0L), h(2L))
    val diff = hamming(h(0L), h(3L))
    assert(noise <= 12, s"1-char perturbation moved $noise bits")
    assert(diff > noise, s"different image ($diff bits) not farther than noise ($noise)")
    // and the driver-corpus run emits one 16-hex row per doc, keeper <= id
    val real = operators.Multimodal.mmPhash(spark, sf).collect()
    assert(real.length == Tables.documents(spark, sf).count())
    real.foreach { r =>
      assert(r.getAs[String]("phash").matches("[0-9a-f]{16}"))
      assert(r.getAs[Long]("keeper") <= r.getAs[Long]("doc_id"))
    }
  }

  test("image tiles: full grid per doc, hand-recomputed tile content matches") {
    import operators.Multimodal
    val rows = Multimodal.mmImageTile(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, tiles) =>
      val w = (id % 3) * 8 + 16
      val h = (id / 3 % 3) * 8 + 16
      assert(tiles.length == (w / 8) * (h / 8), s"doc $id tile count")
      val px = texts(id).padTo(1024, '.').take(1024).mkString
      tiles.foreach { t =>
        val (tx, ty) = (t.getAs[Long]("tx"), t.getAs[Long]("ty"))
        val content = (0 until 8).map { r =>
          val start = ((ty * 8 + r) * w + tx * 8).toInt
          px.substring(start, start + 8)
        }.mkString
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(content.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        assert(t.getAs[String]("tile_md5") == md5, s"doc $id tile ($tx,$ty)")
        assert(t.getAs[Long]("ink_px") == content.count(_ != '.'))
      }
    }
  }

  test("shot boundaries hand-recompute from sampled first-byte intensities") {
    import operators.Multimodal
    val rows = Multimodal.mmVideoShotBoundary(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.nonEmpty && rows.exists(_.getAs[Long]("n_cuts") > 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val body = texts(id).getBytes("UTF-8")
      val nFrames = id % 512 + 16
      val stride = math.max(1L, nFrames / 8)
      val fb = math.max(1L, body.length / nFrames)
      val idxs = (0L until nFrames by stride).take(8)
        .filter(_ * fb < body.length)
      val intens = idxs.map(i => (body((i * fb).toInt) & 0xFF).toLong)
      val cuts = idxs.zip(intens).sliding(2).collect {
        case Seq((_, a), (i, b)) if math.abs(b - a) > 16 => i
      }.toSeq
      assert(r.getAs[Long]("n_sampled") == idxs.length, s"doc $id sampled")
      assert(r.getAs[Long]("n_cuts") == cuts.length, s"doc $id cuts")
      assert(r.getAs[Long]("n_shots") == cuts.length + 1, s"doc $id shots")
      assert(r.getAs[String]("cut_frames") == cuts.sorted.mkString(","), s"doc $id csv")
    }
  }

  test("every payload decodes and dims match the declared metadata") {
    val s = spark
    import s.implicits._
    val decoded = Multimodal.withPayload(spark, sf).as[Multimodal.MediaRow]
      .mapPartitions(rows => rows.map(r => (r.doc_id, r.meta.declared_w, r.meta.declared_h)))
      .toDF("doc_id", "dw", "dh")
    val stats = Multimodal.mmDecodeStats(spark, sf).collect()
    assert(stats.map(_.getAs[Long]("n_media")).sum == Tables.documents(spark, sf).count())
    stats.foreach(r => assert(r.getAs[Long]("n_decoded") == r.getAs[Long]("n_media"),
      s"decode failures in ${r.getAs[String]("source")}"))
    // spot-check a full row roundtrip: decode reproduces declared dims
    val full = Multimodal.withPayload(spark, sf).as[Multimodal.MediaRow].collect()
    full.take(50).foreach { r =>
      val w = ((r.payload(4) & 0xFF) << 8) | (r.payload(5) & 0xFF)
      val h = ((r.payload(6) & 0xFF) << 8) | (r.payload(7) & 0xFF)
      assert(w == r.meta.declared_w && h == r.meta.declared_h)
    }
  }

  test("payload is header + utf8 body, byte-exact") {
    val s = spark
    import s.implicits._
    val row = Multimodal.withPayload(spark, sf).as[Multimodal.MediaRow].head()
    assert(new String(row.payload.slice(0, 4), "UTF-8") == "GRFT")
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === row.doc_id).select("text").head().getString(0)
    assert(row.payload.drop(8).sameElements(text.getBytes("UTF-8")))
  }

  test("frame sampling: <= 8 uniform-stride frames per doc, in-range, byte-accounted") {
    val s = spark
    import s.implicits._
    val meta = Multimodal.withPayload(spark, sf).as[Multimodal.MediaRow]
      .collect().map(r => r.doc_id ->
        (r.meta.declared_w.toLong, r.payload.length.toLong - 8L)).toMap
    val rows = Multimodal.mmFrameSample(spark, sf).collect()
    assert(rows.length == meta.size, "one row per document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nFrames, bodyLen) = meta(id)
      val stride = math.max(1L, nFrames / 8)
      val n = r.getAs[Long]("n_sampled")
      assert(n >= 1 && n <= 8, s"doc $id: $n frames sampled")
      assert(n == math.min(8L, (nFrames - 1) / stride + 1), s"doc $id: stride not uniform")
      assert(r.getAs[Long]("max_idx") == (n - 1) * stride, s"doc $id: wrong last index")
      assert(r.getAs[Long]("n_frames") == nFrames)
      // exact byte accounting: frame idx starts at body offset idx*frameBytes
      // and is clipped by the payload end (declared frame counts can exceed
      // the body, so tail frames may be legitimately empty)
      val frameBytes = math.max(1L, bodyLen / nFrames)
      val expectedBytes = (0L until n).map(_ * stride)
        .map(idx => math.max(0L, math.min(frameBytes, bodyLen - idx * frameBytes)))
        .sum
      assert(r.getAs[Long]("sampled_bytes") == expectedBytes,
        s"doc $id: ${r.getAs[Long]("sampled_bytes")} vs $expectedBytes")
    }
  }

  test("audio chunks: overlap accounting and byte-exact chunk starts") {
    import org.apache.spark.sql.functions._
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val rows = operators.Multimodal.mmAudioChunk(spark, sf).collect()
    assert(rows.length == texts.count(_._2.nonEmpty))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val body = texts(id).getBytes("UTF-8")
      val starts = 0L.until(body.length.toLong, 48L)
      assert(r.getAs[Long]("n_chunks") == starts.size, s"doc $id chunk count")
      assert(r.getAs[Long]("chunked_bytes") ==
        starts.map(s0 => math.min(64L, body.length - s0)).sum, s"doc $id bytes")
      assert(r.getAs[Long]("first_byte_sum") ==
        starts.map(s0 => body(s0.toInt).toLong).sum,
        s"doc $id: a chunk does not start at the exact byte offset")
    }
  }

  test("byte histogram: matches a local recount of raw payload bytes") {
    val rows = operators.Multimodal.mmByteHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val payloads = operators.Multimodal.withPayload(spark, sf)
      .select("source", "payload").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Array[Byte]]("payload"))
    val counts = payloads.groupBy(_._1).map { case (src, ps) =>
      src -> ps.flatMap(_._2).groupBy(b => b & 0xFF).map { case (b, a) => b -> a.length }
    }
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val want = counts(src)
      val top = want.toSeq
        .map { case (b, n) => (n.toLong, f"$b%02X") }
        .sortBy { case (n, h) => (-n, h) }.take(8)
      val got = rs.sortBy(_.getAs[Long]("rk"))
        .map(r => (r.getAs[Long]("n"), r.getAs[String]("byte_hex")))
      assert(got.toSeq == top, s"$src top bytes")
      rs.foreach(r => assert(r.getAs[Long]("n_distinct_bytes") == want.size))
    }
  }

  test("image neardup: blocked pairs equal the all-pairs hamming recompute") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Multimodal.mmImageNeardup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    // all-pairs truth from the phash relation itself
    val hs = operators.Multimodal.mmPhash(spark, sf)
      .select(col("doc_id"), col("phash")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        java.lang.Long.parseUnsignedLong(r.getAs[String]("phash"), 16)))
    val truth = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).sortBy(x => (x._1, x._2))
    assert(rows.toSeq == truth.toSeq, "pigeonhole blocking lost a pair")
    // exact phash dups (mm_phash is_dup) appear here at hamming 0
    val dupPairs = operators.Multimodal.mmPhash(spark, sf)
      .filter(col("is_dup")).select(col("keeper"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val zero = rows.filter(_._3 == 0L).map(x => (x._1, x._2)).toSet
    dupPairs.foreach { case (k, d) => assert(zero((k, d)) ||
      rows.exists(r => r._1 == k && r._2 == d && r._3 == 0L)) }
  }

  test("audio snr: dB ratio recomputes from the frame-energy split") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Multimodal.mmAudioSnr(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 32)
    assert(rows.length == docs.length)
    val byId = docs.toMap
    rows.foreach { r =>
      val t = byId(r.getAs[Long]("doc_id"))
      val nf = t.length / 32
      val energies = (0 until nf).map { f =>
        (0 until 32).map { j =>
          val v = t.charAt(f * 32 + j).toLong - 128; v * v
        }.sum
      }
      val tot = energies.sum
      val speech = energies.map(e => e * nf > tot)
      val (se, ns) = (energies.zip(speech).filter(_._2).map(_._1).sum,
        speech.count(identity).toLong)
      val (ne, nn) = (energies.zip(speech).filterNot(_._2).map(_._1).sum,
        speech.count(!_).toLong)
      assert(r.getAs[Long]("n_frames") == nf.toLong)
      assert(r.getAs[Long]("n_speech") == ns)
      assert(r.getAs[Long]("n_noise") == nn)
      if (ns > 0 && nn > 0 && ne > 0 && se > 0) {
        val snr = 10000 * math.log10(se.toDouble * nn / (ne.toDouble * ns))
        assert(math.abs(r.getAs[Long]("snr_db_milli") - math.round(snr)) <= 1)
        // speech frames are above the mean by construction => SNR > 0
        assert(r.getAs[Long]("snr_db_milli") > 0)
      } else assert(r.isNullAt(r.fieldIndex("snr_db_milli")))
    }
  }
}
