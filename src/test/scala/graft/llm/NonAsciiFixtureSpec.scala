package graft.llm

import graft.SparkSpec
import graft.tools.NonAsciiFixture
import org.apache.spark.sql.functions._

/** Byte-true contracts on the mixed-script fixture (round 13) — the
  * cases the ASCII driver fixture can't reach: multi-byte UTF-8 cycling
  * in the multimodal codec family, NFC normalization that actually
  * composes something, and the BPE UTF-8 tie-break on a pair where
  * UTF-8 byte order and Java/UTF-16 order disagree.
  *
  * The same fixture also runs through the REAL DuckDB differential via
  * `graft.tools.NonAsciiFixture` + `tools/check.py` (recorded in
  * BASELINE.md round 13); this spec is the in-suite pin.
  */
class NonAsciiFixtureSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = graft.Engine.scratchDir("nafixspec").toString
    NonAsciiFixture.write(spark, d, sf("sf0.001"))
    d
  }

  private def shaOfHex(bytes: Array[Byte]): String = Multimodal.shaOfHex(bytes)

  test("fixture integrity: planted codepoints, NFD sequences, empty doc, determinism") {
    // the load-bearing codepoints — an encoding corruption of the
    // fixture source would fail HERE, not silently weaken the suite
    assert(NonAsciiFixture.tieA.codePoints.toArray.toSeq == Seq(0x1F4A1))
    assert(NonAsciiFixture.tieB.codePoints.toArray.toSeq == Seq(0xE000, 0xE001))
    assert(NonAsciiFixture.pool.exists(_.codePoints.toArray.toSeq ==
      "cafe".codePoints.toArray.toSeq :+ 0x0301), "NFD cafe + combining acute missing")
    assert(NonAsciiFixture.pool.exists(w => w.codePoints.toArray.contains(0x030A) &&
      w.codePoints.toArray.contains(0x0308)), "NFD Angstrom sequence missing")
    assert(NonAsciiFixture.pool.exists(_.codePoints.toArray.exists(_ > 0xFFFF)),
      "supplementary-plane pool word missing")
    val d1 = NonAsciiFixture.docs(spark).collect().sortBy(_.getLong(0))
    val d2 = NonAsciiFixture.docs(spark).collect().sortBy(_.getLong(0))
    assert(d1.toSeq == d2.toSeq, "fixture must be deterministic")
    assert(d1.length == 80 && d1.last.getString(1).isEmpty, "doc 79 must be empty")
    // every non-empty doc is genuinely multi-byte in UTF-8
    d1.dropRight(1).foreach { r =>
      val t = r.getString(1)
      assert(t.getBytes("UTF-8").length > t.codePointCount(0, t.length),
        s"doc ${r.getLong(0)} is pure 1-byte — not exercising multi-byte cycling")
    }
  }

  test("mm codec family is byte-true on multi-byte UTF-8 text") {
    val s = spark
    import s.implicits._
    // empty doc excluded by the media gate on both sides
    val feats = graft.SparkEntry.queries("mm_features")(s, dir)
      .select("doc_id", "n_pixels", "pixel_sha")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(feats.length == 79)
    val texts = NonAsciiFixture.docs(s).filter(length(col("text")) > 0)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    feats.take(12).foreach { case (id, nPix, sha) =>
      val b = texts(id).getBytes("UTF-8")
      val expected = Array.tabulate(nPix.toInt)(i => b(i % b.length))
      assert(sha == shaOfHex(expected),
        s"doc $id: decoded raster diverged from UTF-8 byte cycling")
    }
    val audio = graft.SparkEntry.queries("mm_audio")(s, dir)
      .select("doc_id", "n_samples", "pcm_sha")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(audio.length == 79)
    audio.take(12).foreach { case (id, n, sha) =>
      val b = texts(id).getBytes("UTF-8")
      val pcm = Array.tabulate[Byte](n.toInt)(i => b(i % b.length))
      assert(sha == shaOfHex(pcm), s"doc $id: decoded PCM diverged from UTF-8 byte cycling")
    }
    // frames cycle from a BYTE offset — the contract a char-counting
    // implementation would break on multi-byte text
    val frames = graft.SparkEntry.queries("mm_frames")(s, dir)
      .select("doc_id", "frame_idx", "frame_sig")
      .as[(Long, Int, String)].collect()
    assert(frames.length == 79 * 4)
    frames.filter(_._1 < 3).foreach { case (id, idx, sig) =>
      val b = texts(id).getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5").digest(b)
      val w = 8 + (md(0) & 0x1f); val h = 8 + (md(1) & 0x1f)
      val nf = 4 + ((md(2) & 0xff) % 5)
      val src = idx * nf / 4
      val px = Array.tabulate[Byte](w * h)(p => b((p + src) % b.length))
      assert(sig == shaOfHex(px).substring(0, 12),
        s"doc $id frame $idx: byte-offset cycling diverged")
    }
  }

  test("text_normalize performs real NFC composition on the fixture") {
    val s = spark
    import s.implicits._
    val out = graft.SparkEntry.queries("text_normalize")(s, dir)
      .select("doc_id", "norm_text", "n_norm_chars")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.length == 80)
    val texts = NonAsciiFixture.docs(s)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val nfd = "cafe" + new String(Character.toChars(0x0301))  // NFD: e + combining acute
    val nfc = "caf" + new String(Character.toChars(0x00E9))   // NFC: precomposed e-acute
    var composedSomething = false
    out.foreach { case (id, norm, n) =>
      val expect = java.text.Normalizer.normalize(texts(id), java.text.Normalizer.Form.NFC)
      assert(norm == expect, s"doc $id: engine NFC != java.text.Normalizer NFC")
      assert(n == norm.codePointCount(0, norm.length).toLong, s"doc $id: n_norm_chars")
      if (texts(id).contains(nfd)) {
        composedSomething = true
        assert(!norm.contains(nfd) && norm.contains(nfc),
          s"doc $id: NFD sequence survived normalization")
        assert(n < texts(id).codePointCount(0, texts(id).length),
          s"doc $id: composition must shorten the code-point count")
      }
    }
    assert(composedSomething, "fixture never exercised a real composition — pool regressed?")
  }

  test("BPE tie-break follows UTF-8 byte order, local ≡ distributed, on the planted tie") {
    // premise: the two orders genuinely disagree on the planted pair
    assert(Bpe.utf8Order.compare(NonAsciiFixture.tieB, NonAsciiFixture.tieA) < 0,
      "UTF-8 bytes: private-use (EE..) must sort below the surrogate pair (F0..)")
    assert(Ordering.String.compare(NonAsciiFixture.tieA, NonAsciiFixture.tieB) < 0,
      "UTF-16 units: the surrogate pair (D83D..) must sort below private-use (E000)")

    val docs = NonAsciiFixture.docs(spark)
    val local = Bpe.train(docs, k = 6)                      // collected fast path
    val dist = Bpe.train(docs, k = 6, maxLocalVocab = 0)    // forced distributed loop
    assert(local == dist, "local and distributed BPE must produce identical merges")
    // both tie pairs have the planted global-max count (8 per non-empty
    // doc); the UTF-8 rule must merge the private-use pair FIRST — a
    // Java-natural-order tie-break would put the light bulb's pair at
    // rank 0 (D83D < E000) and diverge from Spark's UTF8String order
    val t0 = NonAsciiFixture.tieB.codePoints.toArray
      .map(cp => new String(Character.toChars(cp)))
    assert(local.head.left == t0(0) && local.head.right == t0(1),
      s"rank-0 merge must be the private-use pair, got ${local.head}")
    assert(local(1).left == t0(0) + t0(1) && local(1).right == Bpe.Eow,
      s"rank-1 must finish the private-use word, got ${local(1)}")
    assert(local(2).left == NonAsciiFixture.tieA && local(2).right == Bpe.Eow,
      s"rank-2 must be the light-bulb pair, got ${local(2)}")
  }

  test("script_profile counts real script blocks on the mixed corpus") {
    val s = spark
    import s.implicits._
    val out = graft.SparkEntry.queries("script_profile")(s, dir)
      .select("doc_id", "n_cp", "n_latin", "n_cyrillic", "n_greek", "n_arabic", "n_cjk", "main_script")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.length == 80)
    val texts = NonAsciiFixture.docs(s)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def inRange(cp: Int, ranges: Seq[(Int, Int)]): Boolean =
      ranges.exists { case (a, b) => cp >= a && cp <= b }
    val latin = Seq(('A'.toInt, 'Z'.toInt), ('a'.toInt, 'z'.toInt), (0xC0, 0x24F))
    val cyr = Seq((0x400, 0x4FF)); val greek = Seq((0x370, 0x3FF))
    val arabic = Seq((0x600, 0x6FF))
    val cjk = Seq((0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xAC00, 0xD7AF))
    out.foreach { case (id, nCp, nL, nCy, nG, nA, nC, main) =>
      val cps = texts(id).codePoints.toArray
      assert(nCp == cps.length.toLong, s"doc $id n_cp")
      assert(nL == cps.count(inRange(_, latin)).toLong, s"doc $id latin")
      assert(nCy == cps.count(inRange(_, cyr)).toLong, s"doc $id cyrillic")
      assert(nG == cps.count(inRange(_, greek)).toLong, s"doc $id greek")
      assert(nA == cps.count(inRange(_, arabic)).toLong, s"doc $id arabic")
      assert(nC == cps.count(inRange(_, cjk)).toLong, s"doc $id cjk")
      val counts = Map("latin" -> nL, "cyrillic" -> nCy, "greek" -> nG,
        "arabic" -> nA, "cjk" -> nC)
      if (counts.values.max == 0L) assert(main == "none", s"doc $id main")
      else assert(counts(main) == counts.values.max, s"doc $id main_script not a maximum")
    }
    // the corpus must actually light up every non-latin class somewhere
    assert(out.exists(_._4 > 0) && out.exists(_._5 > 0) &&
      out.exists(_._6 > 0) && out.exists(_._7 > 0),
      "fixture no longer covers all script blocks")
    assert(out.map(_._8).toSet.size >= 2, "main_script should vary across docs")
  }

  test("bpe_encode round-trips the mixed-script corpus") {
    val s = spark
    import s.implicits._
    val docs = NonAsciiFixture.docs(s)
    val merges = Bpe.train(docs, k = 16)
    val enc = Bpe.encodeDocs(docs, merges)
      .select("doc_id", "bpe").as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(enc.length == 80)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    enc.foreach { case (id, toks) =>
      val rebuilt = toks.mkString("").replace(Bpe.Eow, " ").trim
      val expect = texts(id).split(" ").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == expect, s"doc $id: BPE segmentation lost bytes on mixed-script text")
    }
    assert(enc.last._2.isEmpty, "empty doc must encode to zero tokens, not vanish")
  }
}
