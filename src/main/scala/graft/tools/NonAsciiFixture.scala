package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mixed-script `documents` fixture (round 13) — the non-ASCII corpus
  * that exercises the byte-true contracts the ASCII driver fixture
  * cannot: multi-byte UTF-8 cycling in the multimodal codec oracles
  * (hex-pair arithmetic, [[graft.llm.Multimodal.shaOfHex]]), NFC
  * normalization that is NOT the identity (planted NFD sequences), and
  * the BPE UTF-8 tie-break ([[graft.llm.Bpe.utf8Order]] — the planted
  * supplementary-plane vs private-use pair below is exactly where UTF-8
  * byte order and Java/UTF-16 order disagree).
  *
  * The fixture strings are literal UTF-8 in this source file; the
  * load-bearing codepoints (NFD combining sequences, the U+1F4A1 vs
  * U+E000/U+E001 tie pair) are asserted by NonAsciiFixtureSpec, so an
  * encoding round-trip corruption would fail the suite, not silently
  * weaken the fixture.
  *
  * Deterministic (seeded per doc), so engine-side specs can predict
  * results independently. `main` also copies the other nine fixture
  * tables from a source SF dir so the DuckDB differential harness
  * (tools/check.py) can bind all its views against the output dir:
  *
  * {{{
  * sbt -batch "runMain graft.tools.NonAsciiFixture /tmp/nafix /root/testdata/sf0.001"
  * sbt -batch "runMain graft.Verify /tmp/nafix /tmp/naout mm_features,..."
  * python3 tools/check.py /tmp/nafix /tmp/naout mm_features,...
  * }}}
  */
object NonAsciiFixture {

  /** Random word pool: ASCII, precomposed Latin, NFD combining
    * sequences (NFC-normalize to the precomposed forms), Cyrillic,
    * Greek, CJK, kana, Hangul, Arabic (RTL), and a supplementary-plane
    * emoji pair — 1 to 4 UTF-8 bytes per code point.
    */
  val pool: Vector[String] = Vector(
    "spark", "data", "join", "filter", "the", "stream",
    "café",                    // precomposed e-acute (already NFC)
    "café",                   // e + COMBINING ACUTE -- NFC composes to the word above
    "Ångström",         // A + RING ABOVE, o + DIAERESIS -- NFC precomposes both
    "naïve",
    "данные", "поток",   // Cyrillic
    "δεδομένα", "ποταμός", // Greek
    "数据", "流处理", "测试",           // CJK
    "テスト", "データ",                     // kana
    "데이터", "처리",                           // Hangul
    "بيانات", "معالجة", // Arabic (RTL)
    "🚀🔥"      // U+1F680 U+1F525 rocket+fire -- supplementary plane
  )

  /** The BPE tie-break words: U+1F4A1 (a surrogate pair, UTF-8 F0 9F 92
    * A1) and U+E000 U+E001 (private use, UTF-8 EE 80 xx). UTF-16 code
    * units order the first BELOW the second (D83D < E000); UTF-8 bytes
    * order it ABOVE (F0 > EE). Planted at equal frequency so the BPE
    * pair-count tie is broken by the declared UTF-8 rule — a local
    * trainer tie-breaking in Java's natural String order would diverge
    * from the distributed path here.
    */
  val tieA = "💡"             // U+1F4A1 light bulb (surrogate pair)
  val tieB = ""             // private-use BMP pair

  /** 80 deterministic docs; doc 79 is empty (exercises the media
    * fixtures' `len(text) > 0` gate on both engine and oracle sides).
    * Each non-empty doc plants 8 copies of each tie word, making the
    * tie pairs the global pair-count maximum — the tie is exercised at
    * merge rank 0, not buried below the pool words' shared letter pairs.
    */
  def docs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val langs = Vector("zh", "ru", "el", "ar", "ja", "ko", "en")
    val rows = (0L until 80L).map { id =>
      val rnd = new scala.util.Random(0xC0FFEE + id * 7919)
      val n = 10 + rnd.nextInt(31)
      val words = Vector.fill(n)(pool(rnd.nextInt(pool.length))) ++
        Vector.fill(8)(tieA) ++ Vector.fill(8)(tieB)
      val text = if (id == 79) "" else words.mkString(" ")
      // source ids follow the driver fixture's `srcN` shape — mix_rates
      // (and any other id keyed on the numeric source suffix) reads the
      // chars from position 4, so a differently-shaped id crashes BOTH
      // engines identically rather than testing anything
      (id, text, langs((id % langs.length).toInt), s"src${id % 4}",
        text.codePointCount(0, text.length).toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Write `documents.parquet` as a single parquet FILE under `outDir`
    * (the fixture layout Verify/check.py expect) and copy the other
    * nine tables from `srcDir`.
    */
  def write(spark: SparkSession, outDir: String, srcDir: String): Unit = {
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    val tmp = java.nio.file.Files.createTempDirectory("nafix")
    docs(spark).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    // Files.list holds a directory handle until closed — draining does
    // NOT release it (the SchemaRegistry.replay convention)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.toArray.map(_.toString).filter(_.endsWith(".parquet"))
      finally listing.close()
    require(part.length == 1, s"expected one part file, got ${part.toSeq}")
    java.nio.file.Files.move(java.nio.file.Paths.get(part(0)),
      out.resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        out.resolve(s"$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val srcDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.Engine.session("graft-nafix")
    write(spark, outDir, srcDir)
    println(s"[nafix] wrote mixed-script documents + 9 copied tables to $outDir")
    spark.stop()
  }
}
