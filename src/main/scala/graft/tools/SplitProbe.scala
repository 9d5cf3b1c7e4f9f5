package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (not shipped behavior): pins what `split(w, "")` emits for
  * ASCII, astral-plane, and embedded-control inputs — the cross-engine
  * char-split contract the Bpe oracles mirror with DuckDB's
  * `string_split(w, '')`. Run: sbt "runMain graft.tools.SplitProbe"
  */
object SplitProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Engine.session("graft-splitprobe")
    import s.implicits._
    val astral = new String(Character.toChars(0x1D54F))
    val rows = Seq("abc", "a" + astral + "b", "x\ny", "", "é")
      .toDF("w")
      .select(col("w"), split(col("w"), "").as("cs"))
      .collect()
    rows.foreach { r =>
      val cs = r.getSeq[String](1)
      println(s"[splitprobe] n=${cs.length} " +
        cs.map(c => c.codePoints().toArray.mkString("+")).mkString("[", "][", "]"))
    }
    s.stop()
  }
}
