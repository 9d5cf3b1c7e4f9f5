package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, length}

/** NfcNormalize: composition cases the ASCII synthetic corpus can't
  * exercise, interpreted-vs-codegen agreement, and codegen presence.
  */
class NfcNormalizeSpec extends SparkSpec {

  test("nfc composes combining sequences, is identity on NFC input, null-safe") {
    val s = spark
    import s.implicits._
    NfcNormalize.ensureRegistered(s)
    val rows = Seq(
      // decomposed e + COMBINING ACUTE → precomposed é (the canonical case)
      (1L, "café"),
      // already-NFC text is returned unchanged (fast path)
      (2L, "café"),
      // NFC is NOT compatibility normalization: ﬁ ligature must survive
      // (NFKC would expand it — that would be the wrong form for dedup,
      // where visually-distinct variants should stay distinct)
      (3L, "ﬁle"),
      // Hangul: conjoining jamo compose to a precomposed syllable
      (4L, "가"),
      (5L, null)
    ).toDF("id", "t")
    val out = rows
      .select(col("id"), NfcNormalize.nfc_normalize(col("t")).as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "café")
    assert(out(1).getString(1) == "café")
    assert(out(2).getString(1) == "ﬁle")
    assert(out(3).getString(1) == "가")
    assert(out(4).isNullAt(1))
  }

  test("interpreted eval agrees with the codegen path") {
    // exercise nullSafeEval directly (the codegen template delegates to
    // the same static normalize(), but the null/cast scaffolding differs)
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("éx"),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == "éx")
  }

  test("stays inside whole-stage codegen on the documents scan") {
    val s = spark
    NfcNormalize.ensureRegistered(s)
    val q = graft.Tables(s, sf("sf0.001")).documents
      .select(NfcNormalize.nfc_normalize(col("text")).as("n"))
      .select(length(col("n")))
    val codegenned = q.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenned,
      s"nfc_normalize projection fell out of codegen:\n${q.queryExecution.executedPlan}")
    assert(q.count() > 0)
  }
}
