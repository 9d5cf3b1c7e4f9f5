package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.11): `latest_by_scn` — keep the
  * payload of the highest-SCN event. Same semantics as
  * `max_by(payload, scn)`, expressed as an `Aggregator` to exercise the
  * user-defined-aggregate path (merge-able buffer → map-side partials,
  * exactly like the built-in).
  */
object LatestBy {

  /** (scn, payload) → payload of max scn; null-safe empty buffer. The
    * input scn is a BOXED Long: `max_by` SKIPS rows whose ordering value
    * is null, and this aggregator must match — with a primitive input
    * encoder a null scn crashed the whole job at deserialization
    * ("Null value appeared in non-nullable field") instead.
    */
  val latestByScn: Aggregator[(java.lang.Long, String), (Boolean, Long, String), String] =
    new Aggregator[(java.lang.Long, String), (Boolean, Long, String), String] {
      // the buffer carries an explicit SEEN flag: a MinValue sentinel
      // alone is indistinguishable from a REAL row with
      // scn == Long.MinValue, and merge would then let an empty partial
      // beat the real row and return null where max_by returns the
      // payload
      override def zero: (Boolean, Long, String) = (false, Long.MinValue, null)
      private def pick(a: (Boolean, Long, String), b: (Boolean, Long, String)) =
        if (!a._1) b
        else if (!b._1) a
        else if (a._2 != b._2) { if (a._2 > b._2) a else b }
        else {
          // deterministic scn tie-break on the payload (nulls lose):
          // reduce used last-seen-wins and merge used b1-wins, so tied
          // groups flipped with partition order — a comparison on the
          // VALUES cannot
          if (a._3 == null) b
          else if (b._3 == null) a
          else if (a._3.compareTo(b._3) >= 0) a else b
        }
      override def reduce(b: (Boolean, Long, String),
          a: (java.lang.Long, String)): (Boolean, Long, String) =
        if (a._1 == null) b // null ordering: skip, like max_by
        else pick(b, (true, a._1.longValue, a._2))
      override def merge(b1: (Boolean, Long, String),
          b2: (Boolean, Long, String)): (Boolean, Long, String) = pick(b1, b2)
      override def finish(r: (Boolean, Long, String)): String = r._3
      override def bufferEncoder: Encoder[(Boolean, Long, String)] =
        Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong, Encoders.STRING)
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column-API form: latest_by_scn(scn, payload). */
  val latest_by_scn: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(latestByScn)
}
