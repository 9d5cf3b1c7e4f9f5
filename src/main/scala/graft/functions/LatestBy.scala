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
  val latestByScn: Aggregator[(java.lang.Long, String), (Long, String), String] =
    new Aggregator[(java.lang.Long, String), (Long, String), String] {
      override def zero: (Long, String) = (Long.MinValue, null)
      override def reduce(b: (Long, String), a: (java.lang.Long, String)): (Long, String) =
        if (a._1 == null) b // null ordering: skip, like max_by
        else if (a._1.longValue >= b._1) (a._1.longValue, a._2)
        else b
      override def merge(b1: (Long, String), b2: (Long, String)): (Long, String) =
        if (b1._1 >= b2._1) b1 else b2
      override def finish(r: (Long, String)): String = r._2
      override def bufferEncoder: Encoder[(Long, String)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column-API form: latest_by_scn(scn, payload). */
  val latest_by_scn: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(latestByScn)
}
