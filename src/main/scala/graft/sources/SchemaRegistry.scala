package graft.sources

/** Schema-registry stand-in + schema history log (SURVEY.md §2.1 "Avro
  * encode/decode + registry"; reference `README.md:813-817` — Confluent
  * Schema Registry service at `docker-compose-main.yml:97-119` and the
  * `schema.history.internal.kafka.topic` DDL history).
  *
  * Storage is an APPEND-ONLY directory of schema files, one per
  * registered version, named `"%05d_<subject>.avsc".format(id)` with the
  * raw Avro schema JSON as content. That single structure is both:
  *  - the registry: id → schema resolution for framed messages
  *    ([[SchemaFrame]]), subject → latest for producers;
  *  - the schema HISTORY log: an ordered, replayable record of every
  *    schema version ever registered (the Kafka-topic analog) — replay =
  *    fold the files in id order, asserted in RegistrySpec.
  *
  * Registration is idempotent (re-registering a subject's existing
  * schema returns its id — Confluent semantics). Single-writer by
  * design, like the reference's one-connector-owns-the-topic layout; a
  * cluster deployment swaps this for the actual registry service behind
  * the same four methods.
  */
final class SchemaRegistry private (dir: java.nio.file.Path) {

  import scala.jdk.CollectionConverters._

  /** (id, subject, version, schemaJson) in registration order. @volatile:
    * writes happen under `synchronized` (register) but the read surface
    * (byId/latest/history/schemasById) is lock-free — without the barrier
    * a reader thread could legally see the pre-registration vector.
    */
  @volatile private var entries: Vector[(Int, String, Int, String)] = replay()

  private def replay(): Vector[(Int, String, Int, String)] = {
    val files =
      if (java.nio.file.Files.isDirectory(dir)) {
        // Files.list holds a directory handle until closed — draining the
        // iterator does NOT release it, and a long-lived process re-opening
        // registries would leak descriptors
        val stream = java.nio.file.Files.list(dir)
        try stream.iterator().asScala
          // %05d zero-pads SMALL ids; past 99999 the prefix simply grows,
          // so match any digit run and order by the PARSED id (name order
          // would sort 100000_ before 99999_)
          .filter(_.getFileName.toString.matches("\\d{5,}_.*\\.avsc"))
          .toVector
        finally stream.close()
      } else Vector.empty
    val versions = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    files
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".avsc")
        val id = name.takeWhile(_.isDigit).toInt
        val subject = name.drop(name.indexOf('_') + 1)
        (id, subject, p)
      }
      .sortBy(_._1)
      .map { case (id, subject, p) =>
        versions(subject) += 1
        (id, subject, versions(subject), new String(
          java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
      }
  }

  /** Register (idempotently) and return the schema id. */
  def register(subject: String, schemaJson: String): Int = synchronized {
    require(subject.matches("[A-Za-z0-9._-]+"), s"unsafe subject name: $subject")
    entries.find(e => e._2 == subject && e._4 == schemaJson) match {
      case Some((id, _, _, _)) => id
      case None =>
        val id = entries.map(_._1).maxOption.getOrElse(0) + 1
        val version = entries.count(_._2 == subject) + 1
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(
          dir.resolve(f"$id%05d_$subject.avsc"),
          schemaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        entries = entries :+ ((id, subject, version, schemaJson))
        id
    }
  }

  def byId(id: Int): Option[String] = entries.find(_._1 == id).map(_._4)

  def latest(subject: String): Option[(Int, String)] =
    entries.filter(_._2 == subject).lastOption.map(e => (e._1, e._4))

  /** Full history of a subject, oldest first: (id, version, schema). */
  def history(subject: String): Seq[(Int, Int, String)] =
    entries.filter(_._2 == subject).map(e => (e._1, e._3, e._4))

  /** Immutable id → schema snapshot, broadcast-friendly for executors. */
  def schemasById: Map[Int, String] = entries.map(e => e._1 -> e._4).toMap

  /** Distinct subjects in first-registration order. */
  def subjects: Seq[String] = entries.map(_._2).distinct

  /** Per-subject / global compatibility configuration (the service's
    * `PUT/GET /config[/{subject}]` surface, `docker-compose-main.yml:
    * 97-119` runs the registry that enforces it): key `scala.None` is
    * the GLOBAL level, `Some(subject)` a per-subject override —
    * resolution is override → global → BACKWARD, the Confluent default
    * chain. Persisted next to the schema log (`_config.properties`,
    * name chosen to miss the `\\d{5,}_.*\\.avsc` replay filter) so a
    * reopened registry keeps its policy.
    */
  @volatile private var compatConfig: Map[Option[String], SchemaRegistry.Compatibility] =
    loadConfig()

  private def configPath = dir.resolve("_config.properties")

  private def loadConfig(): Map[Option[String], SchemaRegistry.Compatibility] =
    if (java.nio.file.Files.exists(configPath))
      java.nio.file.Files.readAllLines(configPath).asScala
        .flatMap { line =>
          line.split("=", 2) match {
            case Array(k, v) =>
              SchemaRegistry.Compatibility.parse(v.trim).map { c =>
                (if (k.trim == "*") None else Some(k.trim)) -> c
              }
            case _ => None
          }
        }.toMap
    else Map.empty

  def setCompatibility(subject: Option[String], mode: SchemaRegistry.Compatibility): Unit =
    synchronized {
      subject.foreach(sj => require(sj.matches("[A-Za-z0-9._-]+"),
        s"unsafe subject name: $sj"))
      compatConfig += (subject -> mode)
      java.nio.file.Files.createDirectories(dir)
      val body = compatConfig.toSeq
        .map { case (k, v) => s"${k.getOrElse("*")}=${SchemaRegistry.Compatibility.name(v)}" }
        .sorted.mkString("", "\n", "\n")
      java.nio.file.Files.write(configPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  /** The configured level for `subject`, if any (None key = global). */
  def getCompatibility(subject: Option[String]): Option[SchemaRegistry.Compatibility] =
    compatConfig.get(subject)

  /** Effective level: subject override → global → BACKWARD (Confluent
    * default chain).
    */
  def compatibilityOf(subject: String): SchemaRegistry.Compatibility =
    compatConfig.getOrElse(Some(subject),
      compatConfig.getOrElse(None, SchemaRegistry.Backward))

  /** [[registerChecked]] under the subject's CONFIGURED level — what the
    * HTTP surface runs on every POST.
    */
  def registerConfigured(subject: String, schemaJson: String): Int =
    registerChecked(subject, schemaJson, compatibilityOf(subject))

  /** Register with a Confluent-style compatibility gate against the
    * subject's LATEST version (the registry service's default check):
    * BACKWARD = consumers on the NEW schema can read data written with
    * the old one; FORWARD = the reverse; FULL = both. Compatibility is
    * decided by Avro's own resolution rules
    * ([[org.apache.avro.SchemaCompatibility]] — e.g. adding a field is
    * BACKWARD-compatible only if it has a default), not a re-derived
    * approximation. Incompatible registrations throw; nothing is written.
    */
  def registerChecked(subject: String, schemaJson: String,
      mode: SchemaRegistry.Compatibility = SchemaRegistry.Backward): Int = synchronized {
    val parser = () => new org.apache.avro.Schema.Parser()
    // the NEW schema must parse regardless of subject history — a first
    // registration (no latest to compare against) or a text-identical
    // re-registration would otherwise skip the gate entirely and admit
    // garbage that poisons every LATER checked registration at the
    // parse-the-previous step
    val next =
      try parser().parse(schemaJson)
      catch { case e: org.apache.avro.SchemaParseException =>
        throw new IllegalArgumentException(
          s"schema for subject '$subject' is not valid Avro: ${e.getMessage}", e)
      }
    latest(subject).foreach { case (_, prevJson) =>
      if (entries.exists(e => e._2 == subject && e._4 == schemaJson)) ()
      else {
        val prev =
          try parser().parse(prevJson)
          catch { case e: org.apache.avro.SchemaParseException =>
            throw new IllegalStateException(
              s"stored latest schema for subject '$subject' does not parse " +
                "(registered through the unchecked register()?) — " +
                "compatibility cannot be decided", e)
          }
        def readable(reader: org.apache.avro.Schema, writer: org.apache.avro.Schema) =
          org.apache.avro.SchemaCompatibility
            .checkReaderWriterCompatibility(reader, writer)
            .getType == org.apache.avro.SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE
        val ok = mode match {
          case SchemaRegistry.NoneCompat => true
          case SchemaRegistry.Backward   => readable(next, prev)
          case SchemaRegistry.Forward    => readable(prev, next)
          case SchemaRegistry.Full       => readable(next, prev) && readable(prev, next)
        }
        if (!ok) throw new SchemaRegistry.IncompatibleSchemaException(
          s"schema for subject '$subject' is not $mode-compatible with its latest version")
      }
    }
    register(subject, schemaJson)
  }
}

object SchemaRegistry {
  def open(dir: String): SchemaRegistry =
    new SchemaRegistry(java.nio.file.Paths.get(dir))

  sealed trait Compatibility
  /** `NONE` — no gate, any parseable schema registers (the level the
    * service uses for free-form topics).
    */
  case object NoneCompat extends Compatibility
  case object Backward extends Compatibility
  case object Forward extends Compatibility
  case object Full extends Compatibility

  object Compatibility {
    /** Confluent wire names ↔ the ADT (`NONE|BACKWARD|FORWARD|FULL`). */
    def parse(s: String): Option[Compatibility] = s.trim.toUpperCase match {
      case "NONE"     => Some(NoneCompat)
      case "BACKWARD" => Some(Backward)
      case "FORWARD"  => Some(Forward)
      case "FULL"     => Some(Full)
      case _          => None
    }

    def name(c: Compatibility): String = c match {
      case NoneCompat => "NONE"
      case Backward   => "BACKWARD"
      case Forward    => "FORWARD"
      case Full       => "FULL"
    }
  }

  /** A registration rejected by the compatibility gate — the condition
    * the Confluent service answers with HTTP 409.
    */
  final class IncompatibleSchemaException(msg: String) extends RuntimeException(msg)
}

/** Confluent Avro wire framing (reference `README.md:813-816`): one
  * magic byte 0x00, then the schema id as a 4-byte big-endian int, then
  * the Avro binary payload. Layout asserted byte-for-byte in
  * RegistrySpec.
  */
object SchemaFrame {

  val Magic: Byte = 0x00

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + payload.length)
    bb.put(Magic).putInt(schemaId).put(payload)
    bb.array()
  }

  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5, s"frame too short: ${bytes.length} bytes")
    require(bytes(0) == Magic, f"bad magic byte 0x${bytes(0)}%02x")
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, 4)
    val id = bb.getInt
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }
}
