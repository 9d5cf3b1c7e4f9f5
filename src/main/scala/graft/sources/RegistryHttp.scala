package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Confluent-compatible REST surface over [[SchemaRegistry]], served and
  * consumed with ONLY JDK machinery (`com.sun.net.httpserver` /
  * `java.net.http`) — no new dependencies.
  *
  * The reference runs a live Schema Registry service
  * (`docker-compose-main.yml:97-119`) that producers/consumers reach
  * over HTTP; rounds 3–7 carried that as an environment-blocked
  * execution because no registry SERVICE exists in the sandbox. This
  * closes it: [[RegistryServer]] exposes the store through the actual
  * Confluent v1 routes, [[HttpRegistryClient]] talks real HTTP to them,
  * and RegistrySpec executes the full register → frame → resolve-by-id
  * round trip over a live socket. A production deployment points the
  * client's baseUrl at the real registry — the four-route subset used
  * here is the stable public API
  * (POST /subjects/{s}/versions, GET /schemas/ids/{id},
  * GET /subjects/{s}/versions/latest, GET /subjects).
  */
object RegistryHttp {
  private[sources] val mapper = new ObjectMapper()

  private[sources] def schemaBody(schemaJson: String): String = {
    val n = JsonNodeFactory.instance.objectNode()
    n.put("schema", schemaJson)
    mapper.writeValueAsString(n)
  }
}

/** Serve a [[SchemaRegistry]] over HTTP on 127.0.0.1 (`port` 0 = pick an
  * ephemeral port; read it back from [[baseUrl]]).
  */
final class RegistryServer(registry: SchemaRegistry, port: Int = 0) {
  import RegistryHttp.mapper

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, body: String): Unit = {
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def err(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, code: Int, msg: String): Unit = {
    val n = JsonNodeFactory.instance.objectNode()
    n.put("error_code", code); n.put("message", msg)
    respond(ex, status, mapper.writeValueAsString(n))
  }

  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val VersionsRe = "/subjects/([A-Za-z0-9._-]+)/versions".r
      val LatestRe = "/subjects/([A-Za-z0-9._-]+)/versions/latest".r
      val ByIdRe = "/schemas/ids/(\\d+)".r
      val ConfigSubjRe = "/config/([A-Za-z0-9._-]+)".r
      // PUT /config (global) | /config/{subject}: the service's
      // compatibility-level surface (answers the PUT with "compatibility",
      // the GET with "compatibilityLevel" — the real API's asymmetry)
      def putConfig(scope: Option[String]): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val lvl = Option(mapper.readTree(body).get("compatibility"))
          .filter(_.isTextual).map(_.asText())
        lvl.flatMap(SchemaRegistry.Compatibility.parse) match {
          case Some(mode) =>
            registry.setCompatibility(scope, mode)
            val n = JsonNodeFactory.instance.objectNode()
            n.put("compatibility", SchemaRegistry.Compatibility.name(mode))
            respond(ex, 200, mapper.writeValueAsString(n))
          case None =>
            err(ex, 422, 42203,
              s"Invalid compatibility level ${lvl.getOrElse("(missing)")}. " +
                "Valid values are NONE, BACKWARD, FORWARD, FULL")
        }
      }
      (method, path) match {
        case ("PUT", "/config") => putConfig(None)
        case ("PUT", ConfigSubjRe(subject)) => putConfig(Some(subject))
        case ("GET", "/config") =>
          val n = JsonNodeFactory.instance.objectNode()
          n.put("compatibilityLevel", SchemaRegistry.Compatibility.name(
            registry.getCompatibility(None).getOrElse(SchemaRegistry.Backward)))
          respond(ex, 200, mapper.writeValueAsString(n))
        case ("GET", ConfigSubjRe(subject)) =>
          registry.getCompatibility(Some(subject)) match {
            case Some(mode) =>
              val n = JsonNodeFactory.instance.objectNode()
              n.put("compatibilityLevel", SchemaRegistry.Compatibility.name(mode))
              respond(ex, 200, mapper.writeValueAsString(n))
            case None =>
              // the real service 404s an unset subject unless
              // ?defaultToGlobal=true — pin the strict form
              err(ex, 404, 40408,
                s"Subject '$subject' does not have subject-level compatibility configured")
          }
        case ("POST", VersionsRe(subject)) =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          val schema = mapper.readTree(body).get("schema")
          if (schema == null || !schema.isTextual)
            err(ex, 422, 42201, "request body must carry a textual 'schema'")
          else {
            // the CHECKED path, like the service this mirrors: the
            // Confluent registry applies BACKWARD compatibility by
            // default and answers 409 on violation / 422 on non-Avro —
            // the unchecked register() here used to hand out ids for
            // schemas the real service rejects
            try {
              // the SUBJECT'S configured level (override → global →
              // BACKWARD), like the service this mirrors
              val id = registry.registerConfigured(subject, schema.asText())
              val n = JsonNodeFactory.instance.objectNode()
              n.put("id", id)
              respond(ex, 200, mapper.writeValueAsString(n))
            } catch {
              case e: SchemaRegistry.IncompatibleSchemaException =>
                err(ex, 409, 409, String.valueOf(e.getMessage))
              case e: IllegalArgumentException =>
                err(ex, 422, 42201, String.valueOf(e.getMessage))
            }
          }
        case ("GET", LatestRe(subject)) =>
          registry.latest(subject) match {
            case Some((id, schema)) =>
              val version = registry.history(subject).size
              val n = JsonNodeFactory.instance.objectNode()
              n.put("subject", subject); n.put("id", id)
              n.put("version", version); n.put("schema", schema)
              respond(ex, 200, mapper.writeValueAsString(n))
            case None => err(ex, 404, 40401, s"Subject '$subject' not found.")
          }
        case ("GET", ByIdRe(idStr)) =>
          registry.byId(idStr.toInt) match {
            case Some(schema) => respond(ex, 200, RegistryHttp.schemaBody(schema))
            case None => err(ex, 404, 40403, s"Schema ${idStr.toInt} not found.")
          }
        case ("GET", "/subjects") =>
          val a = JsonNodeFactory.instance.arrayNode()
          registry.subjects.foreach(a.add)
          respond(ex, 200, mapper.writeValueAsString(a))
        case _ => err(ex, 404, 40401, s"no route: $method $path")
      }
    } catch {
      case e: Exception => err(ex, 500, 50001, String.valueOf(e.getMessage))
    }
  })

  server.setExecutor(null)
  server.start()

  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)
}

/** JDK `java.net.http` client for the same four Confluent v1 routes —
  * what a producer/consumer deployment points at the real service.
  */
final class HttpRegistryClient(baseUrl: String) {
  import RegistryHttp.mapper

  // explicit timeouts: with the JDK defaults (none) a blackholed
  // registry endpoint hangs register()/byId() forever and silently
  // stalls the producer pipeline — fail loudly instead
  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def send(req0: java.net.http.HttpRequest): (Int, String) = {
    val req = java.net.http.HttpRequest.newBuilder(req0, (_, _) => true)
      .timeout(java.time.Duration.ofSeconds(30)).build()
    val resp = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString(
        java.nio.charset.StandardCharsets.UTF_8))
    (resp.statusCode(), resp.body())
  }

  private def get(path: String): (Int, String) =
    send(java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(baseUrl + path)).GET().build())

  /** POST /subjects/{subject}/versions → registered (or existing) id. */
  def register(subject: String, schemaJson: String): Int = {
    val (status, body) = send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$baseUrl/subjects/$subject/versions"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        RegistryHttp.schemaBody(schemaJson)))
      .build())
    require(status == 200, s"register($subject) failed: HTTP $status $body")
    mapper.readTree(body).get("id").asInt()
  }

  /** GET /schemas/ids/{id} → the schema text, None on 404. */
  def byId(id: Int): Option[String] = {
    val (status, body) = get(s"/schemas/ids/$id")
    if (status == 404) None
    else {
      require(status == 200, s"byId($id) failed: HTTP $status $body")
      Some(mapper.readTree(body).get("schema").asText())
    }
  }

  /** GET /subjects/{subject}/versions/latest → (id, schema), None on 404. */
  def latest(subject: String): Option[(Int, String)] = {
    val (status, body) = get(s"/subjects/$subject/versions/latest")
    if (status == 404) None
    else {
      require(status == 200, s"latest($subject) failed: HTTP $status $body")
      val n = mapper.readTree(body)
      Some((n.get("id").asInt(), n.get("schema").asText()))
    }
  }

  /** PUT /config or /config/{subject} → the confirmed level name. */
  def setCompatibility(subject: Option[String], level: String): String = {
    val path = subject.fold("/config")(s => s"/config/$s")
    val n = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
    n.put("compatibility", level)
    val (status, body) = send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(baseUrl + path))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(n)))
      .build())
    require(status == 200, s"setCompatibility($subject, $level) failed: HTTP $status $body")
    mapper.readTree(body).get("compatibility").asText()
  }

  /** GET /config or /config/{subject} → level name; None on 404 (subject
    * without an override — the service's strict no-defaultToGlobal form).
    */
  def compatibility(subject: Option[String]): Option[String] = {
    val (status, body) = get(subject.fold("/config")(s => s"/config/$s"))
    if (status == 404) None
    else {
      require(status == 200, s"compatibility($subject) failed: HTTP $status $body")
      Some(mapper.readTree(body).get("compatibilityLevel").asText())
    }
  }

  /** GET /subjects → all subject names. */
  def subjects(): Seq[String] = {
    val (status, body) = get("/subjects")
    require(status == 200, s"subjects() failed: HTTP $status $body")
    val n = mapper.readTree(body)
    (0 until n.size()).map(i => n.get(i).asText())
  }
}
