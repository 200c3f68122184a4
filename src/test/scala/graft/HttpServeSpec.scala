package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.serve.HttpServe

/** Live-socket end-to-end: the JDK HttpServer transport bound on an
  * ephemeral port, driven with a real HTTP client — URL decoding, status
  * propagation, POST form bodies, concurrent requests. Endpoint SEMANTICS
  * are covered by ServeApiSpec against the same dispatch; this spec owns
  * the transport layer.
  */
class HttpServeSpec extends SparkSpec {

  private lazy val server = HttpServe.start(spark, Sf0001, port = 0)
  private lazy val base = s"http://localhost:${server.getAddress.getPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    try HttpServe.stop(server) finally super.afterAll()
  }

  private def get(pathAndQuery: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def postForm(path: String, form: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("health over a real socket") {
    val (status, body) = get("/health")
    assert(status == 200, body)
    assert(body.contains("\"status\":\"healthy\""), body)
  }

  test("query string is URL-decoded before dispatch") {
    val (status, body) = get("/api/query?q=spark%20join%20filter&mode=dense&count=3")
    assert(status == 200, body)
    assert(body.contains("\"query\":\"spark join filter\""), body)
    assert(body.contains("\"score\":"), body)
  }

  test("status codes propagate: 400 bad mode, 422 missing param, 404 route") {
    assert(get("/api/query?q=x&mode=telepathy")._1 == 400)
    assert(get("/api/query")._1 == 422)
    assert(get("/api/nope")._1 == 404)
  }

  test("POST form body merges into params (staged-upload contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-load").toFile
    val f = new java.io.File(dir, "batch.json")
    java.nio.file.Files.writeString(f.toPath,
      """[{"partNumber": "H1", "description": "hydraulic pump"}]""")
    val store = new java.io.File(dir, "store").getAbsolutePath
    val (status, body) = postForm("/api/load-data",
      s"path=${java.net.URLEncoder.encode(f.getAbsolutePath, UTF_8)}" +
        s"&store_dir=${java.net.URLEncoder.encode(store, UTF_8)}")
    assert(status == 200, body)
    assert(body.contains("\"documents_loaded\":1"), body)
    assert(spark.read.parquet(s"$store/documents").count() == 1)
  }

  test("concurrent requests are served (shared session, parallel jobs)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { i =>
      Future(get(s"/api/search-dense?query=spark%20join&limit=$i"))
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results.foreach { case (status, body) =>
      assert(status == 200, body)
      assert(body.contains("\"mode\":\"dense\""), body)
    }
  }
}
