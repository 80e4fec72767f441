package graft.crawl

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkSpec

/** Drives the production HTTP transport against a LOOPBACK HttpServer
  * (the StreamingSpec real-HTTP pattern — no network egress): status
  * pass-through, gzip inflate, Location exposure without following,
  * User-Agent header, transport-failure throw, and the whole
  * frontier→fetch→WARC chain over real sockets. */
class HttpFetchTransportSpec extends SparkSpec {

  private def withServer(f: (HttpServer, Int) => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      f(server, server.getAddress.getPort)
    } finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte],
                      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  test("status/body/content-type pass through; gzip inflates; Location rides, never follows") {
    withServer { (server, port) =>
      val agents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server.createContext("/", new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          agents.add(Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")): Unit
          ex.getRequestURI.getPath match {
            case "/ok" =>
              respond(ex, 200, "plain body".getBytes(StandardCharsets.UTF_8),
                "Content-Type" -> "text/plain; charset=utf-8")
            case "/gz" =>
              val bos = new java.io.ByteArrayOutputStream()
              val gz = new java.util.zip.GZIPOutputStream(bos)
              gz.write("gzip body".getBytes(StandardCharsets.UTF_8)); gz.close()
              respond(ex, 200, bos.toByteArray,
                "Content-Type" -> "text/plain",
                "Content-Encoding" -> "gzip")
            case "/missing" =>
              respond(ex, 404, "nope".getBytes(StandardCharsets.UTF_8),
                "Content-Type" -> "text/plain")
            case "/redir" =>
              respond(ex, 301, Array.emptyByteArray,
                "Location" -> s"http://127.0.0.1:$port/ok")
            case _ =>
              respond(ex, 500, Array.emptyByteArray)
          }
        }
      }): Unit
      val t = new HttpFetchTransport
      val ok = t.fetch(s"http://127.0.0.1:$port/ok", "graftbot-test")
      assert(ok.status == 200)
      assert(ok.contentType == "text/plain; charset=utf-8")
      assert(new String(ok.body, StandardCharsets.UTF_8) == "plain body")
      assert(ok.location == null)

      val gz = t.fetch(s"http://127.0.0.1:$port/gz", "graftbot-test")
      assert(gz.status == 200)
      assert(new String(gz.body, StandardCharsets.UTF_8) == "gzip body",
        "Content-Encoding: gzip must inflate transparently")

      // 4xx RETURNS (the executor's retry loop owns policy)
      val miss = t.fetch(s"http://127.0.0.1:$port/missing", "graftbot-test")
      assert(miss.status == 404 &&
        new String(miss.body, StandardCharsets.UTF_8) == "nope")

      // 3xx returns WITH the Location — the client must not follow
      val rd = t.fetch(s"http://127.0.0.1:$port/redir", "graftbot-test")
      assert(rd.status == 301 && rd.location == s"http://127.0.0.1:$port/ok")

      import scala.jdk.CollectionConverters._
      assert(agents.asScala.forall(_ == "graftbot-test"),
        "every request must carry the configured User-Agent")
    }
  }

  test("body cap: oversized raw bodies and gzip bombs throw instead of buffering") {
    withServer { (server, port) =>
      server.createContext("/", new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          ex.getRequestURI.getPath match {
            case "/big" => // 8 KiB raw, over the 4 KiB cap below
              respond(ex, 200, Array.fill[Byte](8192)('x'))
            case "/bomb" => // ~100 bytes compressed, 64 KiB inflated
              val bos = new java.io.ByteArrayOutputStream()
              val gz = new java.util.zip.GZIPOutputStream(bos)
              gz.write(new Array[Byte](65536)); gz.close()
              respond(ex, 200, bos.toByteArray,
                "Content-Encoding" -> "gzip")
            case _ => respond(ex, 200, "small".getBytes(StandardCharsets.UTF_8))
          }
      }): Unit
      val prev = sys.props.put("graft.fetch.max_body_bytes", "4096")
      try {
        val t = new HttpFetchTransport // reads the prop at construction
        val e1 = intercept[java.io.IOException] {
          t.fetch(s"http://127.0.0.1:$port/big", "ua")
        }
        assert(e1.getMessage.contains("max_body_bytes"), e1.getMessage)
        // the gzip bomb passes the RAW cap (it is tiny on the wire) but
        // must trip the cap while INFLATING, never after
        val e2 = intercept[java.io.IOException] {
          t.fetch(s"http://127.0.0.1:$port/bomb", "ua")
        }
        assert(e2.getMessage.contains("inflated body"), e2.getMessage)
        assert(t.fetch(s"http://127.0.0.1:$port/ok", "ua").status == 200)
      } finally {
        prev match {
          case Some(v) => sys.props.put("graft.fetch.max_body_bytes", v): Unit
          case None => sys.props.remove("graft.fetch.max_body_bytes"): Unit
        }
      }
    }
  }

  test("transportProps bridge: Config knobs reach the no-arg constructor; differing props never share an instance") {
    withServer { (server, port) =>
      server.createContext("/", new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          respond(ex, 200, Array.fill[Byte](8192)('x'),
            "Content-Type" -> "text/plain")
      }): Unit
      import spark.implicits._
      val url = s"http://127.0.0.1:$port/big"
      val before = sys.props.get("graft.fetch.max_body_bytes")
      // capped via the settings bridge (no extraJavaOptions, no pre-set
      // system property): the 8 KiB body trips the 1 KiB cap inside the
      // transport -> transport failure -> audited status -1
      val capped = Fetch.fetchFrontier(Seq(url).toDF("url"),
        Fetch.Config(
          transportClass = classOf[HttpFetchTransport].getName,
          maxAttempts = 1,
          transportProps = Map("graft.fetch.max_body_bytes" -> "1024")))
        .select("status", "error").collect()
      assert(capped.length == 1 && capped(0).getInt(0) == -1)
      assert(capped(0).getString(1).contains("max_body_bytes"))
      // publication is scoped to the construction window — nothing may
      // bleed into the JVM afterwards (or into other configs' transports)
      assert(sys.props.get("graft.fetch.max_body_bytes") == before,
        "transportProps must restore the JVM property after construction")
      // the SAME class with default props in the same JVM must get a
      // DIFFERENT instance (props key the cache), which reads the body
      val open = Fetch.fetchFrontier(Seq(url).toDF("url"),
        Fetch.Config(
          transportClass = classOf[HttpFetchTransport].getName,
          maxAttempts = 1))
        .select("status").collect()
      assert(open.length == 1 && open(0).getInt(0) == 200)
    }
  }

  test("transport-level failure throws (the retry contract); fetch executor audits it") {
    // a port with no listener: connect refused -> the trait's THROW path
    val dead = new java.net.ServerSocket(0)
    val port = dead.getLocalPort
    dead.close()
    val t = new HttpFetchTransport
    intercept[Exception] { t.fetch(s"http://127.0.0.1:$port/x", "ua") }: Unit
  }

  test("frontier -> HttpFetchTransport -> WARC over real loopback sockets, redirects followed by the executor") {
    withServer { (server, port) =>
      server.createContext("/", new HttpHandler {
        override def handle(ex: HttpExchange): Unit =
          ex.getRequestURI.getPath match {
            case "/page/1" =>
              respond(ex, 200, "one".getBytes(StandardCharsets.UTF_8),
                "Content-Type" -> "text/plain")
            case "/page/2" => // relative redirect onto page 1
              respond(ex, 302, Array.emptyByteArray, "Location" -> "/page/1")
            case _ => respond(ex, 404, "x".getBytes(StandardCharsets.UTF_8))
          }
      }): Unit
      import spark.implicits._
      val frontier = Seq(
        s"http://127.0.0.1:$port/page/1",
        s"http://127.0.0.1:$port/page/2").toDF("url")
      val dir = java.nio.file.Files.createTempDirectory("http_fetch").toString
      val stats = Fetch.run(frontier, s"$dir/out", checkpointDir = null,
        cfg = Fetch.Config(
          transportClass = classOf[HttpFetchTransport].getName,
          warcDate = "2026-01-01T00:00:00Z"))
      assert(stats.attempted == 2 && stats.ok == 2 && stats.failed == 0)
      val back = spark.read.format("warc").load(s"$dir/out")
        .select("target_uri", "http_status", "payload")
        .collect()
        .map(r => r.getAs[String]("target_uri") ->
          ((r.getAs[Int]("http_status"),
            new String(r.getAs[Array[Byte]]("payload"), StandardCharsets.UTF_8))))
        .toMap
      assert(back(s"http://127.0.0.1:$port/page/1") == ((200, "one")))
      // the redirect archived under the ORIGINAL url with the final body
      assert(back(s"http://127.0.0.1:$port/page/2") == ((200, "one")))
    }
  }
}
