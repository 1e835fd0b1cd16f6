package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{HttpLlmScorer, LlmClientConfig}

/** Drives [[HttpLlmScorer]] against a loopback chat-completions server
  * (same pattern as IngestPipelineSpec for downloads): request shape,
  * verdict parsing, retry-then-success, neutral fallback, availability
  * gating. */
class LlmClientSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = h(ex)
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b); ex.close()
  }

  /** A chat-completions body whose message content is the verdict JSON. */
  private def completion(verdict: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val content = mapper.writeValueAsString(verdict) // JSON-escape
    s"""{"choices":[{"message":{"role":"assistant","content":$content}}]}"""
  }

  private def cfg(base: String) = LlmClientConfig(
    endpoint = s"$base/v1/chat/completions", apiKey = Some("test-key"),
    attempts = 3, retryBaseMs = 1L, retryMaxMs = 2L)

  test("parses verdict and sends an openai-shaped authorized request") {
    @volatile var seenAuth: String = null
    @volatile var seenBody: String = null
    withServer(Map("/v1/chat/completions" -> { ex =>
      seenAuth = ex.getRequestHeaders.getFirst("Authorization")
      seenBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      respond(ex, 200, completion(
        """{"match":true,"score":0.92,"reason":"same entity","confidence":"high"}"""))
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "Koala Tech", "https://koala.tech", "Software",
        "KOALA TECHNOLOGIES PTY LTD", "51824753556", "NSW", "2000")
      assert(r.isMatch && r.score == 0.92 &&
        r.reason == "same entity" && r.confidence == "high")
      assert(seenAuth == "Bearer test-key")
      val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(seenBody)
      assert(req.path("model").asText() == "gpt-4o-mini")
      assert(req.path("response_format").path("type").asText() == "json_object")
      assert(req.path("messages").size() == 2)
      val user = req.path("messages").path(1).path("content").asText()
      assert(user.contains("Koala Tech") &&
        user.contains("KOALA TECHNOLOGIES PTY LTD") &&
        user.contains("51824753556"))
    }
  }

  test("retries on 5xx then succeeds; absent verdict fields default") {
    val hits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      if (hits.incrementAndGet() == 1) respond(ex, 500, "upstream error")
      else respond(ex, 200, completion("""{"score":0.7}"""))
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(hits.get() == 2)
      assert(!r.isMatch && r.score == 0.7 && r.confidence == "low")
    }
  }

  test("neutral 0.5 fallback after retries exhausted, and on malformed content") {
    val hits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      hits.incrementAndGet()
      respond(ex, 503, "down")
    })) { base =>
      val s = new HttpLlmScorer(cfg(base))
      assert(s.score("A", "B") == 0.5)
      assert(hits.get() == 3) // all attempts consumed before the fallback
    }
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      respond(ex, 200, """{"unexpected":"shape"}""")
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(!r.isMatch && r.score == 0.5 && r.confidence == "low")
    }
  }

  test("4xx and malformed bodies fail fast: one request, no backoff burn") {
    // 401: permanent auth failure — neutral fallback after exactly 1 hit
    val authHits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      authHits.incrementAndGet()
      respond(ex, 401, """{"error":"bad key"}""")
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(!r.isMatch && r.score == 0.5)
      assert(authHits.get() == 1)
    }
    // non-JSON 200 body: parse error is not a transient network failure
    val parseHits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      parseHits.incrementAndGet()
      respond(ex, 200, "<html>definitely not json</html>")
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(!r.isMatch && r.score == 0.5)
      assert(parseHits.get() == 1)
    }
    // 429 IS retried (rate limit heals)
    val rlHits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      if (rlHits.incrementAndGet() == 1) respond(ex, 429, "slow down")
      else respond(ex, 200, completion("""{"score":0.8}"""))
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(r.score == 0.8 && rlHits.get() == 2)
    }
    // 408 (request timeout) is transient like a socket timeout — retried
    val toHits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      ex.getRequestBody.readAllBytes()
      if (toHits.incrementAndGet() == 1) respond(ex, 408, "timeout")
      else respond(ex, 200, completion("""{"score":0.7}"""))
    })) { base =>
      val r = new HttpLlmScorer(cfg(base)).matchCompanies(
        "A", null, null, "B", null, null, null)
      assert(r.score == 0.7 && toHits.get() == 2)
    }
  }

  test("no api key: neutral verdict without touching the network") {
    val hits = new AtomicInteger(0)
    withServer(Map("/v1/chat/completions" -> { ex =>
      hits.incrementAndGet(); respond(ex, 200, completion("""{"score":1.0}"""))
    })) { base =>
      val s = new HttpLlmScorer(cfg(base).copy(apiKey = None))
      assert(!s.isAvailable)
      val r = s.matchCompanies("A", null, null, "B", null, null, null)
      assert(!r.isMatch && r.score == 0.5 &&
        r.reason == "LLM matching not available")
      assert(s.score("A", "B") == 0.5)
      assert(hits.get() == 0)
    }
  }
}
