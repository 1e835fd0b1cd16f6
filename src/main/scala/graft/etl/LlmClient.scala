package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** Non-retryable LLM protocol failure — 4xx statuses, missing or
  * malformed response JSON. Falls straight through to the neutral-score
  * fallback instead of burning the retry backoff schedule. */
private[etl] final class LlmProtocolException(msg: String)
  extends RuntimeException(msg)

/** One LLM entity-match verdict (reference:
  * src/common/llm_matcher.py:20-26 `MatchResult`). */
case class LlmMatchResult(isMatch: Boolean, score: Double, reason: String,
    confidence: String)

/** Connection settings for [[HttpLlmScorer]]. `apiKey=None` disables the
  * client (the reference's `is_available()==False` gate); retry settings
  * feed [[Pipeline.retry]]'s exponential backoff. */
case class LlmClientConfig(
    endpoint: String,
    apiKey: Option[String] = None,
    model: String = "gpt-4o-mini",
    temperature: Double = 0.0,
    timeoutMs: Long = 30000L,
    attempts: Int = 3,
    retryBaseMs: Long = 500L,
    retryMaxMs: Long = 4000L)

/**
 * Real HTTP client for the uncertain-band LLM rescue — an
 * OpenAI-chat-completions-compatible JSON client (reference:
 * src/common/llm_matcher.py:69-205).
 *
 * Semantics mirrored from the reference:
 *  - availability gating: no API key → every call returns the neutral
 *    0.5 without touching the network (llm_matcher.py:92-99);
 *  - request: system + user message, temperature, JSON response format
 *    (llm_matcher.py:103-117), prompt fields and wording from
 *    `_build_prompt`/`_get_system_prompt` (llm_matcher.py:158-205);
 *  - response: `choices[0].message.content` parsed as a JSON object with
 *    `match`/`score`/`reason`/`confidence`, absent fields defaulting to
 *    false/0.0/""/"low" (llm_matcher.py:119-127);
 *  - failure: any error after retries → neutral 0.5, never an exception
 *    into the match pipeline (llm_matcher.py:128-135). The reference has
 *    no retry; we put [[Pipeline.retry]]'s exponential backoff in front
 *    of the fallback, matching the pipeline's other remote calls.
 *
 * Driver-side by design: the uncertain band is collected before scoring
 * (reference entity_match.py:537-538 — API calls cannot run in
 * executors), so this client never ships to tasks; the @transient client
 * keeps the class Serializable anyway since [[LlmScorer]] demands it.
 */
class HttpLlmScorer(cfg: LlmClientConfig) extends LlmScorer {

  /** Score used whenever the real client cannot answer. */
  val NeutralScore = 0.5

  def isAvailable: Boolean = cfg.apiKey.exists(_.nonEmpty)

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(cfg.timeoutMs))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  def score(crawlName: String, abrName: String): Double =
    matchCompanies(crawlName, null, null, abrName, null, null, null).score

  /** Full verdict for a (web record, ABR record) pair; nulls render as
    * "N/A" like the reference's `dict.get(..., 'N/A')`. */
  def matchCompanies(name: String, url: String, industry: String,
      entityName: String, abn: String, state: String,
      postcode: String): LlmMatchResult = {
    if (!isAvailable)
      return LlmMatchResult(isMatch = false, NeutralScore,
        "LLM matching not available", "low")
    try {
      // Retry only transient failures (connect/timeout IOException, 5xx,
      // 429); 4xx and response-shape errors surface as
      // LlmProtocolException and drop straight to the neutral fallback.
      Pipeline.retry(cfg.attempts, cfg.retryBaseMs, cfg.retryMaxMs,
        retryIf = _.isInstanceOf[java.io.IOException]) {
        parseVerdict(post(requestBody(
          userPrompt(name, url, industry, entityName, abn, state, postcode))))
      }
    } catch {
      case NonFatal(e) =>
        LlmMatchResult(isMatch = false, NeutralScore,
          s"Error: ${e.getMessage}", "low")
    }
  }

  private def post(body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(cfg.endpoint))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer ${cfg.apiKey.get}")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    val code = resp.statusCode()
    // 408 (request timeout) and 425 (too early) are transient like 5xx/429
    // — give them the same retry budget a socket-level timeout would get.
    if (code / 100 == 5 || code == 429 || code == 408 || code == 425)
      throw new java.io.IOException(s"LLM endpoint returned HTTP $code")
    if (code / 100 != 2) // auth/shape errors won't heal on retry
      throw new LlmProtocolException(s"LLM endpoint returned HTTP $code")
    resp.body()
  }

  private def requestBody(prompt: String): String = {
    val f = JsonNodeFactory.instance
    val root = f.objectNode()
    root.put("model", cfg.model)
    root.put("temperature", cfg.temperature)
    root.set[JsonNode]("response_format",
      f.objectNode().put("type", "json_object"))
    val msgs = f.arrayNode()
    msgs.add(f.objectNode().put("role", "system").put("content", SystemPrompt))
    msgs.add(f.objectNode().put("role", "user").put("content", prompt))
    root.set[JsonNode]("messages", msgs)
    mapper.writeValueAsString(root)
  }

  private def parseVerdict(responseBody: String): LlmMatchResult = try {
    val content = mapper.readTree(responseBody)
      .path("choices").path(0).path("message").path("content")
    if (!content.isTextual)
      throw new LlmProtocolException(
        "no choices[0].message.content in response")
    val v = mapper.readTree(content.asText())
    LlmMatchResult(
      isMatch = v.path("match").asBoolean(false),
      score = v.path("score").asDouble(0.0),
      reason = v.path("reason").asText(""),
      confidence = v.path("confidence").asText("low"))
  } catch {
    // Jackson's parse exceptions extend IOException — rewrap so malformed
    // bodies are not mistaken for transient network failures and retried.
    case e: com.fasterxml.jackson.core.JacksonException =>
      throw new LlmProtocolException(s"unparseable LLM response: ${e.getMessage}")
  }

  private def na(s: String): String = if (s == null || s.isEmpty) "N/A" else s

  private def userPrompt(name: String, url: String, industry: String,
      entityName: String, abn: String, state: String,
      postcode: String): String =
    s"""Compare these two company records and determine if they represent the same entity:
       |
       |**Source 1: Website (Common Crawl)**
       |- Company Name: ${na(name)}
       |- Website URL: ${na(url)}
       |- Industry: ${na(industry)}
       |
       |**Source 2: Australian Business Register (ABR)**
       |- Legal Entity Name: ${na(entityName)}
       |- ABN: ${na(abn)}
       |- State: ${na(state)}
       |- Postcode: ${na(postcode)}
       |
       |Do these records refer to the same real-world company? Provide your analysis as JSON.""".stripMargin

  private val SystemPrompt =
    """You are an expert entity resolution system specialized in matching Australian company records.
      |
      |Your task is to determine if two company records from different data sources refer to the same real-world business entity.
      |
      |Consider:
      |1. Company name similarity (accounting for abbreviations, trading names vs legal names)
      |2. Location consistency (state, postcode)
      |3. Industry alignment (if available)
      |4. Website domain matching company name
      |
      |You must respond with a JSON object containing:
      |{
      |    "match": true/false,
      |    "score": 0.0 to 1.0 (confidence score),
      |    "reason": "Brief explanation of your decision",
      |    "confidence": "high" | "medium" | "low"
      |}""".stripMargin
}
