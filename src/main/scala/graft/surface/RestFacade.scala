package graft.surface

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.operators.GtsFrame
import graft.script.WarpScriptEngine
import graft.sources.{Formats, Selector}

/** Thin HTTP façade over the engine — the reference's two analytics
  * entry points re-expressed (EgressExecHandler.java:134 `/api/v0/exec`,
  * EgressFetchHandler.java:153 `/api/v0/fetch`), built on the JDK's
  * own `com.sun.net.httpserver` (zero new dependencies; a production
  * deployment would front the same two calls with any server).
  *
  * - `GET /api/v0/fetch?selector=<class{labels}>&start=<ts>&stop=<ts>
  *   [&format=text|json|tsv]` — selector-pruned scan rendered by
  *   [[Formats]] (the reference's text/json/tsv fetch formats).
  * - `POST /api/v0/exec` — body is a WarpScript program; the final
  *   stack renders to a JSON array (frames as row-object arrays,
  *   scalars as literals), like the reference's stack JSON.
  *
  * The façade is a SURFACE, not an executor: every request compiles to
  * the same lazy Catalyst plans as the Scala API; `maxRows` caps what a
  * single HTTP response will materialize (the reference's fetch limits).
  */
final class RestFacade(
    frame: => GtsFrame,
    engine: () => WarpScriptEngine,
    maxRows: Int = 10000) {

  private var server: HttpServer = _

  /** Start on `port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api/v0/fetch", (ex: HttpExchange) => safely(ex) {
      val q = query(ex)
      val sel = Selector.parse(q.getOrElse("selector", "~.*"))
      val start = q.getOrElse("start", Long.MinValue.toString).toLong
      val stop = q.getOrElse("stop", Long.MaxValue.toString).toLong
      val pts = frame.df.filter(sel.predicate)
        .filter(org.apache.spark.sql.functions.col("ts").between(start, stop))
      val body = q.getOrElse("format", "text") match {
        case "json" => lines(Formats.toJsonRows(pts))
        case "tsv" => lines(Formats.toTsv(pts)
          .selectExpr("concat(cast(ts as string), '\t', value) as value"))
        case _ => lines(Formats.toGtsLines(pts))
      }
      (200, body)
    })
    server.createContext("/api/v0/exec", (ex: HttpExchange) => safely(ex) {
      val program = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val stack = engine().run(program)
      (200, stack.map(renderJson).mkString("[", ",", "]"))
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def lines(df: DataFrame): String =
    df.limit(maxRows).collect().map(_.getString(0)).mkString("\n")

  /** Stack value → JSON (frames as row arrays, scalars as literals). */
  private def renderJson(v: Any): String = StackJson.render(v, maxRows)

  private def query(ex: HttpExchange): Map[String, String] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val k = if (i < 0) kv else kv.substring(0, i)
      val v = if (i < 0) "" else java.net.URLDecoder.decode(kv.substring(i + 1), UTF_8)
      k -> v
    }.toMap
  }

  private def safely(ex: HttpExchange)(f: => (Int, String)): Unit = {
    val (code, body) =
      try f
      catch { case e: Exception => (400, s"error: ${e.getMessage}") }
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
