package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** HTTP serving entry point — the analog of the reference's Servant app
  * (haskellServer/src/Lib.hs:28-46), which exposes two extracted fiat2
  * programs as GET routes returning JSON. Built on the JDK's
  * `com.sun.net.httpserver` (no extra dependency), with Spark as the
  * execution engine behind each route:
  *
  *   - `GET /get_artist_less_than/{n}`   — range-scan filter route
  *   - `GET /get_album_and_artist/{n}`   — FK-join route
  *   - `GET /query/{name}`               — ANY registered engine query
  *     (`SparkEntry.queries`) served at this server's data dir
  *   - `GET /`                           — route listing
  *
  * Results stream back as a JSON array of row objects (`Dataset.toJSON`,
  * computed distributed; only the response rows are collected, capped at
  * `maxRows`). Queries on a warm SparkSession are concurrent-safe, so the
  * handler pool serves parallel requests.
  */
final class QueryServer(spark: SparkSession, dataDir: String,
    port: Int = 8080, maxRows: Int = 10000, host: String = "127.0.0.1") {

  private var server: HttpServer = _

  /** Bind and start; returns the actual port (pass port=0 for ephemeral).
    * Binds loopback by default — POST /run executes arbitrary programs, so
    * exposing it beyond localhost is an explicit opt-in (host = "0.0.0.0").
    */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(Executors.newFixedThreadPool(4))
    server.start()
    boundPort
  }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      route(ex.getRequestMethod, ex.getRequestURI.getPath, body) match {
        case Some(df) => respond(ex, 200, toJsonArray(df))
        case None => respond(ex, 404, """{"error":"unknown route"}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"error":${quote(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

  private def route(method: String, path: String,
      body: String): Option[DataFrame] =
    path.split("/").filter(_.nonEmpty) match {
      case Array() => Some(routeListing)
      case Array("get_artist_less_than", IntArg(n)) => Some(artistLessThan(n))
      case Array("get_album_and_artist", IntArg(n)) => Some(albumAndArtist(n))
      case Array("query", name) =>
        graft.SparkEntry.queries.get(name).map(f => f(spark, dataDir))
      case Array("run") if method == "POST" => Some(runProgram(body))
      case Array("runc") if method == "POST" => Some(runCommand(body))
      case Array("extract") if method == "POST" => Some(extractProgram(body))
      case Array("extract_py") if method == "POST" =>
        Some(extractProgramPy(body))
      case _ => None
    }

  /** `POST /run` — the request body is a surface-syntax EXPRESSION (the
    * notation `Parser` accepts; every store table is bound, so `mut nation`
    * etc. work). The program is parsed, join-recognized, and compiled to a
    * distributed plan — the haskellServer's elaborate-then-run request path
    * (haskellServer/src/Extracted.hs:2217) with the whole engine behind it.
    */
  private def fullStore: Map[String, DataFrame] =
    graft.core.Tables.all
      .map(n => n -> Tables.load(spark, dataDir, n)).toMap

  private def runProgram(src: String): DataFrame = {
    import graft.lang.{Compiler, Parser, Rewrites}
    val prog = Rewrites.normalize(Parser.parseExpr(src))
    Compiler.compile(prog, Compiler.Env(Map.empty, fullStore, spark)) match {
      case Compiler.TV(df) => df
      case Compiler.CV(c) => Compiler.oneRow(spark).select(c.as("value"))
    }
  }

  /** `POST /runc` — the body is a surface-syntax COMMAND program. It runs
    * through the whole optimization pipeline (`Optimize`: recognition,
    * collection annotation, incremental aggregate maintenance, index
    * introduction) against the full store, and the store cell named
    * `result` is returned — the reference's optimize-then-interpret
    * lifecycle behind one route. */
  private def runCommand(src: String): DataFrame = {
    import graft.lang.{Compiler, Optimize, Parser}
    val prog = Parser.parseCommand(src)
    val end = Optimize.run(prog, Compiler.Env(Map.empty, fullStore, spark))
    val res = end.store.getOrElse("result", throw new IllegalArgumentException(
      "program must assign a table to `result`"))
    // materialize the response rows BEFORE releasing the caches the
    // Optimize pipeline pinned (keyed indexes) — otherwise a long-lived
    // server accumulates dead cached RDDs request after request
    val rows = res.limit(maxRows).collect()
    end.indexes.values.foreach(_.unpersist())
    end.compoIndexes.values.foreach(_.unpersist())
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), res.schema)
  }

  /** `POST /extract` — same surface-syntax body as /run, but instead of
    * executing, the program is parsed, recognized, collection-annotated,
    * and EXTRACTED to portable SQL (`ToSql`) — the reference's
    * print-to-target-language path (fiat2/src/fiat2/ToPython.v:231-232)
    * served over HTTP. Returns one row {sql: "..."} so a client can run
    * the text on any ANSI engine. */
  private def extractProgram(src: String): DataFrame = {
    import graft.lang.{CollectionTransf, Parser, Rewrites, ToSql}
    import spark.implicits._
    val text = ToSql(CollectionTransf.annotate(
      Rewrites.normalize(Parser.parseExpr(src))))
    Seq(text).toDF("sql")
  }

  /** `POST /extract_py` — the reference's actual extraction target
    * (program_py run under CPython): the surface expression is parsed,
    * recognized, and rendered as a self-contained Python program whose
    * final statement prints the value. Returns one row {python: "..."}. */
  private def extractProgramPy(src: String): DataFrame = {
    import graft.lang.{Parser, Rewrites, ToPython}
    import spark.implicits._
    val e = Rewrites.normalize(Parser.parseExpr(src))
    val text = ToPython.prelude64 + s"print(${ToPython(e)})\n"
    Seq(text).toDF("python")
  }

  /** `exported_get_artist` (Lib.hs:42-43): artists (customers) with id
    * below the captured bound. */
  private def artistLessThan(n: Long): DataFrame =
    Tables.load(spark, dataDir, "customer")
      .filter(col("c_custkey") < n)
      .select(col("c_custkey").as("artist_id"), col("c_name").as("artist"))
      .orderBy("artist_id")

  /** `exported_get_album_and_artist` (Lib.hs:45-46): albums (orders) joined
    * to their artist, bound-parameterized like the Servant capture. */
  private def albumAndArtist(n: Long): DataFrame =
    Tables.load(spark, dataDir, "orders")
      .join(broadcast(Tables.load(spark, dataDir, "customer")
        .filter(col("c_custkey") < n)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("album_id"), col("c_name").as("artist"))
      .orderBy("album_id")

  private def routeListing: DataFrame = {
    import spark.implicits._
    (Seq("/get_artist_less_than/{n}", "/get_album_and_artist/{n}",
      "POST /run  (body: surface-syntax expression)",
      "POST /runc  (body: surface-syntax command; returns `result`)",
      "POST /extract  (body: surface-syntax expression; returns SQL)",
      "POST /extract_py  (body: surface-syntax expression; returns Python)") ++
      graft.SparkEntry.queries.keys.toSeq.sorted.map(q => s"/query/$q"))
      .toDF("route")
  }

  private def toJsonArray(df: DataFrame): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private object IntArg {
    def unapply(s: String): Option[Long] =
      try Some(s.toLong) catch { case _: NumberFormatException => None }
  }
}

/** `startApp` (Lib.hs:30-32): serve until killed. Args: dataDir [port]. */
object QueryServerMain {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(8080)
    val spark = graft.core.ScaleConf.tuned(SparkSession.builder()
      .appName("graft-server").master("local[*]")
      .config("spark.sql.shuffle.partitions", 32))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val server = new QueryServer(spark, dataDir, port)
    val bound = server.start()
    println(s"Starting server on port $bound")
    Thread.currentThread.join()
  }
}
