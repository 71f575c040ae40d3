package graft

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite
import graft.server.QueryServer

/** The HTTP serving entry point (Lib.hs analog) driven over a real socket:
  * both reference routes, the generic query route, and error paths.
  */
class QueryServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def withServer(f: Int => Unit): Unit = {
    val srv = new QueryServer(spark, TestSpark.sfDir, port = 0)
    val port = srv.start()
    try f(port) finally srv.stop()
  }

  test("reference routes serve parameterized JSON results") {
    withServer { port =>
      import org.apache.spark.sql.functions.col
      val (c1, artists) = get(s"http://localhost:$port/get_artist_less_than/4")
      assert(c1 === 200)
      // one row object per artist below the bound
      val nArtists = graft.core.Tables.load(spark, TestSpark.sfDir, "customer")
        .filter(col("c_custkey") < 4).count()
      assert("\"artist_id\":".r.findAllIn(artists).size === nArtists)
      assert(artists.contains("\"artist_id\":1"))

      val (c2, albums) = get(s"http://localhost:$port/get_album_and_artist/2")
      assert(c2 === 200)
      val nAlbums = graft.core.Tables.load(spark, TestSpark.sfDir, "orders")
        .filter(col("o_custkey") < 2).count()
      assert("\"album_id\":".r.findAllIn(albums).size === nAlbums)
    }
  }

  test("generic /query/{name} route serves any registered engine query") {
    withServer { port =>
      val (code, body) = get(s"http://localhost:$port/query/q1_agg")
      assert(code === 200)
      assert(body.startsWith("[") && body.contains("\"l_returnflag\""))
    }
  }

  private def post(url: String, body: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, out)
  }

  test("POST /run executes a surface-syntax program") {
    withServer { port =>
      val program =
        """n <- mut nation;
          |check(n[n_regionkey] == 0);
          |ret { key : n[n_nationkey], name : n[n_name] }""".stripMargin
      val (code, body) = post(s"http://localhost:$port/run", program)
      assert(code === 200)
      val expected = graft.core.Tables.load(spark, TestSpark.sfDir, "nation")
        .filter(org.apache.spark.sql.functions.col("n_regionkey") === 0).count()
      assert("\"key\":".r.findAllIn(body).size === expected)
      // a scalar program returns a single value row
      val (c2, b2) = post(s"http://localhost:$port/run", "2 + 3 * 4")
      assert(c2 === 200 && b2 === """[{"value":14}]""")
      // a broken program reports the parse error, not a hung socket
      val (c3, b3) = post(s"http://localhost:$port/run", "ret {")
      assert(c3 === 500 && b3.contains("error"))
      // GET on /run is not a route
      assert(get(s"http://localhost:$port/run")._1 === 404)
    }
  }

  test("POST /runc runs a command program through the Optimize pipeline") {
    withServer { port =>
      val program =
        """let mut out := nil[{k : int, n : int}] in
          |for kv in [1, 2] :
          |  set out := { k : kv,
          |    n : len(n <- mut nation; check(n[n_regionkey] == kv); ret n)
          |  } :: mut out
          |end;
          |set result := mut out""".stripMargin
      val (code, body) = post(s"http://localhost:$port/runc", program)
      assert(code === 200)
      val expected = (1L to 2L).map { k =>
        graft.core.Tables.load(spark, TestSpark.sfDir, "nation")
          .filter(org.apache.spark.sql.functions.col("n_regionkey") === k)
          .count()
      }
      for ((n, k) <- expected.zip(Seq(1, 2)))
        assert(body.contains(s""""k":$k,"n":$n"""), s"$body")
      // a program without a `result` assignment reports the contract
      val (c2, b2) = post(s"http://localhost:$port/runc", "skip")
      assert(c2 === 500 && b2.contains("result"))
    }
  }

  test("POST /extract returns portable SQL for a surface-syntax program") {
    withServer { port =>
      val program =
        """n <- mut nation;
          |check(n[n_regionkey] == 0);
          |ret { key : n[n_nationkey], name : n[n_name] }""".stripMargin
      val (code, body) = post(s"http://localhost:$port/extract", program)
      assert(code === 200)
      assert(body.contains("SELECT") && body.contains("nation"), body)
      // the returned SQL actually runs on the engine (JSON unwrapped by
      // hand — single {"sql": "..."} row)
      val text = body.stripPrefix("""[{"sql":"""").stripSuffix("\"}]")
        .replace("\\\"", "\"").replace("\\n", "\n")
      graft.core.Tables.registerAll(spark, TestSpark.sfDir)
      assert(spark.sql(text).count() ===
        graft.core.Tables.load(spark, TestSpark.sfDir, "nation")
          .filter(org.apache.spark.sql.functions.col("n_regionkey") === 0)
          .count())
      // an inextractable program reports the refusal, not a hang
      val (c2, b2) = post(s"http://localhost:$port/extract", "1 / 0")
      assert(c2 === 500 && b2.contains("error"))
    }
  }

  test("POST /extract_py returns a runnable Python program") {
    withServer { port =>
      val program =
        """x <- range(0, 5);
          |check(1 < x);
          |ret x * 2""".stripMargin
      val (code, body) = post(s"http://localhost:$port/extract_py", program)
      assert(code === 200)
      assert(body.contains("print(") && body.contains("import functools"),
        body)
      // the returned program actually runs under CPython and computes the
      // comprehension's value (guarded: skip silently if no python3)
      import scala.sys.process._
      val have = try {
        Seq("python3", "-c", "print(1)").!!.trim == "1"
      } catch { case _: Exception => false }
      if (have) {
        val text = body.stripPrefix("""[{"python":"""").stripSuffix("\"}]")
          .replace("\\\"", "\"").replace("\\n", "\n")
        val f = java.nio.file.Files.createTempFile("graft_srv_py_", ".py")
        java.nio.file.Files.writeString(f, text)
        val out = Seq("python3", f.toString).!!.trim
        java.nio.file.Files.delete(f)
        assert(out === "[4, 6, 8]", s"python output: $out\nprogram:\n$text")
      }
    }
  }

  test("route listing, 404 on unknown, non-numeric capture rejected") {
    withServer { port =>
      val (c0, listing) = get(s"http://localhost:$port/")
      assert(c0 === 200 && listing.contains("/query/q1_agg"))
      assert(get(s"http://localhost:$port/no_such")._1 === 404)
      assert(get(s"http://localhost:$port/query/nope")._1 === 404)
      assert(get(s"http://localhost:$port/get_artist_less_than/xyz")._1 === 404)
    }
  }
}
